"""GIE scalar-expression surface (SURVEY.md §2.5) as Spark Column builders.

Every operator of interactive_engine/executor/ir/proto/expr.proto gets an
explicit, citable mapping. Most are one-liners over
``pyspark.sql.functions`` — that is the point: the reference implements an
expression interpreter (executor/ir/runtime expr eval); here every
expression lowers into Catalyst and runs inside whole-stage codegen. The
wrappers exist so a reference user can find each expr.proto op by name and
so the mapping is test-pinned (tests/test_expressions.py).

| expr.proto op (line) | here |
|---|---|
| EQ NE LT LE GT GE (:53-60) | plain Column operators (documented) |
| WITHIN / WITHOUT (:61-64) | :func:`within` / :func:`without` |
| STARTSWITH / ENDSWITH (:65-68) | :func:`starts_with` / :func:`ends_with` |
| AND OR NOT (:69-75), ISNULL (:76), REGEX (:79) | `&`, `|`, `~`, :func:`is_null`, :func:`regex` |
| ADD..EXP, BITAND..BITRSHIFT (:86-110) | arithmetic operators, :func:`bit_op` |
| CASE WHEN (:195-205) | :func:`case_when` |
| EXTRACT (:208-219) | :func:`extract` |
| DateTimeMinus / TimeInterval (:222-233) | :func:`datetime_minus` |
| VariableKeys / VariableKeyValues (:155-185) | :func:`key_list` / :func:`key_values` |
| IdKey / LabelKey / LengthKey (:25-51) | column access, :func:`length_key` |
| PathConcat / PathFunction (:120-155, 235-270) | :func:`path_concat` / :func:`path_function` |
| UserDefinedFunction (:251-255) | pandas_udf (functions/ modules; per-row udf deliberately unused) |
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else x


def within(col, values: Sequence) -> Column:
    """WITHIN (expr.proto:61-62) — membership in a literal list."""
    return _c(col).isin(list(values))


def without(col, values: Sequence) -> Column:
    """WITHOUT (expr.proto:63-64)."""
    return ~_c(col).isin(list(values))


def starts_with(col, prefix: str) -> Column:
    """STARTSWITH (expr.proto:65-66)."""
    return _c(col).startswith(prefix)


def ends_with(col, suffix: str) -> Column:
    """ENDSWITH (expr.proto:67-68)."""
    return _c(col).endswith(suffix)


def is_null(col) -> Column:
    """ISNULL (expr.proto:76)."""
    return _c(col).isNull()


def regex(col, pattern: str) -> Column:
    """REGEX (expr.proto:79) — full-match-anywhere semantics = rlike."""
    return _c(col).rlike(pattern)


_BIT_OPS = {
    "and": lambda a, b: a.bitwiseAND(b),
    "or": lambda a, b: a.bitwiseOR(b),
    "xor": lambda a, b: a.bitwiseXOR(b),
    "lshift": lambda a, b: F.shiftleft(a, b),
    "rshift": lambda a, b: F.shiftright(a, b),
}


def bit_op(op: str, a, b) -> Column:
    """BITAND/BITOR/BITXOR/BITLSHIFT/BITRSHIFT (expr.proto:102-110).
    Shift amounts are Python ints (Spark's shiftleft takes a literal
    count, matching the proto's int operand)."""
    return _BIT_OPS[op](_c(a), b if isinstance(b, int) else _c(b))


def case_when(branches: Sequence[tuple[Column, Column]], default) -> Column:
    """CASE WHEN (expr.proto:195-205)."""
    out = None
    for cond, val in branches:
        out = F.when(cond, val) if out is None else out.when(cond, val)
    return out.otherwise(_c(default) if isinstance(default, str) else default)


_EXTRACT = {
    "year": F.year, "month": F.month, "day": F.dayofmonth,
    "hour": F.hour, "minute": F.minute, "second": F.second,
}


def extract(interval: str, col) -> Column:
    """EXTRACT (expr.proto:208-219; intervals YEAR..MILLISECOND)."""
    interval = interval.lower()
    if interval == "millisecond":
        # timestamp fractional part in ms, matching the proto's field
        c = _c(col)
        return (
            (c.cast("double") - c.cast("long").cast("double")) * 1000
        ).cast("int")
    return _EXTRACT[interval](_c(col))


def datetime_minus(a, b, unit: str = "day") -> Column:
    """DateTimeMinus (expr.proto:222-233) — difference in ``unit``."""
    da, db = _c(a), _c(b)
    if unit == "day":
        return F.datediff(da, db)
    secs = da.cast("long") - db.cast("long")
    return {"second": secs, "minute": secs / 60, "hour": secs / 3600}[unit]


def key_list(*cols) -> Column:
    """VariableKeys list-projection (expr.proto:155-166) → array()."""
    return F.array(*[_c(c) for c in cols])


def key_values(**kv) -> Column:
    """VariableKeyValues map-projection (expr.proto:167-185) → map()."""
    items: list[Column] = []
    for k, v in kv.items():
        items.append(F.lit(k))
        items.append(_c(v))
    return F.create_map(*items)


def length_key(col) -> Column:
    """LengthKey (expr.proto:41-44) — length of a path/collection value."""
    return F.size(_c(col))


def path_concat(a, b) -> Column:
    """PathConcat (expr.proto:235-250) — concatenate two path arrays."""
    return F.concat(_c(a), _c(b))


def path_function(col, func: str) -> Column:
    """PathFunction (expr.proto:120-155): len / first / last over a path
    array column."""
    c = _c(col)
    return {
        "len": F.size(c) - 1,  # hops = vertices - 1
        "first": F.element_at(c, 1),
        "last": F.element_at(c, -1),
    }[func]
