"""Relational operators of the GIE algebra as documented Spark wrappers.

Each wrapper cites the reference operator it reproduces
(interactive_engine/executor/ir/proto/algebra.proto +
executor/ir/runtime/src/process/operator/*) and delegates to the Spark
primitive whose physical behavior Catalyst already owns (SURVEY.md §4.2:
predicate pushdown, column pruning, top-k fusion, limit pushdown, join
strategies, subquery decorrelation are all built in — nothing to hand-roll).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: GIE join kinds (algebra.proto:63-78 → join/join.rs:105-146) → Spark how=
JOIN_KINDS = {
    "inner": "inner",
    "left_outer": "left",
    "right_outer": "right",
    "full_outer": "full",
    "semi": "left_semi",
    "anti": "left_anti",
    "times": "cross",
}


def scan(spark, path: str, fmt: str = "parquet", predicate=None,
         columns: list[str] | None = None, limit_n: int | None = None) -> DataFrame:
    """Scan (algebra.proto:234; source.rs QueryParams: predicate, columns,
    limit) — Catalyst pushes filter/projection/limit into the format."""
    df = spark.read.format(fmt).load(path)
    if predicate is not None:
        df = df.filter(predicate)
    if columns:
        df = df.select(*columns)
    if limit_n is not None:
        df = df.limit(limit_n)
    return df


def select(df: DataFrame, predicate) -> DataFrame:
    """Select/filter (algebra.proto:56; filter/select.rs)."""
    return df.filter(predicate)


def project(df: DataFrame, *exprs: Column | str) -> DataFrame:
    """Project (algebra.proto:38; map/project.rs — expressions, CASE,
    var-maps → Spark select with arbitrary Columns)."""
    return df.select(*exprs)


def join(left: DataFrame, right: DataFrame, on, kind: str = "inner") -> DataFrame:
    """Join (algebra.proto:62-88; join/join.rs:41-150) with GIE kind names,
    including Semi/Anti/Times."""
    how = JOIN_KINDS[kind]
    if how == "cross":
        return left.crossJoin(right)
    return left.join(right, on, how)


def group_by(df: DataFrame, keys: list, aggs: list[Column]) -> DataFrame:
    """GroupBy + AggFunc (algebra.proto:105-144; group/group.rs,
    accum/accum.rs:30-46 — SUM MIN MAX COUNT COUNT_DISTINCT TO_LIST TO_SET
    AVG FIRST = sum/min/max/count/countDistinct/collect_list/collect_set/
    avg/first). Empty ``keys`` = Fold (global aggregate, group/fold.rs)."""
    return df.groupBy(*keys).agg(*aggs) if keys else df.agg(*aggs)


def order_by(df: DataFrame, cols: list, limit_n: int | None = None) -> DataFrame:
    """OrderBy / TopK (algebra.proto:145-163; sort/sort.rs — with a limit
    Spark plans TakeOrderedAndProject, the top-k heap of the reference's
    TopKPushDownRule)."""
    out = df.orderBy(*cols)
    return out.limit(limit_n) if limit_n is not None else out


def dedup(df: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """Dedup (algebra.proto:164-168; keyed/keyed.rs:157)."""
    return df.dropDuplicates(keys) if keys else df.distinct()


def consolidate_columns(
    df: DataFrame, columns: list[str], result_column: str
) -> DataFrame:
    """CONSOLIDATE_COLUMNS (dag_utils.py:232-275): merge several property
    columns of one label into a single array-typed column (the reference's
    vineyard consolidation packs them into one tensor chunk; the columnar
    analog here is one ArrayType column, which parquet stores contiguously
    per row group)."""
    others = [c for c in df.columns if c not in columns]
    return df.select(
        *others, F.array(*[F.col(c) for c in columns]).alias(result_column)
    )


def limit(df: DataFrame, n: int) -> DataFrame:
    """Range/Limit (algebra.proto:178-192; pegasus concise/limit.rs with
    early-cancel — Spark's CollectLimit short-circuits the same way)."""
    return df.limit(n)


def union(*dfs: DataFrame) -> DataFrame:
    """Union (algebra.proto:89-99; pegasus concise/merge.rs)."""
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


def unfold(df: DataFrame, col: str, alias: str | None = None) -> DataFrame:
    """Unfold (algebra.proto:169-177; flatmap/unfold.rs:282) — explode a
    collection column."""
    others = [c for c in df.columns if c != col]
    return df.select(*others, F.explode(F.col(col)).alias(alias or col))


def sample(df: DataFrame, fraction: float, seed: int = 42) -> DataFrame:
    """Sample/Coin (algebra.proto:428-450; filter/coin.rs, accum/sample.rs)
    — Bernoulli row sample; the reservoir-sample aggregate of the reference
    maps to orderBy(rand(seed)).limit(k) when an exact k is needed."""
    return df.sample(fraction=fraction, seed=seed)


def apply_subquery(df: DataFrame, subquery, kind: str = "semi") -> DataFrame:
    """Apply / SegmentApply (algebra.proto:387-406; subtask/apply.rs:118):
    correlated per-record subtask joined back by ``kind``. ``subquery`` is a
    callable df→df building the correlated branch; Catalyst decorrelates the
    join (RewriteCorrelatedScalarSubquery analog for the dataframe form)."""
    sub = subquery(df)
    key = [c for c in df.columns if c in sub.columns]
    return join(df, sub, key, kind)


def vertex_range(df: DataFrame, begin: int | None = None,
                 end: int | None = None, id_col: str = "id") -> DataFrame:
    """GAE context ``vertex_range=[begin, end)`` slicing
    (python/graphscope/framework/context.py:137-160 — results restricted
    to the half-open oid range over the sorted vertex order; tested in
    test_app.py:141-149). A pure range predicate: Catalyst pushes it into
    the scan as min/max filters, so slicing a 100 TB result set prunes row
    groups rather than sorting anything."""
    out = df
    if begin is not None:
        out = out.filter(F.col(id_col) >= begin)
    if end is not None:
        out = out.filter(F.col(id_col) < end)
    return out
