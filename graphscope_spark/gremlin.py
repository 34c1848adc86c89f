"""Gremlin-subset traversal front end compiling to DataFrame operators.

The reference's interactive engine accepts Gremlin; its compiler lowers
each step to the GIE algebra (docs/interactive_engine/tinkerpop/
supported_gremlin_steps.md — the supported-step inventory this module
mirrors; lowering rules in
interactive_engine/compiler/src/main/java/com/alibaba/graphscope/gremlin).
This module is the Spark-native analog: a fluent ``Traversal`` whose every
step is a *lazy* DataFrame transformation, so one Gremlin chain compiles to
ONE Catalyst plan — filter/projection pushdown, join reordering and top-k
fusion happen exactly as they do for the reference's optimizer rules
(FilterIntoJoinRule / TopKPushDownRule, SURVEY.md §4.2).

Supported steps (reference doc → method here):
  source      V() E()
  expand      out() in_() both() outE() inE() bothE() outV() inV()
              otherV() bothV()
  filter      hasId() has() hasNot() is_() where() not_() dedup()
  project     id_() label() constant() values() valueMap() select()
  aggregate   count() sum() min() max() mean() fold() group() groupCount()
  order       order().by()
  statistics  limit() coin() sample()
  union       union()
  sugar       repeat().times() / simplePath() — PathExpand
              (supported_gremlin_steps.md:578-709) via operators/traversal.py
  identity/unfold  identity() unfold() (supported_gremlin_steps.md:559-577)
  elementMap  elementMap() (supported_gremlin_steps.md:323-334)
  path        track_path() + path() — the reference's path() extension
              (supported_gremlin_steps.md:934-939); opt-in because the path
              array widens every shuffle row, exactly the reason the
              reference's PathExpand defaults to end_v over all_v
  range       repeat_range(lo, hi) — PathExpand out('2..4') range syntax
              (supported_gremlin_steps.md:581-643), endV() implied

Frame layout (the "traversal record" of the Rust runtime): column ``v``
holds the head vertex id; an edge head is (``src``, ``dst``); a scalar head
(after values/id_/count-by-key) is ``val``. ``as_(tag)`` snapshots the head
into column ``t_<tag>`` — tags are just carried columns, the same
record-with-tags encoding the reference uses (algebra.proto:280).

Scale notes: nothing here collects; every step stays a DataFrame op. The
edge table joined per expand hop is the Graph's persisted, pre-partitioned
out/in table (graph.py), so chained out().out() reuses the same build side;
vertex-property filters broadcast when the property table is small and
hash-join otherwise — Catalyst's choice, driven by AQE statistics.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph import Graph

__all__ = ["traversal", "GraphTraversalSource", "Traversal", "P"]


class P:
    """Gremlin predicate namespace (supported_gremlin_steps.md has-step
    forms: eq/neq/lt/lte/gt/gte/within/without) — each returns a fn
    Column→Column so steps can apply it to whatever column is the head."""

    @staticmethod
    def eq(v):
        return lambda c: c == F.lit(v)

    @staticmethod
    def neq(v):
        return lambda c: c != F.lit(v)

    @staticmethod
    def lt(v):
        return lambda c: c < F.lit(v)

    @staticmethod
    def lte(v):
        return lambda c: c <= F.lit(v)

    @staticmethod
    def gt(v):
        return lambda c: c > F.lit(v)

    @staticmethod
    def gte(v):
        return lambda c: c >= F.lit(v)

    @staticmethod
    def within(*vs):
        return lambda c: c.isin(list(vs))

    @staticmethod
    def without(*vs):
        return lambda c: ~c.isin(list(vs))

    @staticmethod
    def inside(lo, hi):
        return lambda c: (c > F.lit(lo)) & (c < F.lit(hi))


def _parse_math(expr: str, underscore: Column) -> Column:
    """Shunting-yard mini-parser for the math() step: numbers, ``_``,
    ``+ - * / %`` and parentheses → one Column expression. No eval()."""
    import re as _re

    toks = _re.findall(r"\d+\.\d+|\d+|_|[()+\-*/%]", expr.replace(" ", ""))
    if "".join(toks).replace(" ", "") != expr.replace(" ", ""):
        raise ValueError(f"unsupported math() expression: {expr!r}")
    prec = {"+": 1, "-": 1, "*": 2, "/": 2, "%": 2}
    out: list = []
    ops: list[str] = []

    def _apply(op: str) -> None:
        b, a = out.pop(), out.pop()
        out.append({"+": a + b, "-": a - b, "*": a * b,
                    "/": a / b, "%": a % b}[op])

    for t in toks:
        if t == "_":
            out.append(underscore)
        elif t == "(":
            ops.append(t)
        elif t == ")":
            while ops and ops[-1] != "(":
                _apply(ops.pop())
            if not ops:
                raise ValueError(f"unbalanced parens in math(): {expr!r}")
            ops.pop()
        elif t in prec:
            while ops and ops[-1] != "(" and prec[ops[-1]] >= prec[t]:
                _apply(ops.pop())
            ops.append(t)
        else:
            out.append(F.lit(float(t) if "." in t else int(t)))
    while ops:
        if ops[-1] == "(":
            raise ValueError(f"unbalanced parens in math(): {expr!r}")
        _apply(ops.pop())
    if len(out) != 1:
        raise ValueError(f"malformed math() expression: {expr!r}")
    return out[0]


def _as_pred(value) -> Callable[[Column], Column]:
    return value if callable(value) else P.eq(value)


class GraphTraversalSource:
    """``g`` — per docs/interactive_engine/tinkerpop (the reference binds
    one source per loaded graph)."""

    def __init__(self, graph: Graph, vertex_props: DataFrame | None = None):
        self.graph = graph
        # property table keyed by ``id`` for has()/values(); defaults to the
        # graph's own vertices table (which may be id-only).
        self.vertex_props = vertex_props if vertex_props is not None else graph.vertices

    def V(self, *ids) -> "Traversal":
        """V() source (supported_gremlin_steps.md:26-35): all vertices or
        V(id…) — the id form stays a pushed-down IN filter, the analog of
        the reference's IndexPredicate fast path."""
        df = self.graph.vertices.select(F.col("id").alias("v"))
        if ids:
            df = df.filter(F.col("v").isin(list(ids)))
        return Traversal(self, df, head="v")

    def E(self) -> "Traversal":
        """E() source (supported_gremlin_steps.md:36-45)."""
        return Traversal(self, self.graph.edges.select("src", "dst"), head="e")

    def match(self, patterns: list[tuple[str, str, str]]) -> DataFrame:
        """match() (supported_gremlin_steps.md:532-547): conjunctive
        pattern matching. ``patterns`` is a list of sentences
        ``(tag_a, direction, tag_b)`` — "tag_a's <direction>-neighbor is
        tag_b". Returns one row per distinct binding (columns = tags).

        Lowering (the reference's compiler turns match into a join tree —
        ExtendIntersectRule / worst-case-optimal intersect, SURVEY §4.2):
        sentences whose endpoints are both already bound become existence
        SEMI-joins; sentences introducing a new tag extend the binding via
        an equi-join against the edge table. Catalyst reorders/broadcasts
        as statistics dictate."""
        bind: DataFrame | None = None
        bound: set[str] = set()
        pending = list(patterns)
        while pending:
            # greedy order, cheapest join class first: both-bound sentences
            # are existence semi-joins that only SHRINK the binding — apply
            # them before any extension grows it; disjoint sentences
            # (cross join) go last.
            idx = next((i for i, (a, _, b) in enumerate(pending)
                        if a in bound and b in bound), None)
            if idx is None:
                idx = next((i for i, (a, _, b) in enumerate(pending)
                            if a in bound or b in bound), 0)
            a, direction, b = pending.pop(idx)
            e = self.V()._edges(direction).select(
                F.col("src").alias(a), F.col("dst").alias(b)
            )
            if bind is None:
                bind, bound = e, {a, b}
            elif a in bound and b in bound:
                bind = bind.join(e, [a, b], "left_semi")
            elif a in bound or b in bound:
                on = a if a in bound else b
                bind = bind.join(e, on)
                bound |= {a, b}
            else:
                bind = bind.crossJoin(e)
                bound |= {a, b}
        return bind.select(*sorted(bound)).distinct()


def traversal(graph: Graph, vertex_props: DataFrame | None = None) -> GraphTraversalSource:
    return GraphTraversalSource(graph, vertex_props)


def _tag_cols(df: DataFrame) -> list[str]:
    return [c for c in df.columns if c.startswith("t_")]


class Traversal:
    def __init__(self, source: GraphTraversalSource, df: DataFrame, head: str):
        self._s = source
        self.df = df
        self.head = head  # 'v' | 'e' | 'val'

    # ------------------------------------------------------------- core
    def _new(self, df: DataFrame, head: str | None = None) -> "Traversal":
        return Traversal(self._s, df, head or self.head)

    def _require(self, *heads: str) -> None:
        if self.head not in heads:
            raise TypeError(f"step needs head in {heads}, have {self.head!r}")

    def _head_col(self) -> Column:
        if self.head == "e":
            return F.struct(F.col("src"), F.col("dst"))
        return F.col("v" if self.head == "v" else "val")

    def _edges(self, direction: str) -> DataFrame:
        g = self._s.graph
        e = g.edges.select("src", "dst")
        if direction == "out":
            return e
        if direction == "in":
            return e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        return e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))

    # ----------------------------------------------------------- expand
    def _expand_v(self, direction: str) -> "Traversal":
        """ExpandV — the fused ExpandE+GetV (ExpandGetVFusionRule)."""
        self._require("v")
        e = self._edges(direction)
        keep = [c for c in self.df.columns if c not in ("v", "__path")]
        cols = [*keep, F.col("dst").alias("v")]
        if "__path" in self.df.columns:
            cols.append(
                F.concat(F.col("__path"), F.array(F.col("dst"))).alias("__path")
            )
        out = self.df.join(e, self.df["v"] == e["src"]).select(*cols)
        return self._new(out, "v")

    def out(self) -> "Traversal":
        return self._expand_v("out")

    def in_(self) -> "Traversal":
        return self._expand_v("in")

    def both(self) -> "Traversal":
        return self._expand_v("both")

    def _expand_e(self, direction: str) -> "Traversal":
        self._require("v")
        e = self._edges(direction)
        keep = [c for c in self.df.columns if c != "v"]
        # keep the entry endpoint as t__enter so otherV() can resolve it
        out = (
            self.df.join(e, self.df["v"] == e["src"])
            .select(*keep, self.df["v"].alias("t__enter"), "src", "dst")
        )
        return self._new(out, "e")

    def outE(self) -> "Traversal":
        return self._expand_e("out")

    def inE(self) -> "Traversal":
        # edge kept in storage orientation: src/dst as stored, entry = dst
        self._require("v")
        e = self._s.graph.edges.select("src", "dst")
        keep = [c for c in self.df.columns if c != "v"]
        out = (
            self.df.join(e, self.df["v"] == e["dst"])
            .select(*keep, self.df["v"].alias("t__enter"), "src", "dst")
        )
        return self._new(out, "e")

    def bothE(self) -> "Traversal":
        self._require("v")
        e = self._s.graph.edges.select("src", "dst")
        keep = [c for c in self.df.columns if c != "v"]
        o = self.df.join(e, self.df["v"] == e["src"]).select(
            *keep, self.df["v"].alias("t__enter"), "src", "dst"
        )
        i = self.df.join(e, self.df["v"] == e["dst"]).select(
            *keep, self.df["v"].alias("t__enter"), "src", "dst"
        )
        return self._new(o.unionByName(i), "e")

    def _get_v(self, which: str) -> "Traversal":
        """GetV (algebra.proto:257-284)."""
        self._require("e")
        if which == "start":
            col = F.col("src")
        elif which == "end":
            col = F.col("dst")
        elif which == "other":
            col = F.when(F.col("t__enter") == F.col("src"), F.col("dst")).otherwise(
                F.col("src")
            )
        else:
            raise ValueError(which)
        keep = [c for c in self.df.columns
                if c not in ("src", "dst", "t__enter", "__path")]
        cols = [*keep, col.alias("v")]
        if "__path" in self.df.columns:
            cols.append(F.concat(F.col("__path"), F.array(col)).alias("__path"))
        return self._new(self.df.select(*cols), "v")

    def outV(self) -> "Traversal":
        return self._get_v("start")

    def inV(self) -> "Traversal":
        return self._get_v("end")

    def otherV(self) -> "Traversal":
        return self._get_v("other")

    def bothV(self) -> "Traversal":
        self._require("e")
        return self._new(
            self._get_v("start").df.unionByName(self._get_v("end").df), "v"
        )

    # ----------------------------------------------------------- filter
    def hasId(self, *ids) -> "Traversal":
        self._require("v")
        return self._new(self.df.filter(F.col("v").isin(list(ids))))

    def has(self, prop: str, value=None) -> "Traversal":
        """has(key[, value|P]) — vertex-property filter via semi-join
        against the property table (the reference scans the property
        column in place; the columnar analog is a semi-join that Catalyst
        turns into a broadcast when the filtered prop table is small)."""
        self._require("v")
        props = self._s.vertex_props
        if prop not in props.columns:
            raise KeyError(prop)
        cond = props[prop].isNotNull() if value is None else _as_pred(value)(props[prop])
        keep = props.filter(cond).select(F.col("id").alias("v"))
        return self._new(self.df.join(keep, "v", "left_semi"))

    def hasNot(self, prop: str) -> "Traversal":
        self._require("v")
        props = self._s.vertex_props
        keep = props.filter(props[prop].isNotNull()).select(F.col("id").alias("v"))
        return self._new(self.df.join(keep, "v", "left_anti"))

    def is_(self, value) -> "Traversal":
        self._require("val")
        return self._new(self.df.filter(_as_pred(value)(F.col("val"))))

    def where(self, pred) -> "Traversal":
        """where(P.eq('a')) — compare head to a tag — or where(Column)."""
        if isinstance(pred, Column):
            return self._new(self.df.filter(pred))
        if callable(pred):
            return self._new(self.df.filter(pred(self._head_col())))
        raise TypeError(pred)

    def where_tag(self, cmp: str, tag: str) -> "Traversal":
        """where(P.eq('a')) — head vs the tagged column
        (supported_gremlin_steps.md:211-240). cmp ∈ TAG_CMP ('eq','neq',
        'lt','gt') or a callable (head, tag) → Column."""
        fn = TAG_CMP[cmp] if isinstance(cmp, str) else cmp
        return self._new(self.df.filter(fn(self._head_col(), F.col(f"t_{tag}"))))

    def filter_(self, sub: Callable[["Traversal"], "Traversal"]) -> "Traversal":
        """filter(traversal): keep records whose subtraversal is
        NON-empty — Apply with a semi-join (the positive twin of
        :meth:`not_`; algebra.proto:387-406). Correlation is an explicit
        carried column, as in not_."""
        if self.head == "e":
            corr = F.struct(F.col("src"), F.col("dst"))
        else:
            corr = self._head_col()
        base = self.df.withColumn("__corr", corr)
        inner = sub(self._new(base))
        hit = inner.df.select("__corr").distinct()
        return self._new(base.join(hit, "__corr", "left_semi").drop("__corr"))

    def math(self, expr: str) -> "Traversal":
        """math('_ % 50') (supported_gremlin_steps.md math step): evaluate
        an arithmetic expression over the numeric head, ``_`` = the
        incoming value. Parsed by a tiny shunting-yard grammar (+ - * / %
        and parentheses — never eval()) and lowered to ONE Catalyst
        column expression, JVM-side."""
        self._require("val")
        col = _parse_math(expr, F.col("val"))
        keep = [c for c in self.df.columns if c != "val"]
        return self._new(self.df.select(*keep, col.alias("val")), "val")

    def select_tag(self, tag: str) -> "Traversal":
        """select('a') mid-chain: re-head the traversal on a tagged value
        (supported_gremlin_steps.md:335-366 — the one-key form keeps
        traversing; the multi-key form is the terminal :meth:`select`)."""
        keep = [c for c in self.df.columns if c not in ("v", "val")]
        return self._new(
            self.df.select(*keep, F.col(f"t_{tag}").alias("val")), "val"
        )

    def not_(self, sub: Callable[["Traversal"], "Traversal"]) -> "Traversal":
        """not(traversal): keep records whose subtraversal is EMPTY —
        Apply with an anti-join (algebra.proto:387-406). Correlation is an
        explicit carried column (the reference's Apply keys the subtask by
        the parent record the same way)."""
        if self.head == "e":
            corr = F.struct(F.col("src"), F.col("dst"))
        else:
            corr = self._head_col()
        base = self.df.withColumn("__corr", corr)
        inner = sub(self._new(base))
        hit = inner.df.select("__corr").distinct()
        return self._new(base.join(hit, "__corr", "left_anti").drop("__corr"))

    def dedup(self) -> "Traversal":
        return self._new(self.df.distinct())

    def hasLabel(self, *labels: str) -> "Traversal":
        """hasLabel() (supported_gremlin_steps.md:131-139). Simple graphs
        are single-label ('vertex'/'edge' — the projected-fragment
        contract, same as label()); multi-label graphs go through
        PropertyGraph.project/flatten first."""
        have = "vertex" if self.head == "v" else "edge"
        if have in labels:
            return self._new(self.df)
        return self._new(self.df.limit(0))

    def identity(self) -> "Traversal":
        """identity() (supported_gremlin_steps.md:559-566) — no-op step."""
        return self._new(self.df)

    # ---------------------------------------------------------- project
    def as_(self, tag: str) -> "Traversal":
        self._require("v", "val")
        col = "v" if self.head == "v" else "val"
        return self._new(self.df.withColumn(f"t_{tag}", F.col(col)))

    def id_(self) -> "Traversal":
        self._require("v")
        return self._new(self.df.withColumnRenamed("v", "val"), "val")

    def label(self) -> "Traversal":
        # single-label simple graphs (the projected-fragment contract)
        self._require("v", "e")
        lbl = F.lit("vertex" if self.head == "v" else "edge")
        return self._new(self.df.select(*_tag_cols(self.df), lbl.alias("val")), "val")

    def constant(self, v) -> "Traversal":
        return self._new(self.df.select(*_tag_cols(self.df), F.lit(v).alias("val")), "val")

    def values(self, prop: str) -> "Traversal":
        self._require("v")
        props = self._s.vertex_props.select(F.col("id").alias("v"), F.col(prop).alias("val"))
        keep = [c for c in self.df.columns if c != "v"]
        return self._new(self.df.join(props, "v").select(*keep, "val"), "val")

    def valueMap(self, *props: str) -> "Traversal":
        self._require("v")
        p = self._s.vertex_props
        cols = list(props) or [c for c in p.columns if c != "id"]
        m = p.select(
            F.col("id").alias("v"),
            F.map_from_arrays(
                F.array(*[F.lit(c) for c in cols]),
                F.array(*[F.col(c).cast("string") for c in cols]),
            ).alias("val"),
        )
        keep = [c for c in self.df.columns if c != "v"]
        return self._new(self.df.join(m, "v").select(*keep, "v", "val"), "val")

    def elementMap(self, *props: str) -> "Traversal":
        """elementMap() (supported_gremlin_steps.md:323-334) — valueMap
        plus the id and label entries, all stringified (one string-map
        column, like the reference's elementMap record)."""
        self._require("v")
        p = self._s.vertex_props
        cols = list(props) or [c for c in p.columns if c != "id"]
        m = p.select(
            F.col("id").alias("v"),
            F.map_from_arrays(
                F.array(F.lit("id"), F.lit("label"),
                        *[F.lit(c) for c in cols]),
                F.array(F.col("id").cast("string"), F.lit("vertex"),
                        *[F.col(c).cast("string") for c in cols]),
            ).alias("val"),
        )
        keep = [c for c in self.df.columns if c != "v"]
        return self._new(self.df.join(m, "v").select(*keep, "v", "val"), "val")

    def unfold(self) -> "Traversal":
        """unfold() (supported_gremlin_steps.md:568-577) — explode an
        array-valued head back into one record per element."""
        self._require("val")
        keep = [c for c in self.df.columns if c != "val"]
        return self._new(
            self.df.select(*keep, F.explode(F.col("val")).alias("val")), "val"
        )

    def track_path(self) -> "Traversal":
        """Start path() tracking from the current head: every subsequent
        vertex step appends to a carried ``__path`` array — the PathExpand
        all_v record layout (algebra.proto PathExpand result_opt)."""
        self._require("v")
        return self._new(self.df.withColumn("__path", F.array(F.col("v"))))

    def path(self) -> DataFrame:
        """path() (supported_gremlin_steps.md:934-939) — terminal: the
        visited-vertex array serialized "a->b->c" (the join-key-stable
        spelling the simple-path family uses)."""
        if "__path" not in self.df.columns:
            raise TypeError("path() needs track_path() earlier in the chain")
        return self.df.select(
            F.concat_ws("->", F.transform(F.col("__path"),
                                          lambda x: x.cast("string")))
            .alias("path_str")
        )

    def select(self, *tags: str) -> DataFrame:
        """select('a','b') — project tags out as the result
        (supported_gremlin_steps.md:335-366). Terminal: returns a DataFrame
        with one column per tag."""
        return self.df.select(*[F.col(f"t_{t}").alias(t) for t in tags])

    # -------------------------------------------------------- aggregate
    def count(self) -> DataFrame:
        return self.df.agg(F.count(F.lit(1)).alias("count"))

    def _scalar_agg(self, fn, name: str) -> DataFrame:
        self._require("val")
        return self.df.agg(fn(F.col("val")).alias(name))

    def sum(self) -> DataFrame:
        return self._scalar_agg(F.sum, "sum")

    def min(self) -> DataFrame:
        return self._scalar_agg(F.min, "min")

    def max(self) -> DataFrame:
        return self._scalar_agg(F.max, "max")

    def mean(self) -> DataFrame:
        return self._scalar_agg(F.avg, "mean")

    def fold(self) -> DataFrame:
        """fold() — TO_LIST accumulation (accum/accum.rs:30-46); sorted for
        determinism (the reference's list order is arrival order, which a
        parallel engine doesn't fix either)."""
        col = "val" if self.head == "val" else "v"
        return self.df.agg(F.sort_array(F.collect_list(F.col(col))).alias("folded"))

    def group_count(self, by_tag: str | None = None) -> DataFrame:
        """groupCount() (supported_gremlin_steps.md:445-461): count per
        current head (or per tag). One hash-agg with map-side partials."""
        key = F.col(f"t_{by_tag}").alias(by_tag) if by_tag else self._head_col().alias(
            "key"
        )
        return self.df.groupBy(key).agg(F.count(F.lit(1)).alias("count"))

    def group(self, by_tag: str, agg: Column) -> DataFrame:
        """group().by(tag).by(agg) (supported_gremlin_steps.md:399-444)."""
        return self.df.groupBy(F.col(f"t_{by_tag}").alias(by_tag)).agg(agg)

    # ------------------------------------------------------ order/range
    def order(self, *by, limit_n: int | None = None) -> "Traversal":
        """order().by(...)[.limit(n)] — with a limit Spark plans
        TakeOrderedAndProject (the reference's top-k heap)."""
        cols = list(by) or [self._head_col()]
        out = self.df.orderBy(*cols)
        if limit_n is not None:
            out = out.limit(limit_n)
        return self._new(out)

    def limit(self, n: int) -> "Traversal":
        return self._new(self.df.limit(n))

    def coin(self, prob: float, seed: int = 42) -> "Traversal":
        return self._new(self.df.sample(fraction=prob, seed=seed))

    def sample(self, n: int, seed: int = 42) -> "Traversal":
        return self._new(self.df.orderBy(F.xxhash64(*self.df.columns, F.lit(seed))).limit(n))

    # ------------------------------------------------------------ union
    def union(self, *subs: Callable[["Traversal"], "Traversal"]) -> "Traversal":
        branches = [sub(self._new(self.df)) for sub in subs]
        heads = {b.head for b in branches}
        if len(heads) != 1:
            raise TypeError(f"union branches must agree on head, got {heads}")
        out = branches[0].df
        for b in branches[1:]:
            out = out.unionByName(b.df)
        return self._new(out, branches[0].head)

    # ------------------------------------------------------------ sugar
    def repeat_times(
        self, n: int, direction: str = "out", simple: bool = False
    ) -> "Traversal":
        """repeat(out()).times(n) — the PathExpand sugar
        (supported_gremlin_steps.md:578-709). simple=True adds the
        simplePath() filter (no revisited vertex on the path)."""
        from graphscope_spark.operators.traversal import path_expand

        self._require("v")
        ends = path_expand(
            self.df.select("v"),
            self._s.graph,
            min_hops=n,
            max_hops=n,
            direction=direction,
            path_opt="simple" if simple else "arbitrary",
        )
        keep = [c for c in self.df.columns if c != "v"]
        if keep:
            out = (
                self.df.withColumnRenamed("v", "_start")
                .join(ends, F.col("_start") == ends["start"])
                .select(*keep, ends["v"].alias("v"))
            )
            return self._new(out, "v")
        return self._new(ends.select("v"), "v")

    def repeat_range(
        self, lo: int, hi: int, direction: str = "out", simple: bool = False
    ) -> "Traversal":
        """out('2..4') — the PathExpand RANGE syntax
        (supported_gremlin_steps.md:581-643): endpoints after lo..hi hops
        inclusive, endV() semantics (head = path end). Lowering identical
        to repeat_times but with min/max hops split."""
        from graphscope_spark.operators.traversal import path_expand

        self._require("v")
        ends = path_expand(
            self.df.select("v"),
            self._s.graph,
            min_hops=lo,
            max_hops=hi,
            direction=direction,
            path_opt="simple" if simple else "arbitrary",
        )
        keep = [c for c in self.df.columns if c != "v"]
        if keep:
            out = (
                self.df.withColumnRenamed("v", "_start")
                .join(ends, F.col("_start") == ends["start"])
                .select(*keep, ends["v"].alias("v"))
            )
            return self._new(out, "v")
        return self._new(ends.select("v"), "v")

    # --------------------------------------------------------- terminal
    def subgraph(self) -> Graph:
        """subgraph() (supported_gremlin_steps.md:549-557): materialize the
        edges visited by an edge-head traversal as a NEW Graph — the
        GREMLIN_TO_SUBGRAPH / SinkVineyard path of the reference
        (dag_utils.py gremlin_to_subgraph; the reference sinks to vineyard,
        we return a Graph over the deduped edge DataFrame, persisted and
        re-partitioned like any loaded graph)."""
        self._require("e")
        e = self.df.select("src", "dst").distinct()
        return Graph(
            e,
            directed=self._s.graph.directed,
            num_partitions=self._s.graph.num_partitions,
        )

    def to_df(self) -> DataFrame:
        return self.df


#: two-column comparators for where_tag (head, tag) → Column
TAG_CMP = {
    "eq": lambda h, t: h == t,
    "neq": lambda h, t: h != t,
    "lt": lambda h, t: h < t,
    "gt": lambda h, t: h > t,
}
