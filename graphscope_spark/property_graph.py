"""Multi-label property graph — the ArrowFragment analog.

Reference data model (SURVEY.md §1.1, docs/frag_intro.md): a property graph
holds one columnar table per VERTEX LABEL and one per EDGE LABEL
(vertex_tables_-<label> / edge_tables_-<label>), vertices identified by
(label, oid) and encoded into a packed GID = FID|LABEL|OFFSET; every
builtin algorithm runs on a PROJECTED simple view — one vertex label, one
edge label, ≤1 property each (gs::ArrowProjectedFragment,
arrow_projected_fragment.h:710-756; python surface
python/graphscope/framework/graph.py:816-869 Graph.project) — and the
label-union compat view is gs::ArrowFlattenFragment
(arrow_flattened_fragment.h:524).

Spark-native re-expression: a dict of vertex DataFrames keyed by label and
a dict of edge DataFrames keyed by (src_label, edge_label, dst_label).
GIDs for cross-label views pack the label index into the high bits above
the per-label oid — same bit-packing idea as the reference (one implicit
fragment). Everything stays lazy; ``project``/``flatten`` return the
engine's simple :class:`Graph`, so the whole algorithm library applies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph import Graph

#: bits reserved for the per-label oid in flattened GIDs (oids must fit)
_LABEL_SHIFT = 48


class PropertyGraph:
    def __init__(self, directed: bool = True):
        self.directed = directed
        self.vertex_tables: dict[str, DataFrame] = {}
        # key: (src_label, edge_label, dst_label)
        self.edge_tables: dict[tuple[str, str, str], DataFrame] = {}

    # ------------------------------------------------------------- load
    def add_vertices(self, df: DataFrame, label: str, id_col: str = "id") -> "PropertyGraph":
        """ADD_LABELS vertex side (dag_utils.py add_labels_to_graph;
        Loader vertex mapping). ``df`` columns beyond ``id_col`` become
        the label's properties."""
        if label in self.vertex_tables:
            raise ValueError(f"vertex label {label!r} already defined")
        self.vertex_tables[label] = df.withColumnRenamed(id_col, "id")
        return self

    def add_edges(
        self,
        df: DataFrame,
        label: str,
        src_label: str,
        dst_label: str,
        src_col: str = "src",
        dst_col: str = "dst",
    ) -> "PropertyGraph":
        """ADD_LABELS edge side; endpoints are oids within the endpoint
        labels (the reference's Loader resolves them through the per-label
        vertex map at ingest — here resolution happens lazily at
        project/flatten time)."""
        key = (src_label, edge_label_canon(label), dst_label)
        if key in self.edge_tables:
            raise ValueError(f"edge label {key} already defined")
        self.edge_tables[key] = df.withColumnRenamed(src_col, "src").withColumnRenamed(
            dst_col, "dst"
        )
        return self

    # ------------------------------------------------------------ schema
    def schema(self) -> dict:
        """REPORT_GRAPH schema analog (graph_schema.py): label → props."""
        return {
            "vertices": {
                lbl: [c for c in df.columns if c != "id"]
                for lbl, df in self.vertex_tables.items()
            },
            "edges": {
                "/".join(k): [c for c in df.columns if c not in ("src", "dst")]
                for k, df in self.edge_tables.items()
            },
        }

    # ------------------------------------------------------- transforms
    def consolidate_columns(
        self,
        label: str,
        columns: list[str],
        result_column: str,
    ) -> "PropertyGraph":
        """CONSOLIDATE_COLUMNS (proto/types.proto:109,187-189;
        python/graphscope/framework/dag_utils.py:232-270 /
        graph.py:715-740): merge several same-typed property columns of one
        vertex or edge label into a single array-valued column, dropping
        the originals. The reference consolidates e.g. ``weight0, weight1``
        into one ``weight`` column so projections can address them as one
        property; on Spark this is a pure projection — ``F.array`` over the
        columns — so it is zero-shuffle and fully Catalyst-visible (column
        pruning still reaches the scan for untouched properties).

        ``label`` may be a vertex label or an edge label (edge labels
        match any (src, label, dst) key). Returns a NEW PropertyGraph
        sharing the untouched tables.
        """
        out = PropertyGraph(self.directed)
        out.vertex_tables = dict(self.vertex_tables)
        out.edge_tables = dict(self.edge_tables)
        canon = edge_label_canon(label)
        ekeys = [k for k in self.edge_tables if k[1] == canon]
        if label in self.vertex_tables:
            df = self.vertex_tables[label]
            missing = [c for c in columns if c not in df.columns]
            if missing:
                raise KeyError(f"vertex label {label!r} lacks {missing}")
            keep = [c for c in df.columns if c not in columns]
            out.vertex_tables[label] = df.select(
                *keep, F.array(*columns).alias(result_column)
            )
        elif ekeys:
            for k in ekeys:
                df = self.edge_tables[k]
                missing = [c for c in columns if c not in df.columns]
                if missing:
                    raise KeyError(f"edge label {k} lacks {missing}")
                keep = [c for c in df.columns if c not in columns]
                out.edge_tables[k] = df.select(
                    *keep, F.array(*columns).alias(result_column)
                )
        else:
            raise KeyError(f"no vertex or edge label {label!r}")
        return out

    # ----------------------------------------------------------- views
    def _labels(self) -> list[str]:
        return sorted(self.vertex_tables)

    def project(
        self,
        vertex_label: str,
        edge_label: str,
        vertex_prop: str | None = None,
        edge_prop: str | None = None,
        num_partitions: int | None = None,
    ) -> Graph:
        """ArrowProjectedFragment: one vertex label, one edge label whose
        BOTH endpoints are that label, ≤1 property each → simple Graph.
        (graph.py:816-869 project + @project_to_simple, app.py:45-79)."""
        key = (vertex_label, edge_label, vertex_label)
        if key not in self.edge_tables:
            raise KeyError(
                f"no edge label {edge_label!r} with both endpoints {vertex_label!r}"
            )
        v = self.vertex_tables[vertex_label]
        vcols = ["id"] + ([vertex_prop] if vertex_prop else [])
        e = self.edge_tables[key]
        ecols = ["src", "dst"] + ([edge_prop] if edge_prop else [])
        return Graph(
            e.select(*ecols),
            v.select(*vcols),
            directed=self.directed,
            num_partitions=num_partitions,
        )

    def _gid(self, label: str, col):
        idx = self._labels().index(label)
        return (F.lit(idx).cast("long") * F.lit(1 << _LABEL_SHIFT)) + F.col(col)

    def flatten(self, num_partitions: int | None = None) -> Graph:
        """ArrowFlattenFragment: union view over ALL labels. Vertex ids are
        GID-packed (label_idx << 48 | oid — oids must fit 48 bits, like the
        reference's offset field); edges of every (src,rel,dst) label are
        unioned with endpoints GID-encoded. Properties are dropped (the
        reference's flatten view exposes one vdata/edata pair at most;
        algorithms that need one should project instead)."""
        verts = None
        for lbl in self._labels():
            df = self.vertex_tables[lbl].select(self._gid(lbl, "id").alias("id"))
            verts = df if verts is None else verts.unionByName(df)
        edges = None
        for (sl, _, dl), df in sorted(self.edge_tables.items()):
            part = df.select(
                self._gid(sl, "src").alias("src"), self._gid(dl, "dst").alias("dst")
            )
            edges = part if edges is None else edges.unionByName(part)
        if edges is None:
            raise ValueError("no edge tables")
        return Graph(edges, verts, directed=self.directed, num_partitions=num_partitions)

    def bipartite(
        self,
        src_label: str,
        edge_label: str,
        dst_label: str,
        num_partitions: int | None = None,
    ) -> Graph:
        """Two-label projection with GID-disjoint sides — the u2i graph
        shape (apps/lpa/lpa_u2i.h consumes exactly this)."""
        key = (src_label, edge_label, dst_label)
        e = self.edge_tables[key].select(
            self._gid(src_label, "src").alias("src"),
            self._gid(dst_label, "dst").alias("dst"),
        )
        v = self.vertex_tables[src_label].select(
            self._gid(src_label, "id").alias("id")
        ).unionByName(
            self.vertex_tables[dst_label].select(self._gid(dst_label, "id").alias("id"))
        )
        return Graph(e, v, directed=self.directed, num_partitions=num_partitions)


def edge_label_canon(label: str) -> str:
    return label.strip().lower()
