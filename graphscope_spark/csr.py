"""Hash-partitioned CSR block DataFrames — the fragment storage analog.

The reference holds each fragment's adjacency as an in-memory CSR
(docs/frag_intro.md:17-19: hash-partitioned ArrowFragments, CSR per
direction) and its gather-scatter loops walk the indptr/column arrays
directly — no per-edge tuple materialization. The DataFrame join+groupBy
message exchange re-expresses the SAME dataflow but pays tuple-at-a-time
JVM costs per edge per round.

This module packs the edge table ONCE into one row per hash block:

    (blk int, n_src long, n_edge long,
     srcs binary, indptr binary, dsts binary)

where the three binaries are little-endian int64 numpy buffers — a real
CSR: ``srcs`` the sorted distinct sources of the block, ``indptr`` the
CSR row pointer (len = n_src + 1), ``dsts`` the concatenated, per-source
sorted adjacency. Block assignment is ``pmod(id, B)`` — derived from the
KEY like the reference's HashPartitioner::GetPartitionId
(partitioner.h:43-54), and chosen over a hash function so the SAME rule
is computable inside a numpy kernel (np.mod and F.pmod agree, including
on negative ids); a vertex-state DataFrame grouped by the same
expression co-groups with its out-block.

The per-round message exchange then moves NO per-edge rows at all
(:func:`scatter_packed`): each block's numpy SpMV pre-combines messages
by destination (the Pregel combiner), splits them by destination block,
and ships ≤B packed binary rows per source block — Θ(B²) rows per round
whose total BYTES are the combined message volume, with zero per-row
JVM overhead. The receive side merges the ≤B buffers per block with one
more numpy pass. Vertex state (Θ(V) rows) is the only row-shaped data a
superstep shuffles.

Scale contract (100 TB): a block must fit one executor core's memory —
the identical constraint the reference puts on a fragment. Size B so
E/B ≈ 10⁷–10⁸ edges (≲1.6 GB of int64 buffers); Arrow's 2 GiB-per-value
binary cap is the hard ceiling, asserted at pack time. The pack is one
shuffle of the edge table, paid once; B² stays irrelevant next to data
volume up to B ≈ 10⁴ blocks ≈ 10¹²-edge graphs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph import Graph, persist_partitioned

#: Arrow binary values are capped at 2 GiB; stay under with headroom.
_MAX_BLOCK_EDGES = (1 << 31) // 8 - 1


def block_expr(col: str, num_blocks: int):
    """The block-assignment expression — ``pmod(col, B)``, reproducible
    in numpy as ``ids % B`` (both yield the divisor's sign)."""
    return F.pmod(F.col(col), F.lit(num_blocks)).cast("int")


def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
    if len(pdf) == 0:
        return pd.DataFrame(
            columns=["blk", "n_src", "n_edge", "srcs", "indptr", "dsts"]
        )
    if len(pdf) > _MAX_BLOCK_EDGES:
        raise ValueError(
            f"CSR block of {len(pdf)} edges exceeds the 2 GiB Arrow binary "
            "cap; rebuild with more blocks (num_blocks)"
        )
    pdf = pdf.sort_values(["src", "dst"], kind="mergesort")
    src = pdf["src"].to_numpy(np.int64)
    dst = pdf["dst"].to_numpy(np.int64)
    srcs, counts = np.unique(src, return_counts=True)
    indptr = np.concatenate(([0], np.cumsum(counts))).astype(np.int64)
    return pd.DataFrame(
        [
            {
                "blk": int(pdf["blk"].iloc[0]),
                "n_src": int(srcs.size),
                "n_edge": int(dst.size),
                "srcs": srcs.tobytes(),
                "indptr": indptr.tobytes(),
                "dsts": dst.tobytes(),
            }
        ]
    )


_PACK_SCHEMA = (
    "blk int, n_src long, n_edge long, srcs binary, indptr binary, dsts binary"
)


def build_csr_blocks(
    g: Graph, num_blocks: int | None = None, direction: str = "out"
) -> DataFrame:
    """Pack ``g``'s edges into hash-partitioned CSR blocks (persisted,
    partitioned by ``blk`` so per-round cogroups reuse the exchange).

    ``direction='out'`` keys blocks by src (gather-over-out-edges push);
    ``'in'`` keys by dst with (src,dst) swapped into the CSR so the same
    SpMV kernel computes a pull. One edge shuffle total — the CSR build
    cost the reference pays at fragment load (docs/frag_intro.md).
    """
    b = num_blocks or g.num_partitions
    if direction == "out":
        e = g.out_edges.select("src", "dst")
    elif direction == "in":
        e = g.in_edges.select(
            F.col("dst").alias("src"), F.col("src").alias("dst")
        )
    else:
        raise ValueError("direction must be 'out' or 'in'")
    blocks = (
        e.withColumn("blk", block_expr("src", b))
        .groupBy("blk")
        .applyInPandas(_pack, _PACK_SCHEMA)
    )
    # register the cache already hash-partitioned on blk: the per-round
    # cogroup then exchanges ONLY the vertex-state side (persist with AQE
    # off so the InMemoryRelation reports HashPartitioning — the same
    # CSR-stays-put discipline Graph applies to out_edges/in_edges).
    return persist_partitioned(blocks.repartition(b, "blk"))


def scatter_packed(
    csr: DataFrame, vals: DataFrame, num_blocks: int
) -> DataFrame:
    """One gather-scatter over the CSR blocks, messages pre-combined and
    PACKED: for each edge (u→v), send ``val(u)`` to v; sums are combined
    per v inside the block (numpy bincount = the Pregel combiner), then
    split by v's destination block and emitted as binary buffers:

        (sblk int, dblk int, ids binary, sums binary)

    ≤ num_blocks rows per source block — the per-edge volume crosses the
    shuffle as packed bytes, never as rows. ``vals`` must be
    ``(blk, id, val)`` with blk = pmod(id, B). Merge the ≤B buffers per
    dblk with :func:`merge_packed` on the receive side.
    """

    def gather(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "sblk": pd.Series(dtype=np.int32),
            "dblk": pd.Series(dtype=np.int32),
            "ids": pd.Series(dtype=object),
            "sums": pd.Series(dtype=object),
        })
        if len(left) == 0 or len(right) == 0:
            return empty
        ids = right["id"].to_numpy(np.int64)
        val = right["val"].to_numpy(np.float64)
        order = np.argsort(ids, kind="mergesort")
        ids_s, val_s = ids[order], val[order]
        rows: list[dict] = []
        for row in left.itertuples(index=False):
            srcs = np.frombuffer(row.srcs, dtype=np.int64)
            indptr = np.frombuffer(row.indptr, dtype=np.int64)
            dsts = np.frombuffer(row.dsts, dtype=np.int64)
            pos = np.searchsorted(ids_s, srcs)
            per_edge = np.repeat(val_s[pos], np.diff(indptr))
            uniq, inv = np.unique(dsts, return_inverse=True)
            sums = np.bincount(inv, weights=per_edge, minlength=uniq.size)
            # split the combined messages by destination block; uniq is
            # sorted, so a stable sort on dblk keeps ids sorted per slice
            dblk = (uniq % num_blocks).astype(np.int32)
            o = np.argsort(dblk, kind="mergesort")
            uniq, sums, dblk = uniq[o], sums[o], dblk[o]
            bounds = np.flatnonzero(np.diff(dblk)) + 1
            for part_ids, part_sums, b0 in zip(
                np.split(uniq, bounds), np.split(sums, bounds),
                dblk[np.concatenate(([0], bounds))] if uniq.size else [],
            ):
                rows.append({
                    "sblk": int(row.blk),
                    "dblk": int(b0),
                    "ids": part_ids.tobytes(),
                    "sums": part_sums.tobytes(),
                })
        return pd.DataFrame(rows) if rows else empty

    return (
        csr.groupby("blk")
        .cogroup(vals.groupby("blk"))
        .applyInPandas(gather, "sblk int, dblk int, ids binary, sums binary")
    )


def merge_packed(pdf: pd.DataFrame) -> tuple[np.ndarray, np.ndarray]:
    """Combine the ≤B packed buffers addressed to one block into
    (ids, sums), ids sorted ascending. Deterministic: buffers are summed
    in sblk order (np.unique's inverse + bincount fixes the float add
    order given the concatenation order)."""
    if len(pdf) == 0:
        return (np.empty(0, np.int64), np.empty(0, np.float64))
    pdf = pdf.sort_values("sblk", kind="mergesort")
    all_ids = np.concatenate(
        [np.frombuffer(b, dtype=np.int64) for b in pdf["ids"]]
    )
    all_sums = np.concatenate(
        [np.frombuffer(b, dtype=np.float64) for b in pdf["sums"]]
    )
    uniq, inv = np.unique(all_ids, return_inverse=True)
    return uniq, np.bincount(inv, weights=all_sums, minlength=uniq.size)
