"""Distributed Louvain community detection.

Reference semantics (apps/pregel/louvain/louvain.h:60-429; overview at
louvain.h:32-50): repeat {phase 1: local-move — every vertex greedily joins
the neighbor community with the best modularity gain until no move
improves; phase 2: compress — contract each community to one vertex,
aggregate parallel edges} until modularity stops improving. The reference
is explicitly non-deterministic in community count; its own test only
checks the app runs (python/graphscope/tests/test_app.py:218-228). We keep
determinism anyway (ties → min community id; alternating-parity move
rounds prevent the synchronous-swap oscillation the reference's
minimum-node rule addresses, louvain.h).

Spark dataflow per local-move round: one join carrying neighbor
communities + one groupBy computing per-(vertex, community) in-weights +
one broadcast-joined community-Σtot table — shuffles ∝ E, the same
asymptotics as a superstep. Phase-2 contraction is a groupBy over edges
keyed by community pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph import Graph


def _local_move_pass(
    edges: DataFrame, comm: DataFrame, deg: DataFrame, m2: float,
    max_rounds: int, num_partitions: int,
    to_convergence: bool = True,
) -> DataFrame:
    """One phase-1 sweep. edges: (src, dst, w) symmetric; comm: (id, comm);
    deg: (id, k) weighted degrees. Returns updated (id, comm).

    ``to_convergence=False`` runs exactly ``max_rounds`` rounds with no
    early break — the fixed-depth form the SQL twin replays (rounds past
    convergence are no-ops: no strictly-better move exists, so the state
    is a fixed point under either parity)."""
    comm = comm.localCheckpoint(eager=True)
    for rnd in range(max_rounds):
        ctot = comm.join(deg, "id").groupBy("comm").agg(F.sum("k").alias("tot"))
        # neighbor-community in-weights per vertex. Self-loops (created by
        # phase-2 contraction in passes >= 2) are excluded: a self-loop's
        # weight stays internal regardless of which community the vertex
        # joins, so it cancels out of every candidate's gain — counting it
        # only for the current community biased the score toward staying.
        nbr = (
            edges.filter(F.col("src") != F.col("dst"))
            .join(comm.select(F.col("id").alias("dst"),
                              F.col("comm").alias("ncomm")), "dst")
            .groupBy(F.col("src").alias("id"), "ncomm")
            .agg(F.sum("w").alias("k_in"))
        )
        # base: every vertex with its degree and own-community total
        base = comm.join(deg, "id").join(ctot, "comm")
        # stay score: ΔQ(remove-and-rejoin own community) ∝
        # k_in(own) − k·(Σtot(own) − k)/2m, with k_in(own) = 0 when the
        # vertex has no same-community neighbor (a singleton, or a hub
        # whose community drifted away) — NOT −inf: forcing a move in
        # that case takes negative-gain moves standard louvain rejects.
        own = (
            nbr.join(comm, "id")
            .filter(F.col("ncomm") == F.col("comm"))
            .select("id", F.col("k_in").alias("k_in_own"))
        )
        stay = base.join(own, "id", "left").select(
            "id",
            "comm",
            (
                F.coalesce(F.col("k_in_own"), F.lit(0.0))
                - F.col("k") * (F.col("tot") - F.col("k")) / F.lit(m2)
            ).alias("stay_score"),
        )
        # move candidates: ΔQ(join C) ∝ k_in(C) − k·Σtot(C)/2m for C ≠ own
        # (the vertex is not in C, so Σtot(C) needs no correction)
        cand = (
            nbr.join(comm, "id")
            .filter(F.col("ncomm") != F.col("comm"))
            .join(deg, "id")
            .join(ctot.withColumnRenamed("comm", "ncomm")
                  .withColumnRenamed("tot", "ntot"), "ncomm")
        )
        scored = cand.select(
            "id", "ncomm",
            (F.col("k_in") - F.col("k") * F.col("ntot") / F.lit(m2))
            .alias("score"),
        )
        best = (
            scored.groupBy("id")
            .agg(
                F.max(F.struct(
                    F.col("score"),
                    (-F.col("ncomm")).alias("neg"),  # ties → min community
                    F.col("ncomm"),
                )).alias("b"),
            )
            .select(
                "id",
                F.col("b.ncomm").alias("best_comm"),
                F.col("b.score").alias("best_score"),
            )
        )
        move_cond = (
            F.col("best_comm").isNotNull()
            & (F.col("best_score") > F.col("stay_score") + 1e-12)
            # alternating parity: only half the vertices move per round —
            # breaks the A↔B synchronous swap oscillation
            & (F.pmod(F.col("id"), F.lit(2)) == (rnd % 2))
        )
        moved = (
            stay.join(best, "id", "left")
            .select(
                "id",
                F.when(move_cond, F.col("best_comm"))
                .otherwise(F.col("comm")).alias("comm"),
                F.coalesce(move_cond, F.lit(False)).alias("changed"),
            )
        )
        moved = moved.localCheckpoint(eager=True)
        comm = moved.select("id", "comm")
        if to_convergence and moved.filter("changed").count() == 0:
            break
    return comm


def modularity(edges: DataFrame, comm: DataFrame, deg: DataFrame, m2: float) -> float:
    """Q = Σ_C (in_C/2m − (Σtot_C/2m)²) over symmetric weighted edges."""
    internal = (
        edges.join(comm.select(F.col("id").alias("src"), F.col("comm").alias("cs")), "src")
        .join(comm.select(F.col("id").alias("dst"), F.col("comm").alias("cd")), "dst")
        .filter(F.col("cs") == F.col("cd"))
        .agg(F.coalesce(F.sum("w"), F.lit(0.0)))
        .first()[0]
    )
    tots = (
        comm.join(deg, "id").groupBy("comm").agg(F.sum("k").alias("tot"))
        .agg(F.sum(F.col("tot") * F.col("tot")))
        .first()[0]
    )
    return internal / m2 - tots / (m2 * m2)


def _sym_weighted(g: Graph) -> tuple[DataFrame, float]:
    """Symmetric simple unit-weight edge table + 2m for ``g``."""
    e = g.edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    sym = (
        e.select(F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v"))
        .distinct()
    )
    edges = (
        sym.select(F.col("u").alias("src"), F.col("v").alias("dst"), F.lit(1.0).alias("w"))
        .union(sym.select(F.col("v").alias("src"), F.col("u").alias("dst"), F.lit(1.0).alias("w")))
        .repartition(g.num_partitions, "src")
        .persist()
    )
    m2 = edges.agg(F.sum("w")).first()[0] or 1.0  # = 2m
    return edges, m2


def louvain_fixed(
    g: Graph,
    passes: int = 2,
    move_rounds: int = 6,
) -> DataFrame:
    """(id, comm) — FIXED-DEPTH louvain: exactly ``passes`` local-move +
    contraction passes of exactly ``move_rounds`` synchronous rounds, no
    early termination anywhere (no move-count break, no modularity
    progress cutoff, no contraction check). Every step is deterministic
    (min-community ties, parity-alternating moves, integer-valued weights
    throughout — contraction sums of 1.0 stay exact in double), so the
    whole recursion is replayable: tpch_graphs.louvain_sql unrolls this
    exact computation and the gate value-hash-matches it. This is the
    same fixed-round-gate convention as eigenvector/katz/hits.
    Rounds past convergence are no-ops (a fixed point has no
    strictly-better move under either parity), so generous depths are
    safe. Use :func:`louvain` for the adaptive operator."""
    edges, m2 = _sym_weighted(g)
    mapping = g.vertices.select("id", F.col("id").alias("comm"))
    cur_edges = edges
    for _ in range(passes):
        deg = cur_edges.groupBy(F.col("src").alias("id")).agg(
            F.sum("w").alias("k")
        )
        verts = cur_edges.select(F.col("src").alias("id")).distinct()
        comm0 = verts.select("id", F.col("id").alias("comm"))
        comm = _local_move_pass(cur_edges, comm0, deg, m2, move_rounds,
                                g.num_partitions, to_convergence=False)
        remap = comm.select(F.col("id").alias("comm"),
                            F.col("comm").alias("newc"))
        mapping = (
            mapping.join(remap, "comm")
            .select("id", F.col("newc").alias("comm"))
            .localCheckpoint(eager=True)
        )
        cur_edges = (
            cur_edges.join(comm.select(F.col("id").alias("src"),
                                       F.col("comm").alias("cs")), "src")
            .join(comm.select(F.col("id").alias("dst"),
                              F.col("comm").alias("cd")), "dst")
            .groupBy(F.col("cs").alias("src"), F.col("cd").alias("dst"))
            .agg(F.sum("w").alias("w"))
            .localCheckpoint(eager=True)
        )
    out = (
        g.vertices.select("id")
        .join(mapping, "id", "left")
        .select("id", F.coalesce(F.col("comm"), F.col("id")).alias("comm"))
    )
    edges.unpersist()
    return out


def louvain(
    g: Graph,
    max_passes: int = 3,
    max_move_rounds: int = 10,
    min_progress: float = 1e-4,
) -> tuple[DataFrame, float]:
    """Returns ((id, comm), final modularity). ``min_progress`` mirrors the
    reference's progress cutoff parameter (louvain.py:31-41)."""
    edges, m2 = _sym_weighted(g)

    # mapping from ORIGINAL vertex to current community
    mapping = g.vertices.select("id", F.col("id").alias("comm"))
    cur_edges = edges
    q_prev = None
    for _ in range(max_passes):
        deg = cur_edges.groupBy(F.col("src").alias("id")).agg(F.sum("w").alias("k"))
        verts = cur_edges.select(F.col("src").alias("id")).distinct()
        comm0 = verts.select("id", F.col("id").alias("comm"))
        comm = _local_move_pass(cur_edges, comm0, deg, m2,
                                max_move_rounds, g.num_partitions)
        q = modularity(cur_edges, comm, deg, m2)
        if q_prev is not None and q - q_prev < min_progress:
            break
        q_prev = q
        # compose: original → old comm → new comm
        remap = comm.select(F.col("id").alias("comm"), F.col("comm").alias("newc"))
        mapping = (
            mapping.join(remap, "comm")
            .select("id", F.col("newc").alias("comm"))
            .localCheckpoint(eager=True)
        )
        # phase 2: contract communities
        contracted = (
            cur_edges.join(comm.select(F.col("id").alias("src"),
                                       F.col("comm").alias("cs")), "src")
            .join(comm.select(F.col("id").alias("dst"),
                              F.col("comm").alias("cd")), "dst")
            .groupBy(F.col("cs").alias("src"), F.col("cd").alias("dst"))
            .agg(F.sum("w").alias("w"))
            .localCheckpoint(eager=True)
        )
        if contracted.count() == cur_edges.count():
            break  # no contraction happened
        cur_edges = contracted
    # vertices that never appeared in edges keep their own singleton comm
    out = (
        g.vertices.select("id")
        .join(mapping, "id", "left")
        .select("id", F.coalesce(F.col("comm"), F.col("id")).alias("comm"))
    )
    final_q = q_prev if q_prev is not None else 0.0
    edges.unpersist()
    return out, float(final_q)
