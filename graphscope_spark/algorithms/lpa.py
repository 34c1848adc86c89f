"""lpa_u2i — bipartite (user→item) weighted label diffusion.

Reference semantics (apps/lpa/lpa_u2i.h:42-245, registered in
coordinator .gs_conf.yaml): U vertices carry a vector of ``prop_num``
double labels (initialized from vertex properties, lpa_u2i.h:51-61); I
vertices start at 0. Precomputed per user u (lpa_u2i.h:69-104):
  * out_degree(u)              — # of u→i edges
  * out_nbr_in_degree_sum(u)   — Σ_{u→i} in_degree(i)
Then alternating supersteps (lpa_u2i.h:164-240):
  * **u2i** (even step): label_i[p] = Σ_{u→i} label_u[p] · w(u,i)
  * **i2u** (odd step):  tmp_u[p] = Σ_{u→i} label_i[p] · w(u,i); then
      - label_u[p] ∈ {0, 1}  → unchanged (clamped ground truth,
        lpa_u2i.h:219-221);
      - out_nbr_in_degree_sum(u) == out_degree(u) → unchanged (:228-229);
      - else label_u[p] = (tmp_u[p] − out_degree(u)·label_u[p])
                          / (out_nbr_in_degree_sum(u) − out_degree(u))
        (:222-227) — removes u's own round-trip contribution and averages
        over the other users sharing items with u (exact for unit weights,
        which is what the count-based correction assumes — reference
        behavior preserved verbatim for weighted inputs too).
Runs ``max_round`` supersteps starting with u2i; output = user labels.

Spark dataflow: labels are plain double columns ``label_0..label_{P-1}``;
each stage is one edge join + one groupBy with P sum aggregates — a single
shuffle per superstep regardless of prop_num (all props aggregate in one
pass). The degree tables are computed once and ride in the user state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def lpa_u2i(
    edges: DataFrame,
    users: DataFrame,
    label_cols: list[str],
    max_round: int = 10,
    weight_col: str | None = None,
) -> DataFrame:
    """``edges(u, i[, weight])`` user→item; ``users(id, <label_cols>…)``.
    Returns (id, label_0…label_{P-1}) for users after ``max_round``
    alternating supersteps (u2i first, matching lpa_u2i.h:164-167 where
    step 2 = the first u2i stage)."""
    P = len(label_cols)
    w = (F.col(weight_col).cast("double") if weight_col else F.lit(1.0))
    e = edges.select(F.col("u"), F.col("i"), w.alias("w"))
    e = e.repartition(int(e.sparkSession.conf.get("spark.sql.shuffle.partitions")), "u")
    e = e.persist()

    # per-user degree + Σ of item in-degrees over out-neighbors
    out_deg = e.groupBy("u").agg(F.count(F.lit(1)).alias("out_degree"))
    item_in_deg = e.groupBy("i").agg(F.count(F.lit(1)).alias("in_degree"))
    nbr_sum = (
        e.join(item_in_deg, "i")
        .groupBy("u")
        .agg(F.sum("in_degree").alias("out_nbr_in_degree_sum"))
    )

    ustate = (
        users.select(
            F.col("id").alias("u"),
            *[F.col(c).cast("double").alias(f"label_{p}")
              for p, c in enumerate(label_cols)],
        )
        .join(out_deg, "u", "left")
        .join(nbr_sum, "u", "left")
        .fillna(0, ["out_degree", "out_nbr_in_degree_sum"])
        .localCheckpoint(eager=True)
    )

    for step_no in range(max_round):
        if step_no % 2 == 0:
            # u2i: items gather weighted user labels
            istate = (
                e.join(ustate.select(
                    "u", *[f"label_{p}" for p in range(P)]), "u")
                .groupBy("i")
                .agg(*[
                    F.sum(F.col(f"label_{p}") * F.col("w")).alias(f"ilabel_{p}")
                    for p in range(P)
                ])
                .localCheckpoint(eager=True)
            )
        else:
            # i2u: users gather weighted item labels, then degree-correct
            tmp = (
                e.join(istate, "i")
                .groupBy("u")
                .agg(*[
                    F.sum(F.col(f"ilabel_{p}") * F.col("w")).alias(f"tmp_{p}")
                    for p in range(P)
                ])
            )
            newcols = []
            for p in range(P):
                lab = F.col(f"label_{p}")
                tmpc = F.coalesce(F.col(f"tmp_{p}"), F.lit(0.0))
                clamped = (lab == 0.0) | (lab == 1.0)
                degenerate = (
                    F.col("out_nbr_in_degree_sum") == F.col("out_degree")
                )
                corrected = (
                    (tmpc - F.col("out_degree") * lab)
                    / (F.col("out_nbr_in_degree_sum") - F.col("out_degree"))
                )
                newcols.append(
                    F.when(clamped | degenerate, lab)
                    .otherwise(corrected).alias(f"label_{p}")
                )
            ustate = (
                ustate.join(tmp, "u", "left")
                .select("u", *newcols, "out_degree", "out_nbr_in_degree_sum")
                .localCheckpoint(eager=True)
            )
    e.unpersist()
    return ustate.select(F.col("u").alias("id"),
                         *[f"label_{p}" for p in range(P)])
