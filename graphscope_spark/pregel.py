"""Superstep kernel: the PIE/Pregel loop as driver-side DataFrame control flow.

Reference lifecycle (SURVEY.md §3): DefaultWorker::Query runs PEval once then
IncEval rounds until the termination vote passes
(analytical_engine/core/worker/default_worker.h:90-131); each round is one
MPI message exchange + one scalar allreduce (grape::Communicator Sum).

Spark re-expression: the "worker loop" is a driver `while`; a message
exchange is the shuffle inside `state ⋈ edges → groupBy(target)`; the
termination vote is a scalar `agg` collected to the driver. Two additions the
reference gets for free from MPI+vineyard that Spark needs explicitly:

  * lineage truncation — every round appends to the logical plan, so the
    kernel calls `localCheckpoint(eager=True)` every ``truncate_every``
    rounds (otherwise plan analysis time grows superlinearly);
  * durable checkpoint/resume (north rule) — every ``checkpoint_every``
    rounds the state DataFrame is written to
    ``{dir}/{run_id}/state/round=K/`` (Parquet; Iceberg when a catalog is
    on the classpath — same layout) together with a lineage record per
    partition ``(run_id, superstep, partition_id, rows, state_hash,
    metrics_json, wall_ms)`` so an interrupted run resumes mid-iteration
    with integrity evidence.

The kernel is algorithm-agnostic: a ``step(state, round_idx) ->
(new_state, metrics)`` callable plays IncEval; ``should_stop(metrics)``
plays ToTerminate. Scalars an algorithm carries across rounds (e.g.
PageRank's dangling mass) must be derivable from the state DataFrame so a
resumed run can reconstruct them — same constraint vineyard-stored contexts
satisfy in the reference.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from graphscope_spark.graph import materialized_checkpoint


@dataclass
class SuperstepResult:
    state: DataFrame
    rounds: int
    metrics: list[dict] = field(default_factory=list)
    run_id: str | None = None


def _partition_lineage(state: DataFrame) -> list[dict]:
    """Per-partition (rows, content-hash). The hash is an order-independent
    sum of xxhash64 over all columns, so it is stable across task scheduling
    — the analog of the reference's per-fragment golden `cmp` check
    (analytical_engine/test/app_tests.sh:115-127) at partition granularity.
    """
    cols = [F.col(c) for c in state.columns]
    rows = (
        state.groupBy(F.spark_partition_id().alias("partition_id"))
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum(F.xxhash64(*cols).cast("decimal(38,0)")).alias("state_hash"),
        )
        .collect()
    )
    return [r.asDict() for r in rows]


class SuperstepRunner:
    def __init__(
        self,
        spark: SparkSession,
        name: str = "superstep",
        checkpoint_dir: str | None = None,
        checkpoint_every: int = 0,
        truncate_every: int = 4,
        run_id: str | None = None,
        collect_lineage: bool = True,
    ):
        self.spark = spark
        self.name = name
        self.checkpoint_dir = checkpoint_dir
        self.checkpoint_every = checkpoint_every if checkpoint_dir else 0
        self.truncate_every = max(truncate_every, 1)
        self.run_id = run_id or f"{name}-{uuid.uuid4().hex[:12]}"
        self.collect_lineage = collect_lineage

    # -------------------------------------------------------------- #
    def _state_path(self, rnd: int) -> str:
        return os.path.join(self.checkpoint_dir, self.run_id, "state", f"round={rnd}")

    def _lineage_path(self) -> str:
        return os.path.join(self.checkpoint_dir, self.run_id, "lineage")

    def _checkpoint(self, state: DataFrame, rnd: int, metrics: dict,
                    wall_ms: float) -> None:
        state.write.mode("overwrite").parquet(self._state_path(rnd))
        lineage = _partition_lineage(state)
        recs = [
            {
                "run_id": self.run_id,
                "superstep": rnd,
                "partition_id": p["partition_id"],
                "rows": p["rows"],
                "state_hash": str(p["state_hash"]),
                "metrics_json": json.dumps(metrics, default=float),
                "wall_ms": float(wall_ms),
            }
            for p in lineage
        ]
        (
            self.spark.createDataFrame(
                recs,
                schema="run_id string, superstep int, partition_id int, "
                "rows long, state_hash string, metrics_json string, wall_ms double",
            )
            .coalesce(1)
            .write.mode("append")
            .parquet(self._lineage_path())
        )

    def latest_checkpoint(self) -> tuple[int, DataFrame] | None:
        """Find the newest durable round for this run_id, for resume."""
        base = os.path.join(self.checkpoint_dir, self.run_id, "state")
        if not os.path.isdir(base):
            return None
        rounds = sorted(
            int(d.split("=", 1)[1])
            for d in os.listdir(base)
            if d.startswith("round=")
            and os.path.exists(os.path.join(base, d, "_SUCCESS"))
        )
        if not rounds:
            return None
        rnd = rounds[-1]
        return rnd, self.spark.read.parquet(self._state_path(rnd))

    # -------------------------------------------------------------- #
    def run(
        self,
        init_state: DataFrame,
        step: Callable[[DataFrame, int], DataFrame],
        max_rounds: int,
        metrics_fn: Callable[[DataFrame, DataFrame, int], dict] | None = None,
        should_stop: Callable[[dict], bool] | None = None,
        resume: bool = False,
        check_every: int = 1,
    ) -> SuperstepResult:
        """PEval = ``init_state`` (already computed), IncEval = ``step``.

        ``step(state, round)`` returns the next state *lazily*; the kernel
        persists it, then runs ``metrics_fn(prev_state, new_state, round)``
        (the scalar-allreduce action of the round — convergence metric,
        frontier size, carried mass). If ``should_stop(metrics)`` is true
        the loop ends (ToTerminate vote). With ``resume=True`` and a
        checkpoint present, restarts from the newest durable round instead
        of ``init_state``.

        ``check_every > 1`` runs the termination vote only every k rounds —
        correct ONLY for monotone fixpoints (min-label, distance
        relaxation, peeling) where rounds past convergence are no-ops; the
        result may include up to k−1 extra no-op rounds. Between votes the
        rounds carry no driver action at all, so Spark fuses them into one
        job — the same driver-critical-path win the fixed-round PageRank
        path gets from truncate_every. Convergence metrics that compare
        CONSECUTIVE states (e.g. an L1 delta) must keep check_every=1;
        with k > 1 ``metrics_fn`` receives the state from the previous
        vote, k rounds back."""
        start_round = 0
        state = init_state
        if resume and self.checkpoint_dir:
            found = self.latest_checkpoint()
            if found is not None:
                start_round, state = found

        state = state.persist(StorageLevel.MEMORY_AND_DISK)
        all_metrics: list[dict] = []
        rnd = start_round
        for rnd in range(start_round + 1, max_rounds + 1):
            t0 = time.monotonic()
            new_state = step(state, rnd)

            if rnd % self.truncate_every == 0:
                # eager lineage cut: materializes and drops the plan prefix.
                # materialized_checkpoint (not bare localCheckpoint) because
                # steps that reference `state` more than once (block-engine
                # frontier+receiver cogroups, pointer-jumping self-joins)
                # would otherwise square the inherited sizeInBytes estimate
                # every round — see graph.materialized_checkpoint's docstring.
                new_state = materialized_checkpoint(new_state)
            else:
                new_state = new_state.persist(StorageLevel.MEMORY_AND_DISK)

            vote_now = (
                metrics_fn is not None
                and (rnd % max(check_every, 1) == 0 or rnd == max_rounds)
            )
            metrics = metrics_fn(state, new_state, rnd) if vote_now else {}
            wall_ms = (time.monotonic() - t0) * 1000.0
            metrics = {"superstep": rnd, "wall_ms": wall_ms, **metrics}
            all_metrics.append(metrics)

            if self.checkpoint_every and (
                rnd % self.checkpoint_every == 0 or rnd == max_rounds
            ):
                self._checkpoint(new_state, rnd, metrics, wall_ms)

            state.unpersist()
            state = new_state
            if vote_now and should_stop is not None and should_stop(metrics):
                break
        return SuperstepResult(state=state, rounds=rnd, metrics=all_metrics,
                               run_id=self.run_id)


def vertex_program(
    g,
    init: dict[str, "F.Column"],
    message: "F.Column",
    combine: Callable[["F.Column"], "F.Column"],
    update: dict[str, "F.Column"],
    max_rounds: int = 10,
    frontier: bool = True,
    runner: "SuperstepRunner | None" = None,
) -> SuperstepResult:
    """Declarative vertex-centric API — the ``@pregel`` decorator analog
    (python/graphscope/analytical/udf/decorators.py:51-202 /
    core/app/pregel/pregel_compute_context.h:93-106), vectorized: the four
    callbacks are COLUMN EXPRESSIONS, never per-row Python, so the whole
    superstep stays in whole-stage codegen.

    * ``init``: ``{state_col: expr over g.vertices}`` — Pregel ``Init``.
    * ``message``: expr over the sender's state columns + the edge's
      columns (``dst`` and any edge property, e.g. ``weight``) — the value
      sent along each out-edge (``SendMsgThroughOEdges``). Rows where it
      evaluates to NULL are not sent.
    * ``combine``: aggregate function applied to incoming messages per
      target (``F.min``/``F.sum``/…) — the Pregel combiner; Spark also
      applies it map-side automatically (partial aggregation).
    * ``update``: ``{state_col: expr over old state + 'msg'}`` — Pregel
      ``Compute``; ``msg`` is NULL for vertices with no inbox.
    * ``frontier=True``: only vertices whose state CHANGED last round send
      messages (vote_to_halt analog — unchanged vertices are halted and
      wake on delivery); the loop stops when the frontier empties.
      ``frontier=False`` sends from every vertex every round (fixed-round
      algorithms like PageRank).

    Runs on :class:`SuperstepRunner`, so lineage truncation, checkpoints
    and resume apply unchanged. Returns the runner's result; the state
    DataFrame has ``id`` + the ``init``/``update`` keys.
    """
    runner = runner or SuperstepRunner(g.spark)
    edges = g.edges.persist(StorageLevel.MEMORY_AND_DISK)
    keys = list(init)
    if set(update) != set(init):
        raise ValueError("update must define exactly the init state columns")

    state0 = g.vertices.select(
        "id", *[expr.alias(k) for k, expr in init.items()]
    ).withColumn("_active", F.lit(True))

    def step(state: DataFrame, rnd: int) -> DataFrame:
        senders = state.filter("_active") if frontier else state
        inbox = (
            senders.join(edges, senders["id"] == edges["src"])
            .select(F.col("dst").alias("_target"), message.alias("_m"))
            .filter(F.col("_m").isNotNull())
            .groupBy("_target")
            .agg(combine(F.col("_m")).alias("msg"))
        )
        joined = state.drop("_active").join(
            inbox, state["id"] == inbox["_target"], "left"
        )
        new_cols = [update[k].alias(f"_new_{k}") for k in keys]
        changed = None
        upd = joined.select("id", *keys, "msg", *new_cols)
        for k in keys:
            ne = ~F.col(f"_new_{k}").eqNullSafe(F.col(k))
            changed = ne if changed is None else (changed | ne)
        return upd.select(
            "id",
            *[F.col(f"_new_{k}").alias(k) for k in keys],
            changed.alias("_active"),
        )

    def metrics_fn(prev: DataFrame, new: DataFrame, rnd: int) -> dict:
        if not frontier:
            return {}
        return {"frontier": new.filter("_active").count()}

    res = runner.run(
        state0,
        step,
        max_rounds=max_rounds,
        metrics_fn=metrics_fn if frontier else None,
        should_stop=(lambda m: m.get("frontier", 1) == 0) if frontier else None,
    )
    edges.unpersist()
    return SuperstepResult(
        state=res.state.drop("_active"),
        rounds=res.rounds,
        metrics=res.metrics,
        run_id=res.run_id,
    )
