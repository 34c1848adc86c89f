"""Event-stream analytics: sessionize, funnel, as-of join, range join.

The operators an event table (events: event_id, ts, user_id, event_type,
value, props) needs that plain SQL doesn't give you directly — and the two
joins the Spark engine genuinely lacks as built-ins (as-of and range),
re-expressed as compositions of window functions and bucketized equi-joins
rather than per-row UDFs or n² theta joins.

All time arithmetic is integer epoch-MICROSECONDS (Spark unix_micros ==
DuckDB epoch_us — both exact integers), so boundaries, tie-breaks, and
the DuckDB twins are deterministic at any parallelism.

Scale shapes:
  * sessionize — ONE shuffle keyed by user; the lag/cumsum windows run
    inside each user partition. Session ids are per-user ordinals (global
    ids would need a global sort; callers key on (user, session)).
  * funnel — one tiny aggregate per step (len(steps) passes over a
    pre-filtered, persisted projection); each pass is a groupBy keyed by
    user with map-side combine.
  * asof_join — the union-sort-carry-forward form: tag both sides, ONE
    shuffle keyed by user, one ordered window carrying the latest right
    row forward; never builds per-left candidate sets (the naive
    inequality join is |L|·|R| per key).
  * range_join — intervals explode into covered coarse buckets and
    equi-join points on bucket (shuffle ∝ points + interval·span/bucket),
    then the exact containment filter; never the |P|·|I| theta product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["sessionize", "funnel", "asof_join", "range_join"]


def _us(col: str):
    """Epoch microseconds as BIGINT. Parquet timestamps arrive as
    TIMESTAMP_NTZ; the session timezone is pinned to UTC (session.py), so
    the cast to TIMESTAMP is value-identical and unix_micros returns the
    stored micros — the same integer DuckDB's epoch_us(ts) reads."""
    return F.unix_micros(F.col(col).cast("timestamp"))



def sessionize(
    events: DataFrame,
    gap_minutes: int = 360,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """(user_id, session, n_events, start_us, end_us) — gap-based
    sessions: a new session starts when the time since the user's previous
    event exceeds ``gap_minutes``. ``session`` is the user's 1-based
    session ordinal. Event order within a user is (ts, event_id) — the
    id tie-break makes simultaneous events deterministic."""
    gap_us = int(gap_minutes) * 60_000_000
    ts_us = _us(ts_col)
    w = Window.partitionBy(user_col).orderBy("ts_us", id_col)
    e = events.select(
        F.col(user_col).alias("user_id"),
        F.col(id_col).alias("event_id"),
        ts_us.alias("ts_us"),
    )
    flagged = e.withColumn(
        "new_session",
        F.when(
            F.col("ts_us") - F.lag("ts_us").over(w) > gap_us, 1
        ).otherwise(0),
    )
    # first event per user: lag is null -> otherwise(0); cumsum + 1 below
    sess = flagged.withColumn(
        "session",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        )
        + F.lit(1),
    )
    return sess.groupBy("user_id", "session").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts_us").alias("start_us"),
        F.max("ts_us").alias("end_us"),
    )


def funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """(step, step_name, n_users) — ordered-funnel conversion: a user
    reaches step i when an event of type steps[i] occurs STRICTLY after
    their step-(i-1) reach time (first-touch semantics: each reach time is
    the MINIMUM qualifying timestamp, the standard funnel definition).
    Counts are monotonically non-increasing by construction."""
    from pyspark.sql import SparkSession

    ts_us = _us(ts_col)
    e = events.select(
        F.col(user_col).alias("user_id"),
        F.col(type_col).alias("etype"),
        ts_us.alias("ts_us"),
    ).persist()
    reach = None  # (user_id, t) reach time of previous step
    counts = []
    for i, step in enumerate(steps):
        cur = e.filter(F.col("etype") == step)
        if reach is not None:
            cur = cur.join(reach, "user_id").filter(
                F.col("ts_us") > F.col("t")
            )
        reach = cur.groupBy("user_id").agg(F.min("ts_us").alias("t"))
        reach = reach.localCheckpoint(eager=True)
        counts.append((i + 1, step, reach.count()))
    e.unpersist()
    spark = SparkSession.getActiveSession()
    return spark.createDataFrame(
        counts, "step int, step_name string, n_users long"
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """For every left row, attach the LATEST right row of the same key
    with right.ts <= left.ts (ties: right at the identical timestamp DOES
    match — backward as-of, the market-data convention). Left rows with
    no prior right row keep nulls.

    Implementation: tag both sides, union, ONE window ordered by
    (ts_us, is_left) per key carrying the last right values forward —
    right sorts before left at equal timestamps, which is exactly the
    <= semantics. One shuffle, no candidate blowup.
    """
    right_cols = right_cols or [
        c for c in right.columns if c not in (key_col, ts_col)
    ]
    ts_us = _us(ts_col)
    # deterministic tie-break among right rows sharing (key, ts): the
    # lexicographically-last projected right tuple wins (LAST in window
    # order is what gets carried) — without this, simultaneous right rows
    # would make the carried row partitioning-dependent
    tie = F.struct(*[F.col(c) for c in right_cols])
    lhs = left.select(
        F.col(key_col).alias("_k"),
        ts_us.alias("_ts_us"),
        F.lit(1).alias("_is_left"),
        F.lit(None).cast(
            right.select(tie.alias("_tie")).schema["_tie"].dataType
        ).alias("_tie"),
        F.struct(*left.columns).alias("_l"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}")
          for c in right_cols],
    )
    rhs = right.select(
        F.col(key_col).alias("_k"),
        ts_us.alias("_ts_us"),
        F.lit(0).alias("_is_left"),
        tie.alias("_tie"),
        F.lit(None).cast(
            lhs.schema["_l"].dataType
        ).alias("_l"),
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts_us", "_is_left", F.col("_tie").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = lhs.unionByName(rhs).select(
        "_is_left",
        "_l",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_rc_{c}")
            for c in right_cols
        ],
    )
    out = carried.filter(F.col("_is_left") == 1).select(
        "_l.*",
        *[F.col(f"_rc_{c}").alias(f"{c}{suffix}") for c in right_cols],
    )
    return out


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str = "ts",
    lo_col: str = "lo_us",
    hi_col: str = "hi_us",
    bucket_minutes: int = 1440,
) -> DataFrame:
    """Point-in-interval join: every (point, interval) pair with
    lo_us <= point_ts < hi_us (half-open, in epoch micros). Intervals
    explode into the coarse time buckets they overlap; points equi-join
    on their bucket; the exact predicate filters. Shuffle is
    points + sum(interval spans)/bucket — pick ``bucket_minutes`` near
    the typical interval length so each interval lands in O(1) buckets."""
    b_us = int(bucket_minutes) * 60_000_000
    p = points.withColumn("_ts_us", _us(point_ts))
    p = p.withColumn("_bucket", F.expr(f"_ts_us div {b_us}"))
    iv = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.expr(f"{lo_col} div {b_us}"),
                # hi is exclusive: the last covered bucket holds hi-1
                F.expr(f"(greatest({hi_col} - 1, {lo_col})) div {b_us}"),
            )
        ),
    )
    return (
        p.join(iv, "_bucket")
        .filter(
            (F.col(lo_col) <= F.col("_ts_us"))
            & (F.col("_ts_us") < F.col(hi_col))
        )
        .drop("_bucket", "_ts_us")
    )


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """(cohort_day, day_offset, n_users) — classic cohort retention:
    cohort_day = the epoch day of a user's FIRST event; for every later
    activity day, the user counts once toward (cohort_day, offset).
    offset 0 is the cohort size itself.

    Scale shape: one user-keyed aggregate for first-seen (map-side
    combined), one distinct over (user, day) — shuffle ∝ active
    user-days, not events — then a broadcast-sized join back and a final
    (cohort, offset) aggregate. Day arithmetic is integer epoch-days
    (micros div 86_400_000_000), exact in both engines."""
    day = 86_400_000_000
    e = events.select(
        F.col(user_col).alias("user_id"),
        F.expr(f"unix_micros(cast({ts_col} as timestamp)) div {day}")
        .alias("d"),
    )
    user_days = e.distinct()
    first = user_days.groupBy("user_id").agg(F.min("d").alias("cohort_day"))
    return (
        user_days.join(first, "user_id")
        .select(
            "cohort_day", (F.col("d") - F.col("cohort_day")).alias("day_offset")
        )
        .groupBy("cohort_day", "day_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def rolling_window_sum(
    events: DataFrame,
    days: int = 7,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """(event_id, user_id, ts_us, n_in_window, roll_value) — per event,
    the count and value-sum of the SAME user's events in the trailing
    ``days``-day window (inclusive of the current event; ties in ts all
    share one frame — RANGE semantics, so the result is set-determined,
    not order-determined).

    Scale shape: one user-keyed exchange, then an in-partition RANGE
    window — no self-join (the naive trailing-window formulation is a
    per-row inequality join). Values are quantized to integer cents
    before summation so frame sums are exact and partition-independent;
    roll_value converts back at output (2 decimals)."""
    ts_us = _us(ts_col)
    day_us = 86_400_000_000
    e = events.select(
        F.col(id_col).alias("event_id"),
        F.col(user_col).alias("user_id"),
        ts_us.alias("ts_us"),
        F.round(F.col(value_col) * 100, 0).cast("long").alias("cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-days * day_us, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        "ts_us",
        F.count(F.lit(1)).over(w).alias("n_in_window"),
        F.round(
            F.sum("cents").over(w).cast("double") / 100.0, 2
        ).alias("roll_value"),
    )


def interval_join(
    a: DataFrame,
    b: DataFrame,
    a_lo: str = "lo_us",
    a_hi: str = "hi_us",
    b_lo: str = "lo_us",
    b_hi: str = "hi_us",
    bucket_minutes: int = 1440,
) -> DataFrame:
    """Interval-overlap join: every (a, b) pair with
    max(a_lo, b_lo) < min(a_hi, b_hi) (half-open overlap). Both sides
    explode into the coarse buckets they span, BUT a pair is emitted only
    from the single bucket containing max(a_lo, b_lo) — the canonical
    dedup-free bucketized interval join (no distinct over the pair
    blowup; each overlapping pair materializes exactly once).

    Shuffle ∝ Σ spans/bucket on each side; never |A|·|B|."""
    b_us = int(bucket_minutes) * 60_000_000

    def bucketed(df: DataFrame, lo: str, hi: str, tag: str) -> DataFrame:
        return df.withColumn(
            f"_bucket",
            F.explode(
                F.sequence(
                    F.expr(f"{lo} div {b_us}"),
                    F.expr(f"(greatest({hi} - 1, {lo})) div {b_us}"),
                )
            ),
        )
    aa = bucketed(a, a_lo, a_hi, "a")
    bb = bucketed(b, b_lo, b_hi, "b")
    start = F.greatest(F.col(f"a.{a_lo}"), F.col(f"b.{b_lo}"))
    end = F.least(F.col(f"a.{a_hi}"), F.col(f"b.{b_hi}"))
    joined = aa.alias("a").join(
        bb.alias("b"), F.col("a._bucket") == F.col("b._bucket")
    )
    return (
        joined.filter(start < end)
        # emit only from the overlap-start bucket: exactly-once per pair
        .filter(F.expr(f"a._bucket = (greatest(a.{a_lo}, b.{b_lo})) div {b_us}"))
        .drop("_bucket")
    )
