"""Event-time operators over the ``events`` table (extension surface).

Batch twins of the Structured Streaming pipelines in ``streaming/ops.py``
— same window/gap semantics, minus the watermark. Timestamp arithmetic is
done in integer microseconds (``unix_micros``) so results are exact and
engine-portable.

Scale notes: sessionization is the classic skew trap — windows partition
by user, so one hyperactive user serializes on one task. The gap-session
window here is a single shuffle by user; for pathological users, salt by
(user, day) first and merge boundary sessions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def normalize_event_ts(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Normalize an event-time column to plain TIMESTAMP across the three
    encodings the parquet testdata has shipped as:

    - ``bigint`` — TIMESTAMP(NANOS) read under
      ``spark.sql.legacy.parquet.nanosAsLong``; truncating integer ``DIV
      1000`` matches DuckDB's nanos→micros conversion exactly.
    - ``timestamp_ntz`` — parquet ``timestamp[us]`` with
      ``isAdjustedToUTC=false`` (pyarrow's default); the wall-clock fields
      are interpreted as UTC (``to_utc_timestamp(ts, 'UTC')``), which makes
      ``unix_micros`` agree exactly with DuckDB's ``epoch_us`` under a UTC
      session, and ``date_format`` renderings agree under ANY session tz.
    - ``timestamp`` — already what every downstream operator
      (``unix_micros``, ``withWatermark``, ``window``) expects; unchanged.

    Works on batch and streaming frames alike (pure column expression).
    """
    dtype = dict(df.dtypes).get(ts_col)
    if dtype == "bigint":
        return df.withColumn(ts_col, F.expr(f"timestamp_micros({ts_col} DIV 1000)"))
    if dtype == "timestamp_ntz":
        return df.withColumn(ts_col, F.to_utc_timestamp(F.col(ts_col), "UTC"))
    return df


def sessionized_counts(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the user's gap
    since the previous event exceeds ``gap_minutes``. Returns per-user
    ``(user_id, n_sessions, n_events)``."""
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc(), F.col(order_tiebreak).asc())
    us = F.unix_micros(F.col(ts_col))
    prev = F.lag(us).over(w)
    gap_us = gap_minutes * 60 * 1_000_000
    new_session = F.when(prev.isNull() | ((us - prev) > gap_us), 1).otherwise(0)
    with_flag = events.withColumn("_new_session", new_session)
    w2 = (
        Window.partitionBy(user_col)
        .orderBy(F.col(ts_col).asc(), F.col(order_tiebreak).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_sid = with_flag.withColumn("_session_id", F.sum("_new_session").over(w2))
    return with_sid.groupBy(user_col).agg(
        F.max("_session_id").cast("long").alias("n_sessions"),
        F.count("*").alias("n_events"),
    )


def tumbling_window_agg(
    events: DataFrame,
    window_duration: str = "1 hour",
    ts_col: str = "ts",
    group_col: str = "event_type",
) -> DataFrame:
    """Tumbling event-time windows with per-type counts and value sums —
    the batch form of the streaming hourly rollup."""
    return (
        events.groupBy(F.window(ts_col, window_duration).alias("w"), group_col)
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            group_col,
            "n_events",
            "sum_value",
        )
    )


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort retention matrix: users are assigned to the cohort of
    the ISO week (Monday-aligned ``date_trunc('week')``) of their FIRST
    event; each cell ``(cohort_week, week_offset)`` counts the cohort's
    users still active that many weeks later, plus their event volume —
    the standard product-analytics retention triangle.

    Scale shape: the per-user first-event timestamp is a window min (one
    shuffle keyed by user — the same key a sessionization already uses,
    so AQE can reuse the exchange), then a single global aggregate over
    ``(cohort, offset)`` whose cardinality is weeks², tiny regardless of
    corpus size. ``count_distinct(user)`` in the cell aggregate is exact;
    at 100 TB swap in HLL sketches (operators/sketches.py) if ±2% is
    acceptable.
    """
    w = Window.partitionBy(user_col)
    cohort = F.date_trunc("week", F.min(ts_col).over(w))
    week = F.date_trunc("week", F.col(ts_col))
    return (
        events.select(
            F.col(user_col),
            F.date_format(cohort, "yyyy-MM-dd").alias("cohort_week"),
            F.floor(F.datediff(week, cohort) / 7).cast("long").alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(
            F.count_distinct(user_col).cast("long").alias("n_active_users"),
            F.count("*").cast("long").alias("n_events"),
        )
    )


def markov_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition counts and probabilities over each
    user's time-ordered event sequence: ``p(dst | src)`` estimated from
    consecutive pairs — sequence mining for funnels/next-event prediction.

    Determinism: sequences order by ``(ts, event_id)`` so simultaneous
    events tie-break identically in every engine. Scale shape: ONE
    shuffle keyed by user for the lead() window; the transition aggregate
    is |event types|² rows, and the per-src normalizing window runs over
    that tiny aggregate, not the raw events.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    pairs = events.select(
        F.col(type_col).alias("src"),
        F.lead(type_col).over(w).alias("dst"),
    ).where(F.col("dst").isNotNull())
    counts = pairs.groupBy("src", "dst").agg(F.count("*").alias("_n"))
    per_src = Window.partitionBy("src")
    return counts.select(
        "src",
        "dst",
        F.col("_n").cast("long").alias("n_transitions"),
        F.round(F.col("_n") / F.sum("_n").over(per_src), 6).alias("p"),
    )


def cusum_changepoints(
    events: DataFrame,
    drift_micro: int = 0,
    threshold_micro: int = 0,
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """One-sided CUSUM change detection over each event type's DAILY
    volume: flag days where the cumulative excess over the series mean
    (minus ``drift_micro`` slack) exceeds ``threshold_micro`` — the
    standard sequential detector for rate shifts.

    The recursion ``S_i = max(0, S_{i-1} + y_i)`` has the closed form
    ``S_i = P_i − min(0, min_{j≤i} P_j)`` (prefix sum minus its running
    minimum, floored by the empty prefix P₀ = 0 — dropping that floor
    under-reports S whenever the series starts positive), so the
    sequential statistic becomes two WINDOW functions — no iteration,
    no state. All terms are integer micro-units
    (``y_i = 10⁶·count_i − mean_micro − drift``; the mean enters as the
    exact integer ``10⁶·total div n_days``), so S is an exact BIGINT in
    every engine.

    Scale shape: one shuffle keys the daily aggregate by type; the
    windows run per type over |days| rows — years of days is still a
    tiny per-key sequence.
    """
    daily = (
        events.select(F.col(type_col), F.date_format(ts_col, "yyyy-MM-dd").alias("day"))
        .groupBy(type_col, "day")
        .agg(F.count("*").alias("n"))
    )
    stats = daily.groupBy(type_col).agg(
        F.sum("n").alias("_tot"), F.count("*").alias("_days")
    )
    w = Window.partitionBy(type_col).orderBy("day")
    wmin = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    y = (
        F.lit(1_000_000) * F.col("n")
        - F.expr("(1000000 * _tot) div _days")
        - F.lit(drift_micro)
    )
    p = F.sum(y).over(wmin)
    scored = (
        daily.join(stats, type_col)
        .withColumn("_p", p)
        .withColumn(
            "_s",
            (F.col("_p") - F.least(F.lit(0), F.min("_p").over(wmin))).cast("long"),
        )
    )
    return scored.select(
        F.col(type_col),
        "day",
        F.col("n").cast("long").alias("n_events"),
        F.col("_s").alias("cusum_micro"),
        (F.col("_s") > threshold_micro).alias("alarm"),
    )
