"""Bucketed range (interval) join — green-field extension (SURVEY.md §2.10:
the reference has no joins; this is the time-window join event pipelines
need: "right rows within [left_ts+lower, left_ts+upper] per key").

Physical design: Spark executes a raw inequality join as
BroadcastNestedLoopJoin (O(|L|·|R|) per key) — unusable at scale. Here the
time axis is bucketed at ``bucket = upper - lower``: each right row lands
in exactly one bucket, each left window spans ≤ 2 adjacent buckets (≤ 3 at
degenerate alignments), and the join becomes an *equi*-join on
(key, bucket) followed by the exact range filter. Shuffle volume is
|L|·~2 + |R| rows, hash-partitioned — the standard bucketed range-join
trick (same as Spark's own storage-partitioned range join, expressed in
plain DataFrame ops so it works everywhere).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower_s: float = -300.0,
    upper_s: float = 0.0,
    how: str = "inner",
) -> DataFrame:
    """Pairs (left row, right row) with equal key columns and
    ``left_ts + lower_s <= right_ts <= left_ts + upper_s`` (inclusive).

    Right columns that collide with left names are suffixed ``_r``.
    ``how='inner'`` only — compose with a left join on the output for
    outer semantics (see harness events_range_join).
    """
    if upper_s <= lower_s:
        raise ValueError("upper_s must be > lower_s")
    if how != "inner":
        raise ValueError("interval_join is inner-only; compose for outer")
    keys = [on] if isinstance(on, str) else list(on)
    bucket_us = int((upper_s - lower_s) * 1_000_000)

    lts = F.unix_micros(F.col(left_ts))
    rts = F.unix_micros(F.col(right_ts))
    lo = lts + int(lower_s * 1_000_000)
    hi = lts + int(upper_s * 1_000_000)

    def _floor_div(x, b: int):
        # exact floor division on long micros (x - pmod stays within double's
        # exact-integer range after the divide; pmod makes it true floor for
        # negatives too)
        return ((x - F.pmod(x, F.lit(b))) / b).cast("long")

    l_b = left.withColumn(
        "_bucket",
        F.explode(F.sequence(_floor_div(lo, bucket_us), _floor_div(hi, bucket_us))),
    ).withColumn("_lts", lts)
    rename = {c: (c if c not in left.columns else f"{c}_r") for c in right.columns if c not in keys}
    r_b = right.select(
        *[F.col(k) for k in keys],
        *[F.col(c).alias(a) for c, a in rename.items()],
    ).withColumn("_bucket", _floor_div(F.unix_micros(F.col(rename[right_ts])), bucket_us))

    rts_out = F.unix_micros(F.col(rename[right_ts]))
    joined = l_b.join(r_b, [*keys, "_bucket"]).where(
        (rts_out >= F.col("_lts") + int(lower_s * 1_000_000))
        & (rts_out <= F.col("_lts") + int(upper_s * 1_000_000))
    )
    return joined.drop("_bucket", "_lts")
