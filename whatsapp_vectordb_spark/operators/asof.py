"""As-of (temporal) join — green-field extension surface (SURVEY.md §2.10:
the reference has no joins at all; this is the time-series join a
training-data/event pipeline needs).

Semantics: for each left row, attach the payload of the *latest* right row
with the same key whose timestamp is ``<=`` (backward, default) or the
*earliest* with ``>=`` (forward) the left timestamp.

Physical plan — the 100 TB-safe one: NO join. Both sides are unioned and
windowed over ``(key) ORDER BY (ts, side)``, so the whole operator is one
shuffle by key + a linear scan per key partition (sort-merge style). The
naive alternative — equi-join on key then filter + rank — materializes
|left_per_key| × |right_per_key| rows per key before pruning; this never
does. Skewed keys cost what any window costs; salting is not applicable
(the scan is inherently per-key sequential), but state per row is O(1).

DuckDB oracle equivalent: ``ASOF JOIN`` (native).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    direction: str = "backward",
    suffix: str = "_matched",
) -> DataFrame:
    """Left as-of join. Returns every left row plus ``<right_ts><suffix>``
    and ``<c><suffix>`` for each payload column ``c`` (NULL when no right
    row qualifies).

    ``direction='backward'``: latest right with ``right_ts <= left_ts``
    (inclusive). ``'forward'``: earliest right with ``right_ts >= left_ts``.

    Tie rule: right rows at exactly ``left_ts`` match. Among right rows
    sharing one timestamp the payload struct's natural ordering picks the
    winner deterministically (both engines need *some* rule; callers that
    care should dedupe right to one row per (key, ts)).
    """
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in keys and c != right_ts]
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")

    payload = F.struct(
        F.col(right_ts).alias(right_ts), *[F.col(c).alias(c) for c in right_cols]
    )
    r_side = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("_ats"),
        F.lit(0).alias("_side"),
        payload.alias("_rp"),
    )
    payload_type = r_side.schema["_rp"].dataType
    left_payload = F.struct(*[F.col(c).alias(c) for c in left.columns])
    l_side = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("_ats"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(payload_type).alias("_rp"),
        left_payload.alias("_lp"),
    )
    r_side = r_side.withColumn("_lp", F.lit(None).cast(l_side.schema["_lp"].dataType))

    unioned = r_side.unionByName(l_side)
    # Backward: ascending time, right rows (side 0) before left at equal ts
    # so inclusive matches see them; carry the latest right payload forward.
    # Forward is the mirror image.
    if direction == "backward":
        order = [F.col("_ats").asc(), F.col("_side").asc(), F.col("_rp").asc()]
    else:
        order = [F.col("_ats").desc(), F.col("_side").asc(), F.col("_rp").desc()]
    w = (
        Window.partitionBy(*[F.col(k) for k in keys])
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.withColumn("_m", F.last("_rp", ignorenulls=True).over(w))
    out_cols = [F.col(f"_lp.{c}").alias(c) for c in left.columns]
    out_cols.append(F.col(f"_m.{right_ts}").alias(f"{right_ts}{suffix}"))
    out_cols.extend(F.col(f"_m.{c}").alias(f"{c}{suffix}") for c in right_cols)
    return matched.where(F.col("_side") == 1).select(*out_cols)
