"""Skew mitigation primitives for hot keys.

AQE's skew-join splitting (on in session.py) handles most cases at runtime;
these are the explicit tools for when the skew is *known* (a handful of hot
keys taking most rows — the power-law shape of user ids, hostnames, stop
shingles):

- ``salted_join``: equi-join where one hot key would pin a whole task.
  The left (big, skewed) side gets a deterministic salt in [0, S); the
  right side is replicated S× with every salt value; the join key becomes
  (key, salt), spreading each hot key over S tasks. Replication cost:
  |right| × S rows — use only when right is small-ish but above the
  broadcast threshold.
- ``salted_distinct_count``: COUNT(DISTINCT x) per key without one
  reducer per hot key: stage 1 dedupes (key, x) under (key, salt-of-x)
  partitioning, stage 2 sums per-salt partial counts. Exact, two narrow
  shuffles, no single-task hot spot. (Plain sums/counts don't need this —
  partial aggregation already shrinks them map-side.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-spread equi-join, result-identical to ``left.join(right, on, how)``
    for ``inner``/``left`` joins. The salt is derived from the whole left row
    (xxhash64), so it is deterministic and needs no designated column."""
    keys = [on] if isinstance(on, str) else list(on)
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner|left")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(n_salts))
    l_s = left.withColumn("_salt", salt)
    r_s = right.withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    return l_s.join(r_s, [*keys, "_salt"], how).drop("_salt")


def salted_distinct_count(
    df: DataFrame,
    key_cols: list[str] | str,
    value_col: str,
    n_salts: int = 16,
) -> DataFrame:
    """Exact ``COUNT(DISTINCT value)`` per key for skewed keys: dedupe under
    (key, hash(value) % S) so no reducer owns a whole hot key, then sum the
    per-salt partial distinct counts (partitioning by hash-of-value makes
    the partial counts disjoint, so the sum is exact)."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    salt = F.pmod(F.xxhash64(F.col(value_col)), F.lit(n_salts))
    partial = (
        df.select(*keys, F.col(value_col), salt.alias("_salt"))
        .groupBy(*keys, "_salt")
        .agg(F.count_distinct(value_col).alias("_partial"))
    )
    return partial.groupBy(*keys).agg(F.sum("_partial").alias(f"n_distinct_{value_col}"))
