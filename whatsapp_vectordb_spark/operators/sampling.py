"""Deterministic sampling for dataset curation (green-field extension —
the reference has no sampling; this is the train/val/test and
downsampling layer a 100 TB training-data pipeline needs).

Everything keys off ``portable_hash`` (md5-derived, engine-portable) so:

- the same row lands in the same split/sample on every run, on every
  engine, regardless of partitioning or row order (unlike ``df.sample``,
  whose output depends on partition layout);
- membership is decided row-locally — a map-only filter, no shuffle, no
  global coordination; adding data never reassigns existing rows;
- the DuckDB oracle reproduces the exact member set bit-for-bit.

Scale shape: ``hash_sample`` and ``assign_splits`` are pure Catalyst
projections/filters (codegen'd, pushdown-friendly). ``stratified_cap`` is
one window (shuffle by group key) — the standard per-group quota; skewed
groups are bounded by the cap itself, so the window state per key is
O(cap) after the rank filter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window

from whatsapp_vectordb_spark.session import local_df
from pyspark.sql import functions as F

from whatsapp_vectordb_spark.functions.text import portable_hash

SAMPLE_BUCKETS = 10_000


def sample_bucket(id_col: Column | str, seed: int = 0) -> Column:
    """Stable bucket in [0, SAMPLE_BUCKETS) from the row id — the basis for
    fraction sampling and split assignment. DuckDB twin:
    ``('0x' || substr(md5(seed || ':' || id), 1, 8))::BIGINT % 10000``."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return portable_hash(c.cast("string"), seed=seed, nibbles=8) % SAMPLE_BUCKETS


def hash_sample(
    df: DataFrame, id_col: str, fraction: float, seed: int = 0
) -> DataFrame:
    """Deterministic ~``fraction`` sample: keep rows whose bucket falls
    below ``fraction·SAMPLE_BUCKETS``. Map-only; reproducible under
    repartitioning and incremental appends."""
    cut = int(round(fraction * SAMPLE_BUCKETS))
    return df.where(sample_bucket(id_col, seed) < cut)


def assign_splits(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float] | None = None,
    seed: int = 0,
    split_col: str = "split",
) -> DataFrame:
    """Attach a ``split`` label ('train'/'val'/'test' by default) from
    cumulative bucket ranges — a row's split never changes as the corpus
    grows, and leakage across splits is impossible by construction
    (membership is a pure function of the id)."""
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    bucket = sample_bucket(id_col, seed)
    expr = None
    acc = 0.0
    last = list(weights)[-1]
    for name, w in weights.items():
        acc += w
        cut = int(round(acc * SAMPLE_BUCKETS))
        cond = bucket < cut
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return df.withColumn(split_col, expr.otherwise(last))


def stratified_cap(
    df: DataFrame,
    group_col: str,
    id_col: str,
    n_per_group: int,
    seed: int = 0,
) -> DataFrame:
    """Balanced downsample: at most ``n_per_group`` rows per group, chosen
    deterministically (ranked by hash bucket, id-tie-broken) — the
    rebalancing step that stops a dominant language/source from swamping a
    training mix."""
    w = Window.partitionBy(group_col).orderBy(
        sample_bucket(id_col, seed).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= n_per_group)
        .drop("_rk")
    )


def weighted_mix(
    df: DataFrame,
    weights: dict[str, float],
    group_col: str = "lang",
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Rebalance a multi-group corpus to target mix proportions — the
    training-mix curation step ("40% English, 15% each other language").

    For each group g with n_g rows and target weight w_g, the acceptance
    rate is ``min(1, λ·w_g/n_g)`` where ``λ = min_g(n_g/w_g)`` — the
    largest total at which every group can still meet its share, so the
    scarcest group keeps ALL its rows and abundant groups are hash-
    downsampled to match. Membership is the same portable-hash bucket
    cut as ``hash_sample``: deterministic per row, stable under appends.

    Scale shape: one tiny per-group count aggregate; λ and the per-group
    integer bucket cuts are computed *in the plan* (broadcast |groups|-row
    frames, no driver collect); the filter itself is map-only. Groups
    absent from ``weights`` are dropped (inner join) — a mix definition is
    also a whitelist.
    """
    spark = df.sparkSession
    # derive the group column's type from the input frame — a hardcoded
    # string schema would break (or silently cast) integer group ids
    from pyspark.sql.types import DoubleType, StructField, StructType

    w_schema = StructType(
        [
            StructField(group_col, df.schema[group_col].dataType),
            StructField("_w", DoubleType()),
        ]
    )
    w_df = local_df(spark, [(g, float(w)) for g, w in weights.items()], w_schema)
    counts = df.groupBy(group_col).agg(F.count("*").alias("_n"))
    gw = counts.join(F.broadcast(w_df), group_col)
    lam = gw.agg(F.min(F.col("_n") / F.col("_w")).alias("_lam"))
    cuts = (
        gw.crossJoin(F.broadcast(lam))
        .select(
            group_col,
            F.round(
                F.least(F.lit(1.0), F.col("_lam") * F.col("_w") / F.col("_n"))
                * SAMPLE_BUCKETS
            )
            .cast("long")
            .alias("_cut"),
        )
    )
    return (
        df.join(F.broadcast(cuts), group_col)
        .where(sample_bucket(id_col, seed) < F.col("_cut"))
        .drop("_cut")
    )


def temperature_mix(
    df: DataFrame,
    group_col: str = "lang",
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Temperature-based mix rebalancing at α = 0.5 — the mC4/XLM-R recipe
    ``q_g ∝ n_g^α``: high-resource groups are flattened toward the
    low-resource ones without any hand-written weight table (α=1 keeps the
    natural mix; α→0 approaches uniform).

    With α = 0.5 the acceptance rate reduces to
    ``min(1, sqrt(n_min) / sqrt(n_g))`` — the smallest group keeps all its
    rows, a group 4× larger keeps half. α is fixed at 0.5 here because
    IEEE sqrt is correctly rounded (bit-identical in every engine) while
    generic ``pow`` is not — the determinism contract the oracle needs.
    Membership is the usual portable-hash bucket cut: per-row, stable
    under appends and repartitioning.

    Scale shape: one |groups|-row count aggregate, cuts computed in-plan
    (broadcast), then a map-only filter — identical to ``weighted_mix``.
    """
    counts = df.groupBy(group_col).agg(F.count("*").alias("_n"))
    nmin = counts.agg(F.min("_n").alias("_nmin"))
    cuts = (
        counts.crossJoin(F.broadcast(nmin))
        .select(
            group_col,
            F.round(
                F.least(
                    F.lit(1.0),
                    F.sqrt(F.col("_nmin").cast("double"))
                    / F.sqrt(F.col("_n").cast("double")),
                )
                * SAMPLE_BUCKETS
            )
            .cast("long")
            .alias("_cut"),
        )
    )
    return (
        df.join(F.broadcast(cuts), group_col)
        .where(sample_bucket(id_col, seed) < F.col("_cut"))
        .drop("_cut")
    )
