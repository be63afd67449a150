"""Upsert as a relational operator (SURVEY.md §2.4 K3).

Reference semantics (upsert/upsert.go:113-215 + the ``vectors/upsert``
endpoint contract): writing an id that already exists *replaces* its row;
last writer wins. The reference does this one HTTPS POST per row; here it
is one distributed plan: union(new, existing) → keep row_number()==1 per
key ordered by sequence desc.

Scale notes: the window shuffles once on the key — the same shuffle a
MERGE would need. For repeated incremental upserts into a huge table,
``VectorIndex.upsert`` bounds the rewrite; this function is the pure
DataFrame→DataFrame core (and the oracle-checkable one).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def upsert_by_key(
    existing: DataFrame,
    new: DataFrame,
    key_col: str = "id",
    seq_col: str | None = None,
) -> DataFrame:
    """Replace-by-key merge of ``new`` into ``existing``.

    If ``seq_col`` is given it totally orders writers (higher wins) and must
    be present in both inputs; otherwise all of ``new`` beats all of
    ``existing``.
    """
    if seq_col is None:
        existing = existing.withColumn("_gen", F.lit(0))
        new = new.withColumn("_gen", F.lit(1))
        seq_col = "_gen"
    merged = new.unionByName(existing)
    w = Window.partitionBy(key_col).orderBy(F.col(seq_col).desc())
    out = merged.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1)
    drop = ["_rn"] + (["_gen"] if seq_col == "_gen" else [])
    return out.drop(*drop)


def upsert_metrics(
    existing: DataFrame,
    new: DataFrame,
    key_col: str = "id",
) -> DataFrame:
    """G2 counters for a replace-by-key merge, as ONE aggregate over the
    key sets (the reference tallies success/fail per HTTP response,
    upsert/upsert.go:150-152, 193-207; here failures don't exist and the
    interesting split is replaced vs inserted).

    Returns one row: ``n_existing, n_batch, n_replaced, n_inserted,
    n_after``. Plan: two key projections, full-outer-ish via union +
    per-key presence flags — a single narrow shuffle on the key.
    """
    e = existing.select(F.col(key_col).alias("_k")).withColumn("_in_e", F.lit(1)).withColumn(
        "_in_n", F.lit(0)
    )
    n = new.select(F.col(key_col).alias("_k")).withColumn("_in_e", F.lit(0)).withColumn(
        "_in_n", F.lit(1)
    )
    per_key = (
        e.unionByName(n)
        .groupBy("_k")
        .agg(F.max("_in_e").alias("_e"), F.max("_in_n").alias("_n"))
    )
    return per_key.agg(
        F.sum("_e").alias("n_existing"),
        F.sum("_n").alias("n_batch"),
        F.sum(F.when((F.col("_e") == 1) & (F.col("_n") == 1), 1).otherwise(0)).alias(
            "n_replaced"
        ),
        F.sum(F.when((F.col("_e") == 0) & (F.col("_n") == 1), 1).otherwise(0)).alias(
            "n_inserted"
        ),
        F.count("*").alias("n_after"),
    )
