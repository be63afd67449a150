"""Data-layout optimization: Z-order (Morton) clustering for multi-column
data skipping.

At 100 TB the scan cost of a query is decided before it runs — by how the
writer laid rows into files. Sorting by one column gives min/max pruning
on that column only; interleaving the BITS of several columns (Z-order)
gives useful min/max ranges on ALL of them at once, which is why
Delta/Iceberg `OPTIMIZE ZORDER BY` exists. This module is the
engine-portable core of that: a bit-exact Morton key plus a deterministic
file assignment, so the layout decision itself is oracle-checkable.

The key math is pure integer bit-shuffling (no floats anywhere), hence
bit-identical in any engine and stable under any partitioning.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_key(x: Column, y: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of two non-negative integer
    columns into a single Z-order key: bit i of ``x`` lands at position
    2i, bit i of ``y`` at 2i+1. Rows close in BOTH dimensions get close
    keys, so a range of keys covers a rectangle — the property min/max
    file pruning exploits.

    All shifts are literals (Spark requires that) and the expression stays
    inside whole-stage codegen — a map-only key at scan speed."""
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    return reduce(lambda a, b: a + b, terms).cast("long")


def zorder_file_stats(
    df: DataFrame,
    x_col: str,
    y_col: str,
    order_id_col: str,
    n_files: int = 16,
    bits: int = 16,
) -> DataFrame:
    """Plan a Z-ordered rewrite of ``df`` into ``n_files`` equal files and
    report each planned file's min/max envelope on BOTH dimensions —
    exactly the parquet footer statistics a scan would prune with, so the
    output IS the data-skipping quality of the layout (tight envelopes =
    most files skippable for a 2-D predicate).

    File assignment is ``ntile(n_files)`` over the total order
    ``(morton_key, order_id_col)`` — deterministic because the tie-break
    id makes the order total. At production scale the same assignment is
    a ``repartitionByRange`` on the key followed by one write; the
    planning query here shuffles only (key, dims) and aggregates 6 longs
    per file.
    """
    from pyspark.sql import Window

    keyed = df.select(
        F.col(x_col).cast("long").alias("_x"),
        F.col(y_col).cast("long").alias("_y"),
        F.col(order_id_col).alias("_oid"),
    ).withColumn("_z", morton_key(F.col("_x"), F.col("_y"), bits))
    w = Window.orderBy(F.col("_z").asc(), F.col("_oid").asc())
    return (
        keyed.withColumn("file_id", F.ntile(n_files).over(w))
        .groupBy("file_id")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("_x").alias("min_x"),
            F.max("_x").alias("max_x"),
            F.min("_y").alias("min_y"),
            F.max("_y").alias("max_y"),
        )
        .select(
            F.col("file_id").cast("int").alias("file_id"),
            "n_rows",
            "min_x",
            "max_x",
            "min_y",
            "max_y",
        )
    )
