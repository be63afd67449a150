from __future__ import annotations

from pyspark.sql import functions as F


def test_hll_estimate_accuracy_and_determinism(spark):
    from whatsapp_vectordb_spark.operators.sketches import hll_distinct_estimate

    n = 5000
    df = spark.range(20000).select((F.col("id") % n).alias("v"))
    est = hll_distinct_estimate(df, "v", log2m=10).head()["hll_estimate"]
    # m=1024 registers -> standard error ~3.3%; allow 4 sigma
    assert abs(est - n) / n < 0.13, est
    again = hll_distinct_estimate(df, "v", log2m=10).head()["hll_estimate"]
    assert est == again  # bit-identical, not just close
    # duplicates don't move the estimate (set semantics)
    dup = df.unionByName(df)
    assert hll_distinct_estimate(dup, "v", log2m=10).head()["hll_estimate"] == est
