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


def test_cms_overestimates_only_and_zero_for_absent(spark):
    from whatsapp_vectordb_spark.operators.sketches import cms_counters, cms_estimate

    vals = ["a"] * 100 + ["b"] * 10 + ["c"] * 1
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    counters = cms_counters(df, "v", width=64)
    probes = spark.createDataFrame([("a",), ("b",), ("c",), ("never-seen",)], "v string")
    est = {r["probe"]: r["est_count"] for r in cms_estimate(counters, probes, "v", width=64).collect()}
    true = {"a": 100, "b": 10, "c": 1, "never-seen": 0}
    for k, t in true.items():
        assert est[k] >= t, (k, est[k], t)  # CMS never undercounts
    # with 3 distinct values in 4x64 cells, the absent probe's min cell is
    # almost surely empty -> exact 0
    assert est["never-seen"] == 0

    # sketches merge by summing counters: union == sum of the parts
    h1 = spark.createDataFrame([(v,) for v in ["a"] * 60 + ["b"] * 4], "v string")
    h2 = spark.createDataFrame([(v,) for v in ["a"] * 40 + ["b"] * 6 + ["c"]], "v string")
    merged = (
        cms_counters(h1, "v", width=64)
        .unionByName(cms_counters(h2, "v", width=64))
        .groupBy("row", "col")
        .agg(F.sum("cnt").alias("cnt"))
    )
    est_m = {r["probe"]: r["est_count"] for r in cms_estimate(merged, probes, "v", width=64).collect()}
    assert est_m == est
