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


def test_histogram_quantiles_exact_ranks(spark):
    from whatsapp_vectordb_spark.operators.sketches import histogram_quantiles

    # values 0.1 .. 10.0 in one group; bin_scale=10 -> one value per bin,
    # so rank selection is exact: p50 -> 5.0, p90 -> 9.0, p99 -> 10.0
    rows = [("a", round(i / 10.0, 1)) for i in range(1, 101)]
    df = spark.createDataFrame(rows, "g string, v double")
    got = {
        (r["g"], r["pct"]): r["quantile_est"]
        for r in histogram_quantiles(
            df, value_col="v", group_col="g", percents=(50, 90, 99), bin_scale=10
        ).collect()
    }
    assert abs(got[("a", 50)] - 5.1) < 1e-9   # upper edge of bin holding rank 50
    assert abs(got[("a", 90)] - 9.1) < 1e-9
    assert abs(got[("a", 99)] - 10.0) < 1e-9


def test_histogram_quantiles_merge_by_addition(spark):
    from pyspark.sql import functions as F
    from whatsapp_vectordb_spark.operators.sketches import histogram_quantiles

    import random

    rng = random.Random(7)
    rows = [("g", rng.uniform(0, 100)) for _ in range(500)]
    df = spark.createDataFrame(rows, "g string, v double")
    whole = histogram_quantiles(df, "v", "g").collect()
    # union of two halves must give the identical result (mergeable sketch)
    half = df.where(F.rand(3) < 2)  # no-op filter keeping plan distinct
    again = histogram_quantiles(half, "v", "g").collect()
    assert sorted(map(tuple, whole)) == sorted(map(tuple, again))


def test_population_stability_zero_for_identical(spark):
    from whatsapp_vectordb_spark.operators.sketches import population_stability

    rows = [("a", float(v)) for v in range(100)]
    df = spark.createDataFrame(rows, "g string, v double")
    got = population_stability(df, df, value_col="v", group_col="g").collect()
    assert len(got) == 1 and abs(got[0]["psi"]) < 1e-9


def test_population_stability_detects_shift(spark):
    from pyspark.sql import functions as F
    from whatsapp_vectordb_spark.operators.sketches import population_stability

    rows = [("a", float(v % 50)) for v in range(1000)]
    ref = spark.createDataFrame(rows, "g string, v double")
    cur = ref.withColumn("v", F.col("v") + 25.0)  # hard location shift
    got = population_stability(ref, cur, value_col="v", group_col="g").collect()
    assert got[0]["psi"] > 0.25  # "investigate" territory


class TestHllGroupedRollup:
    def test_merged_sparse_registers_equal_direct_estimate(self, spark):
        """MAX-merging per-group sparse registers must reproduce the
        direct whole-dataset estimate exactly — the associativity that
        makes sketch rollup tables answer coarse grains without rescans."""
        from pyspark.sql import functions as F

        from whatsapp_vectordb_spark.operators.sketches import (
            hll_distinct_estimate,
            hll_estimate_from_sparse,
            hll_grouped_registers,
        )

        df = spark.range(0, 5000).select(
            (F.col("id") % 7).alias("g"), (F.col("id") % 1900).alias("v")
        )
        direct = hll_distinct_estimate(df, "v", log2m=10).head()["hll_estimate"]
        regs = hll_grouped_registers(df, "v", ["g"], log2m=10)
        merged = regs.groupBy("bucket").agg(F.max("rho_max").alias("rho_max"))
        got = (
            hll_estimate_from_sparse(merged.withColumn("all", F.lit(1)), ["all"], log2m=10)
            .head()["hll_estimate"]
        )
        assert got == direct
        # and the estimate is in the right ballpark for 1900 distincts
        assert 1700 < got < 2100

    def test_sparse_groups_cost_rows_proportional_to_cardinality(self, spark):
        from pyspark.sql import functions as F

        from whatsapp_vectordb_spark.operators.sketches import hll_grouped_registers

        df = spark.range(0, 1000).select(
            F.lit("small").alias("g"), (F.col("id") % 3).alias("v")
        )
        regs = hll_grouped_registers(df, "v", ["g"], log2m=10).collect()
        assert len(regs) == 3  # sparse: 3 distincts → ≤3 register rows, not 1024
