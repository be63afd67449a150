"""Skew mitigation (functions/skew.py): salted plans equal unsalted results."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from whatsapp_vectordb_spark.functions.skew import salted_distinct_count, salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # one hot key (90% of rows) + a tail
    rows = [(i, "hot" if i % 10 else f"k{i}", i % 7) for i in range(1000)]
    return spark.createDataFrame(rows, "row_id long, key string, v long")


def test_salted_join_equals_plain_join(spark, skewed):
    right = spark.createDataFrame(
        [("hot", 1.0), ("k10", 2.0), ("k20", 3.0), ("absent", 9.0)],
        "key string, weight double",
    )
    plain = skewed.join(right, "key").select("row_id", "weight")
    salted = salted_join(skewed, right, on="key", n_salts=8).select("row_id", "weight")
    assert plain.count() == salted.count()
    assert {tuple(r) for r in plain.collect()} == {tuple(r) for r in salted.collect()}


def test_salted_left_join_keeps_unmatched(spark, skewed):
    right = spark.createDataFrame([("k10", 2.0)], "key string, weight double")
    out = salted_join(skewed, right, on="key", how="left")
    assert out.count() == skewed.count()
    assert out.where(F.col("weight").isNotNull()).count() == 1


def test_salted_distinct_count_exact(spark, skewed):
    expected = {
        (r["key"], r["n"])
        for r in skewed.groupBy("key").agg(F.count_distinct("v").alias("n")).collect()
    }
    got = {
        (r["key"], r["n_distinct_v"])
        for r in salted_distinct_count(skewed, "key", "v", n_salts=8).collect()
    }
    assert got == expected
