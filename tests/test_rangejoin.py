"""Bucketed interval join (operators/rangejoin.py)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from whatsapp_vectordb_spark.operators.rangejoin import interval_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _ts("2024-01-01T10:00:00")),
            (2, "u1", _ts("2024-01-01T10:10:00")),
            (3, "u2", _ts("2024-01-01T10:00:00")),
        ],
        "lid long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01T09:55:00"), 1.0),  # within [-5m, 0] of lid 1
            ("u1", _ts("2024-01-01T10:00:00"), 2.0),  # boundary: == lid 1 ts
            ("u1", _ts("2024-01-01T10:06:00"), 3.0),  # within window of lid 2 only
            ("u2", _ts("2024-01-01T11:00:00"), 4.0),  # outside any window
        ],
        "user_id string, ts timestamp, v double",
    )
    return left, right


def test_interval_join_matches_definition(frames):
    left, right = frames
    got = {
        (r["lid"], r["v"])
        for r in interval_join(left, right, on="user_id", lower_s=-300, upper_s=0).collect()
    }
    assert got == {(1, 1.0), (1, 2.0), (2, 3.0)}


def test_interval_join_equals_naive_inequality_join(spark, frames):
    left, right = frames
    naive = left.join(
        right.withColumnRenamed("ts", "rts").withColumnRenamed("user_id", "ruid"),
        (F.col("user_id") == F.col("ruid"))
        & (F.col("rts") >= F.col("ts") - F.expr("INTERVAL 300 SECONDS"))
        & (F.col("rts") <= F.col("ts")),
    )
    fast = interval_join(left, right, on="user_id", lower_s=-300, upper_s=0)
    assert fast.count() == naive.count()
    assert {(r["lid"], r["v"]) for r in fast.collect()} == {
        (r["lid"], r["v"]) for r in naive.collect()
    }


def test_no_duplicate_pairs_across_buckets(frames):
    left, right = frames
    out = interval_join(left, right, on="user_id", lower_s=-300, upper_s=0)
    assert out.count() == out.dropDuplicates(["lid", "v"]).count()
