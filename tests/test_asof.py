"""As-of join (operators/asof.py) semantics."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from whatsapp_vectordb_spark.operators.asof import asof_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _ts("2024-01-01T10:00:00")),
            (2, "u1", _ts("2024-01-01T12:00:00")),
            (3, "u2", _ts("2024-01-01T09:00:00")),
            (4, "u3", _ts("2024-01-01T09:00:00")),
        ],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01T09:30:00"), 10.0),
            ("u1", _ts("2024-01-01T11:00:00"), 20.0),
            ("u2", _ts("2024-01-01T09:00:00"), 30.0),  # exact tie → inclusive match
            ("u2", _ts("2024-01-01T11:00:00"), 40.0),
        ],
        "user_id string, ts timestamp, amount double",
    )
    return left, right


def test_backward_matches_latest_at_or_before(frames):
    left, right = frames
    out = {
        r["event_id"]: (r["ts_matched"], r["amount_matched"])
        for r in asof_join(left, right, on="user_id").collect()
    }
    assert out[1] == (_ts("2024-01-01T09:30:00"), 10.0)
    assert out[2] == (_ts("2024-01-01T11:00:00"), 20.0)
    assert out[3] == (_ts("2024-01-01T09:00:00"), 30.0)  # inclusive
    assert out[4] == (None, None)  # u3 has no right rows


def test_forward_matches_earliest_at_or_after(frames):
    left, right = frames
    out = {
        r["event_id"]: r["amount_matched"]
        for r in asof_join(left, right, on="user_id", direction="forward").collect()
    }
    assert out[1] == 20.0  # next u1 row after 10:00 is 11:00
    assert out[2] is None  # nothing after 12:00
    assert out[3] == 30.0  # inclusive at 09:00


def test_every_left_row_survives(frames):
    left, right = frames
    assert asof_join(left, right, on="user_id").count() == left.count()


def test_matches_sql_correlated_subquery(spark, frames):
    """Cross-check against the O(n·m) definitional query."""
    left, right = frames
    left.createOrReplaceTempView("l")
    right.createOrReplaceTempView("r")
    expected = {
        (r["event_id"]): r["m"]
        for r in spark.sql(
            """
            SELECT l.event_id,
                   (SELECT MAX(r.ts) FROM r
                    WHERE r.user_id = l.user_id AND r.ts <= l.ts) AS m
            FROM l
            """
        ).collect()
    }
    got = {
        r["event_id"]: r["ts_matched"]
        for r in asof_join(left, right, on="user_id").collect()
    }
    assert got == expected
