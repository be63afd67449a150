"""Skew stress: functions/skew.py salted primitives against a planted
power-law key distribution — one hot key owning ~half of all rows (the
100:1+ shape of user ids / hostnames / stop shingles at corpus scale).

Times three joins producing identical results (plain shuffle join with
AQE skew-split ON, plain with AQE OFF — the unmitigated worst case — and
``salted_join`` with AQE OFF) plus per-key COUNT(DISTINCT) both plain and
salted. Broadcast is disabled throughout: the right side stands in for a
dimension above the broadcast threshold, which is exactly when salting is
the tool. Prints one JSON line with wall times and row counts.

    python tools/stress_skew.py [n_rows] [n_salts]      # default 4M, 16
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    n_salts = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    from pyspark.sql import functions as F

    from whatsapp_vectordb_spark.functions.skew import (
        salted_distinct_count,
        salted_join,
    )
    from whatsapp_vectordb_spark.session import get_spark

    spark = get_spark(app_name="skew-stress")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    # left: half the rows on key 'hot-0', the rest uniform over 5k keys;
    # a payload column so shuffle bytes are realistic, not just the key
    left = (
        spark.range(n_rows)
        .select(
            F.when(F.col("id") % 2 == 0, F.lit("hot-0"))
            .otherwise(F.concat(F.lit("key-"), (F.col("id") % 5000).cast("string")))
            .alias("k"),
            F.col("id").alias("left_id"),
            F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        )
        .repartition(64)
        .cache()
    )
    left.count()
    right = (
        spark.range(5001)
        .select(
            F.when(F.col("id") == 5000, F.lit("hot-0"))
            .otherwise(F.concat(F.lit("key-"), F.col("id").cast("string")))
            .alias("k"),
            F.sha2(F.concat(F.lit("dim"), F.col("id").cast("string")), 256).alias("dim_payload"),
        )
        .cache()
    )
    right.count()

    out: dict = {"metric": "skew_stress", "n_rows": n_rows, "n_salts": n_salts}

    def timed(name: str, fn) -> None:
        t0 = time.perf_counter()
        out[name + "_rows"] = fn()
        out[name + "_sec"] = round(time.perf_counter() - t0, 2)
        print(f"{name}: {out[name + '_sec']}s, {out[name + '_rows']} rows", flush=True)

    def agg_count(df):
        return df.agg(F.count("*")).collect()[0][0]

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    timed("join_plain_aqe", lambda: agg_count(left.join(right, "k")))

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    timed("join_plain_noaqe", lambda: agg_count(left.join(right, "k")))
    timed(
        "join_salted_noaqe",
        lambda: agg_count(salted_join(left, right, "k", n_salts=n_salts)),
    )
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")

    # distinct payloads per key: the hot key owns n_rows/2 distinct values,
    # so the plain plan funnels half the table through one reducer
    timed(
        "distinct_plain",
        lambda: agg_count(left.groupBy("k").agg(F.count_distinct("payload"))),
    )
    timed(
        "distinct_salted",
        lambda: agg_count(salted_distinct_count(left, "k", "payload", n_salts=n_salts)),
    )

    # equality spot-check: the salted join must be result-identical
    a = left.join(right, "k").agg(F.count("*"), F.sum(F.crc32("dim_payload"))).collect()[0]
    b = (
        salted_join(left, right, "k", n_salts=n_salts)
        .agg(F.count("*"), F.sum(F.crc32("dim_payload")))
        .collect()[0]
    )
    out["results_identical"] = bool(a[0] == b[0] and a[1] == b[1])

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
