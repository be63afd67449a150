"""Round-5 text/retrieval-operator stress at beyond-fixture scale:
replicate the sf0.1 documents corpus R× with distinct id spaces and
per-replica tail tokens, then time the round-5 stages — phrase search,
overlapping chunking, RAKE keywords, distinct-n diversity, shard
assignment, and the PMI pair miner.

    python tools/stress_text.py [replicas]

Prints one JSON line {"n_docs": ..., "timings": {...}} for BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 20

    from pyspark.sql import functions as F

    from whatsapp_vectordb_spark.functions.text import tokens
    from whatsapp_vectordb_spark.operators.curate import shard_assign
    from whatsapp_vectordb_spark.operators.textops import (
        chunk_overlap,
        distinct_ngram_diversity,
        phrase_search,
        rake_keywords,
    )
    from whatsapp_vectordb_spark.session import get_spark

    spark = get_spark(app_name="text-stress")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select(
        "doc_id", "text", "source"
    )
    r = spark.range(replicas).select(F.col("id").alias("rep"))
    corpus = (
        docs.crossJoin(F.broadcast(r))
        .select(
            (F.col("doc_id") + F.col("rep") * 10_000_000).alias("doc_id"),
            F.concat(
                F.col("text"), F.lit(" replicatail"), F.col("rep").cast("string")
            ).alias("text"),
            "source",
        )
        .repartition(32)
        .cache()
    )
    n_docs = corpus.count()

    timings: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.time()
        n = fn()
        timings[name] = round(time.time() - t0, 3)
        print(f"{name}: {timings[name]}s ({n} rows)", file=sys.stderr)

    timed("phrase_search", lambda: phrase_search(corpus, "sort merge").count())
    timed(
        "chunk_overlap",
        lambda: chunk_overlap(corpus, size=64, stride=32).count(),
    )
    timed("rake_keywords", lambda: rake_keywords(corpus).count())
    timed(
        "distinct_ngrams",
        lambda: distinct_ngram_diversity(corpus).count(),
    )
    timed(
        "shard_assign",
        lambda: shard_assign(
            corpus.select(
                "doc_id", F.size(tokens("text")).cast("long").alias("n_tokens")
            ),
            shard_tokens=65536,
        )
        .groupBy("shard_id")
        .count()
        .count(),
    )

    print(json.dumps({"n_docs": n_docs, "replicas": replicas, "timings": timings}))
    spark.stop()


if __name__ == "__main__":
    main()
