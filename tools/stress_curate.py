"""Curation-operator stress at beyond-fixture scale: replicate the sf0.1
documents corpus R× with distinct id spaces (per-replica suffix tokens so
line-dedup has real cross-doc recurrence AND unique tails), then time the
round-4 curation stages — duplicate-line removal, concat-and-chunk
sequence packing, MaxSim retrieval, JL projection.

    python tools/stress_curate.py [replicas]
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
    from whatsapp_vectordb_spark.operators.curate import (
        duplicate_line_removal,
        pack_sequences,
    )
    from whatsapp_vectordb_spark.operators.projection import jl_project
    from whatsapp_vectordb_spark.operators.textops import maxsim_search
    from whatsapp_vectordb_spark.session import get_spark

    spark = get_spark(app_name="curate-stress")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select(
        "doc_id", "text"
    )
    r = spark.range(replicas).select(F.col("id").alias("rep"))
    corpus = (
        docs.crossJoin(F.broadcast(r))
        .select(
            (F.col("doc_id") + F.col("rep") * 10_000_000).alias("doc_id"),
            F.concat(
                F.col("text"), F.lit(" replicatail"), F.col("rep").cast("string")
            ).alias("text"),
        )
        .repartition(32)
        .cache()
    )
    n_docs = corpus.count()

    emb = (
        spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
        .select("vec_id", "embedding")
        .crossJoin(F.broadcast(r))
        .select(
            (F.col("vec_id") + F.col("rep") * 10_000_000).alias("vec_id"), "embedding"
        )
        .repartition(32)
        .cache()
    )
    n_vecs = emb.count()

    timings = {}

    # lines = 8-token chunks (the harness fixture synthesis, at scale the
    # corpus would carry real newlines)
    lines = corpus.select(
        "doc_id", tokens("text").alias("_tk")
    ).where(F.size("_tk") > 0).select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.ceil(F.size("_tk") / 8).cast("int") - 1),
                lambda i: F.array_join(F.slice(F.col("_tk"), i * 8 + 1, 8), " "),
            )
        ).alias("line_no", "line"),
    )
    t0 = time.perf_counter()
    kept = duplicate_line_removal(lines, min_docs=2)
    n_rows = kept.count()
    dropped = kept.agg(F.sum("n_lines_dropped")).collect()[0][0]
    timings["line_dedup"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    packed = pack_sequences(
        corpus.select("doc_id", F.size(tokens("text")).cast("long").alias("n_tokens")),
        seq_len=2048,
    )
    n_blocks = packed.agg(F.max("end_block")).collect()[0][0] + 1
    timings["pack_sequences"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    top = maxsim_search(corpus, "spark window join", k=10).collect()
    timings["maxsim_topk"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    proj = jl_project(emb, 64, 16, seed=7)
    n_proj = proj.count()
    timings["jl_project"] = round(time.perf_counter() - t0, 2)

    print(
        json.dumps(
            {
                "n_docs": n_docs,
                "n_vectors": n_vecs,
                "line_dedup_docs": n_rows,
                "lines_dropped": int(dropped),
                "train_blocks": int(n_blocks),
                "maxsim_top1": int(top[0]["doc_id"]),
                "jl_projected": n_proj,
                "timings_sec": timings,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
