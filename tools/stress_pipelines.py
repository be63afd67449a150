"""Composed-pipeline stress: the two capstone queries end-to-end at ≥1M
docs (the per-operator stress tools top out at 100k docs — this is the
first COMPOSITION-level scale evidence).

Replicates the sf0.1 documents corpus R× with distinct id spaces and a
per-replica suffix token (exact-dedup still only collapses the planted
within-replica duplicates, so duplicate volume stays linear in docs),
then runs the same stage graphs as ``pipeline_pretraining_shards`` and
``pipeline_curate_corpus`` (harness.py) at each replica level and reports
wall time AND total shuffle-write bytes per run (from the Spark UI REST
API), so super-linear blow-ups show up in bytes even when wall time is
noisy on a shared host.

    python tools/stress_pipelines.py [replicas ...]   # default: 50 100 200
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _shuffle_totals(spark) -> tuple[int, int] | None:
    """(shuffle_write_bytes, shuffle_read_bytes) summed over all completed
    stages so far — deltas around a timed block give that block's cost.
    Returns ``None`` (NOT (0, 0)) when the REST endpoint is unavailable or
    errors, so an unreachable UI reads as 'unavailable' in the output
    instead of silently corrupting the scale evidence with zeros. The
    stress session bumps ``spark.ui.retainedStages`` so stage eviction at
    high replica counts can't undercount the running totals."""
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    if base is None:
        return None
    try:
        with urllib.request.urlopen(f"{base}/api/v1/applications/{app}/stages?status=complete") as r:
            stages = json.load(r)
    except Exception:
        return None
    return (
        sum(s.get("shuffleWriteBytes", 0) for s in stages),
        sum(s.get("shuffleReadBytes", 0) for s in stages),
    )


def _shuffle_delta_mb(before: tuple[int, int] | None, after: tuple[int, int] | None):
    """(write_mb, read_mb) for a timed block, or (None, None) when either
    snapshot was unavailable — surfaced as nulls in the JSON row."""
    if before is None or after is None:
        return (None, None)
    return (round((after[0] - before[0]) / 1e6, 1), round((after[1] - before[1]) / 1e6, 1))


def main() -> None:
    levels = [int(a) for a in sys.argv[1:]] or [50, 100, 200]

    from pyspark.sql import functions as F

    from whatsapp_vectordb_spark.harness import (
        curate_base_frame,
        pretraining_shards_frame,
    )
    from whatsapp_vectordb_spark.operators.sampling import assign_splits, weighted_mix
    from whatsapp_vectordb_spark.session import get_spark

    spark = get_spark(
        app_name="pipeline-stress",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.retainedStages": "10000"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs0 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select(
        "doc_id", "text", "lang", "source"
    )

    MIX = {"en": 0.4, "de": 0.15, "es": 0.15, "fr": 0.15, "zh": 0.15}
    results = []
    for reps in levels:
        r = spark.range(reps).select(F.col("id").alias("rep"))
        corpus = (
            docs0.crossJoin(F.broadcast(r))
            .select(
                (F.col("doc_id") + F.col("rep") * 10_000_000).alias("doc_id"),
                F.concat(
                    F.col("text"), F.lit(" reptail"), F.col("rep").cast("string")
                ).alias("text"),
                "lang",
                "source",
            )
            .repartition(64)
            .cache()
        )
        n_docs = corpus.count()

        # --- capstone 1: pretraining shards — the EXACT harness graph
        # (harness.pretraining_shards_frame), over the replicated corpus
        s0 = _shuffle_totals(spark)
        t0 = time.perf_counter()
        manifest = pretraining_shards_frame(corpus, shard_tokens=4096, seed=7)
        n_shards = manifest.count()
        t_shards = round(time.perf_counter() - t0, 2)
        s1 = _shuffle_totals(spark)

        # --- capstone 2: curate corpus — harness.curate_base_frame, then
        # the same checkpoint + mix + split tail as the registered query
        t0 = time.perf_counter()
        base = curate_base_frame(corpus).localCheckpoint()
        mixed = weighted_mix(base, MIX, group_col="lang", id_col="doc_id")
        cells = (
            assign_splits(mixed, "doc_id")
            .groupBy("split", "lang")
            .agg(F.count("*").alias("n_docs"))
            .collect()
        )
        t_curate = round(time.perf_counter() - t0, 2)
        s2 = _shuffle_totals(spark)

        shards_w, shards_r = _shuffle_delta_mb(s0, s1)
        curate_w, curate_r = _shuffle_delta_mb(s1, s2)
        row = {
            "replicas": reps,
            "n_docs": n_docs,
            "pretraining_shards_sec": t_shards,
            "pretraining_shards_shuffle_write_mb": shards_w,
            "pretraining_shards_shuffle_read_mb": shards_r,
            "n_shards": n_shards,
            "curate_corpus_sec": t_curate,
            "curate_corpus_shuffle_write_mb": curate_w,
            "curate_corpus_shuffle_read_mb": curate_r,
            "curate_cells": len(cells),
        }
        results.append(row)
        print(json.dumps(row), flush=True)
        corpus.unpersist()

    print(json.dumps({"metric": "pipeline_stress", "levels": results}))
    spark.stop()


if __name__ == "__main__":
    main()
