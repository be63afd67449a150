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
    python tools/stress_pipelines.py --capstone [n_rows] [n_batches] [preseed]

``--capstone`` instead replays the streaming capstone's ingest loop
(JSONL drop → validity filter → within-batch dropDuplicates → anti-join
against the persisted index's id projection → append) at ≥100k rows,
recording PER-BATCH wall seconds and shuffle deltas — the empirical check
that per-batch cost stays flat as the index grows (the documented bound:
no stage rereads history beyond the id column).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

def _scratch_root():
    from whatsapp_vectordb_spark.session import local_scratch_root

    return local_scratch_root()



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


def _capstone_replay(n_rows: int, n_batches: int, preseed: int = 0) -> None:
    """Streaming-capstone ingest at stress scale: one JSONL file per
    micro-batch (``n_rows / n_batches`` rows each, dim-64 vectors, ~3%
    malformed lines, 10% of each batch re-delivering ids from the previous
    batch), processed with maxFilesPerTrigger=1 through the SAME ingest
    graph as harness ``streaming_pipeline_capstone``. Per-batch wall time
    and shuffle bytes are recorded from inside foreachBatch; flat per-batch
    numbers as the index grows from 0 to n_rows ARE the documented bound."""
    import shutil
    import tempfile

    import numpy as np
    from pyspark.sql import functions as F

    from whatsapp_vectordb_spark.session import get_spark

    spark = get_spark(
        app_name="capstone-stress",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.retainedStages": "10000"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="wvs_capstone_stress_", dir=_scratch_root())
    import atexit

    atexit.register(shutil.rmtree, root, ignore_errors=True)
    drop = os.path.join(root, "drop")
    os.makedirs(drop)
    index_path = os.path.join(root, "index")

    per = n_rows // n_batches
    dim = 64
    rng = np.random.default_rng(11)

    preseed_s = 0.0
    if preseed:
        # Pre-seed the persisted index at `preseed` rows (id space disjoint
        # from the stream's) so the replay measures per-batch cost against
        # a LARGE existing index — the anti-join's right side is the id
        # projection of `preseed + appended` rows, and flat batch numbers
        # here pin that the scan is column-pruned (id-only) and the join
        # stays sub-linear in index size per batch (VERDICT r8 #7).
        t0 = time.perf_counter()
        (
            spark.range(10_000_000, 10_000_000 + preseed)
            .select(
                F.col("id").alias("vec_id"),
                F.expr(
                    f"transform(sequence(1, {dim}), "
                    "j -> round(sin(id * j * 0.7182818), 4))"
                ).alias("embedding"),
            )
            .write.mode("overwrite")
            .parquet(index_path)
        )
        preseed_s = round(time.perf_counter() - t0, 1)

    t0 = time.perf_counter()
    for b in range(n_batches):
        lo = b * per
        m = np.round(rng.standard_normal((per, dim)), 4)
        with open(os.path.join(drop, f"deliver_{b:03d}.jsonl"), "w") as fh:
            for i in range(per):
                vid = lo + i
                # re-delivery of an id the previous batch actually WROTE:
                # lo-per+i with i%10==0 is the slot the previous batch
                # itself replaced with ITS re-delivery (never written), so
                # +1 targets a genuinely-indexed id — without it, batches
                # ≥2 contain zero duplicates and the anti-join is idle
                if b > 0 and i % 10 == 0:
                    vid = lo - per + i + 1
                line = (
                    '{"vec_id": %d, "embedding": [%s]}'
                    % (vid, ",".join(repr(float(x)) for x in m[i]))
                )
                if i % 31 == 0:  # malformed tail → quarantine path
                    line = line[: len(line) // 2]
                fh.write(line + "\n")
    synth_s = round(time.perf_counter() - t0, 1)

    batch_rows: list[dict] = []

    def ingest(batch_df, batch_id: int) -> None:
        sp = batch_df.sparkSession
        s0 = _shuffle_totals(sp)
        t0 = time.perf_counter()
        valid = (
            batch_df.where(
                F.col("vec_id").isNotNull()
                & F.col("embedding").isNotNull()
                & (F.size("embedding") == dim)
            ).dropDuplicates(["vec_id"])
        )
        if os.path.exists(index_path):
            seen = sp.read.parquet(index_path).select("vec_id")
            valid = valid.join(seen, "vec_id", "left_anti")
        valid.localCheckpoint(eager=True).write.mode("append").parquet(index_path)
        s1 = _shuffle_totals(sp)
        w, r = _shuffle_delta_mb(s0, s1)
        batch_rows.append(
            {
                "batch": int(batch_id),
                "sec": round(time.perf_counter() - t0, 2),
                "shuffle_write_mb": w,
                "shuffle_read_mb": r,
            }
        )
        print(json.dumps(batch_rows[-1]), flush=True)

    q = (
        spark.readStream.schema("vec_id bigint, embedding array<double>")
        .option("maxFilesPerTrigger", "1")
        .json(drop)
        .writeStream.foreachBatch(ingest)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    n_indexed = spark.read.parquet(index_path).count()
    print(
        json.dumps(
            {
                "metric": "capstone_stream_stress",
                "n_rows": n_rows,
                "n_batches": n_batches,
                "preseed": preseed,
                "preseed_s": preseed_s,
                "synth_s": synth_s,
                "n_indexed": n_indexed,
                "batches": batch_rows,
            }
        )
    )
    spark.stop()


def main() -> None:
    if "--capstone" in sys.argv:
        args = [a for a in sys.argv[1:] if not a.startswith("--")]
        _capstone_replay(
            int(args[0]) if args else 120_000,
            int(args[1]) if len(args) > 1 else 12,
            preseed=int(args[2]) if len(args) > 2 else 0,
        )
        return
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
