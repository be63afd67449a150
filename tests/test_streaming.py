from __future__ import annotations

import time

from whatsapp_vectordb_spark.streaming.ops import (
    run_stream_to_memory,
    streaming_embed_pipeline,
    windowed_event_counts,
)


def _await(q, timeout=60):
    q.awaitTermination(timeout)
    q.stop()


def test_windowed_counts_stream(spark, tmp_path):
    import datetime as dt

    rows = [
        (1, dt.datetime(2024, 1, 1, 12, 5), "click", 1.0),
        (2, dt.datetime(2024, 1, 1, 12, 20), "click", 2.0),
        (3, dt.datetime(2024, 1, 1, 13, 5), "view", 4.0),
    ]
    src = str(tmp_path / "events_src")
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    ).write.parquet(src)

    stream = spark.readStream.schema(
        "event_id long, ts timestamp, event_type string, value double"
    ).parquet(src)
    out = windowed_event_counts(stream, "1 hour", "2 hours")
    q = run_stream_to_memory(out, "win_counts", output_mode="complete")
    _await(q)
    got = {
        (r["w"]["start"].hour, r["event_type"]): r["n_events"]
        for r in spark.sql("select * from win_counts").collect()
    }
    assert got[(12, "click")] == 2
    assert got[(13, "view")] == 1


def test_streaming_embed_pipeline(spark, tmp_path):
    lines = [
        ("[09.09.23, 14:35:02] ~ ana: hello there friend",),
        ("[09.09.23, 14:36:10] ~ bob: the deployment failed again",),
        ("garbage line",),
    ]
    src = str(tmp_path / "chat_src")
    spark.createDataFrame(lines, "value string").write.text(src)

    stream = spark.readStream.schema("value string").text(src)
    out = streaming_embed_pipeline(stream, dim=32)
    q = run_stream_to_memory(out, "embedded", output_mode="append")
    _await(q)
    rows = spark.sql("select * from embedded").collect()
    assert len(rows) == 2  # garbage line dropped
    assert all(len(r["embedding"]) == 32 for r in rows)
    assert {r["sender"] for r in rows} == {"ana", "bob"}

    # batch/stream parity: the same transformation on a batch frame
    batch = streaming_embed_pipeline(spark.read.text(src), dim=32).collect()
    assert {r["id"] for r in batch} == {r["id"] for r in rows}


def test_stateful_sessionization_matches_batch(spark, sf_dir):
    import os

    from whatsapp_vectordb_spark.harness import _events
    from whatsapp_vectordb_spark.operators.events import sessionized_counts
    from whatsapp_vectordb_spark.streaming.ops import run_sessionized_stream

    streamed = {
        r["user_id"]: (r["n_sessions"], r["n_events"])
        for r in run_sessionized_stream(
            spark, os.path.join(sf_dir, "events.parquet")
        ).collect()
    }
    batch = {
        r["user_id"]: (r["n_sessions"], r["n_events"])
        for r in sessionized_counts(_events(spark, sf_dir), gap_minutes=30).collect()
    }
    assert streamed == batch


def test_streaming_index_upsert_replaces_by_id(spark, tmp_path):
    """Two-batch replay into a bucketed index: a line re-ingested in a
    later micro-batch must REPLACE its earlier row (same content-hash id),
    never duplicate it — the foreachBatch twin of the batch upsert."""
    import os

    from whatsapp_vectordb_spark.index import VectorIndex
    from whatsapp_vectordb_spark.streaming.ops import run_streaming_index_upsert

    src = tmp_path / "chat_in"
    src.mkdir()
    shared = "[09.09.23, 14:35:02] ~ amit: hello from both batches"
    (src / "batch1.txt").write_text(
        shared + "\n[09.09.23, 14:36:00] ~ dana: only in batch one\nnot a chat line\n"
    )
    (src / "batch2.txt").write_text(
        shared + "\n[10.09.23, 08:00:00] ~ omer: only in batch two\n"
    )

    idx = VectorIndex.create_or_get(
        spark, str(tmp_path / "root"), "stream_idx", dimension=64, num_id_buckets=4
    )
    stream = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", 1)  # force two micro-batches
        .load(str(src))
    )
    run_streaming_index_upsert(
        stream, idx, checkpoint=str(tmp_path / "ckpt")
    )

    rows = idx.read().collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["id"], []).append(r)
    # 3 distinct parseable lines -> 3 ids; the shared line appears ONCE
    assert len(rows) == 3, [r["text"] for r in rows]
    assert all(len(v) == 1 for v in by_id.values())
    texts = {r["text"] for r in rows}
    assert "hello from both batches" in texts
    assert "only in batch one" in texts and "only in batch two" in texts
    # embeddings present and at the index dimension
    assert all(len(r["embedding"]) == 64 for r in rows)


def test_topk_maintenance_invariant_to_batch_split(spark, sf_dir, tmp_path):
    """The foreachBatch top-k merge is a semilattice: replaying the events
    as TWO micro-batches (two files, maxFilesPerTrigger=1) must produce
    exactly the single-batch / batch-SQL answer."""
    import os

    from pyspark.sql import functions as F

    from whatsapp_vectordb_spark.streaming.ops import run_topk_maintenance_stream

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    split_dir = tmp_path / "ev_split"
    split_dir.mkdir()
    for name, pred in (("a", 0), ("b", 1)):
        out = tmp_path / f"w_{name}"
        ev.where(F.col("event_id") % 2 == pred).coalesce(1).write.parquet(str(out))
        part = next(p for p in out.iterdir() if p.name.endswith(".parquet"))
        part.rename(split_dir / f"{name}.parquet")
    # two flat files + maxFilesPerTrigger=1 -> exactly two micro-batches
    got = run_topk_maintenance_stream(
        spark, str(split_dir / "*.parquet"), str(tmp_path / "state"), k=10
    )
    expect = (
        ev.select("event_id", "user_id", F.round(F.col("value"), 6).alias("score"))
        .orderBy(F.col("score").desc(), F.col("event_id").asc())
        .limit(10)
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, expect.collect()))


def test_assign_cells_quantized_tiebreak_and_exactness(spark):
    from whatsapp_vectordb_spark.operators.ann import assign_cells_quantized

    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "centroid bigint, cvec array<double>",
    )
    vecs = spark.createDataFrame(
        [(10, [0.9, 0.1]), (11, [0.1, 0.9])], "vec_id long, embedding array<double>"
    )
    got = {r["vec_id"]: r["centroid"] for r in assign_cells_quantized(vecs, cents).collect()}
    # centroids 0 and 1 are identical -> tie broken by LOWER centroid id
    assert got == {10: 0, 11: 2}


def test_ivf_maintenance_invariant_to_batch_split(spark, sf_dir, tmp_path):
    """Streaming per-batch assignment + append must equal a from-scratch
    quantized assignment of the full corpus, even replayed as TWO
    micro-batches."""
    import os

    from pyspark.sql import functions as F

    from whatsapp_vectordb_spark.operators.ann import assign_cells_quantized
    from whatsapp_vectordb_spark.streaming.ops import run_ivf_maintenance_stream

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).select(
        "vec_id", "embedding"
    )
    split_dir = tmp_path / "emb_split"
    split_dir.mkdir()
    for name, pred in (("a", 0), ("b", 1)):
        out = tmp_path / f"w_{name}"
        emb.where((F.col("vec_id") % 4 < 2) == (pred == 0)).coalesce(1).write.parquet(
            str(out)
        )
        part = next(p for p in out.iterdir() if p.name.endswith(".parquet"))
        part.rename(split_dir / f"{name}.parquet")
    idx = str(tmp_path / "ivf_idx")
    got = run_ivf_maintenance_stream(
        spark, str(split_dir / "*.parquet"), idx, n_centroids=4
    )
    cents = spark.read.parquet(os.path.join(idx, "centroids"))
    expect = (
        assign_cells_quantized(emb, cents)
        .groupBy("centroid")
        .agg(F.count("*").alias("n_vectors"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, expect.collect()))


def test_ivf_sq8_stream_equals_from_scratch_build(spark, sf_dir, tmp_path):
    """The streamed composite index (per-batch assign+encode+append,
    split across TWO micro-batch files) must answer the probe exactly
    like a from-scratch one-shot build with the same frozen quantizer
    and scaler — micro-batching is invisible."""
    import os

    from pyspark.sql import functions as F

    from whatsapp_vectordb_spark.operators.ann import (
        assign_cells_quantized,
        ivf_sq8_topk,
        sq8_encode,
        sq8_train,
    )
    from whatsapp_vectordb_spark.streaming.ops import run_ivf_sq8_index_stream

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).select(
        "vec_id", "embedding"
    )
    split_dir = tmp_path / "emb_split"
    split_dir.mkdir()
    for name, pred in (("a", 0), ("b", 1)):
        out = tmp_path / f"w_{name}"
        emb.where((F.col("vec_id") % 4 < 2) == (pred == 0)).coalesce(1).write.parquet(
            str(out)
        )
        part = next(p for p in out.iterdir() if p.name.endswith(".parquet"))
        part.rename(split_dir / f"{name}.parquet")
    idx = str(tmp_path / "ivf_sq8_stream")
    got = [
        (r["vec_id"], r["score_int"])
        for r in run_ivf_sq8_index_stream(
            spark, str(split_dir / "*.parquet"), idx, n_centroids=4
        ).collect()
    ]

    # from-scratch: same persisted centroids, same bootstrap scaler,
    # one-shot assign+encode of the WHOLE corpus, same probe choice
    cents = spark.read.parquet(os.path.join(idx, "centroids"))
    boot = emb.where(F.col("vec_id") < 250)
    mins, deltas = sq8_train(boot)
    codes = sq8_encode(emb, mins, deltas).join(
        assign_cells_quantized(emb, cents).select("vec_id", "centroid"), "vec_id"
    )
    qgrid = (
        emb.where(F.col("vec_id") == 0)
        .select(
            F.transform(
                "embedding",
                lambda x: F.round(x.cast("double") * 1_000_000).cast("long"),
            ).alias("qv")
        )
        .head()["qv"]
    )
    qcent = cents.select(
        "centroid",
        F.transform(
            "cvec", lambda x: F.round(x.cast("double") * 1_000_000).cast("long")
        ).alias("qc"),
    ).collect()
    cells = [
        cid
        for _, cid in sorted(
            (sum((a - b) ** 2 for a, b in zip(qgrid, r["qc"])), int(r["centroid"]))
            for r in qcent
        )[:2]
    ]
    qvec = emb.where(F.col("vec_id") == 0).head()["embedding"]
    expect = [
        (r["vec_id"], r["score_int"])
        for r in ivf_sq8_topk(codes, cells, qvec, deltas, k=10).collect()
    ]
    assert got == expect and len(got) == 10


def test_foreachbatch_upsert_replay_is_idempotent(spark, tmp_path):
    """Exactly-once emulation: foreachBatch may REPLAY a batch after a
    failure (same batch_id). The index upsert keyed on (_ingest_seq =
    batch_id) is replace-by-id, so re-applying an identical batch must be
    a no-op — the correctness contract that makes the sink safe under
    at-least-once delivery."""
    from pyspark.sql import functions as F

    from whatsapp_vectordb_spark.index import VectorIndex

    idx = VectorIndex.create_or_get(
        spark, str(tmp_path), "replay-idx", dimension=4, num_id_buckets=4
    )
    batch = spark.createDataFrame(
        [(f"v{i}", [float(i)] * 4) for i in range(20)], "id string, embedding array<float>"
    )
    idx.upsert(batch.withColumn("_ingest_seq", F.lit(7)))
    first = sorted(map(tuple, idx.read().select("id").collect()))
    idx.upsert(batch.withColumn("_ingest_seq", F.lit(7)))  # replayed batch
    again = sorted(map(tuple, idx.read().select("id").collect()))
    assert first == again
    assert idx.read().count() == 20


def test_watermark_drops_late_rows_across_batches(spark, tmp_path):
    """REAL late-data behavior, which single-batch replays can't exercise.

    Measured engine semantics (Spark 4.1, and the reason this test is
    shaped the way it is): the watermark advanced by batch N takes effect
    as the FILTER for batch N+2, not N+1 — a late row arriving exactly one
    batch after the watermark-setting data is still accepted (and, its
    window being already closed, immediately emitted). Two batches after,
    it is dropped (`numRowsDroppedByWatermark`). So: three files +
    maxFilesPerTrigger=1 → the 9-days-late row in batch 2 must be dropped
    and must not appear in append output."""
    import time as _time
    import uuid

    from pyspark.sql import functions as F

    src = tmp_path / "stream_src"
    src.mkdir()

    def write_file(rows, name):
        df = spark.createDataFrame(rows, "event_id long, ts_s string").select(
            "event_id", F.to_timestamp("ts_s").alias("ts")
        )
        out = tmp_path / f"w_{name}"
        df.coalesce(1).write.parquet(str(out))
        part = next(p for p in out.iterdir() if p.name.endswith(".parquet"))
        part.rename(src / f"{name}.parquet")

    write_file([(i, f"2024-01-10 12:00:{i:02d}") for i in range(10)], "a")
    _time.sleep(1.1)  # mtime order = batch order
    write_file([(50, "2024-01-10 13:00:00")], "b")
    _time.sleep(1.1)
    write_file([(99, "2024-01-01 00:00:00")], "c")  # 9 days late, batch 2

    stream = (
        spark.readStream.schema("event_id long, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    agg = (
        stream.withWatermark("ts", "1 day")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .count()
        .select(F.col("w.start").cast("string").alias("ws"), "count")
    )
    name = f"late_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    dropped = sum(
        so.get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        for so in p["stateOperators"]
    )
    assert dropped == 1  # the late row, and only it
    out = {r["ws"] for r in spark.table(name).collect()}
    assert "2024-01-01 00:00:00" not in out  # its window never materialized


def test_hll_register_stream_equals_batch(spark, sf_dir, tmp_path):
    """Register MAX-merge associativity: the micro-batched estimate must
    equal the one-shot batch sketch exactly, whatever the batch split."""
    import os

    from whatsapp_vectordb_spark.operators.sketches import hll_distinct_estimate
    from whatsapp_vectordb_spark.streaming.ops import run_hll_register_stream

    events_path = os.path.join(sf_dir, "events.parquet")
    got = run_hll_register_stream(spark, events_path, str(tmp_path)).head()
    want = hll_distinct_estimate(
        spark.read.parquet(events_path), "user_id", log2m=10
    ).head()["hll_estimate"]
    assert got["hll_estimate"] == want
    # sanity: estimate within 10% of exact at m=1024
    assert abs(got["hll_estimate"] - got["exact_distinct"]) < 0.1 * got["exact_distinct"]


def test_capstone_invariant_to_micro_batching(spark):
    """The capstone's final state (index membership checksum + serving
    answers) must not depend on HOW the deliveries were micro-batched:
    file-per-trigger (3 batches) and all-files-in-one-trigger (1 batch)
    must produce identical rows — the dedup is insert-if-absent over
    identical payloads, so any split converges to the same index."""
    from whatsapp_vectordb_spark.harness import streaming_pipeline_capstone

    sf = "/root/testdata/sf0.001"
    one_per = sorted(
        map(tuple, streaming_pipeline_capstone(spark, sf, max_files_per_trigger=1).collect())
    )
    all_in_one = sorted(
        map(tuple, streaming_pipeline_capstone(spark, sf, max_files_per_trigger=3).collect())
    )
    assert one_per == all_in_one
    assert len(one_per) == 13  # 4 queries x top-3 + checksum row


def test_winnow_index_stream_invariant_to_micro_batching(spark):
    """The streaming winnow index's pair union must not depend on how the
    corpus was micro-batched — file-per-trigger (3 batches) vs all-in-one
    (1 batch) — and both must equal the one-shot batch operator (the
    registry oracle's form)."""
    from whatsapp_vectordb_spark.harness import (
        _augmented_docs,
        streaming_winnow_index,
    )
    from whatsapp_vectordb_spark.operators.dedup import winnow_duplicate_pairs

    sf = "/root/testdata/sf0.001"
    per_file = sorted(
        map(tuple, streaming_winnow_index(spark, sf, max_files_per_trigger=1).collect())
    )
    one_shot_stream = sorted(
        map(tuple, streaming_winnow_index(spark, sf, max_files_per_trigger=3).collect())
    )
    batch = sorted(
        map(
            tuple,
            winnow_duplicate_pairs(
                _augmented_docs(spark, sf), k=5, w=4, min_shared=2
            ).collect(),
        )
    )
    assert per_file == one_shot_stream == batch
    assert batch  # non-vacuous
