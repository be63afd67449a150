"""Structured Streaming pipelines (extension surface; the reference has no
streaming — SURVEY.md §2.10. These are the streaming twins of the batch
operators in operators/events.py and the ingest pipeline).

Design: every transformation here is also valid on a batch DataFrame —
the functions take any DataFrame (streaming or not) so the same logic is
oracle-checkable in batch and deployable as ``readStream → writeStream``.
Watermarks bound state; output modes are chosen per sink semantics.

Measured watermark-propagation caveat (Spark 4.1, asserted by
tests/test_streaming.py::test_watermark_drops_late_rows_across_batches):
the watermark advanced by batch N becomes the LATE-ROW FILTER only in
batch N+2. A row arriving one batch after the data that advanced the
watermark past it is still accepted — and, its window being already
closed, is emitted immediately in append mode. Pipelines that need a hard
lateness cutoff must therefore not assume the very next batch filters;
bounded replays here are unaffected (single or ordered batches, oracle
compares final state).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from whatsapp_vectordb_spark.session import local_df
from pyspark.sql import functions as F

from whatsapp_vectordb_spark.operators.events import normalize_event_ts


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    group_col: str = "event_type",
) -> DataFrame:
    """Tumbling event-time window counts with late-data tolerance.

    On a stream: state per (window, type) is dropped once the watermark
    passes window end — bounded state at any corpus rate. Works identically
    on a batch frame (watermark is a no-op there).
    """
    src = events
    if events.isStreaming:
        src = events.withWatermark(ts_col, watermark)
    return src.groupBy(F.window(ts_col, window_duration).alias("w"), group_col).agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


def streaming_embed_pipeline(
    lines: DataFrame,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """The reference's embed pipeline (embed/embed.go:85-131) as a stream:
    parse WhatsApp lines → drop unparseable → embed → vector records.
    Each micro-batch is the batch pipeline verbatim; ids are content
    hashes (position ids don't exist on an unbounded stream)."""
    from whatsapp_vectordb_spark.embedder import embed_udf
    from whatsapp_vectordb_spark.functions.text import portable_hash64
    from whatsapp_vectordb_spark.parse import parse_chat_lines

    parsed = parse_chat_lines(lines)
    ok = parsed.where(F.col("parse_ok"))
    return ok.select(
        F.concat(F.lit("vec_"), portable_hash64(F.col("raw")).cast("string")).alias("id"),
        F.col("ts"),
        F.col("sender"),
        F.col("message").alias("text"),
        embed_udf(dim=dim, seed=seed)(F.col("message")).alias("embedding"),
    )


def run_events_hourly_stream(spark, events_path: str, watermark: str = "2 hours") -> DataFrame:
    """Run the events table THROUGH Structured Streaming (parquet file
    source → watermark → tumbling window agg → memory sink, availableNow)
    and return the finished result as a batch DataFrame.

    This is the real streaming engine — incremental state, watermark
    eviction — not the batch twin; on bounded input with a complete sink it
    must produce exactly the batch answer, which the oracle checks.
    """
    import uuid

    import os

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(events_path).schema
    # the streaming file source wants a directory; narrow it back to just
    # this table's file with a glob filter
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", os.path.basename(events_path))
        .parquet(os.path.dirname(events_path))
    )
    stream = normalize_event_ts(stream)
    agg = windowed_event_counts(stream, "1 hour", watermark).select(
        F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        F.col("event_type"),
        F.col("n_events"),
        F.col("sum_value"),
    )
    name = f"events_hourly_{uuid.uuid4().hex[:8]}"
    # bounded replay with a few thousand groups: don't spread streaming
    # state over a default-200-partition shuffle
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    return spark.table(name)


def sessionize_with_state(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Custom stateful streaming operator (``applyInPandasWithState``):
    per-user session counting with a ``gap_minutes`` inactivity rule.

    State per user = (last event ts, session count, event count) — O(1)
    regardless of stream length; each micro-batch sorts only its own rows
    and folds them into the state. Works on a batch frame too (one "batch"
    = whole input), which is how the oracle checks it.

    Expects columns ``user_id`` and ``ts_us`` (event time in epoch micros).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_us = gap_minutes * 60 * 1_000_000
    out_schema = "user_id bigint, n_sessions bigint, n_events bigint"
    state_schema = "last_ts bigint, n_sessions bigint, n_events bigint"

    def fold(key, pdfs, state):
        last_ts, n_sessions, n_events = (
            state.get if state.exists else (None, 0, 0)
        )
        for pdf in pdfs:
            ts = np.sort(pdf["ts_us"].to_numpy())
            if len(ts) == 0:
                continue
            prev = np.concatenate(([last_ts if last_ts is not None else -(1 << 62)], ts[:-1]))
            n_sessions += int((ts - prev > gap_us).sum())
            n_events += len(ts)
            last_ts = int(ts[-1])
        state.update((last_ts, n_sessions, n_events))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_sessions": [n_sessions], "n_events": [n_events]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fold, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def run_sessionized_stream(spark, events_path: str, gap_minutes: int = 30) -> DataFrame:
    """Replay the events table through the stateful sessionizer and return
    the final per-user counts as a batch frame."""
    import os
    import uuid

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(events_path).schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", os.path.basename(events_path))
        .parquet(os.path.dirname(events_path))
    )
    # normalize any ts encoding to TIMESTAMP, then take exact integer epoch
    # micros (unix_micros — no double rounding above 2^53)
    src = normalize_event_ts(stream).select(
        "user_id", F.unix_micros("ts").alias("ts_us")
    )
    out = sessionize_with_state(src, gap_minutes)
    name = f"sessions_{uuid.uuid4().hex[:8]}"
    # each shuffle partition becomes a state-store partition with its own
    # Python state worker; a handful of key groups doesn't need 32 of them
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    # update mode appends one row per (user, batch); keep the final state row
    from pyspark.sql import Window

    final = spark.table(name)
    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        final.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def run_streaming_distinct(spark, events_path: str, watermark: str = "1 day") -> DataFrame:
    """Streaming exact dedup: ``withWatermark + dropDuplicatesWithinWatermark``
    — the streaming twin of ``operators.dedup.exact_duplicates`` for
    unbounded ingest. Dedup state for a key is evicted once the watermark
    passes its last-seen event time, so state stays bounded at any stream
    length; the tradeoff is that a key recurring *after* eviction is
    re-emitted. (Plain ``dropDuplicates`` on a key subset without the event
    -time column would keep every key forever — unbounded state.) On this
    bounded replay the whole table arrives in one micro-batch (single
    parquet file, initial watermark 0), so the output is exactly the
    distinct (user_id, event_type) key set — which the oracle checks."""
    import os
    import uuid

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(events_path).schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", os.path.basename(events_path))
        .parquet(os.path.dirname(events_path))
    )
    stream = normalize_event_ts(stream)
    deduped = (
        stream.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    name = f"distinct_{uuid.uuid4().hex[:8]}"
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            deduped.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    return spark.table(name)


def run_stream_static_enrich(spark, events_path: str, dim_df: DataFrame) -> DataFrame:
    """Stream-static join: the event stream enriched against a broadcast
    dimension table (the canonical streaming-ETL shape: facts stream, dims
    don't). The static side re-resolves per micro-batch; no state needed.
    Returns per-(mktsegment, event_type) counts after full replay."""
    import os
    import uuid

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(events_path).schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", os.path.basename(events_path))
        .parquet(os.path.dirname(events_path))
    )
    enriched = stream.join(
        F.broadcast(dim_df), stream["user_id"] == dim_df["c_custkey"], "inner"
    )
    agg = enriched.groupBy("c_mktsegment", "event_type").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )
    name = f"enrich_{uuid.uuid4().hex[:8]}"
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    return spark.table(name)


def run_stream_stream_join(
    spark,
    events_path: str,
    window_s: int = 300,
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream inner join with watermarks: click events joined to the
    same user's error events within ``window_s`` seconds *after* the click.
    Both sides carry watermarks and the join condition bounds event-time
    distance, so each side's state is droppable once the other side's
    watermark passes — bounded state on unbounded streams. On bounded
    replay the result must equal the batch inequality join (the oracle).
    """
    import os
    import uuid

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(events_path).schema

    def src():
        s = (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", os.path.basename(events_path))
            .parquet(os.path.dirname(events_path))
        )
        return normalize_event_ts(s)

    clicks = (
        src()
        .where(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    errors = (
        src()
        .where(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("error_id"),
            F.col("user_id").alias("e_user"),
            F.col("ts").alias("error_ts"),
        )
        .withWatermark("error_ts", watermark)
    )
    joined = clicks.join(
        errors,
        (F.col("c_user") == F.col("e_user"))
        & (F.col("error_ts") >= F.col("click_ts"))
        & (F.col("error_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {window_s} SECONDS")),
        "inner",
    ).select("click_id", "error_id", F.col("c_user").alias("user_id"))

    name = f"ssj_{uuid.uuid4().hex[:8]}"
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            joined.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    return spark.table(name)


def session_window_agg(
    stream: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """The watermarked NATIVE session-window aggregation applied to a
    (possibly streaming) events frame — factored out of
    ``run_session_window_stream`` so plan audits can assert the
    EventTimeWatermark + SessionWindow nodes without running a stream."""
    stream = normalize_event_ts(stream)
    return (
        stream.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("session_start"),
            F.date_format("w.end", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def run_session_window_stream(
    spark,
    events_path: str,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Replay the events table through a NATIVE streaming session-window
    aggregation (``F.session_window``): per (user, session) counts with
    state-store-merged windows — the engine's own sessionizer, not the
    ``applyInPandasWithState`` custom one (``sessionize_with_state``).
    Sessions merge in the state store as events arrive and are evicted
    once the watermark passes their close; on bounded replay the result
    must equal the batch gaps-and-islands answer, which the oracle checks.
    """
    import os
    import uuid

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(events_path).schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", os.path.basename(events_path))
        .parquet(os.path.dirname(events_path))
    )
    agg = session_window_agg(stream, gap=gap, watermark=watermark)
    name = f"sesswin_{uuid.uuid4().hex[:8]}"
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    return spark.table(name)


def run_streaming_index_upsert(
    lines_stream: DataFrame,
    index,
    dim: int | None = None,
    seed: int = 42,
    checkpoint: str | None = None,
):
    """Streaming index maintenance: the embed stream is upserted into a
    ``VectorIndex`` via ``foreachBatch`` — each micro-batch runs the SAME
    replace-by-id merge as the batch path (``index.upsert``), so a bucketed
    index rewrites only the id-buckets the batch touched. ``_ingest_seq``
    is the micro-batch id: later batches beat earlier ones for the same id
    (and the existing table always loses to the incoming batch), giving
    exactly the Pinecone upsert contract on an unbounded ingest stream
    (reference upsert/upsert.go:113-215 per-vector HTTP upserts, here one
    bounded-rewrite merge per micro-batch).

    Processes everything available (availableNow) and returns the index.
    """
    vec_dim = dim if dim is not None else getattr(index, "dimension", 64)
    vectors = streaming_embed_pipeline(lines_stream, dim=vec_dim, seed=seed)

    def upsert_batch(batch_df: DataFrame, batch_id: int) -> None:
        index.upsert(batch_df.withColumn("_ingest_seq", F.lit(batch_id)))

    writer = vectors.writeStream.foreachBatch(upsert_batch).trigger(availableNow=True)
    if checkpoint is not None:
        writer = writer.option("checkpointLocation", checkpoint)
    q = writer.start()
    q.awaitTermination()
    return index


def run_stream_to_memory(stream_df: DataFrame, query_name: str, output_mode: str = "update"):
    """Helper for tests: sink a streaming frame to an in-memory table and
    return the StreamingQuery (caller awaits + stops)."""
    return (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )


def run_topk_maintenance_stream(
    spark, events_path: str, state_dir: str, k: int = 10
) -> DataFrame:
    """Incrementally-maintained top-k over a stream via ``foreachBatch``:
    each micro-batch computes its own local top-k and merges it into a
    k-row persisted state table — ``state ← top-k(state ∪ top-k(batch))``.
    Ranking on (rounded score DESC, event_id ASC) is a total order, so the
    merge is a semilattice: the final state is identical no matter how the
    stream was micro-batched (asserted against the batch answer by the
    oracle, and under a forced 2-batch split in tests).

    Scale shape: per batch the stream side does one TakeOrderedAndProject
    (no shuffle of the batch), and the state side reads/writes k rows —
    maintenance cost is O(batch + k) regardless of history length. This is
    the streaming materialization pattern for any "current leaderboard"
    query (top sellers, hottest keys, worst latencies)."""
    import os

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(events_path).schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", os.path.basename(events_path))
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.dirname(events_path))
    )
    scored = stream.select(
        "event_id", "user_id", F.round(F.col("value"), 6).alias("score")
    )
    state_path = os.path.join(state_dir, "topk_state")

    def merge_topk(batch_df: DataFrame, batch_id: int) -> None:
        sp = batch_df.sparkSession
        order = [F.col("score").desc(), F.col("event_id").asc()]
        merged = batch_df.orderBy(*order).limit(k)
        if os.path.exists(state_path):
            merged = sp.read.parquet(state_path).unionByName(merged)
        top = merged.orderBy(*order).limit(k)
        # pin before overwriting the directory the plan may be reading
        top = top.localCheckpoint(eager=True)
        top.coalesce(1).write.mode("overwrite").parquet(state_path)

    q = scored.writeStream.foreachBatch(merge_topk).trigger(availableNow=True).start()
    q.awaitTermination()
    return spark.read.parquet(state_path)


def run_ivf_maintenance_stream(
    spark,
    emb_path: str,
    index_dir: str,
    n_centroids: int = 8,
    scale: int = 1_000_000,
) -> DataFrame:
    """Streaming IVF index maintenance: bootstrap a coarse quantizer on the
    history (even ``vec_id``s stand in for "vectors indexed before the
    stream started"), then ingest the live stream (odd ``vec_id``s) through
    ``foreachBatch`` — each micro-batch is assigned to its nearest cell via
    the integer-exact quantized assigner and APPENDED to the persisted
    cells table, exactly how a production IVF stays queryable while data
    arrives (centroids frozen; ``IvfIndex.drift`` decides rebuilds).

    Because per-row assignment is deterministic and appends are
    row-independent, the final cells table is invariant to how the stream
    was micro-batched, and equals a from-scratch assignment of the full
    corpus — which is what the oracle recomputes from the SAME persisted
    centroids. Returns the final per-cell occupancy ``(centroid,
    n_vectors)`` — the index's load-balance/health view.

    Scale shape: the stream side is map-only per batch (broadcast k-row
    centroid table + codegen integer fold); appends touch only the
    arriving rows; the occupancy read is one count-groupBy on the cell id.
    """
    import os

    from whatsapp_vectordb_spark.operators.ann import IvfIndex, assign_cells_quantized

    emb = spark.read.parquet(emb_path).select("vec_id", "embedding")
    bootstrap = emb.where(F.col("vec_id") % 2 == 0)

    built = IvfIndex.build_balanced(bootstrap, n_centroids=n_centroids)
    cents_df = local_df(spark, 
        [(int(i), [float(x) for x in c]) for i, c in enumerate(built.centroids)],
        "centroid bigint, cvec array<double>",
    )
    cents_path = os.path.join(index_dir, "centroids")
    cells_path = os.path.join(index_dir, "cells")
    cents_df.coalesce(1).write.mode("overwrite").parquet(cents_path)
    cents = spark.read.parquet(cents_path)  # assign from the PERSISTED floats

    assign_cells_quantized(bootstrap, cents, scale=scale).select(
        "vec_id", "centroid"
    ).write.mode("overwrite").parquet(cells_path)

    stream = (
        spark.readStream.schema(spark.read.parquet(emb_path).schema)
        .option("pathGlobFilter", os.path.basename(emb_path))
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.dirname(emb_path))
        .select("vec_id", "embedding")
        .where(F.col("vec_id") % 2 == 1)
    )

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        assign_cells_quantized(batch_df, cents, scale=scale).select(
            "vec_id", "centroid"
        ).write.mode("append").parquet(cells_path)

    q = stream.writeStream.foreachBatch(ingest).trigger(availableNow=True).start()
    q.awaitTermination()

    return (
        spark.read.parquet(cells_path)
        .groupBy("centroid")
        .agg(F.count("*").alias("n_vectors"))
        .select(F.col("centroid").cast("long").alias("centroid"), "n_vectors")
    )


def run_ivf_sq8_index_stream(
    spark,
    emb_path: str,
    index_dir: str,
    n_centroids: int = 8,
    scale: int = 1_000_000,
    nprobe: int = 2,
    k: int = 10,
    boot_below: int = 250,
) -> DataFrame:
    """Streaming maintenance of the COMPOSITE IVF-SQ8 index — the
    foreachBatch twin of ``IvfSq8Index.add_batch`` and the composition
    of the two existing streaming index rows (``streaming_ivf_
    maintenance``: frozen quantizer + integer-exact assignment;
    ``streaming_sq8_index``: frozen scaler + map-only encode).

    Bootstrap (``vec_id < boot_below``): fit the coarse quantizer
    (centroids PERSISTED — the one carve-out, exactly as the IVF
    maintenance row), train the SQ8 scaler (analytic — the oracle
    recomputes it from the bootstrap rows), encode+assign+write the
    bootstrap codes ``partitionBy(centroid)``. Stream (the rest,
    file-per-trigger): each micro-batch is a map-only
    assign(integer-exact) + encode + partitioned append under its own
    ``batch_id=N`` dir — the store is never read during ingest, appends
    touch only the arriving rows' cells, and per-row determinism makes
    the final codes tree invariant to micro-batching (≡ a from-scratch
    build, which is what the oracle replays). Query time: probe the
    ``nprobe`` cells nearest the stored query vector by the SAME
    quantized integer metric, then the integer ADC over only those
    cells' codes — file-level pruning on the centroid partition column
    across every batch directory."""
    import os

    from whatsapp_vectordb_spark.operators.ann import (
        IvfIndex,
        _cluster_for_write,
        assign_cells_quantized,
        ivf_sq8_topk,
        sq8_encode,
        sq8_train,
    )

    emb = spark.read.parquet(emb_path).select("vec_id", "embedding")
    boot = emb.where(F.col("vec_id") < boot_below)

    built = IvfIndex.build_balanced(boot, n_centroids=n_centroids)
    cents_df = local_df(spark, 
        [(int(i), [float(x) for x in c]) for i, c in enumerate(built.centroids)],
        "centroid bigint, cvec array<double>",
    )
    cents_path = os.path.join(index_dir, "centroids")
    codes_dir = os.path.join(index_dir, "codes")
    cents_df.coalesce(1).write.mode("overwrite").parquet(cents_path)
    cents = spark.read.parquet(cents_path)  # assign from the PERSISTED floats

    mins, deltas = sq8_train(boot)  # frozen scaler; analytic, oracle-replayed

    def encode_assign(df: DataFrame) -> DataFrame:
        return sq8_encode(df, mins, deltas).join(
            assign_cells_quantized(df, cents, scale=scale).select(
                "vec_id", "centroid"
            ),
            "vec_id",
        )

    _cluster_for_write(encode_assign(boot)).write.partitionBy("centroid").mode(
        "overwrite"
    ).parquet(os.path.join(codes_dir, "batch_id=-1"))

    stream = (
        spark.readStream.schema(spark.read.parquet(emb_path).schema)
        .option("pathGlobFilter", os.path.basename(emb_path))
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.dirname(emb_path))
        .select("vec_id", "embedding")
        .where(F.col("vec_id") >= boot_below)
    )

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        _cluster_for_write(encode_assign(batch_df)).write.partitionBy(
            "centroid"
        ).mode("overwrite").parquet(
            os.path.join(codes_dir, f"batch_id={batch_id}")
        )

    q = stream.writeStream.foreachBatch(ingest).trigger(availableNow=True).start()
    q.awaitTermination()

    # probe-cell choice by the SAME Spark-quantized integer metric the
    # assignment (and the oracle) uses — F.round is HALF_UP, Python
    # round is banker's, so the quantization stays JVM-side
    qgrid = (
        emb.where(F.col("vec_id") == 0)
        .select(
            F.transform(
                "embedding",
                lambda x: F.round(x.cast("double") * scale).cast("long"),
            ).alias("qv")
        )
        .head()["qv"]
    )
    qcent = cents.select(
        "centroid",
        F.transform(
            "cvec", lambda x: F.round(x.cast("double") * scale).cast("long")
        ).alias("qc"),
    ).collect()
    ranked = sorted(
        (sum((a - b) ** 2 for a, b in zip(qgrid, r["qc"])), int(r["centroid"]))
        for r in qcent
    )
    cells = [cid for _, cid in ranked[:nprobe]]

    qvec = emb.where(F.col("vec_id") == 0).head()["embedding"]
    codes = spark.read.parquet(codes_dir).drop("batch_id")
    return ivf_sq8_topk(codes, cells, qvec, deltas, k=k)


def run_drift_monitor_stream(
    spark,
    events_path: str,
    state_dir: str,
    bin_scale: int = 10,
) -> DataFrame:
    """Streaming drift monitor: the CURRENT population's histogram sketch
    is accumulated incrementally — each micro-batch appends its own
    (group, bin, count) rows via ``foreachBatch``, and the merged sketch
    is a sum-groupBy over the appended rows. Because histogram sketches
    are sum-mergeable, the final PSI is invariant to how the stream was
    micro-batched and equals the batch computation exactly (the oracle).

    Population split mirrors the batch ``events_value_drift`` query:
    reference = ``user_id < 750`` (batch-computed once, the "last
    snapshot"), current = ``user_id >= 750`` with ``value × 1.25`` (the
    drifted live stream).

    Scale shape: per batch one count-groupBy over the batch's rows into
    ~thousands of (group, bin) cells; state grows by cells-per-batch, not
    rows; the final merge + PSI join touches sketch cells only.
    """
    import os

    from whatsapp_vectordb_spark.operators.sketches import (
        population_stability_from_sketches,
    )

    events = spark.read.parquet(events_path)
    ref = events.where(F.col("user_id") < 750).select(
        F.col("event_type").alias("g"),
        F.floor(F.col("value").cast("double") * bin_scale).cast("long").alias("bin"),
    ).groupBy("g", "bin").agg(F.count("*").alias("c_r"))

    schema = events.schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", os.path.basename(events_path))
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.dirname(events_path))
        .where(F.col("user_id") >= 750)
        .select(
            F.col("event_type").alias("g"),
            F.floor(F.col("value").cast("double") * 1.25 * bin_scale)
            .cast("long")
            .alias("bin"),
        )
    )
    cells_path = os.path.join(state_dir, "drift_cells")

    def accumulate(batch_df: DataFrame, batch_id: int) -> None:
        # foreachBatch is at-least-once: key every cell by batch_id and
        # overwrite ONLY that batch's partition (dynamic partitionOverwrite),
        # so a retried micro-batch replaces its cells instead of
        # double-counting, and a reused state_dir can't leak stale cells
        # into a different batch's id space.
        (
            batch_df.groupBy("g", "bin")
            .agg(F.count("*").alias("c"))
            .withColumn("batch_id", F.lit(batch_id).cast("long"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(cells_path)
        )

    q = stream.writeStream.foreachBatch(accumulate).trigger(availableNow=True).start()
    q.awaitTermination()

    # explicit schema: an all-empty stream writes no partition files at all
    # (partitioned empty writes carry no footer), so inference would fail
    cur = (
        spark.read.schema("g string, bin long, c long, batch_id long")
        .parquet(cells_path)
        .groupBy("g", "bin")
        .agg(F.sum("c").alias("c_c"))
    )
    return population_stability_from_sketches(ref, cur)


def run_hll_register_stream(
    spark,
    events_path: str,
    state_dir: str,
    log2m: int = 10,
) -> DataFrame:
    """Streaming HLL maintenance: each micro-batch writes its own SPARSE
    register rows (``bucket, rho_max``) keyed by batch_id; the live
    estimate at any point is a MAX-merge over all appended rows. Because
    registers are MAX-mergeable, the final estimate is invariant to how
    the stream was micro-batched and equals the one-shot batch sketch
    exactly — the oracle is literally the batch ``events_hll_users``
    SQL. This is how a 100 TB ingest keeps approximate distinct counts
    current: per-batch register deltas, never a rescan.

    Sink idempotence mirrors the drift monitor: cells partition by
    batch_id with dynamic overwrite, so an at-least-once retry replaces
    its own partition instead of inflating ρ rows (MAX would mask
    duplicates anyway — belt and braces).
    """
    import os

    from whatsapp_vectordb_spark.operators.sketches import (
        hll_estimate_from_sparse,
        hll_grouped_registers,
    )

    events = spark.read.parquet(events_path)
    schema = events.schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", os.path.basename(events_path))
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.dirname(events_path))
        .select("user_id")
    )
    cells_path = os.path.join(state_dir, "hll_cells")

    def accumulate(batch_df: DataFrame, batch_id: int) -> None:
        (
            hll_grouped_registers(batch_df, "user_id", [], log2m=log2m)
            .withColumn("batch_id", F.lit(batch_id).cast("long"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(cells_path)
        )

    q = stream.writeStream.foreachBatch(accumulate).trigger(availableNow=True).start()
    q.awaitTermination()

    merged = (
        spark.read.schema("bucket long, rho_max int, batch_id long")
        .parquet(cells_path)
        .groupBy("bucket")
        .agg(F.max("rho_max").alias("rho_max"))
        .withColumn("_all", F.lit(1))
    )
    est = hll_estimate_from_sparse(merged, ["_all"], log2m=log2m).select(
        "hll_estimate"
    )
    exact = events.agg(F.countDistinct("user_id").alias("exact_distinct"))
    return est.crossJoin(exact)


def run_knn_serving_stream(
    spark,
    emb_path: str,
    query_drop_dir: str,
    out_dir: str,
    k: int = 3,
    round_to: int = 6,
) -> DataFrame:
    """Online kNN SERVING: queries stream in, the vector index is static —
    the streaming twin of the reference's query loop (main.go:95: embed a
    query, ask the index, print matches; here queries arrive continuously
    and answers land in a sink).

    Each micro-batch (one dropped query file per trigger) runs the SAME
    exact batched top-k plan as the batch engine — broadcast the (tiny)
    batch of queries, score the static index map-side, rank per query —
    and writes its answers under ``batch_id=`` with dynamic partition
    overwrite, so a retried batch replaces itself (idempotent replay).
    After full replay the answer set must be bit-equal to the one-shot
    batch ``topk_batched`` over the same queries, which the oracle checks.

    Scale shape: per-batch cost is one scan of the index (swap the static
    side for an IVF-pruned probe for sublinear serving); no state grows
    with stream length — the sink is append-only keyed by batch.
    """
    from whatsapp_vectordb_spark.operators.search import topk_batched

    stream = spark.readStream.schema(
        "query_id bigint, query_vec array<float>"
    ).option("maxFilesPerTrigger", "1").parquet(query_drop_dir)

    def serve(batch_df: DataFrame, batch_id: int) -> None:
        sp = batch_df.sparkSession
        static = sp.read.parquet(emb_path)
        answers = topk_batched(static, batch_df, k=k, round_to=round_to)
        (
            answers.withColumn("batch_id", F.lit(batch_id).cast("long"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out_dir)
        )

    q = stream.writeStream.foreachBatch(serve).trigger(availableNow=True).start()
    q.awaitTermination()
    return spark.read.parquet(out_dir).drop("batch_id")
