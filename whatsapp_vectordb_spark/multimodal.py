"""Multimodal column plumbing (extension surface, BASELINE.json north star).

Images/audio/video are opaque ``binary`` columns with typed metadata
structs, flowing through the same vector-index pipeline as text: decode →
feature-extract → embed → index. The Spark-side plumbing (schemas, Arrow
batch shapes, mapInPandas signatures, partitioning) is real and tested;
the *codec* step is stubbed (no image/audio libraries in this
environment) behind ``DecodeUnavailable`` plus a deterministic fake used
by tests — swapping in PIL/librosa changes one function, not the plan.

Scale notes: binary payloads make rows wide — ``maxRecordsPerBatch`` must
cap Arrow batch bytes, and the decode stage should run *after* any filter
(predicate pushdown keeps undecoded bytes out of Python entirely). The
media table partitions by modality so single-modality pipelines prune.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("modality", StringType(), False),  # image | audio | video
        StructField("content", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("modality", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("content_sha", StringType(), True),
        StructField("embedding", ArrayType(FloatType()), True),
    ]
)


class DecodeUnavailable(NotImplementedError):
    """Raised by the real-codec path: media codecs are not installed in
    this environment. Use ``deterministic_fake=True`` (tests) or swap in
    a real decoder."""


def _fake_decode_embed(content: bytes | None, dim: int) -> list[float] | None:
    """Deterministic stand-in for decode→feature-extract: bytes → seeded
    unit vector. Keeps the full pipeline runnable and exactly testable."""
    if content is None:
        return None
    digest = hashlib.blake2b(content, digest_size=8).digest()
    rng = np.random.default_rng(int.from_bytes(digest, "big"))
    v = rng.standard_normal(dim)
    n = np.linalg.norm(v)
    return (v / n).astype(np.float32).tolist() if n > 0 else None


# --------------------------------------------------------------------------
# Pluggable decoders — the proof the seam isn't fake-embedder-shaped.
# TWO decoder contracts, matching the two extraction granularities:
#   * media-level (``extract_media_features``): picklable
#     ``bytes | None -> list[float] | None`` — whole payload in, features out;
#   * chunk-level (``extract_chunk_features``): picklable
#     ``(bytes | None, start_ms: int, end_ms: int) -> list[float] | None`` —
#     the codec owns seeking/framing inside the payload, so it receives the
#     chunk window explicitly.
# Both ship to executors inside the mapInPandas closure. Provided media-level
# decoders: a REAL pure-numpy netpbm pixel decoder that works in this
# container, and a PIL-backed one gated behind import-try.
# --------------------------------------------------------------------------


def _parse_netpbm(content: bytes) -> np.ndarray:
    """Decode binary netpbm (P5 grayscale / P6 RGB, maxval ≤ 255) to a
    float32 grayscale matrix in [0, 1]. A genuine pixel decoder in ~30
    lines of numpy — no external codec libraries."""
    if not content.startswith((b"P5", b"P6")):
        raise ValueError("not a binary netpbm (P5/P6) payload")
    rgb = content[:2] == b"P6"
    # header: magic, width, height, maxval — whitespace-separated tokens,
    # '#' comments run to end-of-line; pixel data starts after the single
    # whitespace byte following maxval
    tokens, pos = [], 2
    while len(tokens) < 3:
        while pos < len(content) and content[pos : pos + 1].isspace():
            pos += 1
        if content[pos : pos + 1] == b"#":
            while pos < len(content) and content[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(content) and not content[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(content[start:pos]))
    pos += 1  # the single whitespace after maxval
    w, h, maxval = tokens
    if maxval > 255:
        raise ValueError("16-bit netpbm not supported")
    n_ch = 3 if rgb else 1
    px = np.frombuffer(content, dtype=np.uint8, count=w * h * n_ch, offset=pos)
    px = px.reshape(h, w, n_ch).astype(np.float32) / maxval
    # ITU-R BT.601 luma for RGB
    return px @ np.array([0.299, 0.587, 0.114], np.float32) if rgb else px[:, :, 0]


def netpbm_image_decoder(dim: int = 64):
    """Real image decoder for the seam: decode P5/P6 pixels, average-pool
    the flattened grayscale into ``dim`` buckets, L2-normalize. Returns a
    closure suitable for ``extract_media_features(..., decoder=...)``."""

    def decode(content: bytes | None) -> list[float] | None:
        if content is None:
            return None
        gray = _parse_netpbm(content).ravel()
        if gray.size == 0:
            return None
        # average-pool into dim buckets (pad the tail bucket by repeat)
        idx = np.linspace(0, gray.size, dim + 1).astype(np.int64)
        pooled = np.array(
            [gray[a:b].mean() if b > a else gray[min(a, gray.size - 1)] for a, b in zip(idx[:-1], idx[1:])],
            np.float32,
        )
        n = float(np.linalg.norm(pooled))
        return (pooled / n).astype(np.float32).tolist() if n > 0 else pooled.tolist()

    return decode


def pil_image_decoder(dim: int = 64, side: int = 8):
    """PIL-backed decoder (JPEG/PNG/...): grayscale-resize to side×side,
    flatten-pool to ``dim``. Raises ``DecodeUnavailable`` at build time if
    PIL is not installed (it is not in this container — the netpbm decoder
    above is the in-container real path)."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise DecodeUnavailable("PIL not installed; use netpbm_image_decoder") from e
    import io

    def decode(content: bytes | None) -> list[float] | None:
        if content is None:
            return None
        from PIL import Image as _I

        gray = np.asarray(
            _I.open(io.BytesIO(content)).convert("L").resize((side, side)),
            np.float32,
        ).ravel() / 255.0
        idx = np.linspace(0, gray.size, dim + 1).astype(np.int64)
        # empty-bucket guard (dim > side²): repeat the boundary pixel like
        # the netpbm twin, never a NaN mean over an empty slice
        pooled = np.array(
            [gray[a:b].mean() if b > a else gray[min(a, gray.size - 1)] for a, b in zip(idx[:-1], idx[1:])],
            np.float32,
        )
        n = float(np.linalg.norm(pooled))
        return (pooled / n).astype(np.float32).tolist() if n > 0 else pooled.tolist()

    return decode


def extract_media_features(
    media: DataFrame,
    dim: int = 64,
    deterministic_fake: bool = True,
    decoder=None,
) -> DataFrame:
    """mapInPandas decode/feature-extract stage: MEDIA_SCHEMA →
    FEATURE_SCHEMA. One Arrow batch per Python hop; binary payloads never
    leave the executor. ``decoder`` (a picklable ``bytes -> list[float]``
    callable, e.g. ``netpbm_image_decoder(dim)``) takes precedence; else
    the deterministic fake; else ``DecodeUnavailable`` (the codec slot)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder is None and not deterministic_fake:
                raise DecodeUnavailable(
                    "media codecs not available; install a decoder or use deterministic_fake"
                )
            embed = decoder if decoder is not None else (lambda b: _fake_decode_embed(b, dim))
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": content.map(lambda b: len(b) if b is not None else None),
                    "content_sha": content.map(
                        lambda b: hashlib.sha256(b).hexdigest() if b is not None else None
                    ),
                    "embedding": content.map(embed),
                }
            )

    cols = [f.name for f in MEDIA_SCHEMA.fields]
    present = [c for c in cols if c in media.columns]
    return media.select(*present).mapInPandas(extract, schema=FEATURE_SCHEMA)


def resize_dims_plan(
    media: DataFrame,
    max_side: int = 512,
) -> DataFrame:
    """Image resize *planning*: target dimensions preserving aspect ratio,
    bounded by ``max_side`` (never upscaled). Pure Catalyst over the typed
    metadata — the pixel resample itself is the stubbed codec step, which
    receives (content, target_w, target_h) per row. Planning on metadata
    keeps undecoded bytes out of the decision entirely."""
    w, h = F.col("width").cast("double"), F.col("height").cast("double")
    scale = F.least(F.lit(1.0), max_side / F.greatest(w, h))
    return (
        media.where(F.col("modality") == "image")
        .where(F.col("width").isNotNull() & F.col("height").isNotNull())
        .select(
            "media_id",
            F.col("width"),
            F.col("height"),
            F.round(w * scale).cast("int").alias("target_w"),
            F.round(h * scale).cast("int").alias("target_h"),
        )
    )


def chunk_media_plan(
    media: DataFrame,
    chunk_ms: int = 2000,
    modality: str = "audio",
) -> DataFrame:
    """Fixed-duration chunking *plan* for audio/video: one row per
    ``chunk_ms`` window with clamped end (the waveform split itself is the
    stubbed codec step). Pure Catalyst sequence-explode, like
    ``frame_sample_plan`` — fan-out happens JVM-side before any Python."""
    start = F.explode(
        F.sequence(F.lit(0).cast("long"), F.col("duration_ms") - 1, F.lit(chunk_ms))
    ).alias("chunk_start_ms")
    return (
        media.where(F.col("modality") == modality)
        # > 0: duration_ms <= 0 would make sequence(0, -1, step) throw
        .where(F.col("duration_ms") > 0)
        .select("media_id", "duration_ms", start)
        .select(
            "media_id",
            "chunk_start_ms",
            F.least(F.col("chunk_start_ms") + chunk_ms, F.col("duration_ms")).alias(
                "chunk_end_ms"
            ),
        )
    )


def frame_sample_plan(
    media: DataFrame,
    every_ms: int = 1000,
) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled timestamp
    (frame decode itself is the stubbed codec step). Pure Catalyst:
    sequence() explodes timestamps JVM-side, so the fan-out happens before
    any Python stage and partitions stay balanced by frame count."""
    return (
        media.where(F.col("modality") == "video")
        # > 0: duration_ms <= 0 would make sequence(0, -1, step) throw
        .where(F.col("duration_ms") > 0)
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )


def extract_chunk_features(
    media: DataFrame,
    chunk_ms: int = 2000,
    dim: int = 64,
    modality: str = "audio",
    deterministic_fake: bool = True,
    decoder=None,
) -> DataFrame:
    """Chunk-LEVEL feature extraction: one embedding per ``chunk_ms``
    window of each audio/video item — the retrieval granularity real
    media search needs (a 3-second match inside an hour of audio should
    surface that hour). Output: ``(media_id, chunk_start_ms,
    chunk_end_ms, embedding)``.

    The chunk fan-out happens JVM-side (sequence-explode with the binary
    payload carried through — no join back to content), then ONE
    mapInPandas hop embeds every chunk in the batch. The codec is the
    deterministic fake (bytes + chunk offset → seeded unit vector); a real
    decoder slots into the same per-chunk signature.
    """
    fan = (
        media.where(F.col("modality") == modality)
        # > 0, not just NOT NULL: duration_ms <= 0 makes sequence(0, -1, step)
        # throw "Illegal sequence boundaries" and fail the whole job
        .where(F.col("duration_ms") > 0)
        .select(
            "media_id",
            "content",
            "duration_ms",
            F.explode(
                F.sequence(
                    F.lit(0).cast("long"), F.col("duration_ms") - 1, F.lit(chunk_ms)
                )
            ).alias("chunk_start_ms"),
        )
        .select(
            "media_id",
            "content",
            "chunk_start_ms",
            F.least(
                F.col("chunk_start_ms") + chunk_ms, F.col("duration_ms")
            ).alias("chunk_end_ms"),
        )
    )
    out_schema = StructType(
        [
            StructField("media_id", StringType(), False),
            StructField("chunk_start_ms", LongType(), False),
            StructField("chunk_end_ms", LongType(), False),
            StructField("embedding", ArrayType(FloatType()), True),
        ]
    )

    def embed_chunks(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder is None and not deterministic_fake:
                raise DecodeUnavailable(
                    "media codecs not available; install a decoder or use deterministic_fake"
                )
            if decoder is not None:
                # real chunk decoder: (content, start_ms, end_ms) — it
                # seeks inside the payload itself (a codec owns framing)
                embs = [
                    decoder(bytes(c) if c is not None else None, int(s), int(e))
                    for c, s, e in zip(
                        pdf["content"], pdf["chunk_start_ms"], pdf["chunk_end_ms"]
                    )
                ]
            else:
                embs = [
                    _fake_decode_embed(
                        (bytes(c) + int(s).to_bytes(8, "big")) if c is not None else None,
                        dim,
                    )
                    for c, s in zip(pdf["content"], pdf["chunk_start_ms"])
                ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "chunk_start_ms": pdf["chunk_start_ms"].astype("int64"),
                    "chunk_end_ms": pdf["chunk_end_ms"].astype("int64"),
                    "embedding": embs,
                }
            )

    return fan.mapInPandas(embed_chunks, schema=out_schema)


def scene_cut_stats(
    chunks: DataFrame,
    threshold: float = 0.1,
    id_col: str = "media_id",
    order_col: str = "chunk_start_ms",
    vec_col: str = "embedding",
) -> DataFrame:
    """Shot-boundary (scene-cut) detection over per-chunk features: a cut
    is a chunk whose cosine similarity to the PREVIOUS chunk of the same
    asset falls below ``threshold`` — the classic content-based shot
    detector, run on whatever the (stubbed) codec extracted per chunk.
    Output per asset: ``(id, n_chunks, n_cuts, cut_ms_checksum)`` where
    the checksum sums the cut chunks' start offsets, pinning WHICH chunks
    cut, not just how many.

    Determinism: similarity rounds to 6 decimals BEFORE the threshold
    compare, so boundary chunks classify identically in every engine.
    Scale shape: one shuffle keyed by asset for the lag() window (an
    asset's chunks are a bounded sequence — hours of video at 500 ms
    chunks is ~10⁴ rows per task, never corpus-scale), then a per-asset
    aggregate on the same key, which reuses the exchange.
    """
    from pyspark.sql import Window

    from whatsapp_vectordb_spark.functions.vector import cosine_similarity

    w = Window.partitionBy(id_col).orderBy(order_col)
    sim = F.round(
        cosine_similarity(F.col(vec_col), F.lag(vec_col).over(w)), 6
    )
    scored = chunks.select(
        F.col(id_col), F.col(order_col).alias("_ms"), sim.alias("_sim")
    )
    is_cut = F.col("_sim") < threshold  # NULL (first chunk) → not a cut
    return scored.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_chunks"),
        F.sum(F.when(is_cut, 1).otherwise(0)).cast("long").alias("n_cuts"),
        F.sum(F.when(is_cut, F.col("_ms")).otherwise(0))
        .cast("long")
        .alias("cut_ms_checksum"),
    )
