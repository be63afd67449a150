from __future__ import annotations

import pytest

from whatsapp_vectordb_spark.multimodal import (
    MEDIA_SCHEMA,
    DecodeUnavailable,
    extract_media_features,
    frame_sample_plan,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        ("m1", "image", b"\x89PNG fake bytes", "image/png", 64, 64, None),
        ("m2", "image", b"\x89PNG fake bytes", "image/png", 64, 64, None),  # same content
        ("m3", "audio", b"RIFF fake wav", "audio/wav", None, None, 2500),
        ("m4", "video", b"\x00\x00ftyp fake mp4", "video/mp4", 1920, 1080, 3500),
        ("m5", "image", None, "image/png", None, None, None),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_extract_features_deterministic(media):
    feats = {r["media_id"]: r for r in extract_media_features(media, dim=16).collect()}
    assert len(feats) == 5
    assert feats["m1"]["embedding"] == feats["m2"]["embedding"]  # same bytes → same vector
    assert feats["m1"]["content_sha"] == feats["m2"]["content_sha"]
    assert feats["m3"]["embedding"] != feats["m1"]["embedding"]
    assert feats["m5"]["embedding"] is None  # null content flows through
    assert feats["m4"]["n_bytes"] == len(b"\x00\x00ftyp fake mp4")


def test_real_codec_path_raises(media):
    with pytest.raises(Exception) as exc_info:
        extract_media_features(media, deterministic_fake=False).collect()
    assert "DecodeUnavailable" in str(exc_info.value) or "codecs not available" in str(
        exc_info.value
    )


def test_frame_sample_plan(media):
    frames = frame_sample_plan(media, every_ms=1000).collect()
    got = [(r["media_id"], r["frame_ts_ms"]) for r in frames]
    assert got == [("m4", 0), ("m4", 1000), ("m4", 2000), ("m4", 3000)]


def test_chunk_features_match_plan_and_are_deterministic(spark, documents):
    from whatsapp_vectordb_spark.harness import _media_df
    from whatsapp_vectordb_spark.multimodal import chunk_media_plan, extract_chunk_features

    media = _media_df(spark, "/root/testdata/sf0.001")
    plan_n = chunk_media_plan(media, chunk_ms=2000, modality="audio").count()
    feats = extract_chunk_features(media, chunk_ms=2000, modality="audio")
    rows = feats.collect()
    assert len(rows) == plan_n  # one embedding per planned chunk
    assert all(len(r["embedding"]) == 64 for r in rows)
    # chunk offset is part of the seed: chunks of the same item differ
    by_media = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(tuple(r["embedding"][:4]))
    multi = [v for v in by_media.values() if len(v) > 1]
    assert multi and all(len(set(v)) == len(v) for v in multi)
    # deterministic across recompute
    again = {(r["media_id"], r["chunk_start_ms"]): tuple(r["embedding"]) for r in feats.collect()}
    first = {(r["media_id"], r["chunk_start_ms"]): tuple(r["embedding"]) for r in rows}
    assert again == first
