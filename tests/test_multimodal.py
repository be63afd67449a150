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


# --------------------------------------------------------------------------
# Round 6: the decode seam with a REAL decoder (pure-numpy netpbm pixels —
# no codec libraries needed), proving the mapInPandas path isn't
# fake-embedder-shaped: actual pixel values flow through the same plan.
# --------------------------------------------------------------------------


def _ppm_bytes(w: int, h: int, fn) -> bytes:
    """Synthesize a real binary P6 image; fn(x, y) -> (r, g, b) in 0..255."""
    header = f"P6\n# test image\n{w} {h}\n255\n".encode()
    px = bytearray()
    for y in range(h):
        for x in range(w):
            px.extend(fn(x, y))
    return header + bytes(px)


def test_netpbm_decoder_decodes_real_pixels():
    import numpy as np

    from whatsapp_vectordb_spark.multimodal import _parse_netpbm, netpbm_image_decoder

    # constant mid-gray: luma known exactly
    flat = _ppm_bytes(8, 4, lambda x, y: (128, 128, 128))
    gray = _parse_netpbm(flat)
    assert gray.shape == (4, 8)
    assert np.allclose(gray, 128 / 255, atol=1e-6)

    # gradient image: pooled features must be monotonically increasing —
    # only true if the decoder read the actual pixel ordering
    grad = _ppm_bytes(64, 1, lambda x, y: (4 * x, 4 * x, 4 * x))
    feats = netpbm_image_decoder(dim=8)(grad)
    assert len(feats) == 8
    assert all(a < b for a, b in zip(feats, feats[1:]))

    # P5 grayscale path
    p5 = b"P5\n4 2\n255\n" + bytes(range(8))
    g5 = _parse_netpbm(p5)
    assert g5.shape == (2, 4) and abs(g5[1, 3] - 7 / 255) < 1e-6

    assert netpbm_image_decoder(dim=8)(None) is None


def test_extract_features_with_real_decoder(spark):
    import numpy as np

    from whatsapp_vectordb_spark.multimodal import netpbm_image_decoder

    dark = _ppm_bytes(16, 16, lambda x, y: (10, 10, 10))
    light = _ppm_bytes(16, 16, lambda x, y: (240, 240, 240))
    rows = [
        ("p1", "image", dark, "image/x-portable-pixmap", 16, 16, None),
        ("p2", "image", light, "image/x-portable-pixmap", 16, 16, None),
        ("p3", "image", None, "image/x-portable-pixmap", None, None, None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = extract_media_features(media, dim=8, decoder=netpbm_image_decoder(8))
    feats = {r["media_id"]: r for r in out.collect()}
    # both are constant images → unit-normalized features identical per
    # component; but the decoder saw REAL distinct pixels (shas differ)
    assert feats["p3"]["embedding"] is None
    assert feats["p1"]["content_sha"] != feats["p2"]["content_sha"]
    v1 = np.array(feats["p1"]["embedding"])
    v2 = np.array(feats["p2"]["embedding"])
    assert np.allclose(np.linalg.norm(v1), 1.0, atol=1e-5)
    assert np.allclose(v1, v2, atol=1e-5)  # normalization removes brightness
    # decoder path must NOT equal the fake path (different algorithms)
    fake = {r["media_id"]: r for r in extract_media_features(media, dim=8).collect()}
    assert fake["p1"]["embedding"] != feats["p1"]["embedding"]


def test_pil_decoder_unavailable_without_pil():
    from whatsapp_vectordb_spark.multimodal import pil_image_decoder

    try:
        import PIL  # noqa: F401

        pytest.skip("PIL present in this environment")
    except ImportError:
        pass
    with pytest.raises(DecodeUnavailable):
        pil_image_decoder(dim=8)


def test_chunk_features_with_real_decoder(spark):
    from whatsapp_vectordb_spark.multimodal import extract_chunk_features

    rows = [("a1", "audio", bytes(range(256)) * 8, "audio/raw", None, None, 4000)]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)

    def chunk_decoder(content, start_ms, end_ms):
        # a real chunk decoder seeks inside the payload by offset; here:
        # mean byte value of the chunk's byte-range, as a 2-dim feature
        if content is None:
            return None
        n = len(content)
        a, b = (start_ms * n) // 4000, (end_ms * n) // 4000
        seg = content[a:max(b, a + 1)]
        m = sum(seg) / len(seg) / 255.0
        return [float(m), float(start_ms) / 4000.0]

    out = extract_chunk_features(
        media, chunk_ms=2000, modality="audio", decoder=chunk_decoder
    ).collect()
    got = {(r["chunk_start_ms"], r["chunk_end_ms"]): r["embedding"] for r in out}
    assert set(got) == {(0, 2000), (2000, 4000)}
    # second component encodes the offset the decoder received
    assert got[(0, 2000)][1] == 0.0 and got[(2000, 4000)][1] == 0.5


def test_pil_decoder_decodes_when_available(spark):
    # the inverse of test_pil_decoder_unavailable_without_pil: where PIL
    # IS installed, the decoder must produce a unit-norm dim-vector from a
    # real encoded image and plug into extract_media_features unchanged
    pytest.importorskip("PIL")
    import io

    from PIL import Image

    from whatsapp_vectordb_spark.multimodal import (
        extract_media_features,
        pil_image_decoder,
    )

    buf = io.BytesIO()
    Image.frombytes("L", (8, 8), bytes(range(64))).save(buf, format="PNG")
    rows = [("p1", "image", buf.getvalue(), "image/png", 8, 8, None)]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = extract_media_features(media, decoder=pil_image_decoder(dim=16)).collect()
    emb = out[0]["embedding"]
    assert len(emb) == 16
    assert abs(sum(x * x for x in emb) - 1.0) < 1e-5  # L2-normalized
    assert emb == sorted(emb)  # gradient image -> monotone pooled means
