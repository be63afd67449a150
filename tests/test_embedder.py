from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from whatsapp_vectordb_spark.embedder import embed_text, with_embedding
from whatsapp_vectordb_spark.functions.vector import cosine_similarity


def _cos(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return dot / (na * nb)


def test_deterministic_and_unit_norm():
    a = embed_text("hello world this is a test", dim=64)
    b = embed_text("hello world this is a test", dim=64)
    assert a == b
    assert math.sqrt(sum(x * x for x in a)) == pytest.approx(1.0, abs=1e-5)


def test_empty_and_none_are_null():
    assert embed_text(None) is None
    assert embed_text("") is None
    assert embed_text("!!! ...") is None


def test_near_duplicates_score_higher_than_unrelated():
    base = "the quick brown fox jumps over the lazy dog near the river bank"
    near = "the quick brown fox jumps over the lazy dog near the river"
    far = "quarterly revenue grew despite persistent supply chain disruptions worldwide"
    assert _cos(embed_text(base), embed_text(near)) > _cos(embed_text(base), embed_text(far))
    assert _cos(embed_text(base), embed_text(near)) > 0.5


def test_udf_matches_scalar(spark, documents):
    sample = documents.limit(20)
    got = with_embedding(sample, "text", "emb").select("doc_id", "text", "emb").collect()
    assert len(got) == 20
    for r in got:
        expected = embed_text(r["text"], dim=64)
        assert r["emb"] == pytest.approx(expected, abs=1e-6)


def test_udf_self_cosine(spark, documents):
    df = with_embedding(documents.limit(50), "text", "emb")
    bad = (
        df.select(cosine_similarity("emb", "emb").alias("c"))
        .where(F.abs(F.col("c") - 1.0) > 1e-6)
        .count()
    )
    assert bad == 0


def test_reference_dimension_1536(spark):
    """The reference's ada-002 dimension (main.go:27): the embedder and the
    search path are dimension-parametric; 1536 works end to end."""
    from pyspark.sql import functions as F

    from whatsapp_vectordb_spark.embedder import embed_text, with_embedding
    from whatsapp_vectordb_spark.operators.search import topk

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta delta"), (3, "unrelated text here")],
        "doc_id long, text string",
    )
    emb = with_embedding(docs, "text", "embedding", dim=1536, min_partitions=0)
    first = emb.head()["embedding"]
    assert len(first) == 1536
    q = embed_text("alpha beta gamma", dim=1536)
    hits = topk(emb, q, k=2, id_col="doc_id").collect()
    assert hits[0]["doc_id"] == 1 and hits[0]["score"] > 0.999
    assert hits[1]["doc_id"] == 2  # near text ranks above unrelated


def test_non_ascii_text_embeds_on_ascii_residue():
    """Multi-byte text must flow through the embedder without error. The
    deterministic stand-in tokenizes [a-z0-9] only (the reference's
    ada-002 handles all scripts; this is the documented fixture
    simplification), so a mixed Hebrew/ASCII string embeds exactly as its
    ASCII residue and a purely-Hebrew string embeds to NULL — both facts
    the `he` connector query relies on."""
    mixed = embed_text("שלום עולם data processing at scale")
    ascii_only = embed_text("data processing at scale")
    assert mixed == ascii_only
    assert embed_text("שלום עולם") is None
