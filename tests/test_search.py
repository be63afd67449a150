from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from whatsapp_vectordb_spark.operators.search import (
    topk,
    topk_batched,
    topk_batched_twophase,
)


@pytest.fixture(scope="module")
def qvec(embeddings):
    return embeddings.where(F.col("vec_id") == 0).head()["embedding"]


def test_topk_self_is_first(embeddings, qvec):
    rows = topk(embeddings, qvec, k=5).collect()
    assert len(rows) == 5
    assert rows[0]["vec_id"] == 0
    assert rows[0]["score"] == pytest.approx(1.0)
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_topk_k_equals_n_is_full_ranking(embeddings, qvec):
    n = embeddings.count()
    all_rows = topk(embeddings, qvec, k=n).collect()
    assert len(all_rows) == n
    top3 = topk(embeddings, qvec, k=3).collect()
    assert [r["vec_id"] for r in top3] == [r["vec_id"] for r in all_rows[:3]]


def test_topk_euclidean_orders_ascending(embeddings, qvec):
    rows = topk(embeddings, qvec, k=5, metric="euclidean").collect()
    assert rows[0]["vec_id"] == 0
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores)


def test_batched_matches_single(spark, embeddings):
    queries = (
        embeddings.where(F.col("vec_id") < 3)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
    )
    batched = topk_batched(embeddings, queries, k=4)
    got = {
        (r["query_id"], r["rank"]): r["vec_id"] for r in batched.collect()
    }
    for qid in range(3):
        qvec = embeddings.where(F.col("vec_id") == qid).head()["embedding"]
        single = topk(embeddings, qvec, k=4).collect()
        for rank, row in enumerate(single, start=1):
            assert got[(qid, rank)] == row["vec_id"]


def test_twophase_matches_window_plan(embeddings):
    qrows = embeddings.where(F.col("vec_id") < 3).select("vec_id", "embedding").collect()
    queries = [(r["vec_id"], r["embedding"]) for r in qrows]
    two = topk_batched_twophase(embeddings, queries, k=4)
    got = {(r["query_id"], r["rank"]): r["vec_id"] for r in two.collect()}
    for qid, qvec in queries:
        single = topk(embeddings, qvec, k=4).collect()
        for rank, row in enumerate(single, start=1):
            assert got[(qid, rank)] == row["vec_id"]


def test_1536_dim_expr_and_numpy_paths_agree(spark, embeddings):
    """The reference's hard dimension constant is 1536 (main.go:27): the
    interpreted-HOF expression path and the Arrow/numpy two-phase path
    must rank identically there, not just at the 64-dim fixture size."""
    from pyspark.sql import functions as F

    from whatsapp_vectordb_spark.operators.search import topk, topk_batched_twophase

    emb1536 = embeddings.limit(120).select(
        "vec_id", F.flatten(F.array_repeat(F.col("embedding"), 24)).alias("embedding")
    )
    qrow = emb1536.where(F.col("vec_id") == 3).head()
    assert len(qrow["embedding"]) == 1536
    exact = [
        (r["vec_id"], round(r["score"], 6))
        for r in topk(emb1536, qrow["embedding"], k=10, round_to=6).collect()
    ]
    two = topk_batched_twophase(emb1536, [(3, qrow["embedding"])], k=10).collect()
    got = [(r["vec_id"], round(r["score"], 6)) for r in sorted(two, key=lambda r: r["rank"])]
    assert got == exact
    # tiling preserves cosine: the same ranking as the 64-dim original
    base = [
        (r["vec_id"], round(r["score"], 6))
        for r in topk(
            embeddings.limit(120), qrow["embedding"][:64], k=10, round_to=6
        ).collect()
    ]
    assert [v for v, _ in base] == [v for v, _ in exact]
