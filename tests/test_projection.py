"""Unit tests for operators/projection.py (JL + PCA)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from whatsapp_vectordb_spark.operators.projection import (
    _jl_sign,
    jl_project,
    pca_project_long,
    pca_train,
)


def test_jl_signs_are_balanced_and_deterministic():
    signs = [_jl_sign(7, i, j) for i in range(64) for j in range(16)]
    assert set(signs) == {-1, 1}
    frac = sum(1 for s in signs if s == 1) / len(signs)
    assert 0.4 < frac < 0.6  # md5 low bits are unbiased
    assert signs == [_jl_sign(7, i, j) for i in range(64) for j in range(16)]


def test_jl_projection_bounds_cosine_distortion(spark, embeddings):
    """The actual JL guarantee is bounded DISTANCE distortion, not top-k
    rank preservation (on a corpus whose top-10 scores are near-ties, rank
    overlap is legitimately weak at k=16). Check the distortion: projected
    cosine tracks original cosine with small median error and strong
    correlation."""
    emb = embeddings.select("vec_id", "embedding")
    rows = jl_project(emb, 64, 16, seed=7).select("vec_id", "embedding", "proj").collect()
    x = np.array([r["embedding"] for r in rows[:80]])
    p = np.array([r["proj"] for r in rows[:80]], dtype=np.float64)

    def cos_mat(m):
        n = m / (np.linalg.norm(m, axis=1, keepdims=True) + 1e-12)
        return n @ n.T

    co, cp = cos_mat(x), cos_mat(p)
    iu = np.triu_indices(len(x), 1)
    err = np.abs(co[iu] - cp[iu])
    assert float(np.median(err)) < 0.2  # E|err| ~ 1/sqrt(k) = 0.25 at k=16
    # this corpus's cosines sit in a narrow band, so correlation is
    # variance-attenuated — assert direction, not strength
    assert float(np.corrcoef(co[iu], cp[iu])[0, 1]) > 0.3


def test_jl_projection_is_integer_exact_and_partition_invariant(spark, embeddings):
    emb = embeddings.select("vec_id", "embedding")
    a = {r["vec_id"]: list(r["proj"]) for r in jl_project(emb, 64, 8, seed=3).collect()}
    b = {
        r["vec_id"]: list(r["proj"])
        for r in jl_project(emb.repartition(13), 64, 8, seed=3).collect()
    }
    assert a == b


def test_pca_components_are_orthonormal_and_ordered(spark, embeddings):
    emb = embeddings.select("vec_id", "embedding")
    mean, comps = pca_train(emb, n_components=4)
    gram = comps @ comps.T
    assert np.allclose(gram, np.eye(4), atol=1e-8)
    # descending explained variance
    x = np.array([r["embedding"] for r in emb.limit(500).collect()]) - mean
    var = [(x @ comps[c]).var() for c in range(4)]
    assert all(var[i] >= var[i + 1] - 1e-9 for i in range(3))


def test_pca_projection_centers_data(spark, embeddings):
    emb = embeddings.select("vec_id", "embedding")
    mean, comps = pca_train(emb, n_components=2, sample_rows=10_000)
    out = pca_project_long(emb, mean, comps).collect()
    # trained on (virtually) the full table → projected coords ~zero-mean
    by_comp = {}
    for r in out:
        by_comp.setdefault(r["comp_id"], []).append(r["coord"])
    for cid, coords in by_comp.items():
        assert abs(float(np.mean(coords))) < 0.02, cid


def test_jl_numpy_and_expr_impls_are_bit_identical(spark, embeddings):
    from whatsapp_vectordb_spark.operators.projection import jl_project

    emb = embeddings.select("vec_id", "embedding")
    a = {r["vec_id"]: list(r["proj"]) for r in jl_project(emb, 64, 8, seed=3, impl="numpy").collect()}
    b = {r["vec_id"]: list(r["proj"]) for r in jl_project(emb, 64, 8, seed=3, impl="expr").collect()}
    assert a == b
