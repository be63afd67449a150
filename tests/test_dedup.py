from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from whatsapp_vectordb_spark.operators.dedup import (
    embedding_near_duplicates,
    exact_duplicates,
    jaccard_near_duplicates,
    minhash_near_duplicates,
    simhash_pairs,
    simhash_signatures,
)

TEXTS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2, "the quick brown fox jumps over the lazy dog near the river bank today"),  # exact dup of 1
    (3, "the quick brown fox jumps over the lazy dog near the river bank"),  # near dup of 1
    (4, "completely different content about quarterly financial results and markets"),
    (5, "THE QUICK   brown fox jumps over the lazy dog near the river bank today"),  # case/ws dup of 1
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(TEXTS, "doc_id long, text string")


def test_exact_duplicates(docs):
    rows = exact_duplicates(docs).collect()
    ids = sorted(r["doc_id"] for r in rows)
    assert ids == [1, 2, 5]  # normalization folds case/whitespace
    assert all(r["group_size"] == 3 for r in rows)


def test_jaccard_near_duplicates(docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in jaccard_near_duplicates(docs, threshold=0.5).collect()
    }
    assert pairs[(1, 2)] == pytest.approx(1.0)
    assert (1, 3) in pairs and pairs[(1, 3)] > 0.5
    assert not any(4 in p for p in pairs)


def test_minhash_finds_high_jaccard_pairs(docs):
    got = {
        (r["id_a"], r["id_b"])
        for r in minhash_near_duplicates(docs, threshold=0.5).collect()
    }
    # exact dups always collide in every band; near-dup 1-3 has j≈0.8
    assert (1, 2) in got
    assert (1, 5) in got
    assert not any(4 in p for p in got)


def test_minhash_subset_of_exact_jaccard(docs):
    mh = {(r["id_a"], r["id_b"]) for r in minhash_near_duplicates(docs, threshold=0.5).collect()}
    ex = {(r["id_a"], r["id_b"]) for r in jaccard_near_duplicates(docs, threshold=0.5).collect()}
    assert mh <= ex  # LSH candidates are verified, so no false positives


def test_simhash_identical_texts_equal_hash(docs):
    sig = {r["doc_id"]: r["simhash"] for r in simhash_signatures(docs).collect()}
    assert sig[1] == sig[2] == sig[5]
    assert 0 <= sig[1] < 2**48


def test_simhash_pairs_hamming(docs):
    rows = {(r["id_a"], r["id_b"]): r["hamming"] for r in simhash_pairs(docs, max_hamming=3).collect()}
    assert rows[(1, 2)] == 0
    assert rows[(1, 5)] == 0


def test_embedding_near_duplicates(spark):
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [1.0, 0.001, 0.0]),  # near-identical
        (3, [0.0, 1.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {(r["id_a"], r["id_b"]) for r in embedding_near_duplicates(emb, threshold=0.95).collect()}
    assert got == {(1, 2)}


def test_connected_components_chain_and_triangle(spark):
    from whatsapp_vectordb_spark.operators.dedup import (
        canonicalize_duplicates,
        connected_components,
    )

    # chain 1-2-3-4 (diameter 3, needs >1 propagation round), triangle
    # 10-11-12, isolated pair 20-21
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        "id_a long, id_b long",
    )
    comp = {r["node"]: r["component"] for r in connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}

    verdict = {r["id"]: r for r in canonicalize_duplicates(pairs).collect()}
    assert verdict[3]["canonical_id"] == 1 and verdict[3]["is_canonical"] == 0
    assert verdict[1]["is_canonical"] == 1
    assert verdict[1]["cluster_size"] == 4
    assert verdict[12]["cluster_size"] == 3
    kept = {i for i, r in verdict.items() if r["is_canonical"] == 1}
    assert kept == {1, 10, 20}


def test_duplicate_spans_counts_positional_windows(spark):
    from whatsapp_vectordb_spark.operators.dedup import duplicate_spans

    # doc 1 and doc 2 share their first 4 tokens ("a b c d") → with n=3,
    # windows "a b c" and "b c d" are cross-doc duplicated; doc 3 is unique;
    # doc 4 is shorter than n and falls back to its full text (unique).
    rows = [
        (1, "a b c d e f"),
        (2, "a b c d x y"),
        (3, "p q r s t u"),
        (4, "hi there"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in duplicate_spans(df, span_n=3).collect()}
    assert got[1]["n_spans"] == 4 and got[1]["n_dup_spans"] == 2
    assert got[2]["n_spans"] == 4 and got[2]["n_dup_spans"] == 2
    assert abs(got[1]["dup_fraction"] - 0.5) < 1e-9
    assert got[3]["n_dup_spans"] == 0
    assert got[4]["n_spans"] == 1 and got[4]["n_dup_spans"] == 0


def test_duplicate_spans_within_doc_repeat_not_duplicated(spark):
    from whatsapp_vectordb_spark.operators.dedup import duplicate_spans

    # "a b c" repeats WITHIN doc 1 only → cross-doc rule says not duplicated
    df = spark.createDataFrame(
        [(1, "a b c a b c"), (2, "z z z z")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in duplicate_spans(df, span_n=3).collect()}
    assert got[1]["n_dup_spans"] == 0
    assert got[2]["n_dup_spans"] == 0


def test_containment_excerpt_detected(spark):
    from whatsapp_vectordb_spark.operators.dedup import containment_near_duplicates

    base = "the quick brown fox jumps over the lazy dog again and again tonight"
    excerpt = "the quick brown fox jumps over the lazy dog"
    rows = [(1, base), (2, excerpt), (3, "completely different words entirely here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        (r["id_a"], r["id_b"]): (r["containment_a"], r["containment_b"])
        for r in containment_near_duplicates(df, shingle_n=3, threshold=0.6).collect()
    }
    assert (1, 2) in out
    ca, cb = out[(1, 2)]
    # every shingle of the excerpt is inside the base doc → containment_b = 1
    assert abs(cb - 1.0) < 1e-9 and ca < 1.0
    assert all(k == (1, 2) for k in out)


def test_elect_canonical_picks_best_not_min_id(spark):
    from whatsapp_vectordb_spark.operators.dedup import elect_canonical

    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (9, 9), (10, 9)], "id bigint, canonical_id bigint"
    )
    scores = spark.createDataFrame(
        [(1, 5), (2, 9), (3, 9), (9, 4), (10, 4)], "id bigint, score int"
    )
    got = {
        r["cluster_id"]: (r["cluster_size"], r["elected_id"], r["elected_score"])
        for r in elect_canonical(clusters, scores).collect()
    }
    # cluster 1: best score 9 shared by ids 2 and 3 -> tie to LOWER id (2)
    assert got[1] == (3, 2, 9)
    # cluster 9: tie at 4 -> min id 9
    assert got[9] == (2, 9, 4)


def test_elect_canonical_unscored_members(spark):
    """Members missing from the scores table still count toward
    cluster_size and lose to any scored member; a fully-unscored cluster
    still appears (min-id elected, NULL score) — the left-join contract."""
    from whatsapp_vectordb_spark.operators.dedup import elect_canonical

    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (7, 7), (8, 7)], "id bigint, canonical_id bigint"
    )
    scores = spark.createDataFrame([(1, 5), (2, 9)], "id bigint, score int")
    got = {
        r["cluster_id"]: (r["cluster_size"], r["elected_id"], r["elected_score"])
        for r in elect_canonical(clusters, scores).collect()
    }
    # id 3 unscored: still counted in cluster_size, never elected over 2
    assert got[1] == (3, 2, 9)
    # cluster 7 fully unscored: present, min-id elected, NULL score
    assert got[7] == (2, 7, None)


def test_connected_components_long_chain_converges_log_rounds(spark):
    """A 120-link duplicate chain (diameter 120 > max_iter 20) — plain
    1-hop label propagation could never converge inside the round budget;
    pointer doubling must land it in O(log diameter) rounds with the
    exact same per-component minimum labels."""
    from whatsapp_vectordb_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(120)], "id_a bigint, id_b bigint"
    )
    before = len(spark.sparkContext._jsc.sc().getRDDStorageInfo())
    got = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert got == {i: 0 for i in range(121)}
    # superseded rounds' checkpoints are freed eagerly: ~7 rounds must
    # leave at most the final labels (+1 slack), not one block per round
    after = len(spark.sparkContext._jsc.sc().getRDDStorageInfo())
    assert after - before <= 2, f"checkpoint leak: {after - before} new stored RDDs"


def test_connected_components_two_chains_stay_separate(spark):
    from whatsapp_vectordb_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(30)] + [(1000 + i, 1001 + i) for i in range(30)],
        "id_a bigint, id_b bigint",
    )
    got = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert all(got[i] == 0 for i in range(31))
    assert all(got[1000 + i] == 1000 for i in range(31))
