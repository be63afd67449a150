"""Winnowing substring dedup + Bloom decontamination (operators/dedup.py).

The reference winnower below is a direct transcription of Schleimer,
Wilkerson & Aiken (SIGMOD 2003) §4 plain winnowing with the rightmost-
on-ties rule — the Spark operator must match it row-for-row, including
the short-document and all-equal-hash degenerate cases.
"""
from __future__ import annotations

import hashlib
import random

import pytest
from pyspark.sql import functions as F

from whatsapp_vectordb_spark.functions.text import py_tokens
from whatsapp_vectordb_spark.operators.dedup import (
    benchmark_contamination,
    bloom_decontaminate,
    winnow_duplicate_pairs,
    winnow_fingerprints,
)

PB = 1 << 20


def _phash(s: str, seed: int = 0) -> int:
    return int(hashlib.md5(f"{seed}:{s}".encode()).hexdigest()[:8], 16)


def _shingles(text: str, k: int) -> list[str]:
    toks = py_tokens(text)
    if len(toks) >= k:
        return [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    return [" ".join(toks)]


def _ref_winnow(text: str, k: int, w: int) -> set[tuple[int, int]]:
    """Reference winnower: per window of w hashes take the min, rightmost
    occurrence on ties; short docs (n < w) take one min over everything."""
    hs = [_phash(s) for s in _shingles(text, k)]
    n = len(hs)
    out: set[tuple[int, int]] = set()
    starts = range(n - w + 1) if n >= w else [0]
    for p in starts:
        window = hs[p : p + w] if n >= w else hs
        m = min(window)
        # rightmost occurrence of the min within the window
        pos = max(i for i, h in enumerate(window, start=p) if h == m)
        out.add((pos, m))
    return out


def _rand_text(rng: random.Random, n_tokens: int, vocab: int = 200) -> str:
    return " ".join(f"w{rng.randrange(vocab)}" for _ in range(n_tokens))


def test_matches_reference_winnower(spark):
    rng = random.Random(11)
    docs = [(i, _rand_text(rng, rng.randrange(1, 60), vocab=30)) for i in range(40)]
    # degenerate shapes: empty-ish, shorter than k, exactly k, exactly w
    docs += [
        (100, "one"),
        (101, "one two"),
        (102, "one two three"),  # exactly k=3 tokens -> 1 shingle
        (103, "one two three four five six"),  # n shingles == w
        (104, "a a a a a a a a a a"),  # all-equal hashes (tie runs)
        (105, "x y x y x y x y x y x y"),  # period-2 tie runs
    ]
    k, w = 3, 4
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got: dict[int, set[tuple[int, int]]] = {}
    for r in winnow_fingerprints(df, k=k, w=w).collect():
        got.setdefault(r["doc_id"], set()).add((r["fp_pos"], r["fp_hash"]))
    for doc_id, text in docs:
        assert got.get(doc_id, set()) == _ref_winnow(text, k, w), doc_id


def test_winnowing_guarantee_planted_runs(spark):
    """Any shared run of >= w+k-1 tokens must yield >= 1 shared selected
    fingerprint hash (the paper's coverage guarantee) — planted at random
    offsets inside otherwise-disjoint-vocabulary documents."""
    k, w = 5, 4
    run_len = w + k - 1  # minimal guaranteed-detectable run
    rng = random.Random(7)
    rows, expect_pairs = [], []
    for i in range(15):
        shared = " ".join(f"s{i}x{j}" for j in range(run_len))
        a_pre = _rand_text(rng, rng.randrange(0, 30), vocab=500)
        a_post = _rand_text(rng, rng.randrange(0, 30), vocab=500)
        b_pre = " ".join(f"b{i}p{j}" for j in range(rng.randrange(0, 25)))
        b_post = " ".join(f"b{i}q{j}" for j in range(rng.randrange(0, 25)))
        rows.append((2 * i, f"{a_pre} {shared} {a_post}".strip()))
        rows.append((2 * i + 1, f"{b_pre} {shared} {b_post}".strip()))
        expect_pairs.append((2 * i, 2 * i + 1))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = winnow_fingerprints(df, k=k, w=w)
    by_doc: dict[int, set[int]] = {}
    for r in fps.collect():
        by_doc.setdefault(r["doc_id"], set()).add(r["fp_hash"])
    for a, b in expect_pairs:
        assert by_doc[a] & by_doc[b], (a, b)
    # and the pair operator surfaces every planted pair at min_shared=1
    got_pairs = {
        (r["id_a"], r["id_b"])
        for r in winnow_duplicate_pairs(df, k=k, w=w, min_shared=1).collect()
    }
    assert set(expect_pairs) <= got_pairs


def test_pairs_max_df_drops_boilerplate(spark):
    """A license-header-style run shared by EVERY document must not produce
    pairs once max_df excludes its fingerprints; a genuine 2-doc dup must
    survive the guard."""
    k, w = 3, 4
    boiler = "standard license header apache version two point zero terms apply"
    rng = random.Random(3)
    rows = [(i, f"{boiler} {_rand_text(rng, 25, vocab=10_000)}") for i in range(30)]
    dup = "unique duplicated paragraph only these two documents share verbatim"
    rows.append((100, f"{boiler} {dup}"))
    rows.append((101, f"{boiler} {dup} trailing extra"))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    unguarded = winnow_duplicate_pairs(df, k=k, w=w, min_shared=1)
    assert unguarded.count() > 100  # boilerplate links ~every doc pair

    guarded = {
        (r["id_a"], r["id_b"])
        for r in winnow_duplicate_pairs(df, k=k, w=w, min_shared=1, max_df=3).collect()
    }
    assert (100, 101) in guarded
    assert len(guarded) < 5  # boilerplate-only pairs are gone


def test_overlong_document_fails_loudly(spark, monkeypatch):
    """pos >= _WINNOW_PBASE corrupts the packed key — the operator must
    raise, not return wrong fingerprints (patch PBASE down so the test
    doesn't need a million-token document)."""
    import whatsapp_vectordb_spark.operators.dedup as dedup_mod

    monkeypatch.setattr(dedup_mod, "_WINNOW_PBASE", 16)
    df = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(40)))], "doc_id long, text string"
    )
    with pytest.raises(Exception, match="winnow_fingerprints"):
        winnow_fingerprints(df, k=3, w=4).collect()


# --- Bloom decontamination ---------------------------------------------------


def _ref_bloom_hits(corpus, bench, n, m_bits, k_hashes):
    """Python reference: md5-half Kirsch-Mitzenmacher bits over DISTINCT
    per-doc shingles — returns {doc_id: n_hits} including false positives."""
    mask = m_bits - 1

    def halves(s):
        d = hashlib.md5(s.encode()).hexdigest()
        return int(d[:8], 16), int(d[8:16], 16)

    bits = set()
    for _, text in bench:
        for s in set(_shingles(text, n)):
            x1, x2 = halves(s)
            bits.update((x1 + j * x2) & mask for j in range(k_hashes))
    out = {}
    for doc_id, text in corpus:
        hit = 0
        for s in set(_shingles(text, n)):
            x1, x2 = halves(s)
            if all((x1 + j * x2) & mask in bits for j in range(k_hashes)):
                hit += 1
        out[doc_id] = hit
    return out


def test_bloom_bit_exact_vs_reference_with_false_positives(spark):
    """Tiny m forces real false positives; the operator must reproduce the
    reference filter's hit counts exactly — FPs included."""
    rng = random.Random(5)
    corpus = [(i, _rand_text(rng, 30, vocab=400)) for i in range(60)]
    bench = corpus[:8]
    m = 1 << 10
    ref = _ref_bloom_hits(corpus, bench, 5, m, 3)
    cdf = spark.createDataFrame(corpus, "doc_id long, text string")
    bdf = spark.createDataFrame(bench, "doc_id long, text string")
    got = {
        r["doc_id"]: r["n_hits"]
        for r in bloom_decontaminate(cdf, bdf, shingle_n=5, m_bits=m, k_hashes=3).collect()
    }
    assert got == ref
    # sanity: the tiny filter really does fire false positives here, and
    # never false-negatives vs the exact join
    exact = {
        r["doc_id"]: r["n_hits"]
        for r in benchmark_contamination(cdf, bdf, shingle_n=5).collect()
    }
    assert sum(got.values()) > sum(exact.values())
    assert all(got[d] >= exact[d] for d in exact)


def test_bloom_no_false_negatives_default_m(spark):
    rng = random.Random(9)
    corpus = [(i, _rand_text(rng, 40, vocab=5000)) for i in range(80)]
    bench = corpus[:10]
    cdf = spark.createDataFrame(corpus, "doc_id long, text string")
    bdf = spark.createDataFrame(bench, "doc_id long, text string")
    out = {
        r["doc_id"]: r["contamination"]
        for r in bloom_decontaminate(cdf, bdf, shingle_n=5, m_bits=1 << 20).collect()
    }
    for doc_id, _ in bench:
        assert out[doc_id] == 1.0  # bench docs self-report fully contaminated


def test_bloom_large_bench_side_builds_executor_side(spark):
    """>=1e5 bench shingles (the scale where a per-bit driver collect
    would hurt): the packed-chunk build must stay correct — bench docs
    present in the corpus read 1.0, novel docs stay near 0."""
    rng = random.Random(13)
    vocab = 50_000
    bench = [
        (i, " ".join(f"v{rng.randrange(vocab)}" for _ in range(80)))
        for i in range(1500)
    ]  # ~1500 * 76 ≈ 114k shingles at n=5
    corpus = bench[:50] + [
        (10_000 + i, " ".join(f"n{rng.randrange(vocab)}" for _ in range(80)))
        for i in range(50)
    ]
    cdf = spark.createDataFrame(corpus, "doc_id long, text string")
    bdf = spark.createDataFrame(bench, "doc_id long, text string")
    out = bloom_decontaminate(cdf, bdf, shingle_n=5, m_bits=1 << 22, k_hashes=3)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert len(rows) == 100
    for doc_id, _ in corpus[:50]:
        assert rows[doc_id]["contamination"] == 1.0
    # fill ≈ 114k·3 / 4.2M ≈ 8% → per-shingle FP ≈ 0.08³ ≈ 5e-4
    novel = [rows[10_000 + i]["contamination"] for i in range(50)]
    assert max(novel) < 0.1


# --- span-level reporting -----------------------------------------------------


def test_shared_spans_locate_planted_paragraph(spark):
    """A paragraph planted at KNOWN token offsets in two otherwise-disjoint
    documents must come back as one span per side covering it (within the
    k-1 shingle-boundary tolerance), at the right offset delta."""
    from whatsapp_vectordb_spark.operators.dedup import winnow_shared_spans

    k, w = 3, 4
    para = " ".join(f"p{j}" for j in range(30))  # 30-token shared paragraph
    a_pre = " ".join(f"a{j}" for j in range(10))   # para at tokens 10..39 in A
    b_pre = " ".join(f"b{j}" for j in range(25))   # para at tokens 25..54 in B
    df = spark.createDataFrame(
        [
            (1, f"{a_pre} {para} " + " ".join(f"az{j}" for j in range(12))),
            (2, f"{b_pre} {para} " + " ".join(f"bz{j}" for j in range(7))),
        ],
        "doc_id long, text string",
    )
    spans = winnow_shared_spans(df, k=k, w=w).collect()
    assert len(spans) == 1
    s = spans[0]
    assert (s["id_a"], s["id_b"]) == (1, 2)
    # span must sit inside the planted region and cover most of it
    assert 10 <= s["start_a"] and s["end_a"] <= 39
    assert s["end_a"] - s["start_a"] >= 30 - (w + k - 1)
    # constant offset: B-side bounds are the A-side bounds shifted by -15
    assert s["start_b"] == s["start_a"] + 15
    assert s["end_b"] == s["end_a"] + 15


def test_shared_spans_two_separate_runs_two_islands(spark):
    """Two distinct shared paragraphs separated by unshared text must
    yield two spans, not one merged blob."""
    from whatsapp_vectordb_spark.operators.dedup import winnow_shared_spans

    k, w = 3, 4
    p1 = " ".join(f"x{j}" for j in range(20))
    p2 = " ".join(f"y{j}" for j in range(20))
    mid_a = " ".join(f"am{j}" for j in range(30))
    mid_b = " ".join(f"bm{j}" for j in range(8))
    df = spark.createDataFrame(
        [(1, f"{p1} {mid_a} {p2}"), (2, f"{p1} {mid_b} {p2}")],
        "doc_id long, text string",
    )
    spans = winnow_shared_spans(df, k=k, w=w).collect()
    # p1 at offset 0; p2 at offset 22 (mid_a 30 vs mid_b 8) — two islands
    assert len(spans) == 2
    offs = sorted(s["start_a"] - s["start_b"] for s in spans)
    assert offs == [0, 22]


def test_shared_spans_min_fps_drops_coincidences(spark):
    """A single shared k-gram (one fingerprint at most) is below min_fps=2
    and must not produce a span."""
    from whatsapp_vectordb_spark.operators.dedup import winnow_shared_spans

    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma " + " ".join(f"u{j}" for j in range(20))),
            (2, " ".join(f"v{j}" for j in range(20)) + " alpha beta gamma"),
        ],
        "doc_id long, text string",
    )
    assert winnow_shared_spans(df, k=3, w=4, min_fps=2).collect() == []


def test_cut_duplicates_removes_copy_from_higher_id_only(spark):
    from whatsapp_vectordb_spark.operators.dedup import winnow_cut_duplicates

    k, w = 3, 4
    para = " ".join(f"p{j}" for j in range(30))
    a = f"{' '.join(f'a{j}' for j in range(10))} {para}"
    b = f"{' '.join(f'b{j}' for j in range(8))} {para} {' '.join(f'c{j}' for j in range(6))}"
    df = spark.createDataFrame([(1, a), (2, b)], "doc_id long, text string")
    out = {r["doc_id"]: r for r in winnow_cut_duplicates(df, k=k, w=w).collect()}
    # lower id keeps everything
    assert out[1]["n_removed"] == 0
    assert out[1]["text_deduped"] == a
    # higher id loses (most of) the planted paragraph, nothing else
    assert out[2]["n_tokens"] == 44
    removed = out[2]["n_removed"]
    assert 30 - (w + k - 1) <= removed <= 30
    kept = out[2]["text_deduped"].split()
    assert all(t.startswith(("b", "c")) or t.startswith("p") for t in kept)
    assert {t for t in kept if t[0] in "bc"} == {f"b{j}" for j in range(8)} | {
        f"c{j}" for j in range(6)
    }  # every non-shared token survives
    # total duplicated mass survives exactly once
    assert f" {para} " in f" {out[1]['text_deduped']} "


def test_cut_duplicates_merges_overlapping_spans(spark):
    """Three docs sharing the same paragraph: doc 1 keeps it; docs 2 and 3
    each produce b-side spans against BOTH lower docs — the overlapping
    cut regions must merge, never double-count n_removed."""
    from whatsapp_vectordb_spark.operators.dedup import winnow_cut_duplicates

    para = " ".join(f"q{j}" for j in range(25))
    rows = [
        (1, f"one unique head {para}"),
        (2, f"two other head {para}"),
        (3, f"{para} three tail here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in winnow_cut_duplicates(df, k=3, w=4).collect()}
    assert out[1]["n_removed"] == 0
    for d in (2, 3):
        assert out[d]["n_removed"] <= 25  # merged, not summed over pair partners
        assert out[d]["n_removed"] >= 25 - 6
    # the non-shared tokens of every doc survive
    assert "three tail here" in out[3]["text_deduped"]
    assert out[2]["text_deduped"].startswith("two other head")


def test_winnow_pairs_releases_fingerprint_cache(spark):
    """The max_df branch caches the fingerprint table; with the default
    release_cache=True the cache must be dropped before the call returns
    (ADVICE r11: long-lived sessions otherwise accumulate one cached
    fingerprint table per call). Storage-level assert, not folklore.

    Asserts on persistent-RDD ID SETS, not counts: the shared session's
    async ContextCleaner may unpersist earlier tests' dropped
    localCheckpoint blocks at any moment, so a count delta is racy
    against that concurrent decrementer (flaked twice under the full
    suite). `unpersist` removes an RDD's id from the persistentRdds map
    synchronously (only block deletion is async), so the set of ids
    ADDED by a call is deterministic regardless of third-party removals."""
    rows = [(i, " ".join(f"t{i}_{j}" for j in range(30))) for i in range(20)]
    shared = " ".join(f"s{j}" for j in range(20))
    rows += [(100, f"head {shared}"), (101, f"{shared} tail")]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    jsc = spark.sparkContext._jsc

    def cached_ids():
        return {int(i) for i in jsc.getPersistentRDDs().keySet().toArray()}

    before = cached_ids()
    out = winnow_duplicate_pairs(df, k=3, w=4, max_df=50)
    # exactly ONE persistent entry was added and survives: the
    # checkpointed RESULT (bounded pair rows); the fingerprint cache was
    # unpersisted before the call returned, so its id is already gone
    added = cached_ids() - before
    assert len(added) == 1, f"expected only the checkpoint id, got {added}"
    assert out.where((F.col("id_a") == 100) & (F.col("id_b") == 101)).count() == 1

    before_lazy = cached_ids()
    lazy = winnow_duplicate_pairs(
        df, k=3, w=4, max_df=50, release_cache=False
    )
    lazy.count()
    # the lazy path stays fully lazy (no checkpoint); its ONE addition
    # is the kept fingerprint cache, and the eager path's checkpoint id
    # from `out` must still be present
    added_lazy = cached_ids() - before_lazy
    assert len(added_lazy) == 1, f"expected only the kept cache id, got {added_lazy}"
    assert added <= cached_ids(), "out's checkpoint must survive while referenced"
    del out
    spark.catalog.clearCache()


def test_pairs_durable_path_is_fault_tolerant_and_releases_cache(spark, tmp_path):
    """durable_path (r14, closes the ADVICE r12 durability caveat): the
    pair set equals the default path's bit-for-bit, the returned frame
    reads from STORAGE (a parquet scan, not executor-pinned
    localCheckpoint blocks — survives executor churn), and the
    fingerprint cache is still released."""
    from whatsapp_vectordb_spark.operators.dedup import winnow_duplicate_pairs

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    df = spark.createDataFrame(
        [(1, base + " one"), (2, base + " two"), (3, "unrelated words only here")],
        "doc_id long, text string",
    )
    want = {
        (r["id_a"], r["id_b"], r["n_shared"])
        for r in winnow_duplicate_pairs(df, k=3, w=4, max_df=50).collect()
    }
    dest = str(tmp_path / "pairs_durable")
    jsc = spark.sparkContext._jsc.sc()
    before = {i.id() for i in jsc.getRDDStorageInfo()}
    out = winnow_duplicate_pairs(df, k=3, w=4, max_df=50, durable_path=dest)
    got = {(r["id_a"], r["id_b"], r["n_shared"]) for r in out.collect()}
    assert got == want and (1, 2) in {(a, b) for a, b, _ in got}
    # the returned plan is a storage scan of durable_path
    assert "pairs_durable" in out._jdf.queryExecution().toString()
    # fingerprint cache released: the call leaves NO new persisted blocks
    # (other tests' localCheckpoint blocks may legitimately linger in the
    # shared session — assert on the delta, not on global emptiness)
    after = {i.id() for i in jsc.getRDDStorageInfo()}
    assert after <= before, after - before
    # durable even without the max_df cache branch
    dest2 = str(tmp_path / "pairs_durable2")
    out2 = winnow_duplicate_pairs(df, k=3, w=4, durable_path=dest2)
    assert {
        (r["id_a"], r["id_b"], r["n_shared"]) for r in out2.collect()
    } == want
