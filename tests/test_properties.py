"""Property tests (SURVEY.md §5.2.3) — hypothesis over the pure driver-side
functions; Spark-level invariants live in the other test files."""

from __future__ import annotations

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from whatsapp_vectordb_spark.embedder import embed_text
from whatsapp_vectordb_spark.operators.ann import portable_planes

texts = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF), max_size=200
)


@given(texts)
@settings(max_examples=200, deadline=None)
def test_embedder_deterministic_and_normalized(t):
    a = embed_text(t)
    b = embed_text(t)
    assert a == b
    if a is not None:
        n = math.sqrt(sum(float(x) * float(x) for x in a))
        assert abs(n - 1.0) < 1e-3  # float32 storage of a unit vector
        assert len(a) == 64


@given(texts, st.integers(min_value=1, max_value=1000))
@settings(max_examples=50, deadline=None)
def test_embedder_seed_sensitivity(t, seed):
    base = embed_text(t, seed=42)
    if base is None:
        assert embed_text(t, seed=seed) is None
    elif seed != 42:
        other = embed_text(t, seed=seed)
        # different seed -> different projection (not a constant function)
        if other is not None and len(set(base)) > 1:
            assert other != base


@given(st.integers(1, 128), st.integers(1, 32), st.integers(0, 5))
@settings(max_examples=50, deadline=None)
def test_portable_planes_shape_and_range(dim, n_planes, seed):
    planes = portable_planes(dim, n_planes, seed)
    assert len(planes) == n_planes
    assert all(len(row) == dim for row in planes)
    assert {s for row in planes for s in row} <= {-1, 1}


def test_embedder_similarity_ordering():
    a = np.array(embed_text("the quick brown fox jumps over the lazy dog"))
    near = np.array(embed_text("the quick brown fox jumps over the lazy cat"))
    far = np.array(embed_text("completely unrelated spreadsheet quarterly revenue"))
    assert float(a @ near) > float(a @ far)


@given(
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=8),
    st.integers(min_value=2, max_value=12),
    st.integers(min_value=0, max_value=10_000),
)
@settings(max_examples=100, deadline=None)
def test_argmin_sq_equals_naive_broadcast(n, d, c, seed):
    """The matmul-identity argmin (round 7 OOM fix) must pick the same
    cell as the naive broadcast-difference form whenever distances are
    not exactly tied (continuous random data: ties have measure zero at
    the distance level; float rounding could still flip a near-tie, so
    equality is asserted on the DISTANCE of the chosen cell)."""
    from whatsapp_vectordb_spark.operators.ann import _argmin_sq

    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n, d))
    cents = rng.standard_normal((c, d))
    fast = _argmin_sq(x, cents)
    naive = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    best = naive.min(axis=1)
    chosen = naive[np.arange(n), fast]
    assert np.allclose(chosen, best, rtol=1e-9, atol=1e-9)


@given(
    st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False), min_size=1, max_size=30
    ),
    st.integers(min_value=0, max_value=6),
)
@settings(max_examples=200, deadline=None)
def test_round_half_up_matches_decimal(vals, r):
    """_round_half_up must agree with decimal ROUND_HALF_UP applied to the
    double's shortest repr whenever the scaled value is exactly
    representable; for general doubles both land within one ulp of the
    grid, so assert the distance to decimal's answer never exceeds one
    grid step and the SIGN of ties is away from zero."""
    import decimal

    from whatsapp_vectordb_spark.operators.search import _round_half_up

    got = _round_half_up(np.array(vals, dtype=np.float64), r)
    step = 10.0 ** (-r)
    for v, g in zip(vals, got):
        dec = float(
            decimal.Decimal(repr(v)).quantize(
                decimal.Decimal(1).scaleb(-r), rounding=decimal.ROUND_HALF_UP
            )
        )
        assert abs(g - dec) <= step + 1e-12


# Winnowing coverage guarantee (SIGMOD'03 §3): any two token sequences
# sharing a verbatim run of >= w+k-1 tokens share at least one selected
# fingerprint. Property-tested on the pure reference winnower; the Spark
# operator is pinned row-equal to it by
# tests/test_winnow.py::test_matches_reference_winnower, so the chain
# covers the distributed op without a Spark session per example.
@given(
    st.integers(min_value=2, max_value=5),  # k
    st.integers(min_value=2, max_value=5),  # w
    st.integers(min_value=0, max_value=8),  # extra shared run length
    st.lists(st.integers(0, 40), max_size=25),  # a-prefix vocab ids
    st.lists(st.integers(0, 40), max_size=25),  # a-suffix
    st.lists(st.integers(0, 40), max_size=25),  # b-prefix
    st.lists(st.integers(0, 40), max_size=25),  # b-suffix
)
@settings(max_examples=150, deadline=None)
def test_winnowing_shared_run_guarantee(k, w, extra, ap, asfx, bp, bsfx):
    from test_winnow import _ref_winnow

    shared = " ".join(f"shared{i}" for i in range(w + k - 1 + extra))
    a = " ".join([*(f"xa{i}" for i in ap), shared, *(f"ya{i}" for i in asfx)])
    b = " ".join([*(f"xb{i}" for i in bp), shared, *(f"yb{i}" for i in bsfx)])
    fa = {h for _, h in _ref_winnow(a, k, w)}
    fb = {h for _, h in _ref_winnow(b, k, w)}
    assert fa & fb


# --- round 12: BPE trainer + apply properties (pure Python, no Spark) -------

_bpe_words = st.lists(
    st.tuples(
        st.text(alphabet="abcd", min_size=1, max_size=7),
        st.integers(min_value=1, max_value=9),
    ),
    min_size=1,
    max_size=25,
)


def _ref_bpe_recount(word_freqs, n_merges):
    """O(rounds·corpus) recount reference for the incremental trainer."""
    from collections import Counter

    vocab = Counter()
    for w, f in word_freqs:
        if w:
            vocab[tuple(w)] += f
    out = []
    for rank in range(n_merges):
        pc = Counter()
        for sym, f in vocab.items():
            for i in range(len(sym) - 1):
                pc[(sym[i], sym[i + 1])] += f
        if not pc:
            break
        (l, r), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        out.append((rank, l, r, c))
        nxt = Counter()
        for sym, f in vocab.items():
            ns, i = [], 0
            while i < len(sym):
                if i < len(sym) - 1 and sym[i] == l and sym[i + 1] == r:
                    ns.append(l + r)
                    i += 2
                else:
                    ns.append(sym[i])
                    i += 1
            nxt[tuple(ns)] += f
        vocab = nxt
    return out


@given(_bpe_words, st.integers(min_value=1, max_value=12))
@settings(max_examples=150, deadline=None)
def test_bpe_incremental_trainer_equals_recount(word_freqs, n_merges):
    """The incremental pair-count trainer (the bpe_learn_local core) must
    equal the recount-everything reference merge-for-merge on ARBITRARY
    word-frequency tables — duplicate words, runs of one letter,
    degenerate single-char vocabularies, early exhaustion."""
    from whatsapp_vectordb_spark.operators.textops import _bpe_train_inmem

    assert _bpe_train_inmem(list(word_freqs), n_merges) == _ref_bpe_recount(
        word_freqs, n_merges
    )


@given(_bpe_words, st.integers(min_value=1, max_value=10))
@settings(max_examples=150, deadline=None)
def test_bpe_priority_apply_equals_sequential_apply(word_freqs, n_merges):
    """For any SELF-CONSISTENT merge table (one actually learned from a
    corpus — each merge's sides exist before it), priority-order
    application (bpe_apply_word, what bpe_encode ships) must equal
    applying every merge once in rank order (the training rewrite and
    the F.replace chain) — the equivalence bpe_encode's oracle relies
    on, here exercised on every word of the training corpus plus unseen
    recombinations."""
    from whatsapp_vectordb_spark.operators.textops import (
        _bpe_train_inmem,
        bpe_apply_word,
    )

    learned = _bpe_train_inmem(list(word_freqs), n_merges)
    merges = [(l, r) for _, l, r, _ in learned]
    ranks = {p: i for i, p in enumerate(merges)}

    def seq_apply(w):
        s = list(w)
        for l, r in merges:
            ns, i = [], 0
            while i < len(s):
                if i < len(s) - 1 and s[i] == l and s[i + 1] == r:
                    ns.append(l + r)
                    i += 2
                else:
                    ns.append(s[i])
                    i += 1
            s = ns
        return s

    probe = [w for w, _ in word_freqs] + [
        w2 + w1 for (w1, _), (w2, _) in zip(word_freqs, reversed(word_freqs))
    ]
    for w in probe:
        got = bpe_apply_word(w, merges, ranks)
        assert got == seq_apply(w)
        assert "".join(got) == w  # segmentation is a partition of the word
