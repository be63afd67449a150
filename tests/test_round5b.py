"""Round-5 batch-5 operators: overlapping chunking, phrase search,
distinct-n diversity, retention cohorts, Markov transitions, balanced
shard assignment.

Exactness against DuckDB oracles is the gate's job; these cover the
operator semantics and edges the oracles can't express (empty docs,
overlapping matches, repeated query tokens, shard-balance bounds,
permutation determinism).
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestChunkOverlap:
    def test_windows_and_md5(self, spark):
        from whatsapp_vectordb_spark.operators.textops import chunk_overlap

        toks = [f"w{i}" for i in range(10)]
        out = chunk_overlap(
            _docs(spark, [(1, " ".join(toks))]), size=4, stride=3
        ).collect()
        # starts: 0,3,6,9 — last window is the 1-token tail
        assert [(r["chunk_id"], r["start_tok"], r["n_chunk_tokens"]) for r in out] == [
            (0, 0, 4),
            (1, 3, 4),
            (2, 6, 4),
            (3, 9, 1),
        ]
        import hashlib

        want = hashlib.md5(" ".join(toks[3:7]).encode()).hexdigest()
        assert out[1]["chunk_md5"] == want

    def test_empty_and_exact_multiple(self, spark):
        from whatsapp_vectordb_spark.operators.textops import chunk_overlap

        out = chunk_overlap(
            _docs(spark, [(1, ""), (2, "a b c d e f")]), size=3, stride=3
        ).collect()
        assert {r["doc_id"] for r in out} == {2}
        assert [(r["start_tok"], r["n_chunk_tokens"]) for r in out] == [(0, 3), (3, 3)]

    def test_tokens_covered_exactly_once_when_stride_equals_size(self, spark):
        from whatsapp_vectordb_spark.operators.textops import chunk_overlap

        n = 50
        out = chunk_overlap(
            _docs(spark, [(7, " ".join(f"t{i}" for i in range(n)))]),
            size=8,
            stride=8,
        ).collect()
        assert sum(r["n_chunk_tokens"] for r in out) == n


class TestPhraseSearch:
    def test_counts_occurrences(self, spark):
        from whatsapp_vectordb_spark.operators.textops import phrase_search

        df = _docs(
            spark,
            [
                (1, "sort merge join beats hash join after a sort merge pass"),
                (2, "merge sort is not sort merge"),  # one match, reversed miss
                (3, "no phrase here"),
                (4, "sort then merge"),  # adjacency required
            ],
        )
        out = {
            r["doc_id"]: r["n_matches"]
            for r in phrase_search(df, "sort merge").collect()
        }
        assert out == {1: 2, 2: 1}

    def test_repeated_query_token(self, spark):
        from whatsapp_vectordb_spark.operators.textops import phrase_search

        df = _docs(spark, [(1, "go go go stop"), (2, "go stop go")])
        # "go go" overlaps: positions 0 and 1 in doc 1
        out = {
            r["doc_id"]: r["n_matches"] for r in phrase_search(df, "go go").collect()
        }
        assert out == {1: 2}

    def test_query_tokenized_like_documents(self, spark):
        from whatsapp_vectordb_spark.operators.textops import phrase_search

        df = _docs(spark, [(1, "state of the art results")])
        out = phrase_search(df, "state-of-the-art").collect()
        assert {r["doc_id"] for r in out} == {1}


class TestDistinctNgrams:
    def test_known_ratios(self, spark):
        from whatsapp_vectordb_spark.operators.textops import (
            distinct_ngram_diversity,
        )

        df = spark.createDataFrame(
            [(1, "a b a b", "s1"), (2, "a a a a", "s1")],
            "doc_id long, text string, source string",
        )
        rows = {
            r["n"]: r
            for r in distinct_ngram_diversity(df, ns=(1, 2)).collect()
        }
        # unigrams: 8 total, {a,b} distinct
        assert rows[1]["n_total"] == 8 and rows[1]["n_distinct"] == 2
        # bigrams: 6 total ("a b","b a","a b" + "a a"×3), {a b, b a, a a}
        assert rows[2]["n_total"] == 6 and rows[2]["n_distinct"] == 3
        assert rows[2]["distinct_ratio"] == 0.5

    def test_short_docs_skip_higher_orders(self, spark):
        from whatsapp_vectordb_spark.operators.textops import (
            distinct_ngram_diversity,
        )

        df = spark.createDataFrame(
            [(1, "solo", "s")], "doc_id long, text string, source string"
        )
        rows = distinct_ngram_diversity(df, ns=(1, 2, 3)).collect()
        assert {r["n"] for r in rows} == {1}


def _events_df(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )


class TestRetentionCohorts:
    def test_cohort_and_offsets(self, spark):
        from whatsapp_vectordb_spark.operators.events import retention_cohorts

        d = datetime.datetime
        rows = [
            # user 1: first event Tue 2024-01-02 → cohort week Mon 2024-01-01
            (1, 1, d(2024, 1, 2), "click"),
            (2, 1, d(2024, 1, 10), "click"),  # week offset 1
            (3, 1, d(2024, 1, 16), "buy"),  # week offset 2
            # user 2: first event in week of 2024-01-08
            (4, 2, d(2024, 1, 8), "click"),
            (5, 2, d(2024, 1, 9), "click"),  # same week, offset 0
        ]
        out = {
            (r["cohort_week"], r["week_offset"]): (r["n_active_users"], r["n_events"])
            for r in retention_cohorts(_events_df(spark, rows)).collect()
        }
        assert out == {
            ("2024-01-01", 0): (1, 1),
            ("2024-01-01", 1): (1, 1),
            ("2024-01-01", 2): (1, 1),
            ("2024-01-08", 0): (1, 2),
        }


class TestMarkovTransitions:
    def test_probabilities(self, spark):
        from whatsapp_vectordb_spark.operators.events import markov_transitions

        d = datetime.datetime
        rows = [
            (1, 1, d(2024, 1, 1, 0), "a"),
            (2, 1, d(2024, 1, 1, 1), "b"),
            (3, 1, d(2024, 1, 1, 2), "a"),
            (4, 1, d(2024, 1, 1, 3), "c"),
            (5, 2, d(2024, 1, 1, 0), "a"),
            (6, 2, d(2024, 1, 1, 1), "b"),
        ]
        out = {
            (r["src"], r["dst"]): (r["n_transitions"], r["p"])
            for r in markov_transitions(_events_df(spark, rows)).collect()
        }
        # from a: b,b,c → p(b|a)=2/3; across users, no cross-user pair
        assert out[("a", "b")] == (2, round(2 / 3, 6))
        assert out[("a", "c")] == (1, round(1 / 3, 6))
        assert out[("b", "a")] == (1, 1.0)
        assert ("c", "a") not in out  # sequence ends per user

    def test_simultaneous_events_tiebreak_on_id(self, spark):
        from whatsapp_vectordb_spark.operators.events import markov_transitions

        d = datetime.datetime
        t = d(2024, 1, 1)
        rows = [(2, 1, t, "y"), (1, 1, t, "x")]  # same ts: order by event_id
        out = {
            (r["src"], r["dst"]) for r in markov_transitions(_events_df(spark, rows)).collect()
        }
        assert out == {("x", "y")}


class TestShardAssign:
    def test_balance_and_conservation(self, spark):
        from whatsapp_vectordb_spark.operators.curate import shard_assign

        docs = spark.createDataFrame(
            [(i, 10 + (i * 13) % 90) for i in range(300)], "doc_id long, n_tokens long"
        )
        target = 500
        out = shard_assign(docs, shard_tokens=target).collect()
        assert len(out) == 300  # every doc assigned
        total = sum(r["n_tokens"] for r in out)
        by_shard: dict[int, int] = {}
        for r in out:
            by_shard[r["shard_id"]] = by_shard.get(r["shard_id"], 0) + r["n_tokens"]
        # shard ids are the contiguous range 0..ceil(total/target)-1
        assert set(by_shard) == set(range(max(by_shard) + 1))
        # every shard's FIRST doc starts before the shard's token budget is
        # exhausted, so a shard overshoots by at most one document (<100
        # tokens here); all but the last shard hold ≥ target - max_doc + 1
        max_doc = 10 + 89
        for sid, tok in by_shard.items():
            if sid != max(by_shard):
                assert tok >= target - max_doc + 1
            assert tok <= target + max_doc - 1

        # deterministic permutation: same seed → identical assignment
        again = {
            r["doc_id"]: r["shard_id"]
            for r in shard_assign(docs, shard_tokens=target).collect()
        }
        assert again == {r["doc_id"]: r["shard_id"] for r in out}
        assert total == sum(10 + (i * 13) % 90 for i in range(300))

    def test_seed_changes_permutation(self, spark):
        from whatsapp_vectordb_spark.operators.curate import shard_assign

        docs = spark.createDataFrame(
            [(i, 50) for i in range(100)], "doc_id long, n_tokens long"
        )
        a = {
            r["doc_id"]: r["perm_key"]
            for r in shard_assign(docs, shard_tokens=500, seed=1).collect()
        }
        b = {
            r["doc_id"]: r["perm_key"]
            for r in shard_assign(docs, shard_tokens=500, seed=2).collect()
        }
        assert a != b


class TestSceneCuts:
    def test_cut_detection_and_checksum(self, spark):
        from whatsapp_vectordb_spark.multimodal import scene_cut_stats

        rows = [
            # asset A: orthogonal flip at 1000 and 2000, similar at 3000
            ("a", 0, [1.0, 0.0]),
            ("a", 1000, [0.0, 1.0]),   # sim 0 → cut
            ("a", 2000, [1.0, 0.0]),   # sim 0 → cut
            ("a", 3000, [0.9, 0.1]),   # sim ~0.994 → no cut
            # asset B: single chunk, never a cut
            ("b", 0, [0.5, 0.5]),
        ]
        df = spark.createDataFrame(
            rows, "media_id string, chunk_start_ms long, embedding array<float>"
        )
        out = {r["media_id"]: r for r in scene_cut_stats(df, threshold=0.5).collect()}
        assert (out["a"]["n_chunks"], out["a"]["n_cuts"]) == (4, 2)
        assert out["a"]["cut_ms_checksum"] == 3000  # 1000 + 2000
        assert (out["b"]["n_chunks"], out["b"]["n_cuts"], out["b"]["cut_ms_checksum"]) == (1, 0, 0)


class TestEpochWaterfill:
    def _invariants(self, spark, rows, budget, max_epochs=4):
        from whatsapp_vectordb_spark.operators.curate import epoch_waterfill

        df = spark.createDataFrame(rows, "source string, n_tokens long, weight long")
        out = epoch_waterfill(df, budget=budget, max_epochs=max_epochs).collect()
        got = {r["source"]: r for r in out}
        total_alloc = sum(r["alloc_tokens"] for r in out)
        # never exceeds budget; floor rounding loses < |sources| tokens
        assert total_alloc <= budget
        for r in out:
            assert 0 <= r["alloc_tokens"] <= r["cap_tokens"]
            assert r["cap_tokens"] == max_epochs * r["n_tokens"]
        # uncapped sources share the leftover proportionally to weight
        uncapped = [r for r in out if r["alloc_tokens"] < r["cap_tokens"]]
        if len(uncapped) >= 2:
            lam = [r["alloc_tokens"] / r["weight"] for r in uncapped]
            assert max(lam) - min(lam) < 1.0  # same water level, floor jitter
        return got, total_alloc

    def test_all_capped_when_budget_huge(self, spark):
        rows = [("a", 100, 50), ("b", 200, 10)]
        got, _ = self._invariants(spark, rows, budget=10_000)
        assert got["a"]["alloc_tokens"] == 400 and got["b"]["alloc_tokens"] == 800
        assert got["a"]["epochs_micro"] == 4_000_000

    def test_quality_weighted_split(self, spark):
        # equal sizes, 3:1 weight → allocation 3:1 until cap
        rows = [("hi", 1000, 300), ("lo", 1000, 100)]
        got, total = self._invariants(spark, rows, budget=4000)
        assert got["hi"]["alloc_tokens"] == 3000
        assert got["lo"]["alloc_tokens"] == 1000
        assert got["hi"]["epochs_micro"] == 3_000_000

    def test_cap_overflow_reflows(self, spark):
        # "hi" would get 6000 > cap 4000; excess reflows to "lo"
        rows = [("hi", 1000, 300), ("lo", 1000, 100)]
        got, total = self._invariants(spark, rows, budget=8000)
        assert got["hi"]["alloc_tokens"] == 4000  # capped
        assert got["lo"]["alloc_tokens"] == 4000  # absorbs the reflow, hits own cap

    def test_zero_weight_dropped_and_random_invariants(self, spark):
        import random

        rng = random.Random(7)
        rows = [
            (f"s{i}", rng.randrange(100, 5000), rng.randrange(0, 2000))
            for i in range(12)
        ]
        budget = 2 * sum(n for _, n, _ in rows)
        got, _ = self._invariants(spark, rows, budget=budget)
        assert set(got) == {s for s, _, w in rows if w > 0}


class TestRakeKeywords:
    def test_degree_over_frequency_scoring(self, spark):
        from whatsapp_vectordb_spark.operators.textops import rake_keywords

        # stopwords 'the'/'and' split candidates:
        # "quick brown fox" (len 3, each word deg 3/freq 1 → 3e6; sum 9e6)
        # "lazy dog"        (len 2, 2e6 each; sum 4e6)
        df = _docs(spark, [(1, "the quick brown fox and the lazy dog")])
        out = rake_keywords(df).collect()
        assert len(out) == 1
        r = out[0]
        assert r["phrase"] == "quick brown fox"
        assert r["score_micro"] == 9_000_000
        assert r["phrase_pos"] == 1

    def test_shared_word_degree_and_tiebreak(self, spark):
        from whatsapp_vectordb_spark.operators.textops import rake_keywords

        # "red fish" and "red cat": red freq=2 deg=4 → 2e6; fish/cat 2e6
        # both phrases score 4e6 → earliest position wins
        df = _docs(spark, [(1, "red fish and red cat")])
        r = rake_keywords(df).collect()[0]
        assert r["phrase"] == "red fish"
        assert r["score_micro"] == 4_000_000

    def test_all_stopword_doc_absent(self, spark):
        from whatsapp_vectordb_spark.operators.textops import rake_keywords

        df = _docs(spark, [(1, "the and of to"), (2, "alpha beta")])
        out = {r["doc_id"]: r["phrase"] for r in rake_keywords(df).collect()}
        assert out == {2: "alpha beta"}


class TestBinaryNearDup:
    def test_identical_and_near_vectors_pair_up(self, spark):
        from whatsapp_vectordb_spark.operators.dedup import binary_near_dup_pairs

        base = [1.0 if i % 3 == 0 else -1.0 for i in range(64)]
        near = list(base)
        near[5] = -near[5]  # 1 bit differs
        far = [-x for x in base]  # all 64 bits differ
        df = spark.createDataFrame(
            [("a", base), ("b", list(base)), ("c", near), ("d", far)],
            "doc_id string, embedding array<float>",
        )
        out = {
            (r["id_a"], r["id_b"]): r["hamming"]
            for r in binary_near_dup_pairs(df, id_col="doc_id").collect()
        }
        assert out[("a", "b")] == 0
        assert out[("a", "c")] == 1 and out[("b", "c")] == 1
        assert not any("d" in p for p in out)

    def test_pigeonhole_recall_at_threshold(self, spark):
        """Exactly max_hamming=3 differing bits spread across 3 bands must
        still be found (some 4th band matches exactly)."""
        from whatsapp_vectordb_spark.operators.dedup import binary_near_dup_pairs

        base = [1.0] * 64
        v3 = list(base)
        for i in (0, 16, 32):  # one flip in each of bands 0,1,2 — band 3 intact
            v3[i] = -1.0
        df = spark.createDataFrame(
            [("a", base), ("b", v3)], "doc_id string, embedding array<float>"
        )
        out = binary_near_dup_pairs(df, id_col="doc_id").collect()
        assert [(r["id_a"], r["id_b"], r["hamming"]) for r in out] == [("a", "b", 3)]

    def test_max_hamming_must_stay_below_band_count(self, spark):
        import pytest

        from whatsapp_vectordb_spark.operators.dedup import binary_near_dup_pairs

        df = spark.createDataFrame(
            [("a", [1.0] * 64)], "doc_id string, embedding array<float>"
        )
        with pytest.raises(ValueError):
            binary_near_dup_pairs(df, id_col="doc_id", max_hamming=4)


class TestMinhashCalibration:
    def test_identical_docs_calibrate_to_exact_one(self, spark):
        from whatsapp_vectordb_spark.operators.dedup import minhash_calibration

        text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        near = "alpha beta gamma delta epsilon zeta eta theta iota lambda"
        df = _docs(spark, [(1, text), (2, text), (3, near)])
        out = {r["n_match"]: r for r in minhash_calibration(df).collect()}
        # the identical pair agrees on all 16 rows and has exact J = 1.0
        assert out[16]["n_pairs"] >= 1
        assert out[16]["mean_jaccard_micro"] == 1_000_000
        # every agreement level reported is >= rows-per-band (banded cands)
        assert all(k >= 4 for k in out)
        # mean exact jaccard is monotone-ish: full agreement >= partial
        partial = [v["mean_jaccard_micro"] for k, v in out.items() if k < 16]
        if partial:
            assert out[16]["mean_jaccard_micro"] >= max(partial)


class TestNoveltyVsReference:
    def test_novel_and_replayed_docs(self, spark):
        from whatsapp_vectordb_spark.operators.dedup import novelty_vs_reference

        ref_text = "one two three four five six seven eight nine ten"
        df = _docs(
            spark,
            [
                (10, ref_text),                 # reference slice
                (1, ref_text),                  # pure replay → novelty 0
                (2, "alpha beta gamma delta epsilon zeta eta theta"),  # all new
            ],
        )
        out = {
            r["doc_id"]: r
            for r in novelty_vs_reference(
                df, F.col("doc_id") % 10 == 0, shingle_n=5
            ).collect()
        }
        assert set(out) == {1, 2}  # reference rows not scored
        assert out[1]["novelty_micro"] == 0
        assert out[2]["novelty_micro"] == 1_000_000
        assert out[2]["n_novel"] == out[2]["n_shingles"]


class TestCusumChangepoints:
    def test_closed_form_matches_recursion(self, spark):
        import datetime

        from whatsapp_vectordb_spark.operators.events import cusum_changepoints

        # one type, daily counts [5, 1, 1, 9, 9] — starts ABOVE the mean
        # (the case the missing P0=0 floor would under-report)
        counts = [7, 1, 1, 5, 1]
        rows = []
        eid = 0
        for day, n in enumerate(counts, 1):
            for _ in range(n):
                eid += 1
                rows.append((eid, 1, datetime.datetime(2024, 1, day), "x"))
        df = spark.createDataFrame(
            rows, "event_id long, user_id long, ts timestamp, event_type string"
        )
        out = {r["day"]: r["cusum_micro"] for r in cusum_changepoints(df).collect()}

        mean_micro = (1_000_000 * sum(counts)) // len(counts)
        s, want = 0, {}
        for day, n in enumerate(counts, 1):
            s = max(0, s + 1_000_000 * n - mean_micro)
            want[f"2024-01-{day:02d}"] = s
        assert out == want
        assert want["2024-01-01"] > 0  # the floor case actually exercised


class TestRandomizedReferences:
    """Seeded random cases replayed against naive Python references —
    property tests at Spark granularity (one session, many cases)."""

    def test_phrase_search_matches_naive_count(self, spark):
        import random

        from whatsapp_vectordb_spark.operators.textops import phrase_search

        rng = random.Random(42)
        vocab = ["a", "b", "c", "d"]
        docs = [
            (i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 30))))
            for i in range(60)
        ]
        phrase = "a b a"
        ptoks = phrase.split()

        def naive(text):
            t = text.split()
            return sum(
                1
                for i in range(len(t) - len(ptoks) + 1)
                if t[i : i + len(ptoks)] == ptoks
            )

        want = {i: naive(tx) for i, tx in docs if naive(tx) > 0}
        got = {
            r["doc_id"]: r["n_matches"]
            for r in phrase_search(_docs(spark, docs), phrase).collect()
        }
        assert got == want

    def test_cusum_matches_recursion_on_random_series(self, spark):
        import datetime
        import random

        from whatsapp_vectordb_spark.operators.events import cusum_changepoints

        rng = random.Random(7)
        rows, eid = [], 0
        series = {}
        for tcode in ("x", "y"):
            counts = [rng.randrange(1, 12) for _ in range(10)]
            series[tcode] = counts
            for day, n in enumerate(counts, 1):
                for _ in range(n):
                    eid += 1
                    rows.append((eid, 1, datetime.datetime(2024, 3, day), tcode))
        df = spark.createDataFrame(
            rows, "event_id long, user_id long, ts timestamp, event_type string"
        )
        out = {
            (r["event_type"], r["day"]): r["cusum_micro"]
            for r in cusum_changepoints(df).collect()
        }
        for tcode, counts in series.items():
            mean_micro = (1_000_000 * sum(counts)) // len(counts)
            s = 0
            for day, n in enumerate(counts, 1):
                s = max(0, s + 1_000_000 * n - mean_micro)
                assert out[(tcode, f"2024-03-{day:02d}")] == s


class TestShardInterleave:
    def test_round_robin_striping(self, spark):
        from whatsapp_vectordb_spark.operators.curate import shard_interleave

        # one shard, 3 sources with 3/2/1 docs; perm_key = doc_id for
        # a readable expected order
        rows = [
            (1, "a", 0, 1), (2, "a", 0, 2), (3, "a", 0, 3),
            (4, "b", 0, 4), (5, "b", 0, 5),
            (6, "c", 0, 6),
        ]
        df = spark.createDataFrame(
            rows, "doc_id long, source string, shard_id long, perm_key long"
        )
        out = sorted(
            (r["pos_in_shard"], r["doc_id"])
            for r in shard_interleave(df).collect()
        )
        # round 1: a1, b4, c6; round 2: a2, b5; round 3: a3
        assert [d for _, d in out] == [1, 4, 6, 2, 5, 3]

    def test_no_long_single_source_runs(self, spark):
        from whatsapp_vectordb_spark.operators.curate import shard_interleave

        rows = [(i, "big" if i < 20 else "small", 0, i) for i in range(24)]
        df = spark.createDataFrame(
            rows, "doc_id long, source string, shard_id long, perm_key long"
        )
        seq = [
            r["doc_id"]
            for r in sorted(
                shard_interleave(df).collect(), key=lambda r: r["pos_in_shard"]
            )
        ]
        # while both sources have docs left, they must alternate
        first8 = seq[:8]
        assert sum(1 for d in first8 if d >= 20) == 4  # small source present
