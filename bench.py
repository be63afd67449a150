"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints the full JSON record line {"metric": ..., "value": total_sec,
"unit": "sec", "queries": {name: sec}, "sf": ...} followed by ONE compact
summary line (total, n, worst-3 ratios vs the recorded baseline) that
always fits the driver's truncated stdout-tail capture. Each query is
forced with a full collect (or count for large outputs) so the measured
time includes the whole plan, not just job submission.

Contention protocol: this box is a shared host with ±50% per-query swings
under load, so each query runs $SPARK_GRAFT_BENCH_REPS times (default 3)
and reports the MEDIAN; `value` is the sum of medians and `queries_all`
carries the raw reps. Caches are cleared BETWEEN queries (each query
starts from the pinned input frames only) but persist across a query's
own reps (same logical plan → same cache entry), so reps 2+ measure warm
compute — the recorded BASELINE.md numbers use the identical protocol,
keeping ratios comparable.
"""

from __future__ import annotations

import json
import os
import sys
import time

# BASELINE.md §"Recorded numbers" sf0.1 medians — the 2×-rule table the
# summary line's vs_recorded/worst3 ratios compare against. MUST stay in
# sync with the markdown table when a query is re-leveled there;
# tests/test_tools.py::test_bench_recorded_matches_baseline_md parses the
# table and asserts equality, so drift fails the suite (ADVICE r14).
RECORDED_SF01_MEDIANS = {
    "knn_topk_single": 0.39, "knn_batched_100_twophase": 0.91,
    "embed_documents": 0.87, "dedup_exact": 0.48,
    "dedup_minhash_lsh": 2.56, "dedup_simhash_pairs": 0.75,
    "text_quality": 1.0, "upsert_dedupe": 0.64, "ann_lsh_topk": 2.12,
    "knn_topk_1536_expr": 2.11, "knn_batched_1536_twophase": 0.48,
    "dedup_embedding_lsh": 2.84, "text_search_bm25": 2.21,
    "ann_pq_adc_topk": 2.73, "events_asof_purchase": 0.27,
    "events_range_join": 0.33, "streaming_sessionized": 3.87,
    "rel_pricing_summary": 0.36, "rel_nation_revenue": 0.82,
    "events_sessionized": 0.25,
}

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

# Per-process oracle-scratch isolation (VERDICT r8 #3): two concurrent
# harness processes on one box must not share the fixed persisted-oracle
# scratch (paths are baked into oracle SQL at harness import time, below).
# Respects an explicit caller override.
if "SPARK_GRAFT_ORACLE_SCRATCH" not in os.environ:
    import atexit
    import shutil
    import tempfile

    from whatsapp_vectordb_spark.session import local_scratch_root

    _scratch = tempfile.mkdtemp(
        prefix="wvs-scratch-bench-", dir=local_scratch_root()
    )
    os.environ["SPARK_GRAFT_ORACLE_SCRATCH"] = _scratch
    atexit.register(shutil.rmtree, _scratch, ignore_errors=True)


def _host_canary() -> float:
    """Contention canary (VERDICT r15 #8): the minimum of 7 reps of a
    1200³ numpy matmul. On a quiet box this reads ~0.008-0.012 s; under
    the r15-style roaming contention window it read 25-100× that. The
    value rides the payload + summary so every recorded bench carries
    its own host-state evidence; BASELINE.md levels should only be
    (re)recorded when the canary is under CANARY_DEGRADED_SEC."""
    import numpy as np

    rng = np.random.default_rng(0)
    a = rng.standard_normal((1200, 1200))
    b = rng.standard_normal((1200, 1200))
    a @ b  # warm the BLAS threadpool
    best = float("inf")
    for _ in range(7):
        t0 = time.perf_counter()
        a @ b
        best = min(best, time.perf_counter() - t0)
    return round(best, 4)


CANARY_FLOOR_SEC = 0.010  # min-of-7 on this box, quiet (measured r16)
CANARY_DEGRADED_SEC = 3 * CANARY_FLOOR_SEC

# The write-path twin (r16 finding): this host carries a ROAMING write
# throttle the CPU matmul cannot see — the same 128 MB buffered write
# measured 1.6-3.0 GB/s and, minutes later, 10-13 MB/s with the matmul
# canary quiet (5-7 ms) throughout. Every staged-commit/shuffle-heavy
# query rides that path, so benches record both canaries.
IO_CANARY_DEGRADED_MBS = 200.0


def _io_canary_mbs() -> float:
    """Buffered-write throughput (MB/s) of one 64 MB file into the fast
    scratch root — best of 2 so a single writeback stall doesn't
    misreport a healthy disk."""
    import tempfile

    from whatsapp_vectordb_spark.session import local_scratch_root

    chunk = os.urandom(1 << 22)
    best = 0.0
    for _ in range(2):
        fd, p = tempfile.mkstemp(prefix="wvs_iocanary_", dir=local_scratch_root())
        try:
            t0 = time.perf_counter()
            with os.fdopen(fd, "wb") as f:
                for _ in range(16):  # 16 × 4 MB
                    f.write(chunk)
            best = max(best, 64.0 / (time.perf_counter() - t0))
        finally:
            try:
                os.remove(p)
            except OSError:
                pass
    return round(best, 1)


def _wait_for_quiet(max_polls: int = 20, interval_s: float = 30.0) -> dict:
    """Bounded quiet-window gate (VERDICT r16 #6): poll BOTH canaries
    until both pass their thresholds or the poll budget runs out —
    official end-of-round records should start inside a quiet window
    instead of merely flagging a degraded one after the fact. Returns
    the poll evidence for the payload; the run proceeds either way (an
    exhausted wait records loudly, it does not block the round)."""
    polls = 0
    cpu, io = _host_canary(), _io_canary_mbs()
    while (
        cpu > CANARY_DEGRADED_SEC or io < IO_CANARY_DEGRADED_MBS
    ) and polls < max_polls:
        polls += 1
        time.sleep(interval_s)
        cpu, io = _host_canary(), _io_canary_mbs()
    return {
        "polls": polls,
        "max_polls": max_polls,
        "quiet_achieved": cpu <= CANARY_DEGRADED_SEC
        and io >= IO_CANARY_DEGRADED_MBS,
        "cpu_sec": cpu,
        "io_mb_s": io,
    }


def per_query_tail_line(
    timings_all: dict[str, list[float]], total: float, sf: float
) -> str:
    """The tail-surviving per-query line (VERDICT r17 #2), in the
    driver's original contract shape {"metric","value","unit","queries",
    "sf"} with "queries" carrying MIN-of-reps at bounded width (2 dp
    under 1 s, 1 dp under 100 s, 0 dp above). A deterministic shrink
    guard drops sub-second precision, then "unit", if the entry set ever
    pushes past 1990 chars — the driver keeps only the final ~2000
    stdout chars and parses the last complete JSON line."""

    def build(sub1_dp: int, over10_dp: int, with_unit: bool) -> str:
        def fmt(x: float) -> float:
            if x < 1:
                return round(x, sub1_dp)
            if x < 10:
                return round(x, 1)
            return round(x, over10_dp) if over10_dp else round(x)

        mins = {q: fmt(min(ts)) for q, ts in timings_all.items()}
        rec = {"metric": "headline_queries_total", "value": round(total, 1)}
        if with_unit:
            rec["unit"] = "sec"
        rec["queries"] = mins
        rec["sf"] = sf
        return json.dumps(rec, separators=(",", ":"))

    # Ladder: each step strictly narrows the max per-value width; the
    # last step bounds every value under 1000 s at 3 chars, which fits
    # the current 70-entry names with the full wrapper (~1966 chars).
    for args in ((2, 1, True), (1, 1, True), (1, 0, True), (1, 0, False)):
        pq = build(*args)
        if len(pq) <= 1990:
            break
    return pq


def main() -> None:
    from pyspark.sql import functions as F

    from whatsapp_vectordb_spark.embedder import with_embedding
    from whatsapp_vectordb_spark.harness import (
        _events,
        _t,
        dedup_minhash_lsh,
        events_sessionized_counts,
        rel_nation_revenue,
        rel_pricing_summary,
    )
    from whatsapp_vectordb_spark.operators.dedup import exact_duplicates
    from whatsapp_vectordb_spark.operators.search import topk, topk_batched_twophase
    from whatsapp_vectordb_spark.operators.textops import quality_scores
    from whatsapp_vectordb_spark.operators.upsert import upsert_by_key
    from whatsapp_vectordb_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    require_quiet = "--require-quiet" in sys.argv or os.environ.get(
        "SPARK_GRAFT_REQUIRE_QUIET", ""
    ) in ("1", "true")
    quiet_wait = _wait_for_quiet() if require_quiet else None
    canary_pre = _host_canary()
    io_pre = _io_canary_mbs()
    spark = get_spark(app_name="wvs-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm up the JVM + python workers so query timings measure plans, not startup
    spark.range(1000).select(F.sum("id")).collect()

    # single parquet files scan as 1-2 splits; spread them once so every
    # query measures the engine, not an accidental 1-core layout (at real
    # scale inputs arrive in thousands of splits and this is a no-op)
    par = spark.sparkContext.defaultParallelism

    # frames every query may read; re-pinned after each cache reset so
    # queries always see warm inputs, never each other's leftovers
    pinned: list = []

    def pin(df):
        df = df.cache()
        df.count()
        pinned.append(df)
        return df

    def reset_caches() -> None:
        # Operator-internal caches from one query must not linger into the
        # next: 19 queries x 3 reps of accumulated blocks cause GC/eviction
        # pressure that made late-running queries degrade monotonically
        # (rel_nation_revenue 2.5s -> 9.5s across reps in round 2).
        spark.catalog.clearCache()
        for df in pinned:
            df.cache()
            df.count()

    emb = pin(_t(spark, sf_dir, "embeddings").repartition(par))
    n_emb = emb.count()
    docs = pin(_t(spark, sf_dir, "documents").repartition(par))

    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    timings: dict[str, float] = {}
    timings_all: dict[str, list[float]] = {}

    # Per-query host-canary timeline (VERDICT r17 #7): a CHEAP sample
    # between queries (outside every timed region) so a mid-run
    # contention burst is attributable from the artifact alone — the r17
    # record had 13 spurious sub-second "regressions" all tracing to one
    # unattributable burst. Light versions of the pre/post canaries:
    # min-of-3 700³ matmul (~5 ms quiet) + one 8 MB buffered write.
    import numpy as _np

    _rng = _np.random.default_rng(0)
    _ca = _rng.standard_normal((700, 700))
    _cb = _rng.standard_normal((700, 700))
    _ca @ _cb  # warm BLAS
    _bench_t0 = time.perf_counter()
    canary_timeline: list[list] = []

    import tempfile as _tf

    from whatsapp_vectordb_spark.session import local_scratch_root as _lsr2

    _io_chunk = b"\0" * (1 << 22)  # preallocated 4 MB; written 8x = 32 MB

    def _sample_canary(label: str) -> None:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _ca @ _cb
            best = min(best, time.perf_counter() - t0)
        fd, p = _tf.mkstemp(prefix="wvs_qcanary_", dir=_lsr2())
        t0 = time.perf_counter()
        try:
            with os.fdopen(fd, "wb") as f:
                for _ in range(8):
                    f.write(_io_chunk)
            io_mbs = round(32.0 / max(time.perf_counter() - t0, 1e-9), 1)
        finally:
            try:
                os.remove(p)
            except OSError:
                pass
        canary_timeline.append(
            [label, round(time.perf_counter() - _bench_t0, 1), round(best, 4), io_mbs]
        )

    def timed(name: str):
        def deco(fn):
            # fresh cache state per query; reps 2+ still measure warm
            # operator caches (same protocol as the recorded baseline)
            reset_caches()
            _sample_canary(name)
            times = []
            for _ in range(reps):
                t0 = time.perf_counter()
                fn()
                times.append(round(time.perf_counter() - t0, 4))
            timings_all[name] = list(times)
            timings[name] = sorted(times)[len(times) // 2]

        return deco

    qvec = emb.where(F.col("vec_id") == 0).head()["embedding"]

    @timed("knn_topk_single")
    def _():
        topk(emb, qvec, k=10).collect()

    @timed("knn_batched_100_twophase")
    def _():
        qrows = emb.limit(100).select("vec_id", "embedding").collect()
        queries = [(r["vec_id"], r["embedding"]) for r in qrows]
        topk_batched_twophase(emb, queries, k=10).count()

    @timed("embed_documents")
    def _():
        with_embedding(docs, "text", "emb").select(F.count("emb")).collect()

    @timed("dedup_exact")
    def _():
        exact_duplicates(docs).count()

    @timed("dedup_minhash_lsh")
    def _():
        dedup_minhash_lsh(spark, sf_dir).count()

    @timed("text_quality")
    def _():
        quality_scores(docs).select(F.sum("quality_score")).collect()

    @timed("upsert_dedupe")
    def _():
        b1 = emb.select("vec_id", "label", F.lit(1).alias("seq"))
        b2 = emb.select("vec_id", (F.col("label") + 1).alias("label"), F.lit(2).alias("seq"))
        upsert_by_key(b1, b2, key_col="vec_id", seq_col="seq").count()

    @timed("dedup_simhash_pairs")
    def _():
        from whatsapp_vectordb_spark.harness import dedup_simhash_pairs

        dedup_simhash_pairs(spark, sf_dir).count()

    @timed("ann_sq8_topk")
    def _():
        # SQ8 end-to-end (train + encode + integer ADC top-10) — the
        # registry query shape; at scale train/encode amortize and only
        # the codes scan recurs
        from whatsapp_vectordb_spark.operators.ann import sq8_encode, sq8_topk, sq8_train

        mins, deltas = sq8_train(emb)
        codes = sq8_encode(emb, mins, deltas)
        sq8_topk(codes, qvec, deltas, k=10).collect()

    @timed("ann_sq8_cosine_topk")
    def _():
        # r12: the quantized COSINE path (normalize-at-encode; the
        # reference's active metric) — same codes-only integer ADC
        from whatsapp_vectordb_spark.functions.vector import l2_normalize
        from whatsapp_vectordb_spark.operators.ann import (
            sq8_encode,
            sq8_topk_cosine,
            sq8_train,
        )

        embn = emb.select("vec_id", l2_normalize("embedding").alias("embedding"))
        mins, deltas = sq8_train(embn)
        codes = sq8_encode(embn, mins, deltas)
        sq8_topk_cosine(codes, qvec, deltas, k=10).collect()

    @timed("ann_ivf_sq8_topk")
    def _():
        # r12: the composite tier — Lloyd coarse quantizer + SQ8 codes,
        # probe 2 of 8 cells (registry shape, build included; production
        # amortizes the build via the persisted partitioned layout)
        from whatsapp_vectordb_spark.harness import ann_ivf_sq8_topk

        ann_ivf_sq8_topk(spark, sf_dir).collect()

    @timed("ann_ivf_sq8_rerank_topk")
    def _():
        # r13: the FULL production serving stack as one registry row —
        # prune + codes-only integer-ADC shortlist + exact re-rank of
        # the shortlist floats (build included, same contract as above)
        from whatsapp_vectordb_spark.harness import ann_ivf_sq8_rerank_topk

        ann_ivf_sq8_rerank_topk(spark, sf_dir).collect()

    # --- untimed setup for the probe-only serving measurement (VERDICT
    # r12 #5): persist the IVF-SQ8 artifact ONCE so the next entry records
    # the RECURRING per-query cost — load + prune + shortlist + re-rank —
    # the number the build-inclusive rows above should not be read as.
    from whatsapp_vectordb_spark.operators.ann import IvfSq8Index as _IvfSq8

    _ivfsq8_path = os.path.join(
        os.environ["SPARK_GRAFT_ORACLE_SCRATCH"], "bench_ivf_sq8"
    )
    _IvfSq8.build(emb, n_centroids=8).save(_ivfsq8_path)

    @timed("ann_ivf_sq8_probe_only")
    def _():
        # r13: SERVING cost of the composed stack against the persisted
        # artifact — load + prune + shortlist + exact re-rank, what
        # recurs per query at 100 TB (the build-inclusive twin above is
        # the registry-contract shape)
        _IvfSq8.load(spark, _ivfsq8_path).search(
            emb, qvec, k=10, nprobe=2, shortlist=100
        ).collect()

    @timed("ann_ivf_sq8_batched_topk")
    def _():
        # r14 (VERDICT r13 #5): the batched serving-throughput shape —
        # N queries, ONE pruned codes scan — gets round-over-round
        # tripwire coverage at sf0.1 (registry/driver-row plan, build
        # included per the registry contract)
        from whatsapp_vectordb_spark.harness import ann_ivf_sq8_batched_topk

        ann_ivf_sq8_batched_topk(spark, sf_dir).count()

    @timed("ann_ivfpq_batched_topk")
    def _():
        # r14: the IVF-PQ batched twin (one LUT-scored codes scan)
        from whatsapp_vectordb_spark.harness import ann_ivfpq_batched_topk

        ann_ivfpq_batched_topk(spark, sf_dir).count()

    @timed("text_bpe_learn_full")
    def _():
        # r12: the at-scale trainer — 16 merges in ONE applyInPandas
        # stage over the distributed word count (registry shape)
        from whatsapp_vectordb_spark.operators.textops import bpe_learn_local

        bpe_learn_local(docs, n_merges=16).collect()

    @timed("text_bpe_encode_arrow")
    def _():
        # r12: train 16 + segment the corpus with the rank-dict pandas
        # UDF (registry shape incl. the per-doc stream hash)
        from whatsapp_vectordb_spark.harness import text_bpe_encode_arrow

        text_bpe_encode_arrow(spark, sf_dir).count()

    @timed("dedup_winnow_pairs")
    def _():
        # substring-level (winnowing) dup pairs — the registry query shape
        # (augmented corpus, k=5/w=4/min_shared=2, no max_df at this scale)
        from whatsapp_vectordb_spark.harness import dedup_winnow_pairs

        dedup_winnow_pairs(spark, sf_dir).count()

    @timed("events_range_join")
    def _():
        from whatsapp_vectordb_spark.harness import events_range_join

        events_range_join(spark, sf_dir).count()

    @timed("streaming_sessionized")
    def _():
        from whatsapp_vectordb_spark.harness import streaming_sessionized

        streaming_sessionized(spark, sf_dir).count()

    @timed("ann_lsh_topk")
    def _():
        from whatsapp_vectordb_spark.operators.ann import portable_lsh_topk

        # numpy signature impl + registry-provided dim: the at-scale form
        # (bit-identical buckets to the expr form the oracle checks)
        portable_lsh_topk(emb, query_id=0, k=10, round_to=6, impl="numpy", dim=64).collect()

    # --- 1536-dim fidelity (the reference's one hard constant: dimension
    # 1536, reference main.go:27) — a deterministic 24× tiling of the
    # 64-dim fixture preserves cosine structure exactly (dot and both
    # norms scale by the same factor), so these measure the engine at the
    # reference's real dimensionality. Corpus prep is cached outside the
    # timed region; the two entries record the expr-HOF vs numpy crossover.
    emb1536 = pin(
        emb.select("vec_id", F.flatten(F.array_repeat(F.col("embedding"), 24)).alias("embedding"))
    )
    q1536 = emb1536.where(F.col("vec_id") == 0).head()["embedding"]
    qrows1536 = emb1536.limit(16).select("vec_id", "embedding").collect()

    @timed("knn_topk_1536_expr")
    def _():
        topk(emb1536, q1536, k=10).collect()

    @timed("knn_topk_1536_numpy")
    def _():
        # the round-6 Arrow/matmul kernel — the at-scale path at this
        # dim (rank-identical to expr, pinned by tests/test_search.py)
        topk(emb1536, q1536, k=10, impl="numpy").collect()

    @timed("knn_batched_1536_twophase")
    def _():
        queries = [(r["vec_id"], r["embedding"]) for r in qrows1536]
        topk_batched_twophase(emb1536, queries, k=10).count()

    @timed("ann_pq1536_adc_topk")
    def _():
        # PQ at the reference's ada-002 shape (dim 1536, main.go:27):
        # m=16/ksub=16 codes cut 1536×8 B doubles to 16 B — the
        # bytes-per-vector story measured at real dimensionality, not the
        # dim-64 sweep shape. Build+encode+scan all timed (one-shot cost);
        # at scale build amortizes via PqIndex.save and only the
        # integer-ADC scan recurs.
        from whatsapp_vectordb_spark.operators.ann import PqIndex

        pq = PqIndex.build(emb1536, m=16, ksub=16, sample_rows=1000, seed=0)
        enc = pq.encode(emb1536)
        pq.adc_topk(enc, q1536, k=10).collect()

    @timed("dedup_embedding_lsh")
    def _():
        from whatsapp_vectordb_spark.operators.ann import portable_lsh_join

        # 32 planes / 4 bands = 8-bit chunks: at 2k+ vectors the 4-bit
        # default floods the band join with random collisions (n²/16 per
        # band); 8-bit chunks cost one extra signature matmul and cut the
        # candidate volume 16× — measured 2.5× faster end-to-end here
        portable_lsh_join(
            emb.select("vec_id", "embedding"),
            threshold=0.9,
            n_planes=32,
            bands=4,
            impl="numpy",
            dim=64,
        ).count()

    @timed("text_search_bm25")
    def _():
        from whatsapp_vectordb_spark.operators.textops import bm25_search

        bm25_search(docs, ["data", "processing", "scale"], top_n=10).collect()

    @timed("cluster_kmeans_step")
    def _():
        from whatsapp_vectordb_spark.harness import cluster_kmeans_step

        cluster_kmeans_step(spark, sf_dir).collect()

    @timed("ann_ivf_portable_build_probe")
    def _():
        from whatsapp_vectordb_spark.harness import ann_ivf_portable_build_probe

        ann_ivf_portable_build_probe(spark, sf_dir).collect()

    @timed("text_search_rm3")
    def _():
        from whatsapp_vectordb_spark.operators.textops import rm3_search

        rm3_search(docs, ["data", "processing", "scale"], top_n=10).collect()

    @timed("ann_pq_adc_topk")
    def _():
        from whatsapp_vectordb_spark.operators.ann import PqIndex

        pq = PqIndex.build(emb, m=8, ksub=16, sample_rows=1000, seed=0)
        enc = pq.encode(emb)
        pq.adc_topk(enc, qvec, k=10).collect()

    @timed("events_asof_purchase")
    def _():
        from whatsapp_vectordb_spark.harness import events_asof_purchase

        events_asof_purchase(spark, sf_dir).count()

    @timed("rel_pricing_summary")
    def _():
        rel_pricing_summary(spark, sf_dir).collect()

    @timed("rel_nation_revenue")
    def _():
        rel_nation_revenue(spark, sf_dir).collect()

    @timed("events_sessionized")
    def _():
        events_sessionized_counts(spark, sf_dir).count()

    @timed("text_repetition")
    def _():
        from whatsapp_vectordb_spark.operators.textops import repetition_scores

        repetition_scores(docs).select(F.sum("n_trigrams")).collect()

    @timed("rel_bloom_pruned_join")
    def _():
        from whatsapp_vectordb_spark.harness import rel_bloom_pruned_join

        rel_bloom_pruned_join(spark, sf_dir).collect()

    @timed("text_line_dedup")
    def _():
        from whatsapp_vectordb_spark.harness import text_line_dedup

        text_line_dedup(spark, sf_dir).count()

    @timed("text_maxsim_topk")
    def _():
        from whatsapp_vectordb_spark.harness import text_maxsim_topk

        text_maxsim_topk(spark, sf_dir).collect()

    @timed("ann_jl_topk")
    def _():
        from whatsapp_vectordb_spark.harness import ann_jl_topk

        ann_jl_topk(spark, sf_dir).collect()

    @timed("text_cdc_chunk_dedup")
    def _():
        from whatsapp_vectordb_spark.harness import text_cdc_chunk_dedup

        text_cdc_chunk_dedup(spark, sf_dir).count()

    @timed("curate_dsir_weights")
    def _():
        from whatsapp_vectordb_spark.harness import curate_dsir_weights

        curate_dsir_weights(spark, sf_dir).count()

    @timed("ann_mrl_topk")
    def _():
        from whatsapp_vectordb_spark.harness import ann_mrl_topk

        ann_mrl_topk(spark, sf_dir).collect()

    @timed("text_chunk_overlap")
    def _():
        from whatsapp_vectordb_spark.harness import text_chunk_overlap

        text_chunk_overlap(spark, sf_dir).count()

    @timed("text_phrase_search")
    def _():
        from whatsapp_vectordb_spark.harness import text_phrase_search

        text_phrase_search(spark, sf_dir).count()

    @timed("pack_shard_assign")
    def _():
        from whatsapp_vectordb_spark.harness import pack_shard_assign

        pack_shard_assign(spark, sf_dir).count()

    @timed("text_rake_keywords")
    def _():
        from whatsapp_vectordb_spark.harness import text_rake_keywords

        text_rake_keywords(spark, sf_dir).count()

    # --- round-7 composites (VERDICT r7 #4): the convergence loop, the
    # streaming capstone, and quality-elected canonicals each have driver
    # rows but had no bench entry — a regression in the Lloyd loop or the
    # capstone's per-batch bound was invisible. Timed via their harness
    # entries so the measurement covers the exact driver-row plan.
    @timed("cluster_kmeans_converge")
    def _():
        from whatsapp_vectordb_spark.harness import cluster_kmeans_converge

        cluster_kmeans_converge(spark, sf_dir).collect()

    @timed("cluster_kmeans_mapside")
    def _():
        # the production update path (round 8) — timed next to its
        # portable twin so the mapside/portable gap is a recorded ratio
        from whatsapp_vectordb_spark.harness import cluster_kmeans_mapside

        cluster_kmeans_mapside(spark, sf_dir).collect()

    @timed("streaming_pipeline_capstone")
    def _():
        from whatsapp_vectordb_spark.harness import streaming_pipeline_capstone

        streaming_pipeline_capstone(spark, sf_dir).collect()

    @timed("dedup_canonical_by_quality")
    def _():
        from whatsapp_vectordb_spark.harness import dedup_canonical_by_quality

        dedup_canonical_by_quality(spark, sf_dir).count()

    # --- the r14 index-family rows, benched for round-over-round drift
    # visibility at sf0.1 (VERDICT r14 #6). Both BUILD-INCLUSIVE by the
    # registry contract: the semantic index fits its quantizer and
    # ingests the augmented corpus in 3 add_batch calls; the ingest row
    # builds + saves + add_batches + reloads the persisted IVF-SQ8
    # artifact. Recurring-cost stories live in BASELINE.md's 1M records.
    @timed("dedup_semdedup_index")
    def _():
        from whatsapp_vectordb_spark.harness import dedup_semdedup_index

        dedup_semdedup_index(spark, sf_dir).count()

    @timed("ann_ivf_sq8_index_ingest")
    def _():
        from whatsapp_vectordb_spark.harness import ann_ivf_sq8_index_ingest

        ann_ivf_sq8_index_ingest(spark, sf_dir).count()

    @timed("ann_ivfpq_index_ingest")
    def _():
        from whatsapp_vectordb_spark.harness import ann_ivfpq_index_ingest

        ann_ivfpq_index_ingest(spark, sf_dir).count()

    # --- the mutation verbs on both persisted artifacts (upsert/delete
    # by id — the reference's remaining Pinecone surface). BUILD-
    # INCLUSIVE like their ingest twins: build + save + three atomic
    # mutation commits + reload + serve.
    @timed("ann_ivf_sq8_index_mutate")
    def _():
        from whatsapp_vectordb_spark.harness import ann_ivf_sq8_index_mutate

        ann_ivf_sq8_index_mutate(spark, sf_dir).count()

    @timed("ann_ivfpq_index_mutate")
    def _():
        from whatsapp_vectordb_spark.harness import ann_ivfpq_index_mutate

        ann_ivfpq_index_mutate(spark, sf_dir).count()

    # --- the r15/r16 serving-surface rows (filtered, CDC, batched
    # re-rank) on BOTH persisted tiers, benched for round-over-round
    # drift visibility (VERDICT r15 #2/#5/#6). All BUILD-INCLUSIVE per
    # the registry contract; recurring-cost stories live in BASELINE.md's
    # 1M-scale records.
    @timed("ann_ivf_sq8_filtered_topk")
    def _():
        from whatsapp_vectordb_spark.harness import ann_ivf_sq8_filtered_topk

        ann_ivf_sq8_filtered_topk(spark, sf_dir).count()

    @timed("ann_ivfpq_filtered_topk")
    def _():
        from whatsapp_vectordb_spark.harness import ann_ivfpq_filtered_topk

        ann_ivfpq_filtered_topk(spark, sf_dir).count()

    @timed("ann_ivf_sq8_batched_rerank_topk")
    def _():
        from whatsapp_vectordb_spark.harness import (
            ann_ivf_sq8_batched_rerank_topk,
        )

        ann_ivf_sq8_batched_rerank_topk(spark, sf_dir).count()

    @timed("ann_ivfpq_batched_rerank_topk")
    def _():
        from whatsapp_vectordb_spark.harness import ann_ivfpq_batched_rerank_topk

        ann_ivfpq_batched_rerank_topk(spark, sf_dir).count()

    @timed("streaming_ivf_sq8_cdc")
    def _():
        from whatsapp_vectordb_spark.harness import streaming_ivf_sq8_cdc

        streaming_ivf_sq8_cdc(spark, sf_dir).count()

    @timed("streaming_ivfpq_cdc")
    def _():
        from whatsapp_vectordb_spark.harness import streaming_ivfpq_cdc

        streaming_ivfpq_cdc(spark, sf_dir).count()

    # --- the r16 lifecycle rows (snapshot time travel + policy-driven
    # compaction), one per family — the PQ twins share the code paths;
    # rebuild is build-dominated by design and rides the run_query
    # series in BASELINE.md instead of the per-round bench.
    @timed("ann_ivf_sq8_time_travel")
    def _():
        from whatsapp_vectordb_spark.harness import ann_ivf_sq8_time_travel

        ann_ivf_sq8_time_travel(spark, sf_dir).count()

    @timed("ann_ivf_sq8_maintenance_tick")
    def _():
        from whatsapp_vectordb_spark.harness import ann_ivf_sq8_maintenance_tick

        ann_ivf_sq8_maintenance_tick(spark, sf_dir).count()

    # --- the r17 retention rows, one per family (the PQ / winnow /
    # semdedup twins share the code paths): a pre-fold snapshot served
    # THROUGH a fold via the retained chain, and the dedup tier's
    # verdict-set replay through a retained compaction.
    @timed("ann_ivf_sq8_snapshot_retention")
    def _():
        from whatsapp_vectordb_spark.harness import (
            ann_ivf_sq8_snapshot_retention,
        )

        ann_ivf_sq8_snapshot_retention(spark, sf_dir).count()

    @timed("dedup_minhash_index_time_travel")
    def _():
        from whatsapp_vectordb_spark.harness import (
            dedup_minhash_index_time_travel,
        )

        dedup_minhash_index_time_travel(spark, sf_dir).count()

    @timed("ann_graph_beam_topk")
    def _():
        from whatsapp_vectordb_spark.harness import ann_graph_beam_topk

        ann_graph_beam_topk(spark, sf_dir).count()

    # --- WhatsApp Python DataSource at sf scale: the connector's
    # per-partition overhead on the record next to spark.read.text over
    # the SAME 32 shard files (partition-per-file on both sides). Corpus
    # synthesis (one chat line per document) happens once, untimed.
    import shutil
    import tempfile

    from whatsapp_vectordb_spark.harness import _chat_lines_df
    from whatsapp_vectordb_spark.sources.whatsapp_source import register as _ws_register

    from whatsapp_vectordb_spark.session import local_scratch_root as _lsr

    chat_dir = tempfile.mkdtemp(prefix="wvs_bench_chat_", dir=_lsr())
    chat_rows = _chat_lines_df(spark, sf_dir).orderBy("doc_id").collect()
    shards = [open(os.path.join(chat_dir, f"chat_{i:02d}.txt"), "w", encoding="utf-8") for i in range(32)]
    for i, r in enumerate(chat_rows):
        shards[i % 32].write(r["value"] + "\n")
    for f in shards:
        f.close()
    ws_fmt = _ws_register(spark)

    @timed("whatsapp_source_read")
    def _():
        (
            spark.read.format(ws_fmt)
            .load(chat_dir)
            .agg(F.count("*"), F.count("sender"), F.sum(F.length("message")))
            .collect()
        )

    @timed("whatsapp_text_read_parse")
    def _():
        # JVM-side twin: read.text + the compat regex parse — the floor
        # the Python DataSource is graded against
        from whatsapp_vectordb_spark.parse import parse_chat_lines

        (
            parse_chat_lines(spark.read.text(chat_dir))
            .agg(F.count("*"), F.count("sender"), F.sum(F.length("message")))
            .collect()
        )

    # --- Hebrew chat export through the same connector (VERDICT r8 #8):
    # multi-byte senders/messages exercise the UTF-8 path of the Python
    # source's regex + Arrow transfer; a mangle or slow-path regression in
    # multi-byte handling shows up here as a number, separate from the
    # ASCII read above. Same shard layout, synthesis untimed.
    from whatsapp_vectordb_spark.harness import _chat_lines_he_df

    chat_he_dir = tempfile.mkdtemp(prefix="wvs_bench_chat_he_", dir=_lsr())
    he_rows = _chat_lines_he_df(spark, sf_dir).orderBy("doc_id").collect()
    shards = [open(os.path.join(chat_he_dir, f"chat_{i:02d}.txt"), "w", encoding="utf-8") for i in range(32)]
    for i, r in enumerate(he_rows):
        shards[i % 32].write(r["value"] + "\n")
    for f in shards:
        f.close()

    @timed("whatsapp_source_read_he")
    def _():
        (
            spark.read.format(ws_fmt)
            .load(chat_he_dir)
            .where(F.col("parse_ok"))
            .groupBy("sender")
            .agg(F.count("*"), F.sum(F.length("message")))
            .collect()
        )

    shutil.rmtree(chat_dir, ignore_errors=True)
    shutil.rmtree(chat_he_dir, ignore_errors=True)

    canary_post = _host_canary()
    io_post = _io_canary_mbs()
    canary = max(canary_pre, canary_post)
    io_canary = min(io_pre, io_post)
    total = round(sum(timings.values()), 4)
    payload = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_all": timings_all,
        "reps": reps,
        "sf": sf,
        "n_embeddings": n_emb,
        # host-state evidence (VERDICT r15 #8): min-of-7 matmul canary
        # before and after the run; degraded = worse reading > 3× the
        # quiet floor. Timings recorded under a degraded canary should
        # not be used to (re)level BASELINE.md.
        "canary_sec": {"pre": canary_pre, "post": canary_post},
        "io_write_mb_s": {"pre": io_pre, "post": io_post},
        "host_degraded": canary > CANARY_DEGRADED_SEC
        or io_canary < IO_CANARY_DEGRADED_MBS,
        # [query-name, sec-since-bench-start, cpu-canary-sec, io-MB/s]
        # sampled immediately BEFORE each query's timed reps (r18): a
        # burst mid-run is attributable to the exact queries it brackets.
        "canary_timeline": canary_timeline,
    }
    if quiet_wait is not None:
        payload["require_quiet"] = quiet_wait
        if payload["host_degraded"]:
            # the bounded gate is exhausted or the window closed mid-run
            # — record the failure explicitly (VERDICT r16 #6's "Done")
            payload["quiet_retry_exhausted"] = (
                f"--require-quiet waited {quiet_wait['polls']}/"
                f"{quiet_wait['max_polls']} polls "
                f"(quiet_achieved={quiet_wait['quiet_achieved']}) but the "
                "run still recorded degraded canaries"
            )
    # The driver's BENCH_r*.json capture keeps only a truncated stdout
    # tail, losing the head of this one-line JSON (the first ~4 queries'
    # timings were unrecoverable from r9's artifact — VERDICT r9 #4). Also
    # write the complete dict to a repo file, pretty-printed, committed
    # per round so the full record survives. Round inference (fixed in
    # r11 — the old flat "+1" misnamed the r10 driver run BENCH_LOCAL_r11
    # because the driver writes CORRECTNESS_r{N} BEFORE running bench):
    # let C = newest CORRECTNESS round. If BENCH_r{C}.json is absent we
    # are INSIDE the driver's round C (correctness written, bench capture
    # not yet) → this run measures round C. If it exists, round C is
    # fully recorded and this is a local run during round C+1.
    # Overridable for ad-hoc runs via SPARK_GRAFT_BENCH_OUT.
    out_path = os.environ.get("SPARK_GRAFT_BENCH_OUT")
    if out_path is None:
        import glob as _glob
        import re as _re

        here = os.path.dirname(os.path.abspath(__file__))
        rounds = [
            int(m.group(1))
            for p in _glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))
            if (m := _re.search(r"r(\d+)", os.path.basename(p)))
        ]
        if not rounds:
            rnd = 1
        else:
            rnd = max(rounds)
            if os.path.exists(os.path.join(here, f"BENCH_r{rnd:02d}.json")):
                rnd += 1
        out_path = os.path.join(here, f"BENCH_LOCAL_r{rnd:02d}.json")
        # Never clobber a COMMITTED round record (VERDICT r15 What's
        # wrong #2: the driver's end-of-round re-run overwrote the
        # committed quiet-session record in the working tree, so an
        # auditor reading the file got the noisy numbers under the quiet
        # record's name). If HEAD already carries this round's file,
        # divert to -retryN; the stdout JSON line stays the contract.
        try:
            import subprocess

            committed = (
                subprocess.run(
                    ["git", "cat-file", "-e", f"HEAD:{os.path.basename(out_path)}"],
                    cwd=here,
                    capture_output=True,
                ).returncode
                == 0
            )
        except OSError:
            committed = False
        if committed:
            n = 1
            while os.path.exists(
                os.path.join(here, f"BENCH_LOCAL_r{rnd:02d}-retry{n}.json")
            ):
                n += 1
            out_path = os.path.join(here, f"BENCH_LOCAL_r{rnd:02d}-retry{n}.json")
    try:
        with open(out_path, "w") as f:
            json.dump(payload, f, indent=1, sort_keys=True)
            f.write("\n")
    except OSError:
        pass  # stdout line is still the contract; the file is belt+braces
    print(json.dumps(payload))
    # Parse-proof summary printed LAST (VERDICT r13 #4/#7): the driver's
    # BENCH_r{N}.json keeps only a ~2000-char stdout TAIL, and the full
    # line above outgrew it (r13's artifact has "parsed": null). This
    # compact line always fits the tail: total, count, and the worst-3
    # ratios vs BASELINE.md's recorded sf0.1 medians (the 2×-rule table,
    # re-recorded round 2 — keep in sync with BASELINE.md §"Recorded
    # numbers" when a query is re-leveled there).
    comp = {q: r for q, r in RECORDED_SF01_MEDIANS.items() if q in timings}
    ratios = {q: round(timings[q] / r, 2) for q, r in comp.items()}
    worst3 = dict(sorted(ratios.items(), key=lambda kv: -kv[1])[:3])
    summary = {
        "metric": "headline_summary",
        "total_sec": total,
        "n_queries": len(timings),
        "reps": reps,
        "sf": sf,
        "recorded_subtotal_sec": round(sum(comp.values()), 2),
        "measured_subtotal_sec": round(sum(timings[q] for q in comp), 2),
        "vs_recorded": round(sum(timings[q] for q in comp) / sum(comp.values()), 2)
        if comp
        else None,
        "worst3_vs_recorded": worst3,
        "canary_sec": canary,
        "io_write_mb_s": io_canary,
        "host_degraded": canary > CANARY_DEGRADED_SEC
        or io_canary < IO_CANARY_DEGRADED_MBS,
        "full_record": os.path.basename(out_path),
    }
    print(json.dumps(summary))
    # Per-query line printed ABSOLUTELY LAST (VERDICT r17 #2): the
    # driver's per-query PERF comparator has been blind for two rounds
    # because the full payload line outgrew the 2000-char stdout tail.
    # "value" stays the sum-of-medians headline total (identical to the
    # full payload's); "queries" here is MIN-of-reps (the low-noise
    # statistic). Additions-only: the payload and summary lines above
    # are unchanged.
    print(per_query_tail_line(timings_all, total, sf))
    spark.stop()


if __name__ == "__main__":
    main()
