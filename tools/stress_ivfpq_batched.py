"""Batched residual IVF-PQ serving at 1M×1536: the one-scan-for-N case
for the memory-bound persisted tier (r15 — the PQ twin of
tools/stress_ivf_sq8_batched.py).

The batched probe's test pins bit-parity with per-query probes; this
records WHY it exists at scale — N queries pay ONE scan of the union of
probed 16-byte-code cells instead of N sequential serving round-trips.
On this tier the scanned bytes are tiny (codes dir ≈ 29 MB at 1M×1536),
so the amortized win is dominated by job-scheduling overhead — exactly
the round-trip cost a serving batch exists to amortize.

Protocol:
  1. synthesize 1M×1536 (same corpus as the ingest stress), build
     IvfPqIndex (IVF64,PQ16, ksub=256, 50k-sample fit), save codes-only;
  2. Q queries (mix of planted and noise ids), nprobe=2;
  3. time (a) the per-query loop: Q × ``probe`` (mapInPandas LUT ADC);
          (b) ONE ``probe_batched`` call (same Q, same cells);
     assert (a) ≡ (b) per query (bit-equal int64 distances).

    python tools/stress_ivfpq_batched.py [n] [dim] [n_queries]

Defaults: 1,000,000 × 1536, 32 queries. One JSON line per stage.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

def _scratch_root():
    from whatsapp_vectordb_spark.session import local_scratch_root

    return local_scratch_root()


NPROBE = 2


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = int(args[0]) if args else 1_000_000
    dim = int(args[1]) if len(args) > 1 else 1536
    n_queries = int(args[2]) if len(args) > 2 else 32

    import numpy as np
    from pyspark.sql import functions as F

    from whatsapp_vectordb_spark.operators.ann import IvfPqIndex
    from whatsapp_vectordb_spark.session import get_spark

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")
    spark = get_spark(
        app_name="ivfpq-batched-stress",
        extra_conf={"spark.driver.maxResultSize": "4g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="wvs_ivfpq_b_", dir=_scratch_root())
    import atexit

    atexit.register(shutil.rmtree, root, ignore_errors=True)
    out: dict = {"metric": "ivfpq_batched_stress", "n": n, "dim": dim,
                 "n_queries": n_queries, "nprobe": NPROBE,
                 "n_centroids": 64, "m": 16, "ksub": 256}

    base = np.random.default_rng(7).standard_normal(dim)

    def synth(batches):
        import pandas as pd

        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rng = np.random.default_rng(1_000_003 + int(ids[0]))
            m = rng.standard_normal((len(ids), dim)).astype(np.float32)
            planted = ids % 1000 == 0
            if planted.any():
                m[planted] = (
                    base[None, :]
                    + 0.25 * rng.standard_normal((int(planted.sum()), dim))
                ).astype(np.float32)
            yield pd.DataFrame({"vec_id": ids, "embedding": list(m)})

    corpus_path = os.path.join(root, "corpus")
    t0 = time.perf_counter()
    (
        spark.range(n)
        .repartition(64)
        .mapInPandas(synth, schema="vec_id long, embedding array<float>")
        .write.mode("overwrite")
        .parquet(corpus_path)
    )
    out["synth_write_s"] = round(time.perf_counter() - t0, 1)
    corpus = spark.read.parquet(corpus_path)
    print(json.dumps(out), flush=True)

    t0 = time.perf_counter()
    idx_path = os.path.join(root, "index")
    IvfPqIndex.build(
        corpus, n_centroids=64, m=16, ksub=256, sample_rows=50_000
    ).save(idx_path, store_vectors=False)
    out["build_save_s"] = round(time.perf_counter() - t0, 1)
    loaded = IvfPqIndex.load(spark, idx_path)
    print(json.dumps(out), flush=True)

    qids = []
    for i in range(n_queries):
        qids.append((i // 2 + 1) * 1000 if i % 2 == 0 else 7 * i + 3)
    qrows = corpus.where(F.col("vec_id").isin(qids)).collect()
    queries = [(int(r["vec_id"]), r["embedding"]) for r in qrows]
    probe_map = {qid: loaded.probe_cells(qv, NPROBE) for qid, qv in queries}
    union_cells = sorted({c for cs in probe_map.values() for c in cs})
    out["union_cells"] = len(union_cells)
    out["cell_rescans_saved"] = round(
        sum(len(cs) for cs in probe_map.values()) / max(1, len(union_cells)), 2
    )

    # (a) per-query loop — the N-round-trips baseline (warm one first)
    loaded.probe(queries[0][1], k=10, nprobe=NPROBE).collect()
    t0 = time.perf_counter()
    solo = {}
    for qid, qv in queries:
        solo[qid] = [
            (r["vec_id"], r["score"])
            for r in loaded.probe(qv, k=10, nprobe=NPROBE).collect()
        ]
    out["per_query_loop_s"] = round(time.perf_counter() - t0, 2)
    print(json.dumps(out), flush=True)

    # (b) ONE batched call — same queries, same cells (warm, then time)
    loaded.probe_batched(queries, k=10, nprobe=NPROBE).count()
    t0 = time.perf_counter()
    brows = loaded.probe_batched(queries, k=10, nprobe=NPROBE).collect()
    batched_elapsed = time.perf_counter() - t0
    out["batched_s"] = round(batched_elapsed, 2)
    by_q: dict = {}
    for r in brows:
        by_q.setdefault(r["query_id"], []).append((r["vec_id"], r["score"]))
    for qid in by_q:
        by_q[qid].sort(key=lambda t: (t[1], t[0]))  # ascending distance
    mismatch = [qid for qid, _ in queries if by_q.get(qid) != solo[qid]]
    assert not mismatch, f"batched != per-query for {mismatch}"
    out["batched_equals_loop"] = True
    # divide by the UNROUNDED elapsed time — round(0.004, 2) == 0.0 and a
    # sub-5ms batched collect at tiny args would ZeroDivisionError here
    out["batched_speedup"] = round(out["per_query_loop_s"] / batched_elapsed, 2)
    out["ms_per_query_batched"] = round(1000 * batched_elapsed / n_queries, 1)
    print(json.dumps(out), flush=True)
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
