"""Metadata-FILTERED serving at 1M×1536: what the ``allowed`` id-set
pre-filter costs the probe across selectivities (r15 — the mutation twin
is tools/stress_ivf_sq8_mutate.py).

The design claim: the filter is ONE broadcast semi-join on id above the
partition filter — pruning intact, nothing shuffles — so a filtered
probe should cost ≈ an unfiltered probe regardless of selectivity, while
guaranteeing k all-allowed results (PRE-filter semantics). Protocol:

  1. synthesize the 1M×1536 corpus, build + save the IVF-SQ8 artifact;
  2. for allowed sets of 0.1% / 1% / 10% of the corpus (the shapes a
     metadata predicate produces), run filtered probes INTERLEAVED with
     unfiltered probes — 3 reps each, medians — so a host-noise window
     hits both sides alike and the RATIO stays meaningful;
  3. assert every filtered result is in the allowed set.

    python tools/stress_ivf_sq8_filtered.py [n] [dim]

One JSON line per stage (BASELINE.md record format).
"""
from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

def _scratch_root():
    from whatsapp_vectordb_spark.session import local_scratch_root

    return local_scratch_root()



def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = int(args[0]) if args else 1_000_000
    dim = int(args[1]) if len(args) > 1 else 1536

    import numpy as np
    from pyspark.sql import functions as F

    from whatsapp_vectordb_spark.operators.ann import IvfSq8Index
    from whatsapp_vectordb_spark.session import get_spark

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")
    spark = get_spark(app_name="ivf-sq8-filtered-stress")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="wvs_sq8_filter_", dir=_scratch_root())
    import atexit

    atexit.register(shutil.rmtree, root, ignore_errors=True)
    out: dict = {"metric": "ivf_sq8_filtered_stress", "n": n, "dim": dim}

    def synth(batches):
        import pandas as pd

        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rng = np.random.default_rng(1_000_003 + int(ids[0]))
            m = rng.standard_normal((len(ids), dim)).astype(np.float32)
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
    base = spark.read.parquet(corpus_path)
    print(json.dumps(out), flush=True)

    t0 = time.perf_counter()
    idx_path = os.path.join(root, "index")
    IvfSq8Index.build(base, n_centroids=64, sample_rows=50_000).save(idx_path)
    out["build_save_s"] = round(time.perf_counter() - t0, 1)
    print(json.dumps(out), flush=True)

    idx = IvfSq8Index.load(spark, idx_path)
    qvec = base.where(F.col("vec_id") == 0).head()["embedding"]

    for frac_ppm, label in ((1_000, "0.1pct"), (10_000, "1pct"), (100_000, "10pct")):
        allowed = base.select("vec_id").where(
            F.pmod(F.xxhash64("vec_id"), 1_000_000) < frac_ppm
        )
        allowed_n = allowed.count()
        filt, unfilt = [], []
        allowed_ids = None
        for _ in range(3):
            t0 = time.perf_counter()
            got = idx.probe(qvec, k=10, nprobe=4, allowed=allowed).collect()
            filt.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            idx.probe(qvec, k=10, nprobe=4).collect()
            unfilt.append(time.perf_counter() - t0)
            if allowed_ids is None:
                allowed_ids = {
                    r["vec_id"] for r in allowed.collect()
                } if allowed_n <= 200_000 else None
            if allowed_ids is not None:
                assert all(r["vec_id"] in allowed_ids for r in got), label
        out[f"allowed_rows_{label}"] = allowed_n
        out[f"probe_filtered_{label}_s"] = round(statistics.median(filt), 2)
        out[f"probe_unfiltered_{label}_s"] = round(statistics.median(unfilt), 2)
        out[f"filter_ratio_{label}"] = round(
            statistics.median(filt) / statistics.median(unfilt), 2
        )
        print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
