"""IvfPqIndex frozen-codebook INGEST at 1M×1536: the memory-bound
persisted tier's maintenance cost (r15 — the PQ twin of
tools/stress_ivf_sq8_ingest.py, same protocol so the two artifacts'
numbers read side by side).

Why this tier exists at 100 TB: PQ codes are m bytes/vector against
SQ8's dim bytes — at the reference's dim=1536 (main.go:27) and m=16
that is a ~96× smaller serving table (16 B vs 1536 B/vector), the
layout a RAM-resident corpus actually deploys (FAISS ``IVF64,PQ16``).
The price is residual-codebook encode (m small matmuls per batch)
instead of SQ8's scalar quantize; this tool records that price.

Protocol (mirrors the SQ8 tool exactly):
  1. synthesize the 1M×1536 base corpus, build with a 50k-sample
     coarse+codebook fit (n_centroids=64, m=16, ksub=256), ``save``
     with the co-located float store;
  2. ``add_batch`` batches of 10k / 100k rows with ``path=`` — each is
     ONE map-only normalize→assign→residual→encode pass + ONE staged
     write + ONE atomic rename (codes + co-located floats together);
  3. reload and search (co-located re-rank): planted exact copies of a
     base vector must be served from the batch dirs;
  4. ``save`` once more = compaction, timed.

    python tools/stress_ivfpq_ingest.py [n] [dim] [batch_rows...]

Defaults: 1,000,000 × 1536, batches of 10,000 and 100,000. One JSON
line per stage (BASELINE.md record format).
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



def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = int(args[0]) if args else 1_000_000
    dim = int(args[1]) if len(args) > 1 else 1536
    batch_sizes = [int(a) for a in args[2:]] or [10_000, 100_000]

    import numpy as np
    from pyspark.sql import functions as F

    from whatsapp_vectordb_spark.operators.ann import IvfPqIndex
    from whatsapp_vectordb_spark.session import get_spark

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")
    # the 50k×1536 training-sample collect serializes ~1.1 GB of task
    # results — above the 1 GiB default maxResultSize (a one-off,
    # driver-bounded build cost; the 48 GiB heap holds it comfortably)
    spark = get_spark(
        app_name="ivfpq-ingest-stress",
        extra_conf={"spark.driver.maxResultSize": "4g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="wvs_ivfpq_ingest_", dir=_scratch_root())
    import atexit

    atexit.register(shutil.rmtree, root, ignore_errors=True)
    out: dict = {"metric": "ivfpq_ingest_stress", "n": n, "dim": dim,
                 "n_centroids": 64, "m": 16, "ksub": 256}

    def synth_fn(offset: int):
        def synth(batches):
            import pandas as pd

            for pdf in batches:
                ids = pdf["id"].to_numpy() + offset
                rng = np.random.default_rng(1_000_003 + int(ids[0]))
                m = rng.standard_normal((len(ids), dim)).astype(np.float32)
                yield pd.DataFrame({"vec_id": ids, "embedding": list(m)})

        return synth

    corpus_path = os.path.join(root, "corpus")
    t0 = time.perf_counter()
    (
        spark.range(n)
        .repartition(64)
        .mapInPandas(synth_fn(0), schema="vec_id long, embedding array<float>")
        .write.mode("overwrite")
        .parquet(corpus_path)
    )
    out["synth_write_s"] = round(time.perf_counter() - t0, 1)
    base = spark.read.parquet(corpus_path)
    print(json.dumps(out), flush=True)

    t0 = time.perf_counter()
    idx = IvfPqIndex.build(
        base, n_centroids=64, m=16, ksub=256, sample_rows=50_000
    )
    idx_path = os.path.join(root, "index")
    idx.save(idx_path, store_vectors=True)
    out["build_save_s"] = round(time.perf_counter() - t0, 1)
    codes_bytes = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(os.path.join(idx_path, "codes"))
        for f in fs
    )
    out["codes_dir_mb"] = round(codes_bytes / 1e6, 1)
    print(json.dumps(out), flush=True)

    # ingest batches: fresh rows + ONE planted exact copy of base vec 0
    qvec = base.where(F.col("vec_id") == 0).head()["embedding"]
    for bs in batch_sizes:
        batch = (
            spark.range(bs - 1)
            .repartition(16)
            .mapInPandas(
                synth_fn(10_000_000 + bs), schema="vec_id long, embedding array<float>"
            )
            .unionByName(
                spark.createDataFrame(
                    [(int(20_000_000 + bs), list(map(float, qvec)))],
                    "vec_id long, embedding array<float>",
                )
            )
        )
        loaded = IvfPqIndex.load(spark, idx_path)
        t0 = time.perf_counter()
        loaded.add_batch(batch, path=idx_path)
        out[f"add_batch_{bs}_s"] = round(time.perf_counter() - t0, 1)
        out[f"add_batch_{bs}_rows_per_s"] = int(
            bs / (time.perf_counter() - t0)
        )
        print(json.dumps(out), flush=True)

    # reload + search through the co-located store: planted copies must
    # be served from the batch dirs (identical vector ⇒ identical codes
    # ⇒ identical ADC score; exact re-rank ties with the original)
    re = IvfPqIndex.load(spark, idx_path)
    out["batch_dirs"] = len(os.listdir(os.path.join(idx_path, "batches")))
    t0 = time.perf_counter()
    got = [
        r["vec_id"]
        for r in re.search(query_vec=qvec, k=4, nprobe=4, shortlist=64).collect()
    ]
    out["probe_after_ingest_s"] = round(time.perf_counter() - t0, 2)
    planted = {20_000_000 + bs for bs in batch_sizes}
    out["planted_found"] = len(planted & set(got))
    assert out["planted_found"] == len(batch_sizes), got
    print(json.dumps(out), flush=True)

    # compaction: save() folds the batch dirs back into the base layout
    t0 = time.perf_counter()
    re.save(idx_path, store_vectors=True)
    out["compact_save_s"] = round(time.perf_counter() - t0, 1)
    assert not os.path.isdir(os.path.join(idx_path, "batches"))
    folded = IvfPqIndex.load(spark, idx_path)
    got2 = [
        r["vec_id"]
        for r in folded.search(query_vec=qvec, k=4, nprobe=4, shortlist=64).collect()
    ]
    assert got == got2, (got, got2)
    out["post_compact_probe_equal"] = True
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
