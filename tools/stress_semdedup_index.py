"""SemDedupIndex ingest at the 1M stress shape (r14): what the
incremental SEMANTIC dedup tier costs per arriving batch — the ingest
twin of tools/stress_semdedup.py exactly as the index twins the batch
operator.

Protocol:
  1. synthesize 1M×64 (same corpus as stress_semdedup: isotropic +
     planted duplicate groups, every 1000th id one of 100 shared bases);
  2. ingest HALF the corpus as batch 1 (fits + freezes the quantizer,
     1024 cells), the other half as batch 2 — each add_batch is one
     map-only assign + ONE cogroup shuffle on centroid + per-cluster
     numpy greedy + one atomic batch-dir commit;
  3. verify the greedy-uniqueness certificate on the PLANTED rows: every
     (group, cluster) cohort keeps exactly one member across batches
     (first-arrival wins — a batch-2 clone of a batch-1 representative
     must be dominated);
  4. compact() and re-verify the state fingerprint.

    python tools/stress_semdedup_index.py [n] [dim] [n_clusters]

Defaults: 1,000,000 × 64, 1024 clusters. One JSON line per stage.
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
    dim = int(args[1]) if len(args) > 1 else 64
    n_clusters = int(args[2]) if len(args) > 2 else 1024

    import numpy as np
    from pyspark.sql import functions as F

    from whatsapp_vectordb_spark.operators.dedup_index import SemDedupIndex
    from whatsapp_vectordb_spark.session import get_spark

    spark = get_spark(app_name="semdedup-index-stress")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="wvs_sd_idx_", dir=_scratch_root())
    import atexit

    atexit.register(shutil.rmtree, root, ignore_errors=True)
    out: dict = {"metric": "semdedup_index_stress", "n": n, "dim": dim,
                 "n_clusters": n_clusters}

    n_groups = 100
    bases = np.random.default_rng(7).standard_normal((n_groups, dim))

    def synth(batches):
        import pandas as pd

        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rng = np.random.default_rng(1_000_003 + int(ids[0]))
            m = rng.standard_normal((len(ids), dim)).astype(np.float32)
            planted = ids % 1000 == 0
            if planted.any():
                g = (ids[planted] // 1000) % n_groups
                m[planted] = (
                    bases[g] + 0.005 * rng.standard_normal((int(planted.sum()), dim))
                ).astype(np.float32)
            yield pd.DataFrame({"vec_id": ids, "embedding": list(m)})

    t0 = time.perf_counter()
    corpus = (
        spark.range(n)
        .repartition(64)
        .mapInPandas(synth, schema="vec_id long, embedding array<float>")
        .cache()
    )
    corpus.count()
    out["synth_s"] = round(time.perf_counter() - t0, 1)
    print(json.dumps(out), flush=True)

    idx = SemDedupIndex(
        spark, os.path.join(root, "idx"), threshold=0.95, n_clusters=n_clusters
    )
    half = n // 2
    flags = []
    for i, b in enumerate(
        (corpus.where(F.col("vec_id") < half), corpus.where(F.col("vec_id") >= half))
    ):
        t0 = time.perf_counter()
        r = idx.add_batch(b).withColumn("batch_no", F.lit(i)).cache()
        nrows = r.count()
        dt = time.perf_counter() - t0
        out[f"add_batch_{i}_s"] = round(dt, 1)
        out[f"add_batch_{i}_rows_per_s"] = int(nrows / dt)
        flags.append(r)
        print(json.dumps(out), flush=True)
    res = flags[0].unionByName(flags[1])

    # planted verification: one survivor per (group, cluster) cohort, and
    # first-arrival-wins — every kept planted row is the cohort's RANK
    # MINIMUM by (batch_no, cent_sim, vec_id)
    planted = res.where(F.col("vec_id") % 1000 == 0).select(
        ((F.col("vec_id") / 1000).cast("long") % n_groups).alias("grp"),
        "centroid", "batch_no", "cent_sim", "vec_id", "kept",
    )
    per = planted.groupBy("grp", "centroid").agg(
        F.count("*").alias("members"),
        F.sum(F.col("kept").cast("int")).alias("survivors"),
        F.min(F.struct("batch_no", "cent_sim", "vec_id")).alias("first"),
        F.min(
            F.when(F.col("kept"), F.struct("batch_no", "cent_sim", "vec_id"))
        ).alias("first_kept"),
    )
    bad = per.where(
        ((F.col("members") > 1) & (F.col("survivors") != 1))
        | (F.col("first") != F.col("first_kept"))
    ).count()
    coh = per.agg(
        F.count("*").alias("cohorts"), F.sum("members").alias("planted_total")
    ).collect()[0]
    out["planted_total"] = int(coh["planted_total"])
    out["group_cluster_cohorts"] = int(coh["cohorts"])
    out["cohort_violations"] = bad
    assert bad == 0, "a cohort kept != 1 survivor or a non-first member"
    kept_total = res.where("kept").count()
    out["kept"] = kept_total
    out["removed"] = n - kept_total
    print(json.dumps(out), flush=True)

    fp = idx._content_fingerprint(idx._stored("kept"))
    t0 = time.perf_counter()
    merged = idx.compact()
    out["compact_s"] = round(time.perf_counter() - t0, 1)
    out["compact_merged_dirs"] = merged
    assert idx._content_fingerprint(idx._stored("kept")) == fp
    out["post_compact_fingerprint_equal"] = True
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
