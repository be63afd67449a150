"""SemDeDup at the 1M stress shape: the cluster-scoped semantic dedup
operator's scale case (r14; registry row `dedup_semdedup` proves
correctness at gate scale with the expr twin).

Why this is the 100 TB shape: global pairwise cosine is O(n²); SemDeDup
bounds the quadratic work to Σ|cluster|² by growing n_clusters with the
corpus (the paper runs 50k clusters on LAION). The numpy kernel never
materializes pair rows — ONE shuffle groups each cluster, then a blocked
dense matmul finds dominated rows with |block|·|prefix| cosines resident.

Protocol:
  1. synthesize n×dim: isotropic noise + planted duplicate GROUPS —
     every 1000th id takes one of 100 shared base vectors + 0.005·noise
     (mutual cosine ≈ 0.9999, far above τ);
  2. run `semdedup(impl="numpy", sample_rows=100k)` end-to-end (quantizer
     fit on the sample + frozen assign + per-cluster blocked matmul);
  3. verify: every planted group whose members share a cluster keeps
     EXACTLY one member (cluster-scoped recall is the method's contract:
     near-identical vectors land in the same cell; the record prints the
     co-clustered share so the claim is measured, not assumed);
  4. report wall, prune counts, cluster balance.

    python tools/stress_semdedup.py [n] [dim] [n_clusters]

Defaults: 1,000,000 × 64, 1024 clusters. One JSON line per stage.
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = int(args[0]) if args else 1_000_000
    dim = int(args[1]) if len(args) > 1 else 64
    n_clusters = int(args[2]) if len(args) > 2 else 1024

    import numpy as np
    from pyspark.sql import functions as F

    from whatsapp_vectordb_spark.operators.ann import semdedup
    from whatsapp_vectordb_spark.session import get_spark

    spark = get_spark(app_name="semdedup-stress")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"metric": "semdedup_stress", "n": n, "dim": dim,
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

    t0 = time.perf_counter()
    res = semdedup(
        corpus, n_clusters=n_clusters, threshold=0.95,
        impl="numpy", sample_rows=100_000,
    ).cache()
    agg = res.groupBy("kept").count().collect()
    out["semdedup_total_s"] = round(time.perf_counter() - t0, 1)
    counts = {bool(r["kept"]): int(r["count"]) for r in agg}
    out["kept"] = counts.get(True, 0)
    out["removed"] = counts.get(False, 0)
    print(json.dumps(out), flush=True)

    # planted-group verification: per (group, cluster) cohort, exactly one
    # member survives; co-clustered share tells how often near-identical
    # vectors landed together (the method's recall assumption, measured)
    planted = res.where(F.col("vec_id") % 1000 == 0).select(
        ((F.col("vec_id") / 1000).cast("long") % n_groups).alias("grp"),
        "centroid",
        "kept",
    )
    per_cohort = planted.groupBy("grp", "centroid").agg(
        F.count("*").alias("members"),
        F.sum(F.col("kept").cast("int")).alias("survivors"),
    )
    bad = per_cohort.where(
        (F.col("members") > 1) & (F.col("survivors") != 1)
    ).count()
    coh = per_cohort.agg(
        F.count("*").alias("cohorts"),
        F.sum("members").alias("planted_total"),
        F.max("members").alias("biggest_cohort"),
    ).collect()[0]
    out["planted_total"] = int(coh["planted_total"])
    out["group_cluster_cohorts"] = int(coh["cohorts"])
    out["biggest_cohort"] = int(coh["biggest_cohort"])
    # perfect co-clustering = 100 cohorts (one per group)
    out["cohorts_violating_one_survivor"] = bad
    assert bad == 0, "a multi-member cohort kept != 1 survivor"

    bal = res.groupBy("centroid").count().agg(
        F.max("count").alias("mx"), F.count("*").alias("nonempty")
    ).collect()[0]
    out["max_cluster"] = int(bal["mx"])
    out["nonempty_clusters"] = int(bal["nonempty"])
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
