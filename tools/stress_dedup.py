"""Dedup stress at beyond-fixture scale: replicate the sf0.1 documents
corpus R× with distinct id spaces and token-suffix perturbations (every
20th replica doc is a true near-dup of its base; everything else is
exact-dup across replicas), then time the dedup tiers.

    python tools/stress_dedup.py [replicas]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 20

    from pyspark.sql import functions as F

    from whatsapp_vectordb_spark.operators.dedup import (
        exact_duplicates,
        minhash_near_duplicates,
        simhash_pairs,
        winnow_duplicate_pairs,
    )
    from whatsapp_vectordb_spark.session import get_spark

    spark = get_spark(app_name="dedup-stress")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select(
        "doc_id", "text"
    )
    r = spark.range(replicas).select(F.col("id").alias("rep"))
    corpus = (
        docs.crossJoin(F.broadcast(r))
        .select(
            (F.col("doc_id") + F.col("rep") * 10_000_000).alias("doc_id"),
            F.when(
                (F.col("doc_id") % 20 == 0) & (F.col("rep") > 0),
                F.concat(F.col("text"), F.lit(" extra suffix token rep"), F.col("rep").cast("string")),
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
        .repartition(32)
        .cache()
    )
    n = corpus.count()
    out: dict = {"n_docs": n, "replicas": replicas}

    t0 = time.perf_counter()
    out["exact_groups"] = exact_duplicates(corpus).select("dup_hash").distinct().count()
    out["exact_s"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    out["minhash_pairs"] = minhash_near_duplicates(
        corpus, num_hashes=16, bands=4, threshold=0.5
    ).count()
    out["minhash_s"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    out["simhash_pairs"] = simhash_pairs(corpus, bits=48, band_bits=12, max_hamming=3).count()
    out["simhash_s"] = round(time.perf_counter() - t0, 2)

    # Winnowing substring pairs at duplicate-heavy scale. Ungated, every
    # replicated doc links its R-1 twins through every shared fingerprint
    # (expected pairs ≈ C(R,2)·n_base, same order as the MinHash tier);
    # with max_df below R the guard drops the cross-replica fingerprints
    # (df = R or 2R here) and the pair count must collapse to ~0 — the
    # boilerplate-suppression behavior pinned at 100k docs.
    t0 = time.perf_counter()
    out["winnow_pairs"] = winnow_duplicate_pairs(corpus, k=5, w=4, min_shared=2).count()
    out["winnow_s"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    out["winnow_pairs_max_df"] = winnow_duplicate_pairs(
        corpus, k=5, w=4, min_shared=2, max_df=replicas // 2
    ).count()
    out["winnow_max_df_s"] = round(time.perf_counter() - t0, 2)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
