"""VERDICT r12 #4: measure BPE training at a REAL vocabulary merge count.

Round 12 recorded 1,000 merges on the 1M-doc corpus in 245 s and ARGUED
(but did not measure) that a 30k-merge vocabulary "changes the dict, not
the scan" — the trainer's incremental pair-count maintenance makes each
merge O(affected symbols), so total cost should be scan-dominated, not
merge-count-dominated. This tool replaces the extrapolation with a
record: the SAME 1M-doc corpus as tools/stress_winnow_bpe.py (sf0.1
documents replicated R x with a unique token prepended), trained twice in
one session — n_lo merges, then n_hi merges — so the MARGINAL per-merge
cost between the two points is measured directly:

    marginal_ms_per_merge = (t_hi - t_lo) / (n_hi - n_lo) * 1000

If per-merge cost were constant at the r12 amortized ~75 ms/merge (which
bundles the fixed corpus scan into 1k merges), 8k merges would take
~10 min of merge-loop alone; if the claim holds, t_hi - t_lo is dominated
by the extra merges' incremental symbol rewrites over the ~1M-row word
table and lands far below that.

Also encodes the corpus with BOTH vocabularies (the Arrow rank-dict
path): encode cost is claimed independent of merge-table depth — two
points measure that too, plus the fertility payoff of the larger vocab.

    python tools/stress_bpe_vocab.py [replicas] [n_lo] [n_hi]

Defaults: 200 replicas (1M docs), n_lo=1000, n_hi=8000. Output: one JSON
line per stage as it lands (BASELINE.md record format).
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    n_lo = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    n_hi = int(sys.argv[3]) if len(sys.argv) > 3 else 8000

    from pyspark.sql import functions as F

    from whatsapp_vectordb_spark.operators.textops import bpe_encode, bpe_learn_local
    from whatsapp_vectordb_spark.session import get_spark

    spark = get_spark(app_name="bpe-vocab-stress")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select(
        "doc_id", "text"
    )
    r = spark.range(replicas).select(F.col("id").alias("rep"))
    corpus = (
        docs.crossJoin(F.broadcast(r))
        .select(
            (F.col("doc_id") + F.col("rep") * 10_000_000).alias("doc_id"),
            F.concat(
                F.lit("uniq"), F.col("rep").cast("string"), F.lit("x"),
                F.col("doc_id").cast("string"), F.lit(" "), F.col("text"),
            ).alias("text"),
        )
        .repartition(64)
        .cache()
    )
    out: dict = {"n_docs": corpus.count(), "replicas": replicas}
    print(json.dumps(out), flush=True)

    t0 = time.perf_counter()
    lo = bpe_learn_local(corpus, n_merges=n_lo).collect()
    out[f"learn_{n_lo}_s"] = round(time.perf_counter() - t0, 2)
    out[f"learn_{n_lo}_merges"] = len(lo)
    print(json.dumps(out), flush=True)

    t0 = time.perf_counter()
    hi = bpe_learn_local(corpus, n_merges=n_hi).collect()
    t_hi = round(time.perf_counter() - t0, 2)
    out[f"learn_{n_hi}_s"] = t_hi
    out[f"learn_{n_hi}_merges"] = len(hi)
    # prefix-consistency: a longer training run must extend, not rewrite,
    # the shorter one (deterministic tie-breaks make this exact)
    lo_t = [(m["lhs"], m["rhs"], m["pair_count"]) for m in lo]
    hi_t = [(m["lhs"], m["rhs"], m["pair_count"]) for m in hi]
    assert hi_t[: len(lo_t)] == lo_t, "merge-prefix mismatch between runs"
    out["prefix_consistent"] = True
    if len(hi) > len(lo):
        out["marginal_ms_per_merge"] = round(
            (out[f"learn_{n_hi}_s"] - out[f"learn_{n_lo}_s"])
            / (len(hi) - len(lo))
            * 1000,
            2,
        )
    print(json.dumps(out), flush=True)

    for tag, merges in ((n_lo, lo_t), (n_hi, hi_t)):
        t0 = time.perf_counter()
        agg = (
            bpe_encode(corpus, [(a, b) for a, b, _ in merges])
            .agg(
                F.count("*").alias("docs"),
                F.sum("n_tokens").alias("tok"),
                F.sum("n_pieces").alias("pieces"),
            )
            .collect()[0]
        )
        out[f"encode_{tag}_s"] = round(time.perf_counter() - t0, 2)
        out[f"encode_{tag}_fertility"] = round(agg["pieces"] / agg["tok"], 4)
        print(json.dumps(out), flush=True)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
