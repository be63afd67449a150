"""VERDICT r13 #4: BPE train cost on a NATURAL (Zipfian) corpus.

Round 13 falsified the "train time is flat in merge count" claim on the
ADVERSARIAL corpus (every doc carries a unique token, maximizing
affected-words per merge: 239 ms/merge marginal at 1k→8k). That gave the
honest scaling law — cost = Σ affected words per merge — its upper
envelope only. This tool records the LOWER/practical envelope point: a
corpus whose word frequencies follow Zipf's law (natural-language-like),
where most merges touch mid-tail words with modest document support, so
the practical 8k-30k-merge cost on real data becomes a measurement
rather than a bound inherited from the adversarial number.

Corpus synthesis (all JVM-side, no driver loop, no Python UDF):
``n_docs`` documents of ``doc_len`` words drawn from a ``vocab``-word
synthetic vocabulary with P(rank r) ∝ 1/r via the inverse-CDF trick
rank = floor(exp(u·ln(V))) over per-(doc, position) xxhash64-derived
uniforms — fully deterministic, reproducible, and genuinely Zipfian
(P(r) ≈ 1/(r·ln V)). Word surface forms are "w<rank>", so BPE sees
realistic frequency structure over a realistic symbol alphabet
(digits + 'w'), and the unique-word table the trainer maintains is
~vocab rows — the natural-corpus regime where incremental pair-count
maintenance is supposed to win.

Protocol mirrors tools/stress_bpe_vocab.py exactly (same trainer, same
two-point marginal, same prefix-consistency assert, same encode pass):

    marginal_ms_per_merge = (t_hi - t_lo) / (n_hi - n_lo) * 1000

    python tools/stress_bpe_zipf.py [n_docs] [doc_len] [vocab] [n_lo] [n_hi]

Defaults: 1,000,000 docs x 50 words from a 30k-word Zipf vocabulary,
n_lo=1000, n_hi=8000. Output: one JSON line per stage (BASELINE.md
record format).
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    doc_len = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    vocab = int(sys.argv[3]) if len(sys.argv) > 3 else 30_000
    n_lo = int(sys.argv[4]) if len(sys.argv) > 4 else 1000
    n_hi = int(sys.argv[5]) if len(sys.argv) > 5 else 8000

    from pyspark.sql import functions as F

    from whatsapp_vectordb_spark.operators.textops import bpe_encode, bpe_learn_local
    from whatsapp_vectordb_spark.session import get_spark

    spark = get_spark(app_name="bpe-zipf-stress")
    spark.sparkContext.setLogLevel("ERROR")

    # Zipf word at (doc_id, position): u = uniform from xxhash64;
    # rank = floor(exp(u * ln(V))) in [1, V], P(rank=r) ~ 1/(r ln V).
    import math

    ln_v = math.log(float(vocab))
    corpus = (
        spark.range(n_docs)
        .select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ",
                F.expr(
                    "transform(sequence(1, {L}), i -> concat('w', cast("
                    "least(cast(exp((pmod(xxhash64(id, i), 1000000) / 1000000.0)"
                    " * {lnv}) as bigint), {vmax}) as string)))".format(
                        L=doc_len, lnv=ln_v, vmax=vocab
                    )
                ),
            ).alias("text"),
        )
        .repartition(64)
        .cache()
    )
    out: dict = {
        "corpus": "zipf",
        "n_docs": corpus.count(),
        "doc_len": doc_len,
        "vocab": vocab,
    }
    # sanity: the corpus really is Zipf-shaped (top word should carry
    # ~1/ln(V) of mass; distinct words ~vocab)
    stats = (
        corpus.select(F.explode(F.split("text", " ")).alias("w"))
        .groupBy("w")
        .count()
        .agg(
            F.count("*").alias("n_distinct"),
            F.max("count").alias("top_count"),
            F.sum("count").alias("total"),
        )
        .collect()[0]
    )
    out["n_distinct_words"] = int(stats["n_distinct"])
    out["top_word_share"] = round(stats["top_count"] / stats["total"], 4)
    print(json.dumps(out), flush=True)

    t0 = time.perf_counter()
    lo = bpe_learn_local(corpus, n_merges=n_lo).collect()
    out[f"learn_{n_lo}_s"] = round(time.perf_counter() - t0, 2)
    out[f"learn_{n_lo}_merges"] = len(lo)
    print(json.dumps(out), flush=True)

    t0 = time.perf_counter()
    hi = bpe_learn_local(corpus, n_merges=n_hi).collect()
    out[f"learn_{n_hi}_s"] = round(time.perf_counter() - t0, 2)
    out[f"learn_{n_hi}_merges"] = len(hi)
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
