"""Unit tests for operators/curate.py (corpus-curation stages)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from whatsapp_vectordb_spark.operators.curate import (
    dataset_diff,
    duplicate_line_removal,
    hard_negative_mine,
    ordered_prefix_sum,
    pack_sequences,
    scd2_apply,
)


def test_ordered_prefix_sum_matches_global_window(spark):
    df = spark.range(0, 1000).select(
        F.col("id"), (F.pmod(F.col("id") * 37 + 11, F.lit(50)) + 1).alias("v")
    )
    got = ordered_prefix_sum(df, "id", "v", n_parts=7)
    w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, -1)
    want = df.withColumn("cum_before", F.coalesce(F.sum("v").over(w), F.lit(0)))
    g = {r["id"]: r["cum_before"] for r in got.collect()}
    for r in want.collect():
        assert g[r["id"]] == r["cum_before"], r["id"]


def test_pack_sequences_blocks_are_contiguous(spark):
    df = spark.range(0, 200).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.col("id") * 13 + 5, F.lit(40)) + 1).alias("n_tokens"),
    )
    rows = sorted(
        pack_sequences(df, seq_len=32).collect(), key=lambda r: r["doc_id"]
    )
    cum = 0
    for r in rows:
        assert r["cum_before"] == cum
        assert r["start_block"] == cum // 32
        assert r["end_block"] == (cum + r["n_tokens"] - 1) // 32
        assert r["n_blocks"] == r["end_block"] - r["start_block"] + 1
        cum += r["n_tokens"]


def test_duplicate_line_removal_keeps_order_and_drops_recurring(spark):
    lines = spark.createDataFrame(
        [
            (1, 0, "unique alpha"),
            (1, 1, "cookie banner"),
            (1, 2, "unique beta"),
            (2, 0, "Cookie  Banner".lower().replace("  ", " ")),  # normalized-equal
            (2, 1, "unique gamma"),
            (3, 0, "all unique here"),
        ],
        "doc_id long, line_no long, line string",
    )
    out = {r["doc_id"]: r for r in duplicate_line_removal(lines, min_docs=2).collect()}
    assert out[1]["cleaned_text"] == "unique alpha unique beta"
    assert out[1]["n_lines_dropped"] == 1
    assert out[2]["cleaned_text"] == "unique gamma"
    assert out[3]["n_lines_dropped"] == 0


def test_dataset_diff_statuses(spark):
    old = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "id long, t string")
    new = spark.createDataFrame([(2, "b"), (3, "CHANGED"), (4, "d")], "id long, t string")
    got = {r["id"]: r["status"] for r in dataset_diff(old, new, "id", ["t"]).collect()}
    assert got == {1: "removed", 2: "same", 3: "changed", 4: "added"}


def test_scd2_collapses_noop_changes(spark):
    cur = spark.createDataFrame([(1, "X"), (2, "Y")], "id long, seg string")
    chg = spark.createDataFrame(
        [(1, "A", 1), (1, "A", 2), (1, "B", 3), (2, "Y", 1)],
        "id long, seg string, eff_seq long",
    )
    rows = scd2_apply(cur, chg, "id", ["seg"]).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["id"], []).append(
            (r["seg"], r["valid_from_seq"], r["valid_to_seq"])
        )
    # id 1: X@0→1, A@1→3 (seq-2 no-op collapsed), B@3→NULL
    assert sorted(by_id[1]) == [("A", 1, 3), ("B", 3, None), ("X", 0, 1)]
    # id 2: the seq-1 change re-asserts the current value → one open version
    assert by_id[2] == [("Y", 0, None)]


def test_hard_negatives_exclude_same_label(spark, embeddings):
    queries = embeddings.where(F.col("vec_id") < 3)
    out = hard_negative_mine(embeddings, queries, k=4).collect()
    qlabel = {r["vec_id"]: r["label"] for r in queries.collect()}
    per_q = {}
    for r in out:
        assert r["neg_label"] != qlabel[r["q_id"]]
        per_q.setdefault(r["q_id"], []).append(r["score"])
    for q, scores in per_q.items():
        assert len(scores) == 4
        assert scores == sorted(scores, reverse=True)
