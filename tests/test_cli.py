"""End-to-end golden test of the reference action surface (cli.py):
embed -> upsert -> query on a WhatsApp-format fixture (SURVEY.md §5.2.4)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def chat_file(tmp_path):
    p = tmp_path / "chat.txt"
    p.write_text(
        "[09.09.23, 14:35:02] ~ alice: the quick brown fox jumps over the lazy dog\n"
        "[09.09.23, 14:36:10] ~ bob: pack my box with five dozen liquor jugs\n"
        "[09.09.23, 14:37:00] ~ alice: sphinx of black quartz judge my vow\n"
        "garbage line without the format\n"
        "[09.09.23, 14:38:30] ~ bob: the quick brown fox jumps over the lazy dog again\n"
    )
    return str(p)


def test_embed_upsert_query_pipeline(spark, tmp_path, chat_file):
    from whatsapp_vectordb_spark.cli import embed_action, query_action, upsert_action

    out = str(tmp_path / "emb")
    counters = embed_action(spark, chat_file, out, dim=64, csv_compat=True)
    assert counters["lines_processed"] == 5
    assert counters["parse_failures"] == 1
    assert counters["success_count"] == 4

    records = spark.read.parquet(out)
    assert records.count() == 4
    assert {r["sender"] for r in records.collect()} == {"alice", "bob"}
    # reference-format CSV also written
    csv_lines = spark.read.text(out + "_csv")
    assert csv_lines.count() == 4

    root = str(tmp_path / "store")
    res = upsert_action(spark, root, "whatsapp-chat", out, dim=64)
    assert res["after"] == 4

    # idempotent re-upsert (replace-by-id, K3)
    res2 = upsert_action(spark, root, "whatsapp-chat", out, dim=64)
    assert res2["after"] == 4

    hits = query_action(
        spark, root, "whatsapp-chat", "quick brown fox jumping", k=2, dim=64
    ).collect()
    assert len(hits) == 2
    assert "quick brown fox" in hits[0]["text"]


def test_cli_main_unknown_action(tmp_path):
    import whatsapp_vectordb_spark.cli as cli

    assert cli.main(["frobnicate", "--root", str(tmp_path)]) == 2
