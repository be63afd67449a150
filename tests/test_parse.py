from __future__ import annotations

import pytest

from whatsapp_vectordb_spark.parse import parse_chat_lines, parse_counters, with_line_ids

LINES = [
    "[09.09.23, 14:35:02] ~ john_doe: Hello world!",
    "[10.09.23, 09:01:15] ~ dana: shalom, how are you?",
    "[10.09.23, 09:02:00] dana: no tilde form",
    "not a chat line at all",
    "[broken 09.09.23] ~ x: nope",
]


@pytest.fixture(scope="module")
def parsed(spark):
    df = spark.createDataFrame([(l,) for l in LINES], "value string")
    return parse_chat_lines(df)


def test_well_formed(parsed):
    rows = {r["raw"]: r for r in parsed.collect()}
    r = rows[LINES[0]]
    assert r["parse_ok"]
    assert r["sender"] == "john_doe"
    assert r["message"] == "Hello world!"
    assert r["ts"].year == 2023 and r["ts"].month == 9 and r["ts"].day == 9
    assert rows[LINES[2]]["parse_ok"]  # tilde optional
    assert rows[LINES[2]]["sender"] == "dana"


def test_malformed_counted_not_embedded(parsed):
    rows = {r["raw"]: r for r in parsed.collect()}
    assert not rows[LINES[3]]["parse_ok"]
    assert rows[LINES[3]]["message"] is None
    c = parse_counters(parsed).head()
    assert c["lines_processed"] == 5
    assert c["parse_failures"] == 2
    assert c["success_count"] == 3


def test_line_ids_deterministic(parsed):
    ids1 = [r["id"] for r in with_line_ids(parsed).orderBy("id").collect()]
    ids2 = [r["id"] for r in with_line_ids(parsed).orderBy("id").collect()]
    assert ids1 == ids2
    assert all(i.startswith("vector_id_") for i in ids1)


def test_quarantine_captures_bad_rows_with_reasons(spark, parsed, tmp_path):
    from whatsapp_vectordb_spark.parse import quarantine_failures, write_quarantine

    q = {r["raw"]: r["reason"] for r in quarantine_failures(parsed).collect()}
    # exactly the parse failures, nothing else (reference err.log, main.go:270-276)
    assert q == {
        "not a chat line at all": "no_timestamp_prefix",
        "[broken 09.09.23] ~ x: nope": "bad_timestamp",
    }

    path = str(tmp_path / "quarantine")
    write_quarantine(parsed, path)
    back = {r["raw"]: r["reason"] for r in spark.read.parquet(path).collect()}
    assert back == q


def test_quarantine_reason_taxonomy(spark):
    from whatsapp_vectordb_spark.parse import parse_chat_lines, quarantine_failures

    lines = [
        "",
        "   ",
        "plain text",
        "[99.99.99, 99:99:99 ~ x: unclosed bracket",
        "[09.09.23, 14:35:02] no colon separator here",
    ]
    df = spark.createDataFrame([(l,) for l in lines], "value string")
    got = {r["raw"]: r["reason"] for r in quarantine_failures(parse_chat_lines(df)).collect()}
    assert got[""] == "empty_line"
    assert got["   "] == "empty_line"
    assert got["plain text"] == "no_timestamp_prefix"
    assert got["[99.99.99, 99:99:99 ~ x: unclosed bracket"] == "bad_timestamp"
    assert got["[09.09.23, 14:35:02] no colon separator here"] == "no_sender_separator"
