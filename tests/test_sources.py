"""Reference-format compat sources/sinks (sources/compat.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from whatsapp_vectordb_spark.sources import (
    read_chat_export,
    read_embeddings_csv,
    write_embeddings_csv,
)


@pytest.fixture()
def chat_file(tmp_path):
    p = tmp_path / "chat.txt"
    p.write_text(
        "[09.09.23, 14:35:02] ~ john_doe: Hello world!\n"
        "[09.09.23, 14:36:10] ~ jane: How are you?\n"
        "not a chat line\n"
    )
    return str(p)


def test_read_chat_export_parses_typed_columns(spark, chat_file):
    rows = read_chat_export(spark, chat_file).collect()
    ok = [r for r in rows if r["parse_ok"]]
    assert len(rows) == 3 and len(ok) == 2
    assert {r["sender"] for r in ok} == {"john_doe", "jane"}
    assert ok[0]["message"] in ("Hello world!", "How are you?")


def test_embeddings_csv_roundtrip(spark, tmp_path, embeddings):
    path = str(tmp_path / "emb_csv")
    src = embeddings.limit(20).select("embedding")
    write_embeddings_csv(src, path)
    back = read_embeddings_csv(spark, path)
    assert back.count() == 20
    first = back.orderBy("id").head()
    assert first["id"].startswith("vector_id_")
    assert len(first["embedding"]) == len(src.head()["embedding"])
    # %f keeps 6 decimals — the reference's own lossy serialization
    orig = {round(float(x), 6) for x in src.head()["embedding"]}
    got = {round(float(x), 6) for x in first["embedding"]}
    assert len(orig) == len(got)


def test_read_embeddings_csv_ids_are_line_positions(spark, tmp_path):
    p = tmp_path / "three.csv"
    p.write_text("1.0,2.0\n3.0,4.0\n5.0,6.0\n")
    rows = read_embeddings_csv(spark, str(p)).orderBy("id").collect()
    assert [r["id"] for r in rows] == ["vector_id_1", "vector_id_2", "vector_id_3"]


class TestWhatsAppDataSource:
    def test_directory_load_partitions_per_file(self, spark, tmp_path):
        from whatsapp_vectordb_spark.sources import whatsapp_source

        (tmp_path / "a.txt").write_text(
            "[09.09.23, 14:35:02] ~ alice: hello   world\nnot a chat line\n"
        )
        (tmp_path / "b.txt").write_text(
            "[10.09.23, 09:00:00] bob: second file\n"
        )
        fmt = whatsapp_source.register(spark)
        df = spark.read.format(fmt).load(str(tmp_path))
        rows = {(r["line_no"], r["sender"]): r for r in df.collect()}
        # per-file line numbering: both files start at 0
        assert rows[(0, "alice")]["message"] == "hello world"  # ws collapsed
        assert rows[(0, "alice")]["parse_ok"] is True
        assert rows[(1, None)]["parse_ok"] is False
        assert rows[(0, "bob")]["ts_raw"] == "10.09.23, 09:00:00"
        assert df.rdd.getNumPartitions() == 2  # one partition per file

    def test_missing_path_raises(self, spark, tmp_path):
        import pytest
        from py4j.protocol import Py4JJavaError

        from whatsapp_vectordb_spark.sources import whatsapp_source

        fmt = whatsapp_source.register(spark)
        with pytest.raises((Py4JJavaError, Exception)):
            spark.read.format(fmt).load(str(tmp_path / "absent")).collect()


class TestWhatsAppStreamReader:
    def test_offsets_incremental_and_replayable(self, tmp_path):
        """Pure-Python offset semantics: file-count offsets, incremental
        reads deliver only new files, and readBetweenOffsets replays the
        exact slice (retry determinism)."""
        from whatsapp_vectordb_spark.sources.whatsapp_source import (
            WhatsAppChatStreamReader,
        )

        (tmp_path / "a.txt").write_text(
            "[09.09.23, 14:35:02] ~ alice: one\nbroken\n"
        )
        (tmp_path / "b.txt").write_text("[09.09.23, 14:36:00] ~ bob: two\n")
        r = WhatsAppChatStreamReader({"path": str(tmp_path)})
        assert r.initialOffset() == {"files": 0}

        it, off = r.read({"files": 0})
        rows = list(it)
        assert off == {"files": 2}
        assert len(rows) == 3
        assert [x[4] for x in rows] == [True, False, True]

        replay = list(r.readBetweenOffsets({"files": 0}, {"files": 1}))
        assert replay == rows[:2]  # exactly file a's rows

        (tmp_path / "c.txt").write_text("[09.09.23, 14:37:00] ~ cara: three\n")
        it2, off2 = r.read(off)
        new_rows = list(it2)
        assert off2 == {"files": 3}
        assert len(new_rows) == 1 and new_rows[0][2] == "cara"


class TestWhatsAppWriter:
    def test_write_read_roundtrip_and_overwrite(self, spark, tmp_path):
        from whatsapp_vectordb_spark.sources import whatsapp_source

        fmt = whatsapp_source.register(spark)
        df = spark.createDataFrame(
            [("09.09.23, 14:35:02", "alice", "hello world"),
             ("10.09.23, 09:00:00", "bob", "second line")],
            "ts_raw string, sender string, message string",
        )
        out = str(tmp_path / "sink")
        df.repartition(2).write.format(fmt).mode("overwrite").save(out)
        back = spark.read.format(fmt).load(out)
        rows = {r["sender"]: r for r in back.collect()}
        assert rows["alice"]["message"] == "hello world"
        assert rows["alice"]["parse_ok"] is True
        assert rows["bob"]["ts_raw"] == "10.09.23, 09:00:00"
        # overwrite replaces, never appends
        df.limit(1).write.format(fmt).mode("overwrite").save(out)
        assert spark.read.format(fmt).load(out).count() == 1
        # no staging debris survives the commit
        import os

        assert not [f for f in os.listdir(out) if f.startswith("_staging")]


def test_read_jsonl_corpus_nested_comma_schema(spark, tmp_path):
    """Field names come from the parsed StructType, so DDL types that
    contain commas (array<struct<...>>, map<k,v>, decimal(p,s)) don't
    mangle the column list; malformed lines still quarantine."""
    from whatsapp_vectordb_spark.sources.compat import read_jsonl_corpus

    p = tmp_path / "corpus.jsonl"
    p.write_text(
        '{"doc_id": 1, "tags": {"a": 2}, "spans": [{"s": 0, "e": 3}], "text": "hi"}\n'
        "{not json\n"
    )
    df = read_jsonl_corpus(
        spark,
        str(p),
        schema=(
            "doc_id bigint, tags map<string,int>, "
            "spans array<struct<s:int,e:int>>, text string"
        ),
    )
    assert df.columns == ["doc_id", "tags", "spans", "text", "parse_ok"]
    rows = {r["parse_ok"]: r for r in df.collect()}
    assert rows[True]["tags"] == {"a": 2} and rows[True]["spans"][0]["e"] == 3
    assert rows[False]["doc_id"] is None and rows[False]["text"] is None
