"""Reference-format sources/sinks (SURVEY.md §2.1 S1/S2, §2.4 K1).

The reference's interchange formats are (a) a line-oriented WhatsApp chat
export and (b) a headerless CSV of 1536 ``%f``-formatted floats per row
(embed/embed.go:120-126, upsert/upsert.go:142-165). Parquet with
``ARRAY<FLOAT>`` is this engine's native storage (CSV-of-floats is an
anti-pattern at scale: no pushdown, no types, 3-4× the bytes); these
functions exist so a reference user's files still load.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType, LongType, StringType, StructField, StructType


def read_chat_export(spark: SparkSession, path: str, parse: bool = True) -> DataFrame:
    """S1: one row per chat line (``spark.read.text``); with ``parse=True``
    the typed (ts, sender, message, parse_ok) columns the reference's regex
    intended to extract (embed/embed.go:98-111 — see SURVEY.md §2.2 BUG)."""
    lines = spark.read.text(path)
    if not parse:
        return lines
    from whatsapp_vectordb_spark.parse import parse_chat_lines

    return parse_chat_lines(lines)


def read_embeddings_csv(spark: SparkSession, path: str, assign_ids: bool = True) -> DataFrame:
    """S2: headerless float CSV → ``(id, embedding ARRAY<FLOAT>)``.

    Ids replicate the reference's line-position scheme
    ``vector_id_<1-based line number>`` (upsert/upsert.go:170). Line
    numbering an unordered distributed scan requires a zipWithIndex pass
    (one extra job to count per-partition offsets) — inherent to the
    format, one more reason parquet is the native store.
    """
    lines = spark.read.text(path)
    if not assign_ids:
        return lines.select(
            F.split(F.col("value"), ",").cast("array<float>").alias("embedding")
        )
    schema = StructType(
        [StructField("_line_no", LongType(), False), StructField("value", StringType(), True)]
    )
    numbered = lines.rdd.zipWithIndex().map(lambda t: (t[1] + 1, t[0]["value"])).toDF(schema)
    return numbered.select(
        F.concat(F.lit("vector_id_"), F.col("_line_no").cast("string")).alias("id"),
        F.split(F.col("value"), ",").cast("array<float>").alias("embedding"),
    )


def embedding_csv_line(vec_col="embedding"):
    """The reference's CSV serialization as a Column: every component
    ``%f``-formatted (6 decimals, embed/embed.go:141-147), comma-joined.
    Engine-portable: DuckDB's ``printf('%f', x::DOUBLE)`` produces the
    identical string (fixed-notation rounding of a double never lands on an
    exact decimal midpoint, so HALF_UP vs round-half-even cannot differ)."""
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return F.array_join(F.transform(c, lambda x: F.format_string("%f", x.cast("double"))), ",")


def write_embeddings_csv(
    df: DataFrame, path: str, vec_col: str = "embedding", mode: str = "overwrite"
) -> None:
    """K1 (reference-compat sink): one CSV line per vector, each component
    ``%f``-formatted (6 decimals — the reference's lossy serialization,
    embed/embed.go:141-147, kept only for format compatibility)."""
    df.select(embedding_csv_line(vec_col).alias("value")).write.mode(mode).text(path)


def read_jsonl_corpus(
    spark: SparkSession,
    path: str,
    schema: str = "doc_id bigint, lang string, text string",
) -> DataFrame:
    """JSONL corpus ingest — the de-facto LLM training-data interchange
    format (one JSON document per line). Explicit schema (no sampling
    inference pass over 100 TB), PERMISSIVE mode: malformed lines yield a
    row of NULL data columns instead of failing the scan, surfaced as
    ``parse_ok`` — the same keep-and-flag quarantine contract as the chat
    parser (parse.py). ``parse_ok`` derives from the parser's own
    corrupt-record column (``columnNameOfCorruptRecord`` included in the
    read schema, so it is selectable), NOT from nullness of a data field —
    a valid record whose first field is legitimately null stays
    parse_ok=true. Data columns of corrupt rows are explicitly nulled so
    the quarantine contract (bad line → NULL data + parse_ok=false) holds
    regardless of Spark's partial-result JSON recovery.

    Scale shape: line-splittable format → Spark assigns byte-range splits
    per file; a map-only scan with the schema pushed into the JSON parser
    (no second pass, no shuffle)."""
    corrupt = "_wvs_corrupt_record"
    df = (
        spark.read.schema(f"{schema}, {corrupt} string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt)
        .json(path)
    )
    ok = F.col(corrupt).isNull()
    # Field names come from the parsed StructType, not a string split —
    # DDL types can themselves contain commas (array<struct<a:int,b:int>>,
    # map<string,int>, decimal(10,2)).
    fields = [f.name for f in StructType.fromDDL(schema).fields]
    return df.select(
        *[F.when(ok, F.col(f)).alias(f) for f in fields], ok.alias("parse_ok")
    )
