"""WhatsApp chat-export parsing (SURVEY.md §2.2, operators P1/P2/P5, G1).

Input format (reference README.md:12, main.go:32)::

    [09.09.23, 14:35:02] ~ john_doe: Hello world!

The reference's regex is buggy (one capture group; grabs the first raw
token; embeds "" on failure — embed/embed.go:98-113). We implement the
documented intent: typed ``ts/sender/message`` columns, a ``parse_ok``
flag, and failure *counting* instead of silent garbage (G1 counters,
embed/embed.go:130-131, as a one-pass conditional aggregate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Anchored extraction of the documented line shape. The `~` prefix before
# the sender is optional in real exports; both forms parse.
CHAT_LINE_RE = r"^\[(\d{2}\.\d{2}\.\d{2}, \d{2}:\d{2}:\d{2})\] ~?\s*([^:]+): (.*)$"
TS_FORMAT = "dd.MM.yy, HH:mm:ss"


def parse_chat_lines(
    lines_df: DataFrame, value_col: str = "value", extra_cols: tuple[str, ...] = ()
) -> DataFrame:
    """P1+P2: raw lines → ``(raw, ts, sender, message, parse_ok)``.

    ``message`` is newline-flattened (intent of embed/embed.go:30 — the
    reference also shell-escapes quotes, a curl artifact we drop).
    Unparseable lines keep ``parse_ok = false`` and NULL fields; they are
    *kept* so the counter aggregate sees them, and dropped by
    ``parsed_ok`` filtering downstream.
    """
    v = F.col(value_col)
    ts_s = F.regexp_extract(v, CHAT_LINE_RE, 1)
    sender = F.regexp_extract(v, CHAT_LINE_RE, 2)
    message = F.regexp_extract(v, CHAT_LINE_RE, 3)
    ok = ts_s != ""
    return lines_df.select(
        *[F.col(c) for c in extra_cols],
        v.alias("raw"),
        F.when(ok, F.to_timestamp(ts_s, TS_FORMAT)).alias("ts"),
        F.when(ok, F.trim(sender)).alias("sender"),
        F.when(ok, F.regexp_replace(message, r"\s+", " ")).alias("message"),
        ok.alias("parse_ok"),
    )


def with_line_ids(parsed_df: DataFrame) -> DataFrame:
    """P5: deterministic 1-based ids ``vector_id_<n>`` by file position
    (reference upsert/upsert.go:170). Uses a window row_number over the
    original order — NOT monotonically_increasing_id, which is
    partition-layout-dependent. The single-partition window is the price
    of the reference's position-based id contract; content-hash ids
    (``portable_hash64``) are the scale-friendly alternative."""
    from pyspark.sql import Window

    w = Window.orderBy(F.col("ts").asc_nulls_last(), F.col("raw").asc())
    return parsed_df.withColumn(
        "id", F.concat(F.lit("vector_id_"), F.row_number().over(w).cast("string"))
    )


def quarantine_failures(parsed_df: DataFrame) -> DataFrame:
    """C3: per-row failure capture — the reference appends raw API/parse
    failures to ``err.log`` (reference main.go:270-276); the engine's
    equivalent is a *quarantine frame* of the unparseable lines with a
    machine-readable reason, to be written as a side parquet next to the
    ingested table. Counters (``parse_counters``) stay the cheap
    aggregate; this is the row-level evidence an ingest operator needs to
    reprocess or triage.

    Returns ``(raw, reason)``; reasons are stable strings so downstream
    can group by failure mode.
    """
    bad = parsed_df.where(~F.col("parse_ok"))
    v = F.col("raw")
    reason = (
        F.when(F.length(F.trim(v)) == 0, F.lit("empty_line"))
        .when(~v.rlike(r"^\["), F.lit("no_timestamp_prefix"))
        .when(~v.rlike(r"^\[\d{2}\.\d{2}\.\d{2}, \d{2}:\d{2}:\d{2}\]"), F.lit("bad_timestamp"))
        .otherwise(F.lit("no_sender_separator"))
    )
    return bad.select(v.alias("raw"), reason.alias("reason"))


def write_quarantine(parsed_df: DataFrame, path: str) -> None:
    """Persist the quarantine frame (overwrite per ingest run)."""
    quarantine_failures(parsed_df).write.mode("overwrite").parquet(path)


def parse_counters(parsed_df: DataFrame) -> DataFrame:
    """G1: ingest summary counters as one partial+final hash aggregate
    (reference embed/embed.go:63-131 tallies these in a sequential loop)."""
    return parsed_df.agg(
        F.count("*").alias("lines_processed"),
        F.sum(F.when(~F.col("parse_ok"), 1).otherwise(0)).alias("parse_failures"),
        F.sum(F.when(F.col("parse_ok"), 1).otherwise(0)).alias("success_count"),
    )
