"""Driver-contract query registry: Spark queries + DuckDB oracle SQL pairs.

Every operator from SURVEY.md §2 (and the extended LLM-pipeline surface)
gets a named ``(spark_fn, oracle_sql)`` pair. Conventions that make the
driver's order-insensitive value-hash comparison deterministic
(SURVEY.md §7.3 hard parts 2/4):

- every float column is rounded (ROUND_SCORE decimals) in BOTH engines,
  and any top-k LIMIT ranks on the *rounded* score with an id tiebreak;
- all computed columns are aliased identically on both sides;
- raw float arrays are never output (float32 repr differs across engines)
  — outputs carry ids, scores, counts, dims instead;
- timestamps are output as epoch seconds or formatted strings.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from whatsapp_vectordb_spark.functions.vector import (
    cosine_similarity,
    dot_product,
    euclidean_distance,
    l2_norm,
)
from whatsapp_vectordb_spark.operators.search import topk, topk_batched

ROUND_SCORE = 6

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def _register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{table}.parquet"))


# --------------------------------------------------------------------------
# Q1/Q2 — k-NN top-k under each metric (SURVEY.md §2.5). The query vector is
# a stored one (vec_id=0) so the oracle needs no Python embedder.
# --------------------------------------------------------------------------

_KNN_ORACLE = """
WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
SELECT e.vec_id,
       ROUND({score_expr}, 6) AS score
FROM embeddings e, q
WHERE {score_expr} IS NOT NULL
ORDER BY score {dir}, e.vec_id ASC
LIMIT 10
"""


@_register(
    "knn_topk_cosine",
    _KNN_ORACLE.format(
        score_expr="list_cosine_similarity(e.embedding::DOUBLE[], q.qv)", dir="DESC"
    ),
)
def knn_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    qvec = emb.where(F.col("vec_id") == 0).head()["embedding"]
    return topk(emb, qvec, k=10, metric="cosine", round_to=ROUND_SCORE)


@_register(
    "knn_topk_dotproduct",
    _KNN_ORACLE.format(score_expr="list_dot_product(e.embedding::DOUBLE[], q.qv)", dir="DESC"),
)
def knn_topk_dotproduct(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    qvec = emb.where(F.col("vec_id") == 0).head()["embedding"]
    return topk(emb, qvec, k=10, metric="dotproduct", round_to=ROUND_SCORE)


@_register(
    "knn_topk_euclidean",
    _KNN_ORACLE.format(score_expr="list_distance(e.embedding::DOUBLE[], q.qv)", dir="ASC"),
)
def knn_topk_euclidean(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    qvec = emb.where(F.col("vec_id") == 0).head()["embedding"]
    return topk(emb, qvec, k=10, metric="euclidean", round_to=ROUND_SCORE)


# --------------------------------------------------------------------------
# Q1 batched — per-query top-k via broadcast + window rank.
# --------------------------------------------------------------------------


@_register(
    "knn_batched",
    """
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS query_vec
           FROM embeddings WHERE vec_id < 5)
SELECT query_id, vec_id, score, CAST(rank AS INTEGER) AS rank FROM (
  SELECT q.query_id, e.vec_id,
         ROUND(list_cosine_similarity(e.embedding::DOUBLE[], q.query_vec), 6) AS score,
         ROW_NUMBER() OVER (
            PARTITION BY q.query_id
            ORDER BY ROUND(list_cosine_similarity(e.embedding::DOUBLE[], q.query_vec), 6) DESC,
                     e.vec_id ASC
         ) AS rank
  FROM embeddings e CROSS JOIN q
) WHERE rank <= 3
""",
)
def knn_batched(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return topk_batched(emb, queries, k=3, metric="cosine", round_to=ROUND_SCORE)


# --------------------------------------------------------------------------
# Vector norms (index-build helper: store-once norms, SURVEY.md §7 step 6).
# --------------------------------------------------------------------------


@_register(
    "vector_norms",
    """
SELECT vec_id,
       ROUND(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])), 6) AS norm
FROM embeddings
""",
)
def vector_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    return emb.select("vec_id", F.round(l2_norm("embedding"), ROUND_SCORE).alias("norm"))


# --------------------------------------------------------------------------
# K3 — upsert replace-by-id (reference upsert/upsert.go:113-215): last
# writer wins. Batch 2 is derived deterministically from the table itself.
# --------------------------------------------------------------------------


@_register(
    "upsert_replace_by_id",
    """
WITH batch1 AS (SELECT vec_id, label, 1 AS seq FROM embeddings),
     batch2 AS (SELECT vec_id, label + 1000 AS label, 2 AS seq
                FROM embeddings WHERE vec_id % 3 = 0),
     unioned AS (SELECT * FROM batch1 UNION ALL SELECT * FROM batch2)
SELECT vec_id, label FROM (
  SELECT vec_id, label,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY seq DESC) AS rn
  FROM unioned
) WHERE rn = 1
""",
)
def upsert_replace_by_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from whatsapp_vectordb_spark.operators.upsert import upsert_by_key

    emb = _t(spark, sf_dir, "embeddings")
    batch1 = emb.select("vec_id", "label", F.lit(1).alias("seq"))
    batch2 = (
        emb.where(F.col("vec_id") % 3 == 0)
        .select("vec_id", (F.col("label") + 1000).alias("label"), F.lit(2).alias("seq"))
    )
    return upsert_by_key(batch1, batch2, key_col="vec_id", seq_col="seq").select(
        "vec_id", "label"
    )


# --------------------------------------------------------------------------
# S3/A3 — point fetch + index stats (reference main.go:141-180,
# debug-commands.txt:10-12). Arrays are summarized (dim), never output raw.
# --------------------------------------------------------------------------


@_register(
    "point_fetch",
    """
SELECT vec_id, label, CAST(len(embedding) AS INTEGER) AS dim
FROM embeddings WHERE vec_id IN (5, 10, 15)
""",
)
def point_fetch(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    return emb.where(F.col("vec_id").isin(5, 10, 15)).select(
        "vec_id", "label", F.size("embedding").alias("dim")
    )


@_register(
    "index_stats",
    """
SELECT label, COUNT(*) AS vector_count FROM embeddings GROUP BY label
""",
)
def index_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    return emb.groupBy("label").agg(F.count("*").alias("vector_count"))


# --------------------------------------------------------------------------
# P1/P2/G1 — WhatsApp line parse + ingest counters (reference
# embed/embed.go:85-131). Chat lines are synthesized deterministically from
# `documents` in BOTH engines (every 7th doc malformed) so the parse is
# oracle-checkable without a chat fixture file.
# --------------------------------------------------------------------------

_CHAT_LINE_SQL = """
SELECT doc_id,
       CASE WHEN doc_id % 7 = 0 THEN text
            ELSE '[09.09.23, 14:35:02] ~ user' || CAST(doc_id % 10 AS VARCHAR) || ': ' || text
       END AS value
FROM documents
"""


def _chat_lines_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 7 == 0, F.col("text"))
        .otherwise(
            F.concat(
                F.lit("[09.09.23, 14:35:02] ~ user"),
                (F.col("doc_id") % 10).cast("string"),
                F.lit(": "),
                F.col("text"),
            )
        )
        .alias("value"),
    )


@_register(
    "parse_whatsapp",
    f"""
WITH lines AS ({_CHAT_LINE_SQL})
SELECT doc_id,
       CASE WHEN ok THEN sender_raw END AS sender,
       CASE WHEN ok THEN message_raw END AS message,
       ok AS parse_ok
FROM (
  SELECT doc_id,
         regexp_extract(value, '^\\[(\\d{{2}}\\.\\d{{2}}\\.\\d{{2}}, \\d{{2}}:\\d{{2}}:\\d{{2}})\\] ~?\\s*([^:]+): (.*)$', 1) <> '' AS ok,
         trim(regexp_extract(value, '^\\[(\\d{{2}}\\.\\d{{2}}\\.\\d{{2}}, \\d{{2}}:\\d{{2}}:\\d{{2}})\\] ~?\\s*([^:]+): (.*)$', 2)) AS sender_raw,
         regexp_replace(regexp_extract(value, '^\\[(\\d{{2}}\\.\\d{{2}}\\.\\d{{2}}, \\d{{2}}:\\d{{2}}:\\d{{2}})\\] ~?\\s*([^:]+): (.*)$', 3), '\\s+', ' ', 'g') AS message_raw
  FROM lines
)
""",
)
def parse_whatsapp(spark: SparkSession, sf_dir: str) -> DataFrame:
    from whatsapp_vectordb_spark.parse import parse_chat_lines

    lines = _chat_lines_df(spark, sf_dir)
    parsed = parse_chat_lines(lines, value_col="value", extra_cols=("doc_id",))
    return parsed.select("doc_id", "sender", "message", "parse_ok")


@_register(
    "parse_counters",
    f"""
WITH lines AS ({_CHAT_LINE_SQL})
SELECT COUNT(*) AS lines_processed,
       CAST(SUM(CASE WHEN NOT ok THEN 1 ELSE 0 END) AS BIGINT) AS parse_failures,
       CAST(SUM(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS success_count
FROM (
  SELECT regexp_extract(value, '^\\[(\\d{{2}}\\.\\d{{2}}\\.\\d{{2}}, \\d{{2}}:\\d{{2}}:\\d{{2}})\\] ~?\\s*([^:]+): (.*)$', 1) <> '' AS ok
  FROM lines
)
""",
)
def parse_counters_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from whatsapp_vectordb_spark.parse import parse_chat_lines, parse_counters

    lines = _chat_lines_df(spark, sf_dir)
    return parse_counters(parse_chat_lines(lines, value_col="value"))
