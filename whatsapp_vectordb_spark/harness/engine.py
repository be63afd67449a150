"""Engine-surface queries: parse/compat/index/upsert/point-fetch/embed.

Split out of the monolithic harness.py (registration order preserved
within each family; see harness/__init__.py for the module order).
"""
from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window

from whatsapp_vectordb_spark.session import local_df
from pyspark.sql import functions as F

from whatsapp_vectordb_spark.functions.vector import (
    cosine_similarity,
    dot_product,
    euclidean_distance,
    l2_norm,
)
from whatsapp_vectordb_spark.operators.search import topk, topk_batched

from whatsapp_vectordb_spark.harness._core import ROUND_SCORE, _CHAT_LINE_HE_SQL, _CHAT_LINE_SQL, _chat_lines_df, _chat_lines_he_df, _oracle_scratch, _phash_sql, _register, _t, _tmp_scratch, _write_jsonl_corpus  # noqa: E501



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
    "parse_quarantine",
    f"""
WITH lines AS ({_CHAT_LINE_SQL}),
flagged AS (
  SELECT value,
         regexp_extract(value, '^\\[(\\d{{2}}\\.\\d{{2}}\\.\\d{{2}}, \\d{{2}}:\\d{{2}}:\\d{{2}})\\] ~?\\s*([^:]+): (.*)$', 1) <> '' AS ok
  FROM lines
)
SELECT value AS raw,
       CASE WHEN length(trim(value)) = 0 THEN 'empty_line'
            WHEN NOT regexp_matches(value, '^\\[') THEN 'no_timestamp_prefix'
            WHEN NOT regexp_matches(value, '^\\[\\d{{2}}\\.\\d{{2}}\\.\\d{{2}}, \\d{{2}}:\\d{{2}}:\\d{{2}}\\]') THEN 'bad_timestamp'
            ELSE 'no_sender_separator'
       END AS reason
FROM flagged WHERE NOT ok
""",
)
def parse_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3 as a first-class query: the quarantine channel (raw line +
    failure reason) over the synthesized chat corpus — the reference's
    err.log (main.go:270-276) with typed, groupable reasons."""
    from whatsapp_vectordb_spark.parse import parse_chat_lines, quarantine_failures

    lines = _chat_lines_df(spark, sf_dir)
    return quarantine_failures(parse_chat_lines(lines, value_col="value"))


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


_FLAGSHIP_QUERY = "data processing at scale"


def _flagship_oracle() -> str:
    """The embedder is deterministic pure Python (embedder.py), so the
    flagship query vector can be computed at registration time and inlined
    into the oracle as a literal — making the end-to-end pipeline
    hash-checked instead of rows-only (SURVEY.md §5.2)."""
    from whatsapp_vectordb_spark.embedder import embed_text

    qv = embed_text(_FLAGSHIP_QUERY, dim=64)
    lit = "[" + ", ".join(repr(float(x)) for x in qv) + "]"
    return f"""
WITH q AS (SELECT {lit}::DOUBLE[] AS qv)
SELECT e.vec_id AS id,
       ROUND(list_cosine_similarity(e.embedding::DOUBLE[], q.qv), 6) AS score
FROM embeddings e, q
WHERE list_cosine_similarity(e.embedding::DOUBLE[], q.qv) IS NOT NULL
ORDER BY score DESC, id ASC
LIMIT 20
"""


@_register("embed_search_pipeline", _flagship_oracle())
def embed_search_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full flagship pipeline (SURVEY.md §3.3, reference main.go:186-266):
    embed the query string driver-side with the deterministic embedder,
    exact top-20 against the stored index — the reference's real shape
    (the index is populated by a prior ingest; the query-time embed is the
    only embedding on the hot path). The corpus-side embed ingest (U1) is
    exactly covered by tests/test_embedder.py and the embed_documents
    bench entry."""
    from whatsapp_vectordb_spark.operators.search import search_text

    index = _t(spark, sf_dir, "embeddings").select(F.col("vec_id").alias("id"), "embedding")
    return search_text(index, _FLAGSHIP_QUERY, k=20, payload_cols=(), round_to=ROUND_SCORE)


# ==========================================================================
# Reference CSV format parity (sources/compat.py K1/P3): the %f-serialized
# line for every vector, md5'd — proves byte-identical interchange with the
# reference's embeddings-CSV format without emitting raw float arrays.
# ==========================================================================


@_register(
    "compat_csv_format",
    """
SELECT vec_id,
       md5(array_to_string(list_transform(embedding, x -> printf('%f', x::DOUBLE)), ',')) AS csv_md5
FROM embeddings
""",
)
def compat_csv_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    from whatsapp_vectordb_spark.sources.compat import embedding_csv_line

    emb = _t(spark, sf_dir, "embeddings")
    return emb.select("vec_id", F.md5(embedding_csv_line("embedding")).alias("csv_md5"))



# Round 6: JSONL ingest — the de-facto LLM-corpus interchange format. The
# corpus is serialized to newline-delimited JSON (json.dumps escaping, so
# quotes/unicode in text round-trip), every 97th line deliberately
# truncated mid-object; Spark reads it back with an explicit schema in
# PERMISSIVE mode. The oracle derives the expected per-language totals AND
# the corrupt-line count analytically from the documents table — the check
# is that the JSON round-trip recovers every value and quarantines exactly
# the planted breakage.
@_register(
    "compat_jsonl_scan",
    """
SELECT lang, TRUE AS parse_ok,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(doc_id) AS BIGINT) AS docid_sum,
       CAST(SUM(len(text)) AS BIGINT) AS chars_sum
FROM documents WHERE doc_id % 97 <> 0
GROUP BY lang
UNION ALL
SELECT CAST(NULL AS VARCHAR), FALSE,
       CAST(COUNT(*) AS BIGINT),
       CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
FROM documents WHERE doc_id % 97 = 0
""",
)
def compat_jsonl_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL corpus scan with quarantine (sources/compat.read_jsonl_corpus):
    schema pushed into the JSON parser, malformed lines kept as
    parse_ok=false rows — per-(lang, parse_ok) integer totals must match
    the closed-form derivation from the source table."""
    from whatsapp_vectordb_spark.sources.compat import read_jsonl_corpus

    scratch = _oracle_scratch("jsonl_scan")
    _write_jsonl_corpus(spark, sf_dir, scratch, shards=1)
    df = read_jsonl_corpus(spark, os.path.join(scratch, "corpus_0.jsonl"))
    return df.groupBy("lang", "parse_ok").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum("doc_id").cast("long").alias("docid_sum"),
        F.sum(F.length("text")).cast("long").alias("chars_sum"),
    )


# ==========================================================================
# Index lifecycle end-to-end (index.py: create → upsert → re-upsert →
# stats): run against a scratch root, return per-namespace stats plus how
# many rows the second batch replaced.
# ==========================================================================


@_register(
    "index_lifecycle",
    """
SELECT 'ns' || CAST(vec_id % 4 AS VARCHAR) AS namespace,
       COUNT(*) AS vector_count,
       CAST(SUM(CASE WHEN vec_id % 3 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_updated
FROM embeddings
GROUP BY 1
""",
)
def index_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from whatsapp_vectordb_spark.index import VectorIndex

    emb = _t(spark, sf_dir, "embeddings")
    records = emb.select(
        F.concat(F.lit("v"), F.col("vec_id").cast("string")).alias("id"),
        F.col("embedding"),
        F.concat(F.lit("text for "), F.col("vec_id").cast("string")).alias("text"),
        F.concat(F.lit("ns"), (F.col("vec_id") % 4).cast("string")).alias("namespace"),
    )
    root = _tmp_scratch("wvs_index_")
    try:
        idx = VectorIndex.create_or_get(spark, root, "harness-idx", dimension=64)
        idx.upsert(records.withColumn("_ingest_seq", F.lit(1)))
        # second batch replaces every vec_id % 3 == 0 row (upsert contract:
        # same id -> replace, reference upsert/upsert.go:23)
        updates = records.where(F.col("id").rlike("^v[0-9]+$")).join(
            emb.where(F.col("vec_id") % 3 == 0).select(
                F.concat(F.lit("v"), F.col("vec_id").cast("string")).alias("id")
            ),
            "id",
        ).withColumn("text", F.concat(F.lit("updated "), F.col("id")))
        idx.upsert(updates.withColumn("_ingest_seq", F.lit(2)))
        merged = idx.read()
        out = (
            merged.groupBy("namespace")
            .agg(
                F.count("*").alias("vector_count"),
                F.sum(F.when(F.col("text").startswith("updated "), 1).otherwise(0)).alias(
                    "n_updated"
                ),
            )
            .collect()
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return local_df(spark, out, "namespace string, vector_count long, n_updated long")


@_register(
    "upsert_metrics",
    """
WITH e AS (SELECT vec_id FROM embeddings),
n AS (SELECT vec_id FROM embeddings WHERE vec_id % 3 = 0
      UNION ALL
      SELECT vec_id + 10000 AS vec_id FROM embeddings WHERE vec_id % 5 = 0)
SELECT
  (SELECT COUNT(DISTINCT vec_id) FROM e) AS n_existing,
  (SELECT COUNT(DISTINCT vec_id) FROM n) AS n_batch,
  (SELECT COUNT(*) FROM (SELECT vec_id FROM e INTERSECT SELECT vec_id FROM n)) AS n_replaced,
  (SELECT COUNT(*) FROM (SELECT vec_id FROM n EXCEPT SELECT vec_id FROM e)) AS n_inserted,
  (SELECT COUNT(*) FROM (SELECT vec_id FROM e UNION SELECT vec_id FROM n)) AS n_after
""",
)
def upsert_metrics_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from whatsapp_vectordb_spark.operators.upsert import upsert_metrics

    emb = _t(spark, sf_dir, "embeddings")
    existing = emb.select("vec_id")
    batch = emb.where(F.col("vec_id") % 3 == 0).select("vec_id").unionByName(
        emb.where(F.col("vec_id") % 5 == 0).select((F.col("vec_id") + 10000).alias("vec_id"))
    )
    return upsert_metrics(existing, batch, key_col="vec_id")


@_register(
    "vector_quantize_int8",
    """
WITH q AS (
  SELECT vec_id,
         list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) / 127.0 AS scale
  FROM embeddings
)
SELECT e.vec_id,
       ROUND(q.scale, 9) AS scale,
       md5(array_to_string(
         list_transform(e.embedding::DOUBLE[], x -> CAST(round(x / q.scale) AS BIGINT)),
         ',')) AS q_md5
FROM embeddings e JOIN q ON e.vec_id = q.vec_id
WHERE q.scale > 0
""",
)
def vector_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    from whatsapp_vectordb_spark.functions.vector import quantize_int8

    emb = _t(spark, sf_dir, "embeddings")
    q = quantize_int8("embedding")
    return emb.select("vec_id", q.alias("q")).where(F.col("q").isNotNull()).select(
        "vec_id",
        F.round(F.col("q.scale"), 9).alias("scale"),
        F.md5(
            F.array_join(F.transform(F.col("q.values"), lambda v: v.cast("long").cast("string")), ",")
        ).alias("q_md5"),
    )


@_register(
    "embed_hard_negatives",
    """
WITH q AS (
  SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv, label AS q_label
  FROM embeddings WHERE vec_id < 5
),
scored AS (
  SELECT q.q_id, e.vec_id AS neg_id, e.label AS neg_label,
         ROUND(list_cosine_similarity(e.embedding::DOUBLE[], q.qv), 6) AS score
  FROM embeddings e CROSS JOIN q
  WHERE e.label <> q.q_label
    AND list_cosine_similarity(e.embedding::DOUBLE[], q.qv) IS NOT NULL
)
SELECT q_id, neg_id, neg_label, score
FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY score DESC, neg_id ASC) AS rk
  FROM scored
)
WHERE rk <= 5
""",
)
def embed_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive hard-negative mining: per query (vec_id < 5), the top-5
    most-similar embeddings with a DIFFERENT label — broadcast queries,
    one index scan, rank on (rounded score, id)
    (operators/curate.py hard_negative_mine)."""
    from whatsapp_vectordb_spark.operators.curate import hard_negative_mine

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    return hard_negative_mine(emb, queries, k=5)


_PCA_DIR = _oracle_scratch("pca_oracle")


def _pca_oracle() -> str:
    """PCA training (eigh) is not SQL-expressible; the PROJECTION is. The
    Spark query persists (comp_id, comp, offset) and the oracle recomputes
    every coordinate as ``list_dot_product(embedding, comp) − offset`` over
    the very same parquet — the IVF persisted-state template. Float-fold
    parity: list_dot_product's left-to-right order matches F.aggregate
    (the contract every knn query already relies on)."""
    return f"""
WITH comps AS (
  SELECT comp_id, comp, "offset" AS off
  FROM read_parquet('{_PCA_DIR}/components/*.parquet')
)
SELECT e.vec_id, c.comp_id,
       ROUND(list_dot_product(e.embedding::DOUBLE[], c.comp) - c.off, 6) AS coord
FROM embeddings e CROSS JOIN comps c
"""


@_register("embed_pca_project", _pca_oracle())
def embed_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact PCA (8 components) trained on the unbiased hash-ranked sample
    (the codebook-training draw), components persisted, every embedding
    projected in one map-only pass — the classic decorrelation/compression
    stage before ANN indexing. Eigenvector signs are canonicalized so the
    persisted components are platform-deterministic."""
    from whatsapp_vectordb_spark.operators.projection import (
        pca_project_long,
        pca_train,
    )

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    mean, comps = pca_train(emb, n_components=8)
    import numpy as np

    rows = [
        (int(cid), [float(v) for v in comps[cid]], float(np.dot(mean, comps[cid])))
        for cid in range(comps.shape[0])
    ]
    local_df(spark, 
        rows, "comp_id bigint, comp array<double>, offset double"
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(_PCA_DIR, "components"))
    # project with the PERSISTED floats (identical bytes to what the oracle
    # reads; float64 round-trips parquet exactly, so the recomputed
    # offsets equal the persisted ones bit-for-bit)
    persisted = sorted(
        spark.read.parquet(os.path.join(_PCA_DIR, "components")).collect(),
        key=lambda r: r["comp_id"],
    )
    comps_p = np.array([r["comp"] for r in persisted])
    return pca_project_long(emb, mean, comps_p)


# ==========================================================================
# Round 4: delete-by-id lifecycle (index.VectorIndex.delete) — the
# Pinecone vectors/delete verb, bounded-rewrite on the bucketed layout.
# ==========================================================================


@_register(
    "index_delete",
    """
SELECT COUNT(*) AS n_remaining,
       CAST(SUM(vec_id) AS BIGINT) AS id_checksum,
       (SELECT COUNT(*) FROM embeddings WHERE vec_id % 7 = 0) AS n_deleted
FROM embeddings WHERE vec_id % 7 <> 0
""",
)
def index_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upsert the embeddings corpus into a BUCKETED index, delete every
    vec_id % 7 == 0, and report what remains — the delete path rewrites
    only the touched hash buckets (same bounded-rewrite contract as
    upsert; emptied buckets are removed explicitly)."""
    import shutil
    import tempfile

    from whatsapp_vectordb_spark.index import VectorIndex

    emb = _t(spark, sf_dir, "embeddings")
    records = emb.select(
        F.col("vec_id").cast("string").alias("id"), F.col("embedding")
    )
    root = _tmp_scratch("wvs_del_")
    try:
        idx = VectorIndex.create_or_get(
            spark, root, "delete-idx", dimension=64, num_id_buckets=8
        )
        idx.upsert(records.withColumn("_ingest_seq", F.lit(1)))
        doomed = [
            r["id"]
            for r in records.where(F.col("id").cast("long") % 7 == 0)
            .select("id")
            .collect()
        ]
        n_deleted = idx.delete(doomed)
        remaining = idx.read().select(F.col("id").cast("long").alias("vid"))
        out = remaining.agg(
            F.count("*").alias("n_remaining"),
            F.sum("vid").alias("id_checksum"),
            F.lit(n_deleted).cast("long").alias("n_deleted"),
        ).collect()
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return local_df(spark, 
        out, "n_remaining bigint, id_checksum bigint, n_deleted bigint"
    )


# ==========================================================================
# Round 4: keyset-paginated scan (the Pinecone vectors/list verb).
# ==========================================================================


@_register(
    "index_scan_pages",
    """
WITH ordered AS (
  SELECT CAST(vec_id AS VARCHAR) AS id,
         row_number() OVER (ORDER BY CAST(vec_id AS VARCHAR) ASC) AS rn
  FROM embeddings
)
SELECT CAST((rn - 1) // 50 AS BIGINT) AS page, id
FROM ordered WHERE rn <= 150
""",
)
def index_scan_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three keyset-paginated 50-row scans chained by cursor (last id of
    each page). Ids are STRINGS (the index contract), so order is
    lexicographic — identical in both engines. Each page is a pushed-down
    range filter + TakeOrderedAndProject: O(page), not OFFSET's
    O(everything before)."""
    import shutil
    import tempfile

    from whatsapp_vectordb_spark.index import VectorIndex

    emb = _t(spark, sf_dir, "embeddings")
    records = emb.select(F.col("vec_id").cast("string").alias("id"), "embedding")
    root = _tmp_scratch("wvs_scan_")
    pages = []
    try:
        idx = VectorIndex.create_or_get(
            spark, root, "scan-idx", dimension=64, num_id_buckets=8
        )
        idx.upsert(records.withColumn("_ingest_seq", F.lit(1)))
        cursor = None
        for page_no in range(3):
            rows = idx.scan_page(after_id=cursor, page_size=50).collect()
            if not rows:
                break
            pages.extend((page_no, r["id"]) for r in rows)
            cursor = rows[-1]["id"]
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return local_df(spark, pages, "page bigint, id string")


# ==========================================================================
# Round 4: embedding-space outlier gate — distance-to-centroid > 1.5× the
# label median; exact integer residuals, median on integers, no sqrt on
# the decision path (functions/vector.py centroid_distance_outliers).
# ==========================================================================


@_register(
    "embed_centroid_outliers",
    """
WITH ex AS (
  SELECT label, vec_id, i.i AS pos,
         CAST(round(embedding[i.i + 1]::DOUBLE * 10000) AS BIGINT) AS q
  FROM embeddings CROSS JOIN range(0, 64) i(i)
),
cent AS (SELECT label, pos, SUM(q) AS S, COUNT(*) AS n FROM ex GROUP BY 1, 2),
dq2 AS (
  SELECT e.label, e.vec_id,
         SUM((e.q * c.n - c.S) * (e.q * c.n - c.S)) AS dq2, MAX(c.n) AS n
  FROM ex e JOIN cent c ON e.label = c.label AND e.pos = c.pos
  GROUP BY 1, 2
),
med AS (SELECT label, quantile_cont(dq2, 0.5) AS m FROM dq2 GROUP BY 1),
rk AS (
  SELECT d.label, d.vec_id, d.dq2, d.n, m.m,
         row_number() OVER (PARTITION BY d.label ORDER BY d.dq2 DESC, d.vec_id ASC) AS r
  FROM dq2 d JOIN med m ON d.label = m.label
)
SELECT label, vec_id,
       ROUND(sqrt(dq2) / (10000.0 * n), 6) AS dist,
       ROUND(sqrt(m) / (10000.0 * n), 6) AS med_dist
FROM rk WHERE r <= 3
""",
)
def embed_centroid_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 3 most atypical members of each label (farthest from the label
    centroid, exact-integer ranked) — the corrupt/mislabeled-vector review
    queue. Integer residual arithmetic end to end; the sole floats are
    the two reported (rounded) distances."""
    from whatsapp_vectordb_spark.functions.vector import centroid_distance_outliers

    return centroid_distance_outliers(_t(spark, sf_dir, "embeddings"))


@_register(
    "index_compact",
    """
WITH corpus AS (
  SELECT vec_id FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000 AS vec_id FROM embeddings WHERE vec_id % 100 = 0
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_vectors,
       CAST(SUM(vec_id) AS BIGINT) AS id_checksum,
       CAST(1 AS BIGINT) AS max_files_per_bucket
FROM corpus
""",
)
def index_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-files maintenance (index.VectorIndex.compact): build a
    bucketed index, simulate an append-mode streaming ingest leaving extra
    file generations in their correct hash buckets, compact, and report
    content invariance (count + id checksum) plus the structural
    invariant (≤1 parquet file per bucket). Only crowded buckets are
    rewritten — the same bounded-rewrite contract as upsert/delete."""
    import os as _os
    import shutil
    import tempfile

    from whatsapp_vectordb_spark.index import VectorIndex

    emb = _t(spark, sf_dir, "embeddings")
    records = emb.select(
        F.col("vec_id").cast("string").alias("id"), F.col("embedding")
    )
    clones = (
        emb.where(F.col("vec_id") % 100 == 0)
        .select(
            (F.col("vec_id") + 1_000_000).cast("string").alias("id"), F.col("embedding")
        )
    )
    root = _tmp_scratch("wvs_compact_")
    try:
        idx = VectorIndex.create_or_get(
            spark, root, "compact-idx", dimension=64, num_id_buckets=8
        )
        idx.upsert(records.withColumn("_ingest_seq", F.lit(1)))
        # append-mode micro-batches: each clone lands in its CORRECT hash
        # bucket dir as an extra file generation (what a streaming append
        # sink leaves behind; upsert itself always rewrites to 1 file)
        tagged = clones.withColumn(
            "_b", F.pmod(F.xxhash64(F.col("id")), F.lit(8))
        ).localCheckpoint(eager=True)
        for b in [r["_b"] for r in tagged.select("_b").distinct().collect()]:
            tagged.where(F.col("_b") == b).drop("_b").withColumn(
                "_ingest_seq", F.lit(2)
            ).write.mode("append").parquet(_os.path.join(idx.path, f"_bucket={b}"))
        idx.compact(max_files_per_partition=1)
        max_files = max(
            sum(
                1
                for f in _os.listdir(_os.path.join(idx.path, d))
                if f.endswith(".parquet")
            )
            for d in _os.listdir(idx.path)
            if d.startswith("_bucket=")
        )
        out = (
            idx.read()
            .select(F.col("id").cast("long").alias("vid"))
            .agg(
                F.count("*").alias("n_vectors"),
                F.sum("vid").alias("id_checksum"),
                F.lit(max_files).cast("long").alias("max_files_per_bucket"),
            )
            .collect()
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return local_df(spark, 
        out, "n_vectors bigint, id_checksum bigint, max_files_per_bucket bigint"
    )


@_register(
    "index_ttl_delete",
    """
SELECT COUNT(*) AS n_remaining,
       CAST(SUM(vec_id) AS BIGINT) AS id_checksum,
       (SELECT COUNT(*) FROM embeddings WHERE label % 5 = 3) AS n_deleted
FROM embeddings WHERE label % 5 <> 3
""",
)
def index_ttl_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete-by-metadata-filter (the Pinecone ``vectors/delete``
    ``filter=`` form / TTL expiry): upsert the corpus with a label
    metadata column into a bucketed index, purge ``label % 5 == 3`` with
    ONE discovery scan + a rewrite of only the buckets containing
    matches (index.py delete_where), and report what remains."""
    import shutil
    import tempfile

    from whatsapp_vectordb_spark.index import VectorIndex

    emb = _t(spark, sf_dir, "embeddings")
    records = emb.select(
        F.col("vec_id").cast("string").alias("id"),
        "embedding",
        F.create_map(F.lit("label"), F.col("label").cast("string")).alias("metadata"),
    )
    root = _tmp_scratch("wvs_ttl_")
    try:
        idx = VectorIndex.create_or_get(
            spark, root, "ttl-idx", dimension=64, num_id_buckets=8
        )
        idx.upsert(records.withColumn("_ingest_seq", F.lit(1)))
        n_deleted = idx.delete_where(
            F.element_at("metadata", "label").cast("int") % 5 == 3
        )
        remaining = idx.read().select(F.col("id").cast("long").alias("vid"))
        out = remaining.agg(
            F.count("*").alias("n_remaining"),
            F.sum("vid").alias("id_checksum"),
            F.lit(n_deleted).cast("long").alias("n_deleted"),
        ).collect()
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return local_df(spark, 
        out, "n_remaining bigint, id_checksum bigint, n_deleted bigint"
    )


_PQ_SWEEP_DIR = _oracle_scratch("pq_distortion_oracle")
_PQ_SWEEP_MS = (4, 8, 16)
_PQ_SWEEP_DIM = 64


def _ensure_pq_micro(spark: SparkSession, sf_dir: str, m: int) -> tuple[str, str]:
    """Build-and-persist the micro-unit PQ artifacts for one ``m``
    (``codes_m{m}`` + ``books_m{m}``), ONCE per (process, corpus) —
    shared between ``embed_pq_distortion_sweep`` and
    ``embed_opq_vs_pq_distortion``, whose m=8 builds were previously
    identical-but-recomputed (same ksub/sample_rows/seed; ~39 s of the
    sf0.01 sweep rebuilt codebooks from scratch — VERDICT r13 #6). A
    marker file keys the cache on the corpus dir so a process that
    checks several scale factors never reuses a stale build; the oracle
    SQL reads the SAME persisted files, so sharing cannot weaken either
    gate."""
    import json as _json

    from whatsapp_vectordb_spark.operators.ann import PqIndex

    codes_path = os.path.join(_PQ_SWEEP_DIR, f"codes_m{m}")
    books_path = os.path.join(_PQ_SWEEP_DIR, f"books_m{m}")
    marker = os.path.join(_PQ_SWEEP_DIR, f"_built_m{m}.json")
    emb_path = os.path.join(os.path.abspath(sf_dir), "embeddings.parquet")
    key = {"sf_dir": os.path.abspath(sf_dir), "m": m, "ksub": 16,
           "sample_rows": 500, "seed": 0,
           # an in-place regenerated corpus must invalidate the cache —
           # both engines read the same persisted artifacts, so a stale
           # build would stay hash-green while measuring nothing
           "corpus_mtime": os.path.getmtime(emb_path)}
    if os.path.exists(marker):
        try:
            with open(marker) as f:
                # a matching marker is only a hit if the artifacts it
                # points at still exist — a marker surviving partial
                # scratch cleanup must trigger a rebuild, not a read
                # failure in both distortion queries (ADVICE r14)
                if (
                    _json.load(f) == key
                    and os.path.isdir(codes_path)
                    and os.path.isdir(books_path)
                ):
                    return codes_path, books_path
        except (OSError, ValueError):
            pass
        os.remove(marker)  # stale: rebuild below, re-marker after
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    dsub = _PQ_SWEEP_DIM // m
    idx = PqIndex.build(emb, m=m, ksub=16, sample_rows=500, seed=0)
    idx.save(os.path.join(_PQ_SWEEP_DIR, f"idx_m{m}"), idx.encode(emb))
    spark.read.parquet(
        os.path.join(_PQ_SWEEP_DIR, f"idx_m{m}", "codes")
    ).write.mode("overwrite").parquet(codes_path)
    book_rows = [
        (j, c, d, int(round(float(idx.codebooks[j][c][d]) * 1_000_000)))
        for j in range(m)
        for c in range(idx.codebooks.shape[1])
        for d in range(dsub)
    ]
    local_df(spark, 
        book_rows, "bj int, bc int, bd int, v_micro long"
    ).coalesce(1).write.mode("overwrite").parquet(books_path)
    with open(marker, "w") as f:
        _json.dump(key, f)
    return codes_path, books_path


def _pq_distortion_sql() -> str:
    blocks = []
    for m in _PQ_SWEEP_MS:
        dsub = _PQ_SWEEP_DIM // m
        blocks.append(
            f"""
SELECT {m} AS m, e.vec_id,
       CAST(SUM(
         (CAST(ROUND(e.embedding[d.d + 1]::DOUBLE * 1000000) AS BIGINT) - b.v_micro)
         * (CAST(ROUND(e.embedding[d.d + 1]::DOUBLE * 1000000) AS BIGINT) - b.v_micro)
       ) AS BIGINT) AS dist
FROM embeddings e
CROSS JOIN range(0, {_PQ_SWEEP_DIM}) d(d)
JOIN read_parquet('{_PQ_SWEEP_DIR}/codes_m{m}/*.parquet') c ON c.vec_id = e.vec_id
JOIN read_parquet('{_PQ_SWEEP_DIR}/books_m{m}/*.parquet') b
  ON b.bj = d.d // {dsub} AND b.bc = c.codes[d.d // {dsub} + 1] AND b.bd = d.d % {dsub}
GROUP BY e.vec_id"""
        )
    per_vec = "\nUNION ALL\n".join(blocks)
    return f"""
WITH pv AS ({per_vec})
SELECT m,
       CAST(COUNT(*) AS BIGINT) AS n_vectors,
       CAST(SUM(dist) // COUNT(*) AS BIGINT) AS mean_sqdist_micro2
FROM pv GROUP BY m
"""


@_register("embed_pq_distortion_sweep", _pq_distortion_sql())
def embed_pq_distortion_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Storage/fidelity tradeoff curve for product quantization: mean
    reconstruction distortion at m ∈ {4, 8, 16} segments (16, 8, 4
    bytes/vector) over the SAME corpus — the sweep that picks a PQ
    operating point, sibling of the nprobe and MRL curves. Codebook
    values persist as integer micro-units and coordinates micro-quantize
    identically in both engines, so every squared residual is an exact
    BIGINT; the per-m mean is an integer floor-division."""
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    out = None
    for m in _PQ_SWEEP_MS:
        dsub = _PQ_SWEEP_DIM // m
        codes_path, books_path = _ensure_pq_micro(spark, sf_dir, m)
        codes = spark.read.parquet(codes_path)
        books = spark.read.parquet(books_path)
        dims = emb.select("vec_id", F.posexplode("embedding").alias("d", "x")).select(
            "vec_id",
            F.round(F.col("x").cast("double") * 1_000_000).cast("long").alias("x_micro"),
            (F.col("d") / dsub).cast("int").alias("j"),
            F.pmod(F.col("d"), F.lit(dsub)).cast("int").alias("dd"),
        )
        seg_codes = codes.select("vec_id", F.posexplode("codes").alias("j", "c"))
        resid = (
            dims.join(seg_codes, ["vec_id", "j"])
            .join(
                F.broadcast(books),
                (F.col("j") == F.col("bj"))
                & (F.col("c") == F.col("bc"))
                & (F.col("dd") == F.col("bd")),
            )
            .select(
                "vec_id",
                ((F.col("x_micro") - F.col("v_micro")) * (F.col("x_micro") - F.col("v_micro"))).alias("sq"),
            )
        )
        pv = resid.groupBy("vec_id").agg(F.sum("sq").cast("long").alias("dist")).select(
            F.lit(m).cast("int").alias("m"), "vec_id", "dist"
        )
        out = pv if out is None else out.unionByName(pv)
    return (
        out.groupBy("m")
        .agg(F.count("*").cast("long").alias("n_vectors"), F.sum("dist").alias("_sd"))
        .select(
            "m",
            "n_vectors",
            F.expr("_sd div n_vectors").cast("long").alias("mean_sqdist_micro2"),
        )
    )


_OPQ_CMP_DIR = _oracle_scratch("opq_vs_pq_oracle")
_OPQ_CMP_M = 8
_OPQ_CMP_DSUB = _PQ_SWEEP_DIM // _OPQ_CMP_M


def _opq_cmp_sql() -> str:
    dsub = _OPQ_CMP_DSUB
    xm = "CAST(ROUND(e.embedding[d.d + 1]::DOUBLE * 1000000) AS BIGINT)"
    # PQ side reads the SHARED m=8 artifacts (identical build params to
    # embed_pq_distortion_sweep's m=8 point — see _ensure_pq_micro)
    pq_block = f"""
SELECT 'pq' AS method, e.vec_id,
       CAST(SUM(({xm} - b.v_micro) * ({xm} - b.v_micro)) AS BIGINT) AS dist
FROM embeddings e
CROSS JOIN range(0, {_PQ_SWEEP_DIM}) d(d)
JOIN read_parquet('{_PQ_SWEEP_DIR}/codes_m{_OPQ_CMP_M}/*.parquet') c ON c.vec_id = e.vec_id
JOIN read_parquet('{_PQ_SWEEP_DIR}/books_m{_OPQ_CMP_M}/*.parquet') b
  ON b.bj = d.d // {dsub} AND b.bc = c.codes[d.d // {dsub} + 1] AND b.bd = d.d % {dsub}
GROUP BY e.vec_id"""
    opq_block = f"""
SELECT 'opq' AS method, pv.vec_id, pv.dist
FROM (
  WITH segc AS (
    SELECT c.vec_id, j.j AS j, c.codes[j.j + 1] AS code
    FROM read_parquet('{_OPQ_CMP_DIR}/codes_opq/*.parquet') c
    CROSS JOIN range(0, {_OPQ_CMP_M}) j(j)
  ),
  recon_rot AS (
    SELECT s.vec_id, s.j * {dsub} + b.bd AS k, b.v_micro
    FROM segc s
    JOIN read_parquet('{_OPQ_CMP_DIR}/books_opq/*.parquet') b
      ON b.bj = s.j AND b.bc = s.code
  ),
  recon_orig AS (
    SELECT rr.vec_id, r.d,
           CAST(SUM(rr.v_micro * r.r_micro) AS HUGEINT) AS s
    FROM recon_rot rr
    JOIN read_parquet('{_OPQ_CMP_DIR}/rot/*.parquet') r ON r.k = rr.k
    GROUP BY 1, 2
  ),
  ro AS (
    SELECT vec_id, d,
           CAST(CASE WHEN s >= 0 THEN s // 1000000
                     ELSE -((-s) // 1000000) END AS BIGINT) AS ro_micro
    FROM recon_orig
  )
  SELECT e.vec_id,
         CAST(SUM(({xm.replace('d.d', 'ro.d')} - ro.ro_micro)
                  * ({xm.replace('d.d', 'ro.d')} - ro.ro_micro)) AS BIGINT) AS dist
  FROM ro
  JOIN embeddings e ON e.vec_id = ro.vec_id
  CROSS JOIN range(0, {_PQ_SWEEP_DIM}) d(d)
  WHERE d.d = ro.d
  GROUP BY e.vec_id
) pv"""
    return f"""
WITH pv AS ({pq_block}
UNION ALL
{opq_block})
SELECT method,
       CAST(COUNT(*) AS BIGINT) AS n_vectors,
       CAST(SUM(dist) // COUNT(*) AS BIGINT) AS mean_sqdist_micro2
FROM pv GROUP BY method
"""


@_register("embed_opq_vs_pq_distortion", _opq_cmp_sql())
def embed_opq_vs_pq_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPQ's learned rotation, priced: mean reconstruction distortion of
    plain PQ vs OPQ at the SAME m=8/16-codes budget — the oracle-checked
    form of the 'rotation buys lower MSE for identical bytes' claim.
    OPQ reconstructions rotate back via persisted integer micro-unit
    rotation rows with truncate-toward-zero downscaling spelled
    identically in both engines (DuckDB // floors, Spark div truncates —
    negatives WOULD diverge unspelled). Embeddings are unit-norm, so the
    in-encode normalization is a no-op and raw-vector distortion is the
    honest metric."""
    from whatsapp_vectordb_spark.operators.ann import OpqIndex

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    dsub = _OPQ_CMP_DSUB

    def persist_books(idx, name):
        rows = [
            (j, c, d, int(round(float(idx.codebooks[j][c][d]) * 1_000_000)))
            for j in range(_OPQ_CMP_M)
            for c in range(idx.codebooks.shape[1])
            for d in range(dsub)
        ]
        local_df(spark, rows, "bj int, bc int, bd int, v_micro long").coalesce(
            1
        ).write.mode("overwrite").parquet(os.path.join(_OPQ_CMP_DIR, name))

    # plain-PQ side: the SHARED m=8 build (identical params; VERDICT r13 #6)
    pq_codes_path, pq_books_path = _ensure_pq_micro(spark, sf_dir, _OPQ_CMP_M)

    opq = OpqIndex.build(emb, m=_OPQ_CMP_M, ksub=16, sample_rows=500, seed=0)
    opq.encode(emb).write.mode("overwrite").parquet(
        os.path.join(_OPQ_CMP_DIR, "codes_opq")
    )
    persist_books(opq, "books_opq")
    rot_rows = [
        (d, k, int(round(float(opq.rotation[d][k]) * 1_000_000)))
        for d in range(_PQ_SWEEP_DIM)
        for k in range(_PQ_SWEEP_DIM)
    ]
    local_df(spark, rot_rows, "d int, k int, r_micro long").coalesce(
        1
    ).write.mode("overwrite").parquet(os.path.join(_OPQ_CMP_DIR, "rot"))

    dims = emb.select("vec_id", F.posexplode("embedding").alias("d", "x")).select(
        "vec_id",
        "d",
        F.round(F.col("x").cast("double") * 1_000_000).cast("long").alias("x_micro"),
    )

    # plain PQ distortion (segment-local reconstruction)
    codes_pq = spark.read.parquet(pq_codes_path)
    books_pq = spark.read.parquet(pq_books_path)
    seg_pq = codes_pq.select("vec_id", F.posexplode("codes").alias("j", "c"))
    pq_resid = (
        dims.withColumn("j", (F.col("d") / dsub).cast("int"))
        .withColumn("dd", F.pmod(F.col("d"), F.lit(dsub)).cast("int"))
        .join(seg_pq, ["vec_id", "j"])
        .join(
            F.broadcast(books_pq),
            (F.col("j") == F.col("bj")) & (F.col("c") == F.col("bc")) & (F.col("dd") == F.col("bd")),
        )
        .select(
            "vec_id",
            ((F.col("x_micro") - F.col("v_micro")) * (F.col("x_micro") - F.col("v_micro"))).alias("sq"),
        )
        .groupBy("vec_id")
        .agg(F.sum("sq").cast("long").alias("dist"))
        .select(F.lit("pq").alias("method"), "vec_id", "dist")
    )

    # OPQ: reconstruct in rotated space, rotate back with integer downscale
    codes_opq = spark.read.parquet(os.path.join(_OPQ_CMP_DIR, "codes_opq"))
    books_opq = spark.read.parquet(os.path.join(_OPQ_CMP_DIR, "books_opq"))
    rot = spark.read.parquet(os.path.join(_OPQ_CMP_DIR, "rot"))
    seg_opq = codes_opq.select("vec_id", F.posexplode("codes").alias("j", "c"))
    recon_rot = seg_opq.join(
        F.broadcast(books_opq),
        (F.col("j") == F.col("bj")) & (F.col("c") == F.col("bc")),
    ).select("vec_id", (F.col("j") * dsub + F.col("bd")).alias("k"), "v_micro")
    recon_orig = (
        recon_rot.join(F.broadcast(rot), "k")
        .groupBy("vec_id", "d")
        .agg(F.sum(F.col("v_micro") * F.col("r_micro")).alias("_s"))
        .select("vec_id", "d", F.expr("_s div 1000000").cast("long").alias("ro_micro"))
    )
    opq_resid = (
        dims.join(recon_orig, ["vec_id", "d"])
        .select(
            "vec_id",
            ((F.col("x_micro") - F.col("ro_micro")) * (F.col("x_micro") - F.col("ro_micro"))).alias("sq"),
        )
        .groupBy("vec_id")
        .agg(F.sum("sq").cast("long").alias("dist"))
        .select(F.lit("opq").alias("method"), "vec_id", "dist")
    )

    return (
        pq_resid.unionByName(opq_resid)
        .groupBy("method")
        .agg(F.count("*").cast("long").alias("n_vectors"), F.sum("dist").alias("_sd"))
        .select(
            "method",
            "n_vectors",
            F.expr("_sd div n_vectors").cast("long").alias("mean_sqdist_micro2"),
        )
    )


@_register(
    "compat_whatsapp_source",
    f"""
WITH lines AS ({_CHAT_LINE_SQL})
SELECT doc_id AS line_no,
       CASE WHEN ok THEN ts_r END AS ts_raw,
       CASE WHEN ok THEN sender_raw END AS sender,
       CASE WHEN ok THEN message_raw END AS message,
       ok AS parse_ok
FROM (
  SELECT doc_id,
         regexp_extract(value, '^\\[(\\d{{2}}\\.\\d{{2}}\\.\\d{{2}}, \\d{{2}}:\\d{{2}}:\\d{{2}})\\] ~?\\s*([^:]+): (.*)$', 1) <> '' AS ok,
         regexp_extract(value, '^\\[(\\d{{2}}\\.\\d{{2}}\\.\\d{{2}}, \\d{{2}}:\\d{{2}}:\\d{{2}})\\] ~?\\s*([^:]+): (.*)$', 1) AS ts_r,
         trim(regexp_extract(value, '^\\[(\\d{{2}}\\.\\d{{2}}\\.\\d{{2}}, \\d{{2}}:\\d{{2}}:\\d{{2}})\\] ~?\\s*([^:]+): (.*)$', 2)) AS sender_raw,
         regexp_replace(regexp_extract(value, '^\\[(\\d{{2}}\\.\\d{{2}}\\.\\d{{2}}, \\d{{2}}:\\d{{2}}:\\d{{2}})\\] ~?\\s*([^:]+): (.*)$', 3), '\\s+', ' ', 'g') AS message_raw
  FROM lines
)
""",
)
def compat_whatsapp_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The chat format as a REGISTERED Spark 4 Python data source:
    ``spark.read.format("whatsapp")`` returns typed parsed rows straight
    from the text file (sources/whatsapp_source.py — partition per file,
    driver only lists paths). The synthesized corpus is written once in
    doc_id order so ``line_no == doc_id`` and the oracle replays the
    identical regex over the same lines."""
    import os as _os

    from whatsapp_vectordb_spark.sources import whatsapp_source

    scratch = _oracle_scratch("whatsapp_source")
    _os.makedirs(scratch, exist_ok=True)
    path = _os.path.join(scratch, "chat.txt")
    rows = _chat_lines_df(spark, sf_dir).orderBy("doc_id").collect()
    with open(path, "w", encoding="utf-8") as f:
        for r in rows:
            f.write(r["value"] + "\n")

    fmt = whatsapp_source.register(spark)
    return spark.read.format(fmt).load(path).select(
        "line_no", "ts_raw", "sender", "message", "parse_ok"
    )


# Round 8: the reference's second-language path (main.go:296-302 routes
# `he` chat exports through the same parse) — Hebrew senders and message
# prefixes through the full connector pipeline: fixture FILE on disk →
# Python DataSource partition read → regex parse → per-sender rollup. The
# rollup (multi-byte sender strings as group keys, character — not byte —
# message lengths) goes through the driver's Arrow value-hash, so a UTF-8
# mangle anywhere in the path (file encoding, Arrow transfer, regex capture)
# breaks the hash.
@_register(
    "compat_whatsapp_source_he",
    f"""
WITH lines AS ({_CHAT_LINE_HE_SQL})
SELECT sender,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(length(message_raw)) AS BIGINT) AS chars_total
FROM (
  SELECT trim(regexp_extract(value, '^\\[(\\d{{2}}\\.\\d{{2}}\\.\\d{{2}}, \\d{{2}}:\\d{{2}}:\\d{{2}})\\] ~?\\s*([^:]+): (.*)$', 2)) AS sender,
         regexp_replace(regexp_extract(value, '^\\[(\\d{{2}}\\.\\d{{2}}\\.\\d{{2}}, \\d{{2}}:\\d{{2}}:\\d{{2}})\\] ~?\\s*([^:]+): (.*)$', 3), '\\s+', ' ', 'g') AS message_raw,
         regexp_extract(value, '^\\[(\\d{{2}}\\.\\d{{2}}\\.\\d{{2}}, \\d{{2}}:\\d{{2}}:\\d{{2}})\\] ~?\\s*([^:]+): (.*)$', 1) <> '' AS ok
  FROM lines
)
WHERE ok
GROUP BY 1
""",
)
def compat_whatsapp_source_he(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hebrew chat export through the registered Python data source:
    per-sender parsed-line counts and total message characters (UTF-8
    code points, identical semantics to DuckDB ``length``). Same scale
    shape as compat_whatsapp_source — partition-per-file scan, map-only
    parse, one skinny rollup."""
    import os as _os

    from whatsapp_vectordb_spark.sources import whatsapp_source

    scratch = _oracle_scratch("whatsapp_source_he")
    _os.makedirs(scratch, exist_ok=True)
    path = _os.path.join(scratch, "chat_he.txt")
    rows = _chat_lines_he_df(spark, sf_dir).orderBy("doc_id").collect()
    with open(path, "w", encoding="utf-8") as f:
        for r in rows:
            f.write(r["value"] + "\n")

    fmt = whatsapp_source.register(spark)
    return (
        spark.read.format(fmt)
        .load(path)
        .where(F.col("parse_ok"))
        .groupBy("sender")
        .agg(
            F.count("*").cast("long").alias("n_lines"),
            F.sum(F.length("message")).cast("long").alias("chars_total"),
        )
    )


@_register(
    "compat_whatsapp_sink",
    f"""
WITH lines AS ({_CHAT_LINE_SQL})
SELECT sender_raw AS sender,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM({_phash_sql('message_raw')}) AS BIGINT) AS message_checksum
FROM (
  SELECT regexp_extract(value, '^\\[(\\d{{2}}\\.\\d{{2}}\\.\\d{{2}}, \\d{{2}}:\\d{{2}}:\\d{{2}})\\] ~?\\s*([^:]+): (.*)$', 1) <> '' AS ok,
         trim(regexp_extract(value, '^\\[(\\d{{2}}\\.\\d{{2}}\\.\\d{{2}}, \\d{{2}}:\\d{{2}}:\\d{{2}})\\] ~?\\s*([^:]+): (.*)$', 2)) AS sender_raw,
         regexp_replace(regexp_extract(value, '^\\[(\\d{{2}}\\.\\d{{2}}\\.\\d{{2}}, \\d{{2}}:\\d{{2}}:\\d{{2}})\\] ~?\\s*([^:]+): (.*)$', 3), '\\s+', ' ', 'g') AS message_raw
  FROM lines
)
WHERE ok
GROUP BY 1
""",
)
def compat_whatsapp_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connector round-trip: parsed rows WRITE back out through
    ``df.write.format("whatsapp")`` (executor-side part files, two-phase
    staged commit — sources/whatsapp_source.py WhatsAppChatWriter), then
    read back through the same source; per-sender line counts and
    message-content checksums must equal the direct parse of the
    original lines — sink, commit protocol, and reader all pinned by one
    oracle."""
    import os as _os
    import shutil

    from whatsapp_vectordb_spark.functions.text import portable_hash
    from whatsapp_vectordb_spark.parse import parse_chat_lines
    from whatsapp_vectordb_spark.sources import whatsapp_source

    scratch = _oracle_scratch("whatsapp_sink")
    shutil.rmtree(scratch, ignore_errors=True)
    out_dir = _os.path.join(scratch, "out")

    parsed = parse_chat_lines(_chat_lines_df(spark, sf_dir), value_col="value").where(
        F.col("parse_ok")
    )
    fmt = whatsapp_source.register(spark)
    # repairs write resolution when a streaming query already ran through
    # the source in this session (see ensure_write_resolution docstring)
    whatsapp_source.ensure_write_resolution(spark, fmt)
    (
        parsed.select(
            F.lit("09.09.23, 14:35:02").alias("ts_raw"), "sender", "message"
        )
        .repartition(4)
        .write.format(fmt)
        .mode("overwrite")
        .save(out_dir)
    )
    back = spark.read.format(fmt).load(out_dir).where(F.col("parse_ok"))
    return back.groupBy("sender").agg(
        F.count("*").cast("long").alias("n_lines"),
        F.sum(portable_hash(F.col("message"))).cast("long").alias("message_checksum"),
    )
