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


def _oracle_scratch(name: str) -> str:
    """Scratch directory for persisted oracle state (parquet written by the
    Spark query, re-read by the DuckDB oracle — both paths are baked into
    the oracle SQL at registration time, so Spark and DuckDB must resolve
    the SAME directory). Default is repo-relative ``spark-warehouse/<name>``
    — stable even if the driver runs the two engines in separate processes.
    Set ``SPARK_GRAFT_ORACLE_SCRATCH`` to point concurrent harness runs at
    disjoint scratch roots (fixed shared paths race: overwrite-at-query-time
    from two runs can corrupt each other's state)."""
    base = os.environ.get("SPARK_GRAFT_ORACLE_SCRATCH")
    if base is None:
        base = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "spark-warehouse"
        )
    return os.path.join(base, name)


def _tmp_scratch(prefix: str) -> str:
    """``mkdtemp`` registered for process-exit cleanup. Streaming/DDL
    queries stage state and answer parquet here and the returned frame is
    re-read LAZILY by the driver, so the directory must outlive the query
    function — removal happens atexit, not inline (ADVICE r6: inline-only
    cleanup leaked one scratch root per gate run)."""
    import atexit
    import shutil
    import tempfile

    d = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    return d


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load `events` with its ``ts`` column normalized to plain TIMESTAMP
    regardless of which parquet encoding this testdata generation used —
    LONG nanos (legacy ``nanosAsLong`` reads), TIMESTAMP_NTZ (current
    testdata: ``timestamp[us]`` with ``isAdjustedToUTC=false``), or plain
    TIMESTAMP. See ``operators.events.normalize_event_ts``."""
    from whatsapp_vectordb_spark.operators.events import normalize_event_ts

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return normalize_event_ts(_t(spark, sf_dir, "events"))


# --------------------------------------------------------------------------
# Q1/Q2 — k-NN top-k under each metric (SURVEY.md §2.5). The query vector is
# a stored one (vec_id=0) so the oracle needs no Python embedder.
# --------------------------------------------------------------------------

_KNN_ORACLE = """
WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
SELECT e.vec_id,{payload}
       ROUND({score_expr}, 6) AS score
FROM embeddings e, q
WHERE {score_expr} IS NOT NULL
ORDER BY score {dir}, e.vec_id ASC
LIMIT 10
"""


@_register(
    "knn_topk_cosine",
    _KNN_ORACLE.format(
        score_expr="list_cosine_similarity(e.embedding::DOUBLE[], q.qv)",
        dir="DESC",
        payload=" e.label,",  # Q4: payload hydrated in the same select
    ),
)
def knn_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    qvec = emb.where(F.col("vec_id") == 0).head()["embedding"]
    return topk(
        emb, qvec, k=10, metric="cosine", round_to=ROUND_SCORE, payload_cols=("label",)
    )


@_register(
    "knn_topk_dotproduct",
    _KNN_ORACLE.format(
        score_expr="list_dot_product(e.embedding::DOUBLE[], q.qv)", dir="DESC", payload=""
    ),
)
def knn_topk_dotproduct(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    qvec = emb.where(F.col("vec_id") == 0).head()["embedding"]
    return topk(emb, qvec, k=10, metric="dotproduct", round_to=ROUND_SCORE)


@_register(
    "knn_topk_euclidean",
    _KNN_ORACLE.format(
        score_expr="list_distance(e.embedding::DOUBLE[], q.qv)", dir="ASC", payload=""
    ),
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


# ==========================================================================
# Extended surface: dedup + text analysis (BASELINE.json north star).
# The sf0.01 corpus has no duplicate texts, so dedup queries run on a
# deterministically AUGMENTED corpus — exact copies (doc_id+1000000 for
# doc_id%50=0) and near-dup copies with a token appended (doc_id+2000000
# for doc_id%50=10) — built identically in Spark and the SQL oracle.
# ==========================================================================

_AUG_SQL = """
SELECT doc_id, text FROM documents
UNION ALL
SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 50 = 0
UNION ALL
SELECT doc_id + 2000000 AS doc_id, text || ' zzqx extra trailing words' AS text
FROM documents WHERE doc_id % 50 = 10
"""

# Shared DuckDB fragments mirroring functions/text.py exactly (ascii corpus).
_TOKS = "list_filter(regexp_split_to_array(lower({c}), '[^a-z0-9]+'), t -> t <> '')"


def _sh_sql(n: int) -> str:
    """DuckDB expression for word n-gram shingles over token list `tk`."""
    gram = " || ' ' || ".join(f"tk[i+{j}]" for j in range(n))
    gram = gram.replace("tk[i+0]", "tk[i]")
    return (
        f"CASE WHEN len(tk) >= {n} THEN "
        f"list_distinct(list_transform(range(1, len(tk) - {n - 2}), i -> {gram})) "
        f"ELSE [array_to_string(tk, ' ')] END"
    )


def _phash_sql(expr: str, seed: int = 0, nibbles: int = 8) -> str:
    return f"('0x' || substr(md5('{seed}:' || {expr}), 1, {nibbles}))::BIGINT"


def _augmented_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    exact = (
        docs.where(F.col("doc_id") % 50 == 0)
        .select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
    )
    near = (
        docs.where(F.col("doc_id") % 50 == 10)
        .select(
            (F.col("doc_id") + 2000000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" zzqx extra trailing words")).alias("text"),
        )
    )
    return docs.unionByName(exact).unionByName(near)


@_register(
    "dedup_exact",
    f"""
WITH corpus AS ({_AUG_SQL})
SELECT dup_hash, doc_id, group_size FROM (
  SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS dup_hash,
         doc_id,
         COUNT(*) OVER (PARTITION BY md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))) AS group_size
  FROM corpus
) WHERE group_size >= 2
""",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from whatsapp_vectordb_spark.operators.dedup import exact_duplicates

    out = exact_duplicates(_augmented_docs(spark, sf_dir))
    return out.withColumn("group_size", F.col("group_size").cast("long"))


def _minhash_sig_sql(num_hashes: int, shingle_n: int, source: str) -> str:
    # mirrors dedup._signatures_from_hashed: one md5 per shingle, split
    # into 32-bit halves x1/x2, h_i = (x1 + i*x2) & 0xFFFFFFFF
    mins = ",\n       ".join(
        f"MIN((x1 + {i} * x2) & 4294967295) AS s{i}" for i in range(num_hashes)
    )
    return f"""
WITH corpus AS ({source}),
toks AS (SELECT doc_id, {_TOKS.format(c='text')} AS tk FROM corpus),
sh AS (SELECT doc_id, {_sh_sql(shingle_n)} AS shingles FROM toks),
ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
hx AS (SELECT doc_id,
              ('0x' || substr(md5(s), 1, 8))::BIGINT AS x1,
              ('0x' || substr(md5(s), 9, 8))::BIGINT AS x2
       FROM ex)
SELECT doc_id,
       {mins}
FROM hx GROUP BY doc_id
"""


@_register("minhash_signatures", _minhash_sig_sql(16, 3, "SELECT doc_id, text FROM documents"))
def minhash_signatures_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from whatsapp_vectordb_spark.operators.dedup import minhash_signatures

    return minhash_signatures(_t(spark, sf_dir, "documents"), num_hashes=16, shingle_n=3)


def _minhash_pairs_sql(num_hashes: int, bands: int, shingle_n: int, threshold: float) -> str:
    r = num_hashes // bands
    sig = _minhash_sig_sql(num_hashes, shingle_n, _AUG_SQL)
    band_selects = "\nUNION ALL\n".join(
        "SELECT doc_id, {b} AS band, md5(concat_ws(',', {cols})) AS band_key FROM sig".format(
            b=b,
            cols=", ".join(f"CAST(s{i} AS VARCHAR)" for i in range(b * r, (b + 1) * r)),
        )
        for b in range(bands)
    )
    return f"""
WITH sig AS ({sig}),
banded AS ({band_selects}),
cand AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
corpus AS ({_AUG_SQL}),
toks AS (SELECT doc_id, {_TOKS.format(c='text')} AS tk FROM corpus),
shl AS (SELECT doc_id, {_sh_sql(shingle_n)} AS shingles FROM toks),
ex AS (SELECT doc_id, unnest(shingles) AS s FROM shl),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM ex GROUP BY doc_id),
inter AS (
  SELECT c.id_a, c.id_b, COUNT(*) AS n_common
  FROM cand c
  JOIN ex ea ON ea.doc_id = c.id_a
  JOIN ex eb ON eb.doc_id = c.id_b AND eb.s = ea.s
  GROUP BY 1, 2
)
SELECT i.id_a, i.id_b,
       ROUND(i.n_common::DOUBLE / (na.n + nb.n - i.n_common), 6) AS jaccard
FROM inter i
JOIN sizes na ON na.doc_id = i.id_a
JOIN sizes nb ON nb.doc_id = i.id_b
WHERE ROUND(i.n_common::DOUBLE / (na.n + nb.n - i.n_common), 6) >= {threshold}
"""


@_register("dedup_minhash_lsh", _minhash_pairs_sql(16, 4, 3, 0.5))
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from whatsapp_vectordb_spark.operators.dedup import minhash_near_duplicates

    return minhash_near_duplicates(
        _augmented_docs(spark, sf_dir), num_hashes=16, bands=4, shingle_n=3, threshold=0.5
    )


@_register("dedup_incremental_index", _minhash_pairs_sql(16, 4, 3, 0.5))
def dedup_incremental_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The persistent MinHash index fed the augmented corpus in TWO
    batches (even doc_ids first, then odd + the synthetic copies); the
    union of the two incremental pair sets must equal the one-shot batch
    dedup — the oracle is literally ``dedup_minhash_lsh``'s SQL. This is
    the ingest-time shape: each arriving batch probes the stored band
    keys and appends only its own state."""
    import shutil

    from whatsapp_vectordb_spark.operators.dedup_index import MinHashDedupIndex

    path = _oracle_scratch("mh_incr_oracle")
    shutil.rmtree(path, ignore_errors=True)
    aug = _augmented_docs(spark, sf_dir)
    idx = MinHashDedupIndex(
        spark, path, num_hashes=16, bands=4, shingle_n=3, threshold=0.5
    )
    p1 = idx.add_batch(aug.where(F.col("doc_id") % 2 == 0))
    p2 = idx.add_batch(aug.where(F.col("doc_id") % 2 == 1))
    return p1.unionByName(p2)


@_register(
    "dedup_jaccard_exact",
    f"""
WITH corpus AS ({_AUG_SQL}),
toks AS (SELECT doc_id, {_TOKS.format(c='text')} AS tk FROM corpus),
shl AS (SELECT doc_id, {_sh_sql(3)} AS shingles FROM toks),
ex AS (SELECT doc_id, unnest(shingles) AS s FROM shl),
cand AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM ex GROUP BY doc_id),
inter AS (
  SELECT c.id_a, c.id_b, COUNT(*) AS n_common
  FROM cand c
  JOIN ex ea ON ea.doc_id = c.id_a
  JOIN ex eb ON eb.doc_id = c.id_b AND eb.s = ea.s
  GROUP BY 1, 2
)
SELECT i.id_a, i.id_b,
       ROUND(i.n_common::DOUBLE / (na.n + nb.n - i.n_common), 6) AS jaccard
FROM inter i
JOIN sizes na ON na.doc_id = i.id_a
JOIN sizes nb ON nb.doc_id = i.id_b
WHERE ROUND(i.n_common::DOUBLE / (na.n + nb.n - i.n_common), 6) >= 0.5
""",
)
def dedup_jaccard_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from whatsapp_vectordb_spark.operators.dedup import jaccard_near_duplicates

    return jaccard_near_duplicates(_augmented_docs(spark, sf_dir), shingle_n=3, threshold=0.5)


# Decontamination: benchmark set = every 37th document's text; 5-gram
# overlap (the 13-gram GPT-3 rule scaled to the short synthetic docs —
# the operator default is 13). Benchmark docs are in the corpus, so they
# self-report contamination 1.0; clean docs report 0.
@_register(
    "dedup_benchmark_contamination",
    f"""
WITH toks AS (SELECT doc_id, {_TOKS.format(c='text')} AS tk FROM documents),
shl AS (SELECT doc_id, {_sh_sql(5)} AS shingles FROM toks),
ex AS (SELECT doc_id, unnest(shingles) AS s FROM shl),
bench AS (SELECT DISTINCT s FROM ex WHERE doc_id % 37 = 0),
sizes AS (SELECT doc_id, COUNT(*) AS n_shingles FROM ex GROUP BY 1),
hits AS (SELECT e.doc_id, COUNT(*) AS n_hits FROM ex e JOIN bench b ON e.s = b.s GROUP BY 1)
SELECT z.doc_id, z.n_shingles,
       COALESCE(h.n_hits, 0) AS n_hits,
       ROUND(COALESCE(h.n_hits, 0)::DOUBLE / z.n_shingles, 6) AS contamination
FROM sizes z LEFT JOIN hits h ON h.doc_id = z.doc_id
""",
)
def dedup_benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from whatsapp_vectordb_spark.operators.dedup import benchmark_contamination

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    bench = docs.where(F.col("doc_id") % 37 == 0)
    return benchmark_contamination(docs, bench, shingle_n=5)


def _simhash_sql(bits: int, source: str) -> str:
    bit_terms = " + ".join(
        f"(CASE WHEN b{j} >= 0 THEN {1 << j} ELSE 0 END)" for j in range(bits)
    )
    bit_sums = ",\n       ".join(
        f"SUM(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS b{j}" for j in range(bits)
    )
    return f"""
WITH corpus AS ({source}),
toks AS (SELECT doc_id, {_TOKS.format(c='text')} AS tk FROM corpus),
shl AS (SELECT doc_id, {_sh_sql(3)} AS shingles FROM toks),
ex AS (SELECT doc_id, unnest(shingles) AS tok FROM shl),
hs AS (SELECT doc_id, {_phash_sql('tok', nibbles=(bits + 3) // 4)} AS h FROM ex),
agg AS (SELECT doc_id,
       {bit_sums}
FROM hs GROUP BY doc_id)
SELECT doc_id, CAST({bit_terms} AS BIGINT) AS simhash FROM agg
"""


@_register("simhash_signatures", _simhash_sql(48, "SELECT doc_id, text FROM documents"))
def simhash_signatures_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from whatsapp_vectordb_spark.operators.dedup import simhash_signatures

    return simhash_signatures(_t(spark, sf_dir, "documents"), bits=48)


def _simhash_pairs_sql(bits: int, band_bits: int, max_hamming: int) -> str:
    sig = _simhash_sql(bits, _AUG_SQL)
    n_bands = bits // band_bits
    mask = (1 << band_bits) - 1
    band_selects = "\nUNION ALL\n".join(
        f"SELECT doc_id, simhash, {b} AS band, (simhash >> {b * band_bits}) & {mask} AS chunk FROM sig"
        for b in range(n_bands)
    )
    return f"""
WITH sig AS ({sig}),
banded AS ({band_selects}),
cand AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         a.simhash AS sh_a, b.simhash AS sh_b
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.chunk = b.chunk AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4
)
SELECT id_a, id_b, CAST(bit_count(xor(sh_a, sh_b)) AS INTEGER) AS hamming
FROM cand
WHERE bit_count(xor(sh_a, sh_b)) <= {max_hamming}
""".replace("{mask}", str(mask))


@_register("dedup_simhash_pairs", _simhash_pairs_sql(48, 12, 3))
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from whatsapp_vectordb_spark.operators.dedup import simhash_pairs

    # impl='pandas' folds bit sums via numpy — bit-identical to the expr
    # form the oracle mirrors, severalfold cheaper at bench scale
    out = simhash_pairs(
        _augmented_docs(spark, sf_dir), bits=48, band_bits=12, max_hamming=3, impl="pandas"
    )
    return out.withColumn("hamming", F.col("hamming").cast("int"))


@_register(
    "dedup_embedding_cosine",
    """
WITH corpus AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000 AS vec_id, embedding FROM embeddings WHERE vec_id % 100 = 0
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cos_sim
FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
WHERE ROUND(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= 0.95
""",
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from whatsapp_vectordb_spark.operators.dedup import embedding_near_duplicates

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    dupes = emb.where(F.col("vec_id") % 100 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"), "embedding"
    )
    return embedding_near_duplicates(emb.unionByName(dupes), threshold=0.95)


_DEDUP_EMB_LSH_ORACLE = """
WITH corpus AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000 AS vec_id, embedding FROM embeddings WHERE vec_id % 100 = 0
),
planes AS (
  SELECT p.p AS p, i.i AS i,
         CASE WHEN ('0x' || substr(md5('0:' || CAST(p.p AS VARCHAR) || ':' || CAST(i.i AS VARCHAR)), 1, 1))::BIGINT & 1 = 1
              THEN 1 ELSE -1 END AS s
  FROM range(0,16) p(p) CROSS JOIN range(0,64) i(i)
),
vq AS (
  SELECT vec_id, i.i AS i,
         CAST(round(embedding[i.i + 1]::DOUBLE * 1000000) AS BIGINT) AS q
  FROM corpus CROSS JOIN range(0,64) i(i)
),
dots AS (
  SELECT vq.vec_id, planes.p, SUM(vq.q * planes.s) AS dot
  FROM vq JOIN planes ON vq.i = planes.i GROUP BY 1, 2
),
sigs AS (
  SELECT vec_id, string_agg(CASE WHEN dot >= 0 THEN '1' ELSE '0' END, '' ORDER BY p) AS sig
  FROM dots GROUP BY vec_id
),
banded AS (
  SELECT vec_id, b.b AS band, substr(sig, b.b * 4 + 1, 4) AS chunk
  FROM sigs CROSS JOIN range(0,4) b(b)
),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.chunk = b.chunk AND a.vec_id < b.vec_id
)
SELECT c.id_a, c.id_b,
       ROUND(list_cosine_similarity(va.embedding::DOUBLE[], vb.embedding::DOUBLE[]), 6) AS cos_sim
FROM cand c
JOIN corpus va ON va.vec_id = c.id_a
JOIN corpus vb ON vb.vec_id = c.id_b
WHERE ROUND(list_cosine_similarity(va.embedding::DOUBLE[], vb.embedding::DOUBLE[]), 6) >= 0.95
"""


@_register("dedup_embedding_lsh", _DEDUP_EMB_LSH_ORACLE)
def dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB shape of ``dedup_embedding_cosine``: LSH-bucketed
    candidate pairs (band-key equi-join, never a cross join) + exact
    cosine verify. The oracle reproduces the integer-exact buckets, and
    ``dedup_embedding_cosine`` above remains the all-pairs ground truth
    for recall."""
    from whatsapp_vectordb_spark.operators.ann import portable_lsh_join

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    dupes = emb.where(F.col("vec_id") % 100 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"), "embedding"
    )
    return portable_lsh_join(
        emb.unionByName(dupes),
        threshold=0.95,
        n_planes=16,
        bands=4,
        seed=0,
        round_to=ROUND_SCORE,
        impl="numpy",
        dim=64,
    )


# End-to-end scale-safe dedup: LSH-bucketed candidate pairs (never all-
# pairs) -> connected components -> canonical keep/drop verdict. Because
# the LSH is integer-portable, even the candidate graph is bit-exact in
# SQL, so the WHOLE pipeline hash-checks — this is the query a 100 TB
# corpus dedup actually runs.
_DEDUP_COMPONENTS_LSH_ORACLE = """
WITH RECURSIVE corpus AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000 AS vec_id, embedding FROM embeddings WHERE vec_id % 100 = 0
),
planes AS (
  SELECT p.p AS p, i.i AS i,
         CASE WHEN ('0x' || substr(md5('0:' || CAST(p.p AS VARCHAR) || ':' || CAST(i.i AS VARCHAR)), 1, 1))::BIGINT & 1 = 1
              THEN 1 ELSE -1 END AS s
  FROM range(0,16) p(p) CROSS JOIN range(0,64) i(i)
),
vq AS (
  SELECT vec_id, i.i AS i,
         CAST(round(embedding[i.i + 1]::DOUBLE * 1000000) AS BIGINT) AS q
  FROM corpus CROSS JOIN range(0,64) i(i)
),
dots AS (
  SELECT vq.vec_id, planes.p, SUM(vq.q * planes.s) AS dot
  FROM vq JOIN planes ON vq.i = planes.i GROUP BY 1, 2
),
sigs AS (
  SELECT vec_id, string_agg(CASE WHEN dot >= 0 THEN '1' ELSE '0' END, '' ORDER BY p) AS sig
  FROM dots GROUP BY vec_id
),
banded AS (
  SELECT vec_id, b.b AS band, substr(sig, b.b * 4 + 1, 4) AS chunk
  FROM sigs CROSS JOIN range(0,4) b(b)
),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.chunk = b.chunk AND a.vec_id < b.vec_id
),
pairs AS (
  SELECT c.id_a AS a, c.id_b AS b
  FROM cand c
  JOIN corpus va ON va.vec_id = c.id_a
  JOIN corpus vb ON vb.vec_id = c.id_b
  WHERE ROUND(list_cosine_similarity(va.embedding::DOUBLE[], vb.embedding::DOUBLE[]), 6) >= 0.95
),
edges AS (SELECT a, b FROM pairs UNION SELECT b, a FROM pairs),
reach(node, r) AS (
  SELECT DISTINCT a AS node, a AS r FROM edges
  UNION
  SELECT e.b AS node, reach.r FROM reach JOIN edges e ON e.a = reach.node
),
comp AS (SELECT node, MIN(r) AS component FROM reach GROUP BY node)
SELECT node AS id,
       component AS canonical_id,
       COUNT(*) OVER (PARTITION BY component) AS cluster_size,
       CASE WHEN node = component THEN 1 ELSE 0 END AS is_canonical
FROM comp
"""


@_register("dedup_components_lsh", _DEDUP_COMPONENTS_LSH_ORACLE)
def dedup_components_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full 100 TB dedup pipeline in one query: LSH-bucketed candidate
    pairs (band-key equi-joins, no cross join), exact-cosine verify,
    hash-min connected components, min-id canonical election. The oracle
    replays every stage — including the candidate graph — bit-exactly."""
    from whatsapp_vectordb_spark.operators.ann import portable_lsh_join
    from whatsapp_vectordb_spark.operators.dedup import canonicalize_duplicates

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    dupes = emb.where(F.col("vec_id") % 100 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"), "embedding"
    )
    pairs = portable_lsh_join(
        emb.unionByName(dupes),
        threshold=0.95,
        n_planes=16,
        bands=4,
        seed=0,
        round_to=ROUND_SCORE,
        impl="numpy",
        dim=64,
    )
    return canonicalize_duplicates(pairs)


@_register(
    "dedup_components",
    """
WITH RECURSIVE corpus AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000 AS vec_id, embedding FROM embeddings WHERE vec_id % 100 = 0
),
pairs AS (
  SELECT a.vec_id AS a, b.vec_id AS b
  FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
  WHERE ROUND(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= 0.95
),
edges AS (SELECT a, b FROM pairs UNION SELECT b, a FROM pairs),
reach(node, r) AS (
  SELECT DISTINCT a AS node, a AS r FROM edges
  UNION
  SELECT e.b AS node, reach.r FROM reach JOIN edges e ON e.a = reach.node
),
comp AS (SELECT node, MIN(r) AS component FROM reach GROUP BY node)
SELECT node AS id,
       component AS canonical_id,
       COUNT(*) OVER (PARTITION BY component) AS cluster_size,
       CASE WHEN node = component THEN 1 ELSE 0 END AS is_canonical
FROM comp
""",
)
def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise cosine near-dup evidence → per-doc keep/drop verdict:
    hash-min connected components + min-id canonical election. The oracle
    recomputes components with a recursive CTE (min reachable id)."""
    from whatsapp_vectordb_spark.operators.dedup import (
        canonicalize_duplicates,
        embedding_near_duplicates,
    )

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    dupes = emb.where(F.col("vec_id") % 100 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"), "embedding"
    )
    pairs = embedding_near_duplicates(emb.unionByName(dupes), threshold=0.95)
    return canonicalize_duplicates(pairs)


# ==========================================================================
# Text analysis (extension surface: token stats, quality, language-ID,
# fingerprints) — all map-only Catalyst expressions over `documents`.
# ==========================================================================

_STOP_SQL = (
    "['the','a','an','and','or','of','to','in','is','are','was','were','be','been',"
    "'it','this','that','for','on','with','as','at','by','from','not','no','i','you',"
    "'he','she','we','they','do','does','did','have','has','had']"
)


@_register(
    "text_token_stats",
    f"""
WITH toks AS (SELECT doc_id, text, {_TOKS.format(c='text')} AS tk FROM documents)
SELECT doc_id,
       CAST(length(text) AS INTEGER) AS n_chars_measured,
       CAST(len(tk) AS INTEGER) AS n_tokens,
       CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\\s]')) AS INTEGER) AS n_pieces,
       CAST(len(list_distinct(tk)) AS INTEGER) AS n_distinct_tokens
FROM toks
""",
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from whatsapp_vectordb_spark.operators.textops import token_stats

    out = token_stats(_t(spark, sf_dir, "documents"))
    return out.select(
        "doc_id",
        F.col("n_chars_measured").cast("int").alias("n_chars_measured"),
        "n_tokens",
        "n_pieces",
        "n_distinct_tokens",
    )


@_register(
    "text_quality_scores",
    f"""
WITH toks AS (SELECT doc_id, text, {_TOKS.format(c='text')} AS tk FROM documents),
feats AS (
  SELECT doc_id,
         len(tk) AS n_tokens,
         CASE WHEN len(tk) > 0 THEN length(text)::DOUBLE / len(tk) ELSE 0.0 END AS mwl,
         CASE WHEN len(tk) > 0 THEN len(list_filter(tk, x -> list_contains({_STOP_SQL}, x)))::DOUBLE / len(tk) ELSE 0.0 END AS sr,
         CASE WHEN len(tk) > 0 THEN len(list_distinct(tk))::DOUBLE / len(tk) ELSE 0.0 END AS dv
  FROM toks
)
SELECT doc_id,
       CAST(n_tokens AS INTEGER) AS n_tokens,
       ROUND(mwl, 6) AS mean_word_len,
       ROUND(sr, 6) AS stopword_ratio,
       ROUND(dv, 6) AS lexical_diversity,
       ROUND(
         (CASE WHEN n_tokens >= 10 AND n_tokens <= 1000 THEN 1.0 ELSE 0.0 END) * 0.25
         + (CASE WHEN mwl >= 3.0 AND mwl <= 12.0 THEN 1.0 ELSE 0.0 END) * 0.25
         + LEAST(sr * 2.0, 1.0) * 0.25
         + dv * 0.25, 6) AS quality_score
FROM feats
""",
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    from whatsapp_vectordb_spark.operators.textops import quality_scores

    return quality_scores(_t(spark, sf_dir, "documents"))


@_register(
    "text_language_id",
    f"""
WITH toks AS (SELECT doc_id, {_TOKS.format(c='text')} AS tk FROM documents),
ratios AS (
  SELECT doc_id,
    CASE WHEN len(tk) > 0 THEN len(list_filter(tk, x -> list_contains({_STOP_SQL}, x)))::DOUBLE / len(tk) ELSE 0.0 END AS r_en,
    CASE WHEN len(tk) > 0 THEN len(list_filter(tk, x -> list_contains(['der','die','das','und','ist','nicht','ein','eine','zu','mit','von','auf','für','er','sie','es','ich','du','wir'], x)))::DOUBLE / len(tk) ELSE 0.0 END AS r_de,
    CASE WHEN len(tk) > 0 THEN len(list_filter(tk, x -> list_contains(['el','la','los','las','de','que','y','en','un','una','es','no','por','con','para','su','al','lo','se','mi','tu'], x)))::DOUBLE / len(tk) ELSE 0.0 END AS r_es,
    CASE WHEN len(tk) > 0 THEN len(list_filter(tk, x -> list_contains(['le','la','les','de','des','et','est','une','un','que','ne','pas','pour','dans','ce','il','elle','nous','vous'], x)))::DOUBLE / len(tk) ELSE 0.0 END AS r_fr
  FROM toks
)
SELECT doc_id,
       ROUND(r_en, 6) AS en_ratio,
       ROUND(GREATEST(r_en, r_de, r_es, r_fr), 6) AS best_ratio,
       CASE WHEN GREATEST(r_en, r_de, r_es, r_fr) = 0 THEN 'und'
            WHEN r_de = GREATEST(r_en, r_de, r_es, r_fr) THEN 'de'
            WHEN r_en = GREATEST(r_en, r_de, r_es, r_fr) THEN 'en'
            WHEN r_es = GREATEST(r_en, r_de, r_es, r_fr) THEN 'es'
            WHEN r_fr = GREATEST(r_en, r_de, r_es, r_fr) THEN 'fr'
       END AS lang_pred
FROM ratios
""",
)
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from whatsapp_vectordb_spark.operators.textops import language_id

    return language_id(_t(spark, sf_dir, "documents"))


@_register(
    "text_fingerprints",
    f"""
WITH toks AS (SELECT doc_id, text, {_TOKS.format(c='text')} AS tk FROM documents),
shl AS (SELECT doc_id, text, {_sh_sql(5)} AS shingles FROM toks)
SELECT doc_id,
       md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS exact_fp,
       list_min(list_transform(shingles, s -> {_phash_sql('s')})) AS content_fp
FROM shl
""",
)
def text_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from whatsapp_vectordb_spark.operators.textops import fingerprints

    return fingerprints(_t(spark, sf_dir, "documents"), shingle_n=5)


# ==========================================================================
# Relational surface over the TPC-H-ish star schema — green-field per
# SURVEY.md §2.10 (the reference has no joins/aggregations): demonstrates
# scan→filter→partial agg, broadcast joins, and per-group top-k at scale.
# ==========================================================================


@_register(
    "rel_pricing_summary",
    """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       ROUND(AVG(l_quantity), 6) AS avg_qty,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
)
def rel_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "sum_disc_price"
            ),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


@_register(
    "rel_top_customers",
    """
SELECT c_custkey, c_name,
       ROUND(SUM(o_totalprice), 2) AS revenue,
       COUNT(*) AS n_orders
FROM customer JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
""",
)
def rel_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .groupBy("c_custkey", "c_name")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count("*").alias("n_orders"),
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


@_register(
    "rel_nation_revenue",
    """
SELECT n_name,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
GROUP BY n_name
""",
)
def rel_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


# ==========================================================================
# Event-time windowed aggregation over `events` — the batch twin of the
# Structured Streaming pipeline in streaming/ops.py (same window semantics;
# the streaming variant adds a watermark). Window starts are emitted as
# formatted strings for engine-portable hashing.
# ==========================================================================


@_register(
    "events_hourly_windows",
    """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 4) AS sum_value
FROM events
GROUP BY 1, 2
""",
)
def events_hourly_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@_register(
    "events_sessionized_counts",
    """
WITH t AS (
  SELECT user_id, ts, event_id,
         CASE WHEN LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                   OR epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                      > 1800000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
s AS (SELECT user_id, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM t)
SELECT user_id, CAST(MAX(session_id) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
FROM s GROUP BY user_id
""",
)
def events_sessionized_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from whatsapp_vectordb_spark.operators.events import sessionized_counts

    return sessionized_counts(_events(spark, sf_dir), gap_minutes=30)


@_register(
    "events_session_windows",
    """
WITH t AS (SELECT user_id, ts, event_id, value FROM events),
m AS (
  SELECT user_id, ts, value,
         CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
                   OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w >= 1800000000
              THEN 1 ELSE 0 END AS brk
  FROM t
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, ts, value,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM m
)
SELECT user_id,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
       strftime(MAX(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S.%f') AS session_end,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 4) AS sum_value
FROM s GROUP BY user_id, sid
""",
)
def events_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session windows (``F.session_window``, 30-min gap): the
    streaming-capable sessionizer — on a stream this exact expression runs
    with watermark-evicted state; here the batch result is checked against
    a gaps-and-islands oracle. Session end = last event + gap, and an
    event landing exactly on the closing boundary opens a NEW session
    (Spark's [start, end) contract — the oracle breaks on >= gap)."""
    ev = _events(spark, sf_dir)
    agg = ev.groupBy(
        "user_id", F.session_window("ts", "30 minutes").alias("w")
    ).agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
    return agg.select(
        "user_id",
        F.date_format("w.start", _TS_FMT_SPARK).alias("session_start"),
        F.date_format("w.end", _TS_FMT_SPARK).alias("session_end"),
        "n_events",
        "sum_value",
    )


_HLL_M = 1024
_HLL_ALPHA = 0.7213 / (1 + 1.079 / _HLL_M)  # identical literal in both engines

# Engine-portable HyperLogLog: registers from the portable md5 hash, the
# harmonic sum as an EXACT integer sum of 2^(W+1-rho_max) — bit-identical
# across engines (unlike approx_count_distinct, whose registers are
# engine-private). ltrim-of-bin gives the 1-based first-one-bit rank with
# no float log2 in either engine.
@_register(
    "events_hll_users",
    f"""
WITH h AS (
  SELECT ('0x' || substr(md5('0:' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
  FROM events
),
r AS (SELECT h % {_HLL_M} AS bucket, (h >> 10) & ((1::BIGINT << 44) - 1) AS rest FROM h),
rho AS (
  SELECT bucket,
         CASE WHEN rest = 0 THEN 45 ELSE 44 - length(ltrim(bin(rest), '0')) + 1 END AS rho
  FROM r
),
maxes AS (SELECT bucket, MAX(rho) AS rho_max FROM rho GROUP BY bucket),
filled AS (
  SELECT b.b AS bucket, COALESCE(m.rho_max, 0) AS rho_max
  FROM range(0, {_HLL_M}) b(b) LEFT JOIN maxes m ON m.bucket = b.b
),
agg AS (
  SELECT SUM(1::BIGINT << (45 - rho_max)) AS s,
         SUM(CASE WHEN rho_max = 0 THEN 1 ELSE 0 END) AS zeros
  FROM filled
),
est AS (
  SELECT CASE WHEN (CAST({(_HLL_ALPHA * _HLL_M * _HLL_M) * float(1 << 45)!r} AS DOUBLE) / s) <= CAST({2.5 * _HLL_M!r} AS DOUBLE)
                   AND zeros > 0
              THEN CAST({_HLL_M} AS DOUBLE) * ln(CAST({_HLL_M} AS DOUBLE) / zeros)
              ELSE CAST({(_HLL_ALPHA * _HLL_M * _HLL_M) * float(1 << 45)!r} AS DOUBLE) / s
         END AS e
  FROM agg
)
SELECT ROUND(e, 4) AS hll_estimate,
       (SELECT COUNT(DISTINCT user_id) FROM events) AS exact_distinct
FROM est
""",
)
def events_hll_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct users via the portable HLL sketch, alongside
    the exact count — the profiling aggregate a 100 TB corpus runs
    per-partition and merges with MAX(register)."""
    from whatsapp_vectordb_spark.operators.sketches import hll_distinct_estimate

    ev = _events(spark, sf_dir)
    est = hll_distinct_estimate(ev, "user_id", log2m=10)
    exact = ev.agg(F.countDistinct("user_id").alias("exact_distinct"))
    return est.crossJoin(exact)


# Count-min sketch frequency estimates for the BM25 query terms over all
# document tokens — integer counters on portable hashes, so the estimate
# (an over-count bounded by eps*N) is bit-identical in both engines.
@_register(
    "text_cms_token_freq",
    f"""
WITH toks AS (SELECT unnest({_TOKS.format(c='text')}) AS tok FROM documents),
cells AS (
  SELECT r.r AS row,
         ('0x' || substr(md5(CAST(r.r AS VARCHAR) || ':' || tok), 1, 15))::BIGINT % 1024 AS col
  FROM toks CROSS JOIN range(0,4) r(r)
),
counters AS (SELECT row, col, COUNT(*) AS cnt FROM cells GROUP BY 1, 2),
probes(p) AS (VALUES ('data'), ('processing'), ('scale')),
pcells AS (
  SELECT p, r.r AS row,
         ('0x' || substr(md5(CAST(r.r AS VARCHAR) || ':' || p), 1, 15))::BIGINT % 1024 AS col
  FROM probes CROSS JOIN range(0,4) r(r)
),
est AS (
  SELECT pc.p, MIN(COALESCE(c.cnt, 0)) AS est_count
  FROM pcells pc LEFT JOIN counters c ON c.row = pc.row AND c.col = pc.col
  GROUP BY pc.p
),
tru AS (SELECT tok, COUNT(*) AS true_count FROM toks GROUP BY 1)
SELECT e.p AS probe, e.est_count, COALESCE(t.true_count, 0) AS true_count
FROM est e LEFT JOIN tru t ON t.tok = e.p
""",
)
def text_cms_token_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from whatsapp_vectordb_spark.functions.text import tokens
    from whatsapp_vectordb_spark.operators.sketches import cms_counters, cms_estimate

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(tokens("text").alias("_tk")).select(
        F.explode("_tk").alias("tok")
    )
    counters = cms_counters(toks, "tok", width=1024)
    probes = spark.createDataFrame([(t,) for t in _BM25_TERMS], "tok string")
    est = cms_estimate(counters, probes, "tok", width=1024)
    tru = toks.groupBy("tok").agg(F.count("*").alias("true_count"))
    return (
        est.join(tru, est["probe"] == tru["tok"], "left")
        .select(
            "probe",
            "est_count",
            F.coalesce(F.col("true_count"), F.lit(0)).alias("true_count"),
        )
    )


# Unigram language-model scoring: avg log-likelihood of each document
# under the corpus's own unigram distribution — the classic cheap
# fluency/quality signal (gibberish and boilerplate sit in the tails).
# Each token's logprob is quantized to an int64 (round(ln(tf/N)·10⁶))
# BEFORE the per-doc sum, so the fold is order-independent and the oracle
# reproduces it exactly; only the final avg division is float.
@_register(
    "text_unigram_loglik",
    f"""
WITH toks AS (SELECT doc_id, unnest({_TOKS.format(c='text')}) AS tok FROM documents),
tf AS (SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY 1),
n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS total FROM toks),
q AS (
  SELECT t.doc_id,
         CAST(round(ln(tf.cnt / n.total) * 1000000) AS BIGINT) AS lp
  FROM toks t JOIN tf ON tf.tok = t.tok CROSS JOIN n
)
SELECT doc_id,
       COUNT(*) AS n_tokens,
       ROUND(SUM(lp)::DOUBLE / COUNT(*) / 1000000, 6) AS avg_logprob
FROM q GROUP BY doc_id
""",
)
def text_unigram_loglik(spark: SparkSession, sf_dir: str) -> DataFrame:
    from whatsapp_vectordb_spark.functions.text import tokens

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokens("text").alias("_tk")).select(
        "doc_id", F.explode("_tk").alias("tok")
    )
    tf = toks.groupBy("tok").agg(F.count("*").alias("cnt"))
    n = toks.agg(F.count("*").cast("double").alias("total"))
    q = (
        toks.join(F.broadcast(tf), "tok")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            F.round(F.log(F.col("cnt") / F.col("total")) * 1000000)
            .cast("long")
            .alias("lp"),
        )
    )
    return q.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.round(F.sum("lp").cast("double") / F.count("*") / 1000000, 6).alias(
            "avg_logprob"
        ),
    )


# Sketch-accelerated EXACT heavy hitters: the Spark plan prefilters the
# token stream with a driver-collected CMS grid (map-side literal-array
# lookups — no false negatives since CMS never undercounts), then counts
# only the candidates exactly. Result is identical to the plain
# GROUP BY/HAVING the oracle runs — the sketch changes the PLAN, not the
# answer.
@_register(
    "text_heavy_hitters",
    f"""
WITH toks AS (SELECT unnest({_TOKS.format(c='text')}) AS tok FROM documents)
SELECT tok AS value, COUNT(*) AS n
FROM toks GROUP BY tok HAVING COUNT(*) >= 300
""",
)
def text_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from whatsapp_vectordb_spark.functions.text import tokens
    from whatsapp_vectordb_spark.operators.sketches import heavy_hitters

    toks = (
        _t(spark, sf_dir, "documents")
        .select(tokens("text").alias("_tk"))
        .select(F.explode("_tk").alias("tok"))
    )
    return heavy_hitters(toks, "tok", min_count=300, width=256)


@_register(
    "streaming_session_windows",
    """
WITH t AS (SELECT user_id, ts, event_id, value FROM events),
m AS (
  SELECT user_id, ts, value,
         CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
                   OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w >= 1800000000
              THEN 1 ELSE 0 END AS brk
  FROM t
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, ts, value,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM m
)
SELECT user_id,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
       strftime(MAX(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S.%f') AS session_end,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 4) AS sum_value
FROM s GROUP BY user_id, sid
""",
)
def streaming_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events_session_windows run through the REAL streaming engine:
    state-store session merging + watermark eviction, replayed bounded and
    checked against the batch gaps-and-islands oracle."""
    from whatsapp_vectordb_spark.streaming.ops import run_session_window_stream

    return run_session_window_stream(spark, os.path.join(sf_dir, "events.parquet"))


# ==========================================================================
# ANN — the 100 TB scale path for similarity search (operators/ann.py).
# ``ann_lsh_topk`` uses the *portable* integer-quantized sign-projection
# LSH so the oracle reproduces buckets bit-for-bit; ``ann_ivf_topk`` is
# KMeans-based (not SQL-expressible → rows-only check by design).
# ==========================================================================

_ANN_LSH_ORACLE = """
WITH planes AS (
  SELECT p.p AS p, i.i AS i,
         CASE WHEN ('0x' || substr(md5('0:' || CAST(p.p AS VARCHAR) || ':' || CAST(i.i AS VARCHAR)), 1, 1))::BIGINT & 1 = 1
              THEN 1 ELSE -1 END AS s
  FROM range(0,16) p(p) CROSS JOIN range(0,64) i(i)
),
vq AS (
  SELECT vec_id, i.i AS i,
         CAST(round(embedding[i.i + 1]::DOUBLE * 1000000) AS BIGINT) AS q
  FROM embeddings CROSS JOIN range(0,64) i(i)
),
dots AS (
  SELECT vq.vec_id, planes.p, SUM(vq.q * planes.s) AS dot
  FROM vq JOIN planes ON vq.i = planes.i GROUP BY 1, 2
),
sigs AS (
  SELECT vec_id, string_agg(CASE WHEN dot >= 0 THEN '1' ELSE '0' END, '' ORDER BY p) AS sig
  FROM dots GROUP BY vec_id
),
banded AS (
  SELECT vec_id, b.b AS band, substr(sig, b.b * 4 + 1, 4) AS chunk
  FROM sigs CROSS JOIN range(0,4) b(b)
),
qb AS (SELECT band, chunk FROM banded WHERE vec_id = 0),
cand AS (SELECT DISTINCT banded.vec_id
         FROM banded JOIN qb ON banded.band = qb.band AND banded.chunk = qb.chunk),
q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
SELECT e.vec_id, ROUND(list_cosine_similarity(e.embedding::DOUBLE[], q.qv), 6) AS score
FROM embeddings e JOIN cand ON e.vec_id = cand.vec_id CROSS JOIN q
WHERE list_cosine_similarity(e.embedding::DOUBLE[], q.qv) IS NOT NULL
ORDER BY score DESC, e.vec_id ASC
LIMIT 10
"""


@_register("ann_lsh_topk", _ANN_LSH_ORACLE)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from whatsapp_vectordb_spark.operators.ann import portable_lsh_topk

    emb = _t(spark, sf_dir, "embeddings")
    # numpy impl computes bit-identical integer signatures (one int64
    # matmul per batch); dim comes from the fixture registry, not a
    # scan-first-row driver job
    return portable_lsh_topk(
        emb, query_id=0, k=10, n_planes=16, bands=4, seed=0, round_to=ROUND_SCORE,
        impl="numpy", dim=64,
    )


_ANN_LSH_MULTIPROBE_ORACLE = """
WITH planes AS (
  SELECT p.p AS p, i.i AS i,
         CASE WHEN ('0x' || substr(md5('0:' || CAST(p.p AS VARCHAR) || ':' || CAST(i.i AS VARCHAR)), 1, 1))::BIGINT & 1 = 1
              THEN 1 ELSE -1 END AS s
  FROM range(0,16) p(p) CROSS JOIN range(0,64) i(i)
),
vq AS (
  SELECT vec_id, i.i AS i,
         CAST(round(embedding[i.i + 1]::DOUBLE * 1000000) AS BIGINT) AS q
  FROM embeddings CROSS JOIN range(0,64) i(i)
),
dots AS (
  SELECT vq.vec_id, planes.p, SUM(vq.q * planes.s) AS dot
  FROM vq JOIN planes ON vq.i = planes.i GROUP BY 1, 2
),
sigs AS (
  SELECT vec_id, string_agg(CASE WHEN dot >= 0 THEN '1' ELSE '0' END, '' ORDER BY p) AS sig
  FROM dots GROUP BY vec_id
),
banded AS (
  SELECT vec_id, b.b AS band, substr(sig, b.b * 4 + 1, 4) AS chunk
  FROM sigs CROSS JOIN range(0,4) b(b)
),
qb AS (SELECT band, chunk FROM banded WHERE vec_id = 0),
probes AS (
  SELECT DISTINCT band,
         CASE WHEN f.f = 0 THEN chunk
              ELSE substr(chunk, 1, f.f - 1)
                   || (CASE WHEN substr(chunk, f.f, 1) = '1' THEN '0' ELSE '1' END)
                   || substr(chunk, f.f + 1, 4)
         END AS chunk
  FROM qb CROSS JOIN range(0,5) f(f)
),
cand AS (SELECT DISTINCT banded.vec_id
         FROM banded JOIN probes ON banded.band = probes.band AND banded.chunk = probes.chunk),
q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
SELECT e.vec_id, ROUND(list_cosine_similarity(e.embedding::DOUBLE[], q.qv), 6) AS score
FROM embeddings e JOIN cand ON e.vec_id = cand.vec_id CROSS JOIN q
WHERE list_cosine_similarity(e.embedding::DOUBLE[], q.qv) IS NOT NULL
ORDER BY score DESC, e.vec_id ASC
LIMIT 10
"""


@_register("ann_lsh_multiprobe", _ANN_LSH_MULTIPROBE_ORACLE)
def ann_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from whatsapp_vectordb_spark.operators.ann import portable_lsh_topk_multiprobe

    emb = _t(spark, sf_dir, "embeddings")
    return portable_lsh_topk_multiprobe(
        emb, query_id=0, k=10, n_planes=16, bands=4, seed=0, round_to=ROUND_SCORE,
        impl="numpy", dim=64,
    )


_IVF_ORACLE_DIR = _oracle_scratch("ivf_oracle")

# The k-means build is not SQL-expressible, but the QUERY path is: the
# harness persists the centroid assignment (partitionBy(centroid) parquet —
# the real disk-resident IVF form) plus the chosen probe ids, and the
# oracle re-runs the probe phase (centroid filter + exact top-k) over the
# very same files. Build stays unchecked; the probe is hash-checked.
_ANN_IVF_ORACLE = f"""
WITH cells AS (
  SELECT * FROM read_parquet('{_IVF_ORACLE_DIR}/cells/*/*.parquet', hive_partitioning = 1)
),
probes AS (
  SELECT centroid FROM read_parquet('{_IVF_ORACLE_DIR}/probe/*.parquet')
),
q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
SELECT c.vec_id, ROUND(list_cosine_similarity(c.embedding::DOUBLE[], q.qv), 6) AS score
FROM cells c JOIN probes p ON CAST(c.centroid AS BIGINT) = CAST(p.centroid AS BIGINT)
CROSS JOIN q
WHERE list_cosine_similarity(c.embedding::DOUBLE[], q.qv) IS NOT NULL
ORDER BY score DESC, c.vec_id ASC
LIMIT 10
"""


@_register("ann_ivf_topk", _ANN_IVF_ORACLE)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from whatsapp_vectordb_spark.operators.ann import IvfIndex

    emb = _t(spark, sf_dir, "embeddings")
    qvec = emb.where(F.col("vec_id") == 0).head()["embedding"]
    idx = IvfIndex.build(emb.select("vec_id", "embedding"), n_centroids=8).save(
        _IVF_ORACLE_DIR
    )
    # probe the SAVED index (file-level partition pruning on centroid), and
    # persist the probed centroid ids so the oracle replays the same probe
    loaded = IvfIndex.load(spark, _IVF_ORACLE_DIR)
    probe_ids = loaded.probe_centroid_ids(qvec, nprobe=2)
    spark.createDataFrame([(int(c),) for c in probe_ids], "centroid bigint").coalesce(
        1
    ).write.mode("overwrite").parquet(os.path.join(_IVF_ORACLE_DIR, "probe"))
    return loaded.probe(qvec, k=10, nprobe=2, round_to=ROUND_SCORE)


_PQ_ORACLE_DIR = _oracle_scratch("pq_oracle")

# Product-quantization ADC probe: the k-means codebook build stays
# unchecked (not SQL-expressible), but the QUERY path is bit-exact — the
# integer-quantized lookup table makes every score an order-independent
# int64 sum, which the oracle recomputes from the persisted codes + LUT.
_ANN_PQ_ORACLE = f"""
WITH codes AS (SELECT * FROM read_parquet('{_PQ_ORACLE_DIR}/codes/*.parquet')),
lut AS (SELECT * FROM read_parquet('{_PQ_ORACLE_DIR}/lut/*.parquet')),
s AS (
  SELECT c.vec_id, CAST(SUM(l.w) AS BIGINT) AS score
  FROM codes c CROSS JOIN range(0,8) j(j)
  JOIN lut l ON l.j = j.j AND l.c = c.codes[j.j + 1]
  GROUP BY 1
)
SELECT vec_id, score FROM s
ORDER BY score DESC, vec_id ASC
LIMIT 10
"""


@_register("ann_pq_topk", _ANN_PQ_ORACLE)
def ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from whatsapp_vectordb_spark.operators.ann import PqIndex

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    qvec = emb.where(F.col("vec_id") == 0).head()["embedding"]
    idx = PqIndex.build(emb, m=8, ksub=16, sample_rows=500, seed=0)
    idx.save(_PQ_ORACLE_DIR, idx.encode(emb))
    lut = idx.lut_int(qvec)
    spark.createDataFrame(
        [(j, c, int(lut[j, c])) for j in range(lut.shape[0]) for c in range(lut.shape[1])],
        "j int, c int, w bigint",
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(_PQ_ORACLE_DIR, "lut"))
    loaded, codes = PqIndex.load(spark, _PQ_ORACLE_DIR)
    return loaded.adc_topk(codes, qvec, k=10)


_IVFPQ_ORACLE_DIR = _oracle_scratch("ivfpq_oracle")

# IVF-PQ probe, DEFAULT (reranked) path: centroid pruning (file-level on
# the saved layout) + integer ADC over 8-byte codes to a 100-candidate
# shortlist, then an exact cosine re-rank over only those rows' float
# vectors (raw ADC order ties aggressively — recall@10 as low as 0.1
# unreranked, BASELINE.md stress table). The shortlist cut is
# deterministic (int64 ADC score, id tiebreak), so the whole query path
# hash-checks; builds stay rows-only.
_ANN_IVFPQ_ORACLE = f"""
WITH cells AS (
  SELECT * FROM read_parquet('{_IVFPQ_ORACLE_DIR}/cells/*/*.parquet', hive_partitioning = 1)
),
probes AS (SELECT centroid FROM read_parquet('{_IVFPQ_ORACLE_DIR}/probe/*.parquet')),
lut AS (SELECT * FROM read_parquet('{_IVFPQ_ORACLE_DIR}/lut/*.parquet')),
adc AS (
  SELECT c.vec_id, CAST(SUM(l.w) AS BIGINT) AS s
  FROM cells c
  JOIN probes p ON CAST(c.centroid AS BIGINT) = CAST(p.centroid AS BIGINT)
  CROSS JOIN range(0,8) j(j)
  JOIN lut l ON l.j = j.j AND l.c = c.codes[j.j + 1]
  GROUP BY 1
  ORDER BY s DESC, vec_id ASC
  LIMIT 100
),
q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
SELECT e.vec_id, ROUND(list_cosine_similarity(e.embedding::DOUBLE[], q.qv), 6) AS score
FROM embeddings e JOIN adc ON e.vec_id = adc.vec_id CROSS JOIN q
WHERE list_cosine_similarity(e.embedding::DOUBLE[], q.qv) IS NOT NULL
ORDER BY score DESC, e.vec_id ASC
LIMIT 10
"""


def _build_ivfpq_state(spark: SparkSession, sf_dir: str, out_dir: str, nprobe: int):
    """Build IVF+PQ over the fixture embeddings and persist the full query
    state (cells partitioned by centroid, probe ids, integer LUT) so the
    DuckDB oracle replays the identical probe over the same files. Returns
    (emb, qvec, ivf, pq, stored-cells frame)."""
    from whatsapp_vectordb_spark.operators.ann import IvfIndex, PqIndex

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    qvec = emb.where(F.col("vec_id") == 0).head()["embedding"]
    ivf = IvfIndex.build(emb, n_centroids=8)
    pq = PqIndex.build(emb, m=8, ksub=16, sample_rows=500, seed=0)
    # the deployed layout: codes + centroid, partitioned by centroid
    cells = pq.encode(emb).join(ivf.assigned.select("vec_id", "centroid"), "vec_id")
    cells.write.partitionBy("centroid").mode("overwrite").parquet(
        os.path.join(out_dir, "cells")
    )
    probe_ids = ivf.probe_centroid_ids(qvec, nprobe=nprobe)
    spark.createDataFrame([(int(c),) for c in probe_ids], "centroid bigint").coalesce(
        1
    ).write.mode("overwrite").parquet(os.path.join(out_dir, "probe"))
    lut = pq.lut_int(qvec)
    spark.createDataFrame(
        [(j, c, int(lut[j, c])) for j in range(lut.shape[0]) for c in range(lut.shape[1])],
        "j int, c int, w bigint",
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(out_dir, "lut"))
    stored = spark.read.parquet(os.path.join(out_dir, "cells"))
    return emb, qvec, ivf, pq, stored


@_register("ann_ivfpq_topk", _ANN_IVFPQ_ORACLE)
def ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from whatsapp_vectordb_spark.operators.ann import ivfpq_topk

    emb, qvec, ivf, pq, stored = _build_ivfpq_state(
        spark, sf_dir, _IVFPQ_ORACLE_DIR, nprobe=2
    )
    return ivfpq_topk(ivf, pq, stored, qvec, k=10, nprobe=2, index_df=emb)


_RECALL_ORACLE_DIR = _oracle_scratch("ivfpq_recall_oracle")

# VERDICT r02 #3: the reference's entire product is k-NN answer quality
# (reference main.go:89-184), so recall itself is oracle-gated: recall@10
# of the default (reranked) IVF-PQ probe against the exact top-10 over the
# SAME parquet — both sides deterministic, both engines replay the full
# shortlist + re-rank + intersect.
_ANN_RECALL_ORACLE = f"""
WITH cells AS (
  SELECT * FROM read_parquet('{_RECALL_ORACLE_DIR}/cells/*/*.parquet', hive_partitioning = 1)
),
probes AS (SELECT centroid FROM read_parquet('{_RECALL_ORACLE_DIR}/probe/*.parquet')),
lut AS (SELECT * FROM read_parquet('{_RECALL_ORACLE_DIR}/lut/*.parquet')),
adc AS (
  SELECT c.vec_id, CAST(SUM(l.w) AS BIGINT) AS s
  FROM cells c
  JOIN probes p ON CAST(c.centroid AS BIGINT) = CAST(p.centroid AS BIGINT)
  CROSS JOIN range(0,8) j(j)
  JOIN lut l ON l.j = j.j AND l.c = c.codes[j.j + 1]
  GROUP BY 1
  ORDER BY s DESC, vec_id ASC
  LIMIT 200
),
q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
ann AS (
  SELECT e.vec_id
  FROM embeddings e JOIN adc ON e.vec_id = adc.vec_id CROSS JOIN q
  WHERE list_cosine_similarity(e.embedding::DOUBLE[], q.qv) IS NOT NULL
  ORDER BY ROUND(list_cosine_similarity(e.embedding::DOUBLE[], q.qv), 6) DESC, e.vec_id ASC
  LIMIT 10
),
exact AS (
  SELECT e.vec_id
  FROM embeddings e CROSS JOIN q
  WHERE list_cosine_similarity(e.embedding::DOUBLE[], q.qv) IS NOT NULL
  ORDER BY ROUND(list_cosine_similarity(e.embedding::DOUBLE[], q.qv), 6) DESC, e.vec_id ASC
  LIMIT 10
)
SELECT CAST(10 AS BIGINT) AS k, ROUND(CAST(COUNT(*) AS DOUBLE) / 10.0, 6) AS recall
FROM ann JOIN exact ON ann.vec_id = exact.vec_id
"""


@_register("ann_recall_gate", _ANN_RECALL_ORACLE)
def ann_recall_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of the default IVF-PQ probe (nprobe=6 of 8 cells,
    shortlist-200 exact re-rank) vs exact brute-force top-10 — a single
    ``(k, recall)`` row, hash-checked. The gate expectation is ≥ 0.9."""
    from whatsapp_vectordb_spark.operators.ann import ivfpq_topk
    from whatsapp_vectordb_spark.operators.search import topk

    emb, qvec, ivf, pq, stored = _build_ivfpq_state(
        spark, sf_dir, _RECALL_ORACLE_DIR, nprobe=6
    )
    ann_ids = ivfpq_topk(ivf, pq, stored, qvec, k=10, nprobe=6, index_df=emb, shortlist=200).select(
        "vec_id"
    )
    exact_ids = topk(emb, qvec, k=10, round_to=ROUND_SCORE).select("vec_id")
    return (
        ann_ids.join(exact_ids, "vec_id")
        .agg(F.count("*").alias("hits"))
        .select(
            F.lit(10).cast("long").alias("k"),
            F.round(F.col("hits").cast("double") / F.lit(10.0), 6).alias("recall"),
        )
    )


_IVFPQR_ORACLE_DIR = _oracle_scratch("ivfpq_residual_oracle")

# Residual IVF-PQ probe (the FAISS-style layout): distances are exact
# int64 sums of the per-cell LUT entries, ascending; build stays
# rows-only, the query path hash-checks over the persisted state.
_ANN_IVFPQR_ORACLE = f"""
WITH cells AS (
  SELECT * FROM read_parquet('{_IVFPQR_ORACLE_DIR}/cells/*/*.parquet', hive_partitioning = 1)
),
probes AS (SELECT centroid FROM read_parquet('{_IVFPQR_ORACLE_DIR}/probe/*.parquet')),
lut AS (SELECT * FROM read_parquet('{_IVFPQR_ORACLE_DIR}/lut/*.parquet')),
s AS (
  SELECT c.vec_id, CAST(SUM(l.w) AS BIGINT) AS score
  FROM cells c
  JOIN probes p ON CAST(c.centroid AS BIGINT) = CAST(p.centroid AS BIGINT)
  CROSS JOIN range(0,8) j(j)
  JOIN lut l ON CAST(l.centroid AS BIGINT) = CAST(c.centroid AS BIGINT)
            AND l.j = j.j AND l.c = c.codes[j.j + 1]
  GROUP BY 1
)
SELECT vec_id, score FROM s
ORDER BY score ASC, vec_id ASC
LIMIT 10
"""


@_register("ann_ivfpq_residual_topk", _ANN_IVFPQR_ORACLE)
def ann_ivfpq_residual_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from whatsapp_vectordb_spark.operators.ann import IvfPqResidualIndex

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    qvec = emb.where(F.col("vec_id") == 0).head()["embedding"]
    idx = IvfPqResidualIndex.build(emb, n_centroids=8, m=8, ksub=16, sample_rows=500)
    idx.encode(emb).write.partitionBy("centroid").mode("overwrite").parquet(
        os.path.join(_IVFPQR_ORACLE_DIR, "cells")
    )
    cells = idx.probe_cells(qvec, nprobe=2)
    spark.createDataFrame([(int(c),) for c in cells], "centroid bigint").coalesce(
        1
    ).write.mode("overwrite").parquet(os.path.join(_IVFPQR_ORACLE_DIR, "probe"))
    luts = idx.luts_int(qvec, cells)
    rows = [
        (int(c), j, k, int(luts[c][j, k]))
        for c in cells
        for j in range(luts[c].shape[0])
        for k in range(luts[c].shape[1])
    ]
    spark.createDataFrame(rows, "centroid bigint, j int, c int, w bigint").coalesce(
        1
    ).write.mode("overwrite").parquet(os.path.join(_IVFPQR_ORACLE_DIR, "lut"))
    stored = spark.read.parquet(os.path.join(_IVFPQR_ORACLE_DIR, "cells"))
    return idx.probe(stored, qvec, k=10, nprobe=2)


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
# As-of join (operators/asof.py): latest purchase at-or-before each click,
# per user. Oracle: DuckDB's native ASOF LEFT JOIN.
# ==========================================================================

_TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss.SSSSSS"
_TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S.%f"


@_register(
    "events_asof_purchase",
    f"""
WITH c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
     p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase')
SELECT c.event_id, c.user_id,
       strftime(c.ts, '{_TS_FMT_DUCK}') AS click_ts,
       strftime(p.ts, '{_TS_FMT_DUCK}') AS purchase_ts
FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts >= p.ts
""",
)
def events_asof_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from whatsapp_vectordb_spark.operators.asof import asof_join

    ev = _events(spark, sf_dir)
    clicks = ev.where(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = ev.where(F.col("event_type") == "purchase").select("user_id", "ts")
    joined = asof_join(clicks, purchases, on="user_id", left_ts="ts", right_ts="ts")
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", _TS_FMT_SPARK).alias("click_ts"),
        F.date_format("ts_matched", _TS_FMT_SPARK).alias("purchase_ts"),
    )


# ==========================================================================
# Multimodal columns (multimodal.py): binary content + typed metadata,
# decode/feature-extract via mapInPandas (deterministic fake codec), frame
# sampling as a pure Catalyst sequence-explode. Media rows are synthesized
# from `documents` identically in both engines.
# ==========================================================================


def _media_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.select(
        F.concat(F.lit("m"), F.col("doc_id").cast("string")).alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("image"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
        .alias("modality"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
        (F.lit(500) + (F.col("doc_id") % 7) * 777).cast("long").alias("duration_ms"),
        (F.lit(320) + (F.col("doc_id") % 5) * 160).cast("int").alias("width"),
        (F.lit(240) + (F.col("doc_id") % 3) * 120).cast("int").alias("height"),
    )


@_register(
    "multimodal_features",
    """
SELECT 'm' || CAST(doc_id AS VARCHAR) AS media_id,
       CASE WHEN doc_id % 3 = 0 THEN 'image'
            WHEN doc_id % 3 = 1 THEN 'audio'
            ELSE 'video' END AS modality,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       sha256(text) AS content_sha,
       CAST(64 AS INTEGER) AS dim
FROM documents
""",
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from whatsapp_vectordb_spark.multimodal import extract_media_features

    feats = extract_media_features(_media_df(spark, sf_dir), dim=64)
    return feats.select(
        "media_id", "modality", "n_bytes", "content_sha", F.size("embedding").alias("dim")
    )


@_register(
    "multimodal_frame_sample",
    """
SELECT 'm' || CAST(doc_id AS VARCHAR) AS media_id,
       unnest(range(0, 500 + (doc_id % 7) * 777, 1000)) AS frame_ts_ms
FROM documents WHERE doc_id % 3 = 2
""",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from whatsapp_vectordb_spark.multimodal import frame_sample_plan

    return frame_sample_plan(_media_df(spark, sf_dir), every_ms=1000)


# Round 6: the REAL decode path under the correctness gate. Each doc gets
# a genuine binary P5 (netpbm) image whose pixel (x, y) is the exact
# integer (doc_id*7 + x*3 + y*5) % 256; Spark decodes the actual bytes
# with the pure-numpy netpbm decoder (multimodal._parse_netpbm) and
# reports integer pixel statistics, which the oracle derives in closed
# form — if the decoder misread the header, stride, or payload, every
# integer breaks. Dims: 64×4 grayscale.
_PPM_W, _PPM_H = 64, 4


@_register(
    "multimodal_real_decode",
    f"""
SELECT d.doc_id,
       CAST({_PPM_W * _PPM_H} AS BIGINT) AS n_px,
       CAST(SUM((d.doc_id * 7 + x.x * 3 + y.y * 5) % 256) AS BIGINT) AS px_sum,
       CAST(MIN((d.doc_id * 7 + x.x * 3 + y.y * 5) % 256) AS BIGINT) AS px_min,
       CAST(MAX((d.doc_id * 7 + x.x * 3 + y.y * 5) % 256) AS BIGINT) AS px_max
FROM documents d
CROSS JOIN range(0, {_PPM_W}) x(x)
CROSS JOIN range(0, {_PPM_H}) y(y)
GROUP BY d.doc_id
""",
)
def multimodal_real_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pixel-exact round trip through the pluggable decode seam: synthesize
    real P5 bytes per doc (mapInPandas, executor-side — bytes never touch
    the driver), decode them with ``_parse_netpbm``, emit integer pixel
    stats. Map-only end to end; the only shuffle is none."""
    import numpy as _np
    import pandas as _pd

    from whatsapp_vectordb_spark.multimodal import (
        MEDIA_SCHEMA,
        _parse_netpbm,
        extract_media_features,
    )

    w, h = _PPM_W, _PPM_H
    docs = _t(spark, sf_dir, "documents").select("doc_id")

    def gen(batches):
        header = f"P5\n{w} {h}\n255\n".encode()
        xs = _np.arange(w)[None, :] * 3 + _np.arange(h)[:, None] * 5
        for pdf in batches:
            ids = pdf["doc_id"].to_numpy()
            content = [
                header + ((int(i) * 7 + xs) % 256).astype(_np.uint8).tobytes()
                for i in ids
            ]
            yield _pd.DataFrame(
                {
                    "media_id": [str(i) for i in ids],
                    "modality": "image",
                    "content": content,
                    "mime": "image/x-portable-graymap",
                    "width": w,
                    "height": h,
                    "duration_ms": None,
                }
            )

    media = docs.mapInPandas(gen, MEDIA_SCHEMA)

    def pixel_stats(b: bytes | None):
        if b is None:
            return None
        px = _np.rint(_parse_netpbm(b) * 255.0)
        return [float(px.size), float(px.sum()), float(px.min()), float(px.max())]

    feats = extract_media_features(media, decoder=pixel_stats)
    e = F.col("embedding")
    return feats.select(
        F.col("media_id").cast("bigint").alias("doc_id"),
        e[0].cast("bigint").alias("n_px"),
        e[1].cast("bigint").alias("px_sum"),
        e[2].cast("bigint").alias("px_min"),
        e[3].cast("bigint").alias("px_max"),
    )


# ==========================================================================
# Structured Streaming: the events table replayed THROUGH the streaming
# engine (file source → watermark → windowed agg → memory sink); on bounded
# input it must equal the batch answer, which this oracle checks.
# ==========================================================================


@_register(
    "streaming_hourly_windows",
    """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 4) AS sum_value
FROM events
GROUP BY 1, 2
""",
)
def streaming_hourly_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from whatsapp_vectordb_spark.streaming.ops import run_events_hourly_stream

    return run_events_hourly_stream(spark, os.path.join(sf_dir, "events.parquet"))


# ==========================================================================
# Per-group top-k over the relational schema (window rank — the grouped
# twin of the global TakeOrderedAndProject top-k).
# ==========================================================================


@_register(
    "rel_orders_topk_per_cust",
    """
SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 2) AS price, CAST(rn AS INTEGER) AS rank
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders
) WHERE rn <= 3
""",
)
def rel_orders_topk_per_cust(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("price"),
            "rank",
        )
    )


# ==========================================================================
# Bucketed range join (operators/rangejoin.py): clicks within the 5 minutes
# before each error, per user — an equi-join on (key, time-bucket) + exact
# range filter, never a nested-loop inequality join.
# ==========================================================================


@_register(
    "events_range_join",
    """
WITH e AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'),
     c AS (SELECT user_id, ts FROM events WHERE event_type = 'click')
SELECT e.event_id, COUNT(c.ts) AS n_recent_clicks
FROM e LEFT JOIN c
  ON c.user_id = e.user_id
 AND c.ts >= e.ts - INTERVAL 5 MINUTE AND c.ts <= e.ts
GROUP BY e.event_id
""",
)
def events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from whatsapp_vectordb_spark.operators.rangejoin import interval_join

    ev = _events(spark, sf_dir)
    errors = ev.where(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    clicks = ev.where(F.col("event_type") == "click").select("user_id", "ts")
    pairs = interval_join(errors, clicks, on="user_id", lower_s=-300.0, upper_s=0.0)
    counts = pairs.groupBy("event_id").agg(F.count("*").alias("n_recent_clicks"))
    return (
        errors.select("event_id")
        .join(counts, "event_id", "left")
        .select("event_id", F.coalesce("n_recent_clicks", F.lit(0)).alias("n_recent_clicks"))
    )


# ==========================================================================
# Custom stateful streaming (applyInPandasWithState): per-user session
# counts folded through per-group state; must equal the batch window-lag
# sessionization (the oracle).
# ==========================================================================


@_register(
    "streaming_sessionized",
    """
WITH t AS (
  SELECT user_id, ts, event_id,
         CASE WHEN LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                   OR epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                      > 1800000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
s AS (SELECT user_id, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM t)
SELECT user_id, CAST(MAX(session_id) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
FROM s GROUP BY user_id
""",
)
def streaming_sessionized(spark: SparkSession, sf_dir: str) -> DataFrame:
    from whatsapp_vectordb_spark.streaming.ops import run_sessionized_stream

    return run_sessionized_stream(spark, os.path.join(sf_dir, "events.parquet"))


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


def _write_jsonl_corpus(spark: SparkSession, sf_dir: str, out_dir: str, shards: int) -> None:
    """Serialize the documents table to ``shards`` JSONL files (json.dumps
    escaping; every 97th doc's line truncated mid-object — the planted
    breakage both jsonl queries' oracle accounts for analytically)."""
    import json as _json

    os.makedirs(out_dir, exist_ok=True)
    rows = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", "lang", "text")
        .orderBy("doc_id")
        .collect()
    )
    files = [
        open(os.path.join(out_dir, f"corpus_{i}.jsonl"), "w", encoding="utf-8")
        for i in range(shards)
    ]
    try:
        for n, r in enumerate(rows):
            line = _json.dumps(
                {"doc_id": r["doc_id"], "lang": r["lang"], "text": r["text"]},
                ensure_ascii=False,
            )
            if r["doc_id"] % 97 == 0:
                line = line[: max(8, len(line) // 2)]  # truncate mid-object
            files[n % shards].write(line + "\n")
    finally:
        for f in files:
            f.close()



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


@_register("streaming_jsonl_ingest", ORACLES["compat_jsonl_scan"])
def streaming_jsonl_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The JSONL ingest as a STREAM: three shard files replayed one per
    micro-batch (drop-folder pattern), each batch's rows appended under
    its batch_id with dynamic partition overwrite (retry-idempotent);
    after full replay the accumulated per-(lang, parse_ok) totals must
    equal the one-shot batch scan — same oracle, same quarantine
    contract, through the streaming engine."""
    import shutil
    import tempfile

    scratch = _tmp_scratch("wvs_jsonl_stream_")
    drop = os.path.join(scratch, "drop")
    _write_jsonl_corpus(spark, sf_dir, drop, shards=3)
    out_dir = os.path.join(scratch, "rows")

    stream = (
        spark.readStream.schema("doc_id bigint, lang string, text string")
        .option("maxFilesPerTrigger", "1")
        .json(drop)
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("batch_id", F.lit(batch_id).cast("long"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out_dir)
        )

    q = stream.writeStream.foreachBatch(sink).trigger(availableNow=True).start()
    q.awaitTermination()
    shutil.rmtree(drop, ignore_errors=True)

    collected = spark.read.schema(
        "doc_id bigint, lang string, text string, batch_id bigint"
    ).parquet(out_dir)
    return (
        collected.withColumn("parse_ok", F.col("doc_id").isNotNull())
        .groupBy("lang", "parse_ok")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum("doc_id").cast("long").alias("docid_sum"),
            F.sum(F.length("text")).cast("long").alias("chars_sum"),
        )
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
    return spark.createDataFrame(out, "namespace string, vector_count long, n_updated long")


# ==========================================================================
# Relational coverage: rollup, distinct aggregate, running (cumulative)
# window sum — green-field per SURVEY.md §2.10.
# ==========================================================================


@_register(
    "rel_revenue_rollup",
    """
SELECT n_name, o_orderpriority,
       ROUND(SUM(o_totalprice), 2) AS revenue,
       COUNT(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
GROUP BY ROLLUP(n_name, o_orderpriority)
""",
)
def rel_revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    return (
        orders.join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .rollup("n_name", "o_orderpriority")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count("*").alias("n_orders"),
        )
    )


@_register(
    "rel_distinct_customers",
    """
SELECT o_orderpriority,
       COUNT(DISTINCT o_custkey) AS n_customers,
       COUNT(*) AS n_orders
FROM orders GROUP BY o_orderpriority
""",
)
def rel_distinct_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.count_distinct("o_custkey").alias("n_customers"),
        F.count("*").alias("n_orders"),
    )


@_register(
    "rel_running_revenue",
    """
SELECT o_custkey, o_orderkey,
       ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey), 2) AS running_rev
FROM orders
""",
)
def rel_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_rev"),
    )


@_register(
    "text_tfidf",
    f"""
WITH toks AS (SELECT doc_id, unnest({_TOKS.format(c='text')}) AS term FROM documents),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
n AS (SELECT COUNT(*) AS n FROM documents)
SELECT tf.doc_id, tf.term, tf.tf AS term_count,
       ROUND(tf.tf * (ln((n.n + 1)::DOUBLE / (dfreq.df + 1)) + 1), 6) AS tfidf
FROM tf JOIN dfreq USING (term) CROSS JOIN n
""",
)
def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from whatsapp_vectordb_spark.operators.textops import tfidf

    return tfidf(_t(spark, sf_dir, "documents"))


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
    "multimodal_audio_chunks",
    """
WITH chunks AS (
  SELECT 'm' || CAST(doc_id AS VARCHAR) AS media_id,
         500 + (doc_id % 7) * 777 AS duration_ms,
         unnest(range(0, 500 + (doc_id % 7) * 777, 2000)) AS chunk_start_ms
  FROM documents WHERE doc_id % 3 = 1
)
SELECT media_id, chunk_start_ms,
       LEAST(chunk_start_ms + 2000, duration_ms) AS chunk_end_ms
FROM chunks
""",
)
def multimodal_audio_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from whatsapp_vectordb_spark.multimodal import chunk_media_plan

    return chunk_media_plan(_media_df(spark, sf_dir), chunk_ms=2000, modality="audio")


_XMODAL_DIR = _oracle_scratch("xmodal_oracle")
_XMODAL_QUERY = "large scale data processing"


def _xmodal_oracle() -> str:
    """Neither the text embedder nor the fake-codec extractor is
    SQL-expressible, but both are deterministic — so (a) the query vector
    is computed at registration time and inlined as a literal (the
    ``_flagship_oracle`` template), and (b) the unioned cross-modal index
    is persisted by the Spark query and replayed by the oracle from the
    very same parquet (the IVF persisted-state template, harness
    ``_ANN_IVF_ORACLE``). The union + scoring + top-k — the cross-modal
    part — is then fully hash-checked."""
    from whatsapp_vectordb_spark.embedder import embed_text

    qv = embed_text(_XMODAL_QUERY, dim=64)
    lit = "[" + ", ".join(repr(float(x)) for x in qv) + "]"
    return f"""
WITH idx AS (
  SELECT * FROM read_parquet('{_XMODAL_DIR}/index/*.parquet')
),
q AS (SELECT {lit}::DOUBLE[] AS qv)
SELECT i.item_id, i.modality,
       ROUND(list_cosine_similarity(i.embedding::DOUBLE[], q.qv), 6) AS score
FROM idx i CROSS JOIN q
WHERE list_cosine_similarity(i.embedding::DOUBLE[], q.qv) IS NOT NULL
ORDER BY score DESC, i.item_id ASC
LIMIT 25
"""


@_register("multimodal_cross_search", _xmodal_oracle())
def multimodal_cross_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union scoring across modalities (SURVEY.md §7.2 step 5): text docs
    and media rows share one embedding space/table shape; a single top-k
    ranks both. Text side embeds with the deterministic embedder, media
    side with the fake-codec extractor — same dim, one unioned index.
    The index is persisted and the top-k probes the PERSISTED parquet, so
    the oracle replays the identical float32 data (see _xmodal_oracle)."""
    from whatsapp_vectordb_spark.embedder import embed_text, with_embedding
    from whatsapp_vectordb_spark.multimodal import extract_media_features
    from whatsapp_vectordb_spark.operators.search import topk

    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") % 2 == 0)
    text_side = with_embedding(docs, "text", "embedding").select(
        F.concat(F.lit("text:"), F.col("doc_id").cast("string")).alias("item_id"),
        F.lit("text").alias("modality"),
        "embedding",
    )
    media_side = extract_media_features(_media_df(spark, sf_dir), dim=64).select(
        F.concat(F.lit("media:"), F.col("media_id")).alias("item_id"),
        "modality",
        "embedding",
    )
    index_path = os.path.join(_XMODAL_DIR, "index")
    text_side.unionByName(media_side).write.mode("overwrite").parquet(index_path)
    index = spark.read.parquet(index_path)
    qvec = embed_text(_XMODAL_QUERY, dim=64)
    return topk(index, qvec, k=25, id_col="item_id", payload_cols=("modality",), round_to=6)


# ==========================================================================
# Sliding (hopping) event-time windows + numeric distribution queries.
# ==========================================================================


@_register(
    "events_sliding_windows",
    """
WITH x AS (
  SELECT ts, event_type, value, unnest([0, 1, 2, 3]) AS i FROM events
),
w AS (
  SELECT make_timestamp((epoch_us(ts) - epoch_us(ts) % 900000000) - CAST(i AS BIGINT) * 900000000) AS ws,
         event_type, value
  FROM x
)
SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 4) AS sum_value
FROM w GROUP BY 1, 2
""",
)
def events_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows hopping every 15 minutes: each event lands in 4
    overlapping windows — Spark's F.window(slideDuration) expansion, the
    same operator Structured Streaming uses for hopping aggregations."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@_register(
    "rel_price_quantiles",
    """
SELECT o_orderpriority,
       ROUND(quantile_cont(o_totalprice, 0.25), 4) AS p25,
       ROUND(quantile_cont(o_totalprice, 0.50), 4) AS p50,
       ROUND(quantile_cont(o_totalprice, 0.75), 4) AS p75
FROM orders GROUP BY o_orderpriority
""",
)
def rel_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.25)"), 4).alias("p25"),
        F.round(F.expr("percentile(o_totalprice, 0.50)"), 4).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.75)"), 4).alias("p75"),
    )


# Skew-mitigation tools in the gate: both are result-identical to the
# vanilla plan (the oracle runs the vanilla SQL) — salting changes HOW
# the shuffle distributes hot keys, never WHAT comes out.
@_register(
    "rel_salted_join_counts",
    """
SELECT c.c_mktsegment, e.event_type, COUNT(*) AS n_events
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1, 2
""",
)
def rel_salted_join_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fact side gets a deterministic row salt, the dim side is
    replicated S×, the join key becomes (key, salt) — a known-hot user id
    spreads over S tasks instead of pinning one. Disable-broadcast is
    forced so the salted shuffle path actually executes here."""
    from whatsapp_vectordb_spark.functions.skew import salted_join

    ev = _events(spark, sf_dir).select(
        F.col("user_id").alias("c_custkey"), "event_type"
    )
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = salted_join(ev, cust, on="c_custkey", n_salts=8)
        return joined.groupBy("c_mktsegment", "event_type").agg(
            F.count("*").alias("n_events")
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


@_register(
    "rel_salted_distinct_users",
    """
SELECT event_type, COUNT(DISTINCT user_id) AS n_distinct_user_id
FROM events GROUP BY 1
""",
)
def rel_salted_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-key COUNT(DISTINCT) without a single reducer owning a
    hot key: dedupe under (key, hash(value) % S), then sum the disjoint
    per-salt partials."""
    from whatsapp_vectordb_spark.functions.skew import salted_distinct_count

    ev = _events(spark, sf_dir).select("event_type", "user_id")
    return salted_distinct_count(ev, "event_type", "user_id", n_salts=8)


# Ordered funnel: first view → first click AFTER it → first purchase
# AFTER that, per user; the sequential-pattern query every event
# analytics stack needs. Three tiny per-user min-aggregates chained by
# time inequality joins — each stage's frame is |users| rows, so the
# chain broadcasts; timestamps compare as epoch micros (exact integers).
@_register(
    "events_funnel",
    """
WITH v AS (
  SELECT user_id, MIN(epoch_us(ts)) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY 1
),
c AS (
  SELECT e.user_id, MIN(epoch_us(e.ts)) AS t2
  FROM events e JOIN v ON v.user_id = e.user_id
  WHERE e.event_type = 'click' AND epoch_us(e.ts) > v.t1
  GROUP BY 1
),
p AS (
  SELECT e.user_id, MIN(epoch_us(e.ts)) AS t3
  FROM events e JOIN c ON c.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.t2
  GROUP BY 1
)
SELECT (SELECT COUNT(*) FROM v) AS n_viewed,
       (SELECT COUNT(*) FROM c) AS n_clicked_after,
       (SELECT COUNT(*) FROM p) AS n_purchased_after
""",
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).select(
        "user_id", "event_type", F.unix_micros("ts").alias("tus")
    )
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("tus").alias("t1"))
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .join(F.broadcast(v), "user_id")
        .where(F.col("tus") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("tus").alias("t2"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(F.broadcast(c), "user_id")
        .where(F.col("tus") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("tus").alias("t3"))
    )
    return (
        v.agg(F.count("*").alias("n_viewed"))
        .crossJoin(c.agg(F.count("*").alias("n_clicked_after")))
        .crossJoin(p.agg(F.count("*").alias("n_purchased_after")))
    )


# Robust outlier detection: |value − median| > 3·1.4826·MAD (the MAD
# z-score with the normal-consistency constant, folded to one literal
# 4.4478 so both engines associate identically). Median/MAD resist the
# very outliers they detect — the right data-quality gate for a corpus
# where mean/stddev would be dragged by the tail.
@_register(
    "events_value_outliers",
    """
WITH e AS (SELECT event_type, value FROM events WHERE value IS NOT NULL),
med AS (SELECT event_type, quantile_cont(value, 0.5) AS med FROM e GROUP BY 1),
j AS (
  SELECT e.event_type, e.value, abs(e.value - m.med) AS absdev
  FROM e JOIN med m ON m.event_type = e.event_type
),
mad AS (SELECT event_type, quantile_cont(absdev, 0.5) AS mad FROM j GROUP BY 1)
SELECT j.event_type,
       COUNT(*) AS n_outliers,
       ROUND(MIN(j.value), 4) AS min_outlier,
       ROUND(MAX(j.value), 4) AS max_outlier
FROM j JOIN mad ON mad.event_type = j.event_type
WHERE j.absdev > 4.4478 * mad.mad
GROUP BY 1
""",
)
def events_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).where(F.col("value").isNotNull()).select(
        "event_type", "value"
    )
    med = ev.groupBy("event_type").agg(F.expr("percentile(value, 0.5)").alias("med"))
    j = ev.join(F.broadcast(med), "event_type").withColumn(
        "absdev", F.abs(F.col("value") - F.col("med"))
    )
    mad = j.groupBy("event_type").agg(F.expr("percentile(absdev, 0.5)").alias("mad"))
    return (
        j.join(F.broadcast(mad), "event_type")
        .where(F.col("absdev") > F.lit(4.4478) * F.col("mad"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_outliers"),
            F.round(F.min("value"), 4).alias("min_outlier"),
            F.round(F.max("value"), 4).alias("max_outlier"),
        )
    )


@_register(
    "events_value_histogram",
    """
SELECT event_type,
       CAST(FLOOR(value / 10.0) AS BIGINT) AS bucket,
       COUNT(*) AS n
FROM events WHERE value IS NOT NULL
GROUP BY 1, 2
""",
)
def events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return (
        ev.where(F.col("value").isNotNull())
        .groupBy(
            "event_type",
            F.floor(F.col("value") / 10.0).cast("long").alias("bucket"),
        )
        .agg(F.count("*").alias("n"))
    )


@_register(
    "events_json_props",
    """
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
       CAST(MIN(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS INTEGER) AS min_k,
       CAST(MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS INTEGER) AS max_k
FROM events
WHERE props IS NOT NULL
GROUP BY event_type
""",
)
def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar functions over the events.props payload (green-field —
    SURVEY.md §2.10 lists JSON functions as absent in the reference)."""
    ev = _events(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.where(F.col("props").isNotNull())
        .select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").cast("long").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


@_register(
    "rel_set_ops",
    """
WITH y95 AS (SELECT DISTINCT o_custkey FROM orders
             WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'),
     y96 AS (SELECT DISTINCT o_custkey FROM orders
             WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01')
SELECT 'both' AS tag, o_custkey FROM (SELECT o_custkey FROM y95 INTERSECT SELECT o_custkey FROM y96)
UNION ALL
SELECT 'only_1995' AS tag, o_custkey FROM (SELECT o_custkey FROM y95 EXCEPT SELECT o_custkey FROM y96)
""",
)
def rel_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")

    def year_custs(y: int):
        return (
            orders.where(
                (F.col("o_orderdate") >= F.lit(f"{y}-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit(f"{y + 1}-01-01").cast("timestamp"))
            )
            .select("o_custkey")
            .distinct()
        )

    y95, y96 = year_custs(1995), year_custs(1996)
    both = y95.intersect(y96).select(F.lit("both").alias("tag"), "o_custkey")
    only95 = y95.exceptAll(y96).select(F.lit("only_1995").alias("tag"), "o_custkey")
    return both.unionByName(only95)


@_register(
    "streaming_distinct_keys",
    """
SELECT DISTINCT user_id, event_type FROM events
""",
)
def streaming_distinct_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup (withWatermark + dropDuplicates) replayed over
    the events table; on bounded input the surviving key set must equal
    batch DISTINCT, which the oracle checks."""
    from whatsapp_vectordb_spark.streaming.ops import run_streaming_distinct

    return run_streaming_distinct(spark, os.path.join(sf_dir, "events.parquet"))


@_register(
    "multimodal_resize_dims",
    """
WITH imgs AS (
  SELECT 'm' || CAST(doc_id AS VARCHAR) AS media_id,
         CAST(320 + (doc_id % 5) * 160 AS INTEGER) AS width,
         CAST(240 + (doc_id % 3) * 120 AS INTEGER) AS height
  FROM documents WHERE doc_id % 3 = 0
)
SELECT media_id, width, height,
       CAST(round(width * LEAST(1.0, 512.0 / GREATEST(width, height))) AS INTEGER) AS target_w,
       CAST(round(height * LEAST(1.0, 512.0 / GREATEST(width, height))) AS INTEGER) AS target_h
FROM imgs
""",
)
def multimodal_resize_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    from whatsapp_vectordb_spark.multimodal import resize_dims_plan

    return resize_dims_plan(_media_df(spark, sf_dir), max_side=512)


_ANN_LSH_BATCHED_ORACLE = """
WITH planes AS (
  SELECT p.p AS p, i.i AS i,
         CASE WHEN ('0x' || substr(md5('0:' || CAST(p.p AS VARCHAR) || ':' || CAST(i.i AS VARCHAR)), 1, 1))::BIGINT & 1 = 1
              THEN 1 ELSE -1 END AS s
  FROM range(0,16) p(p) CROSS JOIN range(0,64) i(i)
),
vq AS (
  SELECT vec_id, i.i AS i,
         CAST(round(embedding[i.i + 1]::DOUBLE * 1000000) AS BIGINT) AS q
  FROM embeddings CROSS JOIN range(0,64) i(i)
),
dots AS (
  SELECT vq.vec_id, planes.p, SUM(vq.q * planes.s) AS dot
  FROM vq JOIN planes ON vq.i = planes.i GROUP BY 1, 2
),
sigs AS (
  SELECT vec_id, string_agg(CASE WHEN dot >= 0 THEN '1' ELSE '0' END, '' ORDER BY p) AS sig
  FROM dots GROUP BY vec_id
),
banded AS (
  SELECT vec_id, b.b AS band, substr(sig, b.b * 4 + 1, 4) AS chunk
  FROM sigs CROSS JOIN range(0,4) b(b)
),
qb AS (SELECT vec_id AS query_id, band, chunk FROM banded WHERE vec_id IN (0, 1, 2)),
cand AS (
  SELECT DISTINCT qb.query_id, banded.vec_id
  FROM banded JOIN qb ON banded.band = qb.band AND banded.chunk = qb.chunk
),
qv AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id IN (0, 1, 2)),
scored AS (
  SELECT c.query_id, e.vec_id,
         ROUND(list_cosine_similarity(e.embedding::DOUBLE[], qv.v), 6) AS score
  FROM cand c
  JOIN embeddings e ON e.vec_id = c.vec_id
  JOIN qv ON qv.query_id = c.query_id
  WHERE list_cosine_similarity(e.embedding::DOUBLE[], qv.v) IS NOT NULL
)
SELECT query_id, vec_id, score, CAST(rn AS INTEGER) AS rank FROM (
  SELECT query_id, vec_id, score,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id ASC) AS rn
  FROM scored
) WHERE rn <= 5
"""


@_register("ann_lsh_batched", _ANN_LSH_BATCHED_ORACLE)
def ann_lsh_batched(spark: SparkSession, sf_dir: str) -> DataFrame:
    from whatsapp_vectordb_spark.operators.ann import portable_lsh_topk_batched

    emb = _t(spark, sf_dir, "embeddings")
    return portable_lsh_topk_batched(
        emb, query_ids=[0, 1, 2], k=5, n_planes=16, bands=4, seed=0, round_to=ROUND_SCORE,
        impl="numpy", dim=64,
    )


# PII scrub: the corpus gets deterministic synthetic PII (emails, phones,
# URLs, IPs) appended in both engines, then the staged redact+count runs
# identically: each rule counts on the previous rule's output, so an
# email inside a URL is consumed (and counted) by the URL rule only.
_PII_AUG_SQL = """
SELECT doc_id,
       text
       || CASE WHEN doc_id % 11 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END
       || CASE WHEN doc_id % 13 = 0 THEN ' call +1 555-0100-123' ELSE '' END
       || CASE WHEN doc_id % 17 = 0 THEN ' see https://ex.org/d/' || CAST(doc_id AS VARCHAR) || '?u=a@b.co' ELSE '' END
       || CASE WHEN doc_id % 19 = 0 THEN ' host 192.168.10.1 up' ELSE '' END
       AS text
FROM documents
"""

_PII_STAGES_SQL = """
s1 AS (SELECT doc_id, len(regexp_extract_all(text, 'https?://[^\\s]+')) AS n_url,
              regexp_replace(text, 'https?://[^\\s]+', '<URL>', 'g') AS t FROM aug),
s2 AS (SELECT doc_id, n_url, len(regexp_extract_all(t, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}')) AS n_email,
              regexp_replace(t, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}', '<EMAIL>', 'g') AS t FROM s1),
s3 AS (SELECT doc_id, n_url, n_email, len(regexp_extract_all(t, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS n_ip,
              regexp_replace(t, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IP>', 'g') AS t FROM s2),
s4 AS (SELECT doc_id, n_url, n_email, n_ip, len(regexp_extract_all(t, '\\+?\\d[\\d\\- ]{7,}\\d')) AS n_phone,
              regexp_replace(t, '\\+?\\d[\\d\\- ]{7,}\\d', '<PHONE>', 'g') AS t FROM s3)
"""


@_register(
    "text_redact_pii",
    f"""
WITH aug AS ({_PII_AUG_SQL}),
{_PII_STAGES_SQL}
SELECT doc_id, md5(t) AS redacted_md5,
       CAST(n_url AS INTEGER) AS n_url, CAST(n_email AS INTEGER) AS n_email,
       CAST(n_ip AS INTEGER) AS n_ip, CAST(n_phone AS INTEGER) AS n_phone
FROM s4
""",
)
def text_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    from whatsapp_vectordb_spark.operators.textops import redact_pii

    d = F.col("doc_id")
    aug = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                d % 11 == 0,
                F.concat(F.lit(" contact user"), d.cast("string"), F.lit("@example.com")),
            ).otherwise(F.lit("")),
            F.when(d % 13 == 0, F.lit(" call +1 555-0100-123")).otherwise(F.lit("")),
            F.when(
                d % 17 == 0,
                F.concat(F.lit(" see https://ex.org/d/"), d.cast("string"), F.lit("?u=a@b.co")),
            ).otherwise(F.lit("")),
            F.when(d % 19 == 0, F.lit(" host 192.168.10.1 up")).otherwise(F.lit("")),
        ).alias("text"),
    )
    out = redact_pii(aug)
    return out.select(
        "doc_id",
        F.md5("redacted").alias("redacted_md5"),
        F.col("n_url").cast("int").alias("n_url"),
        F.col("n_email").cast("int").alias("n_email"),
        F.col("n_ip").cast("int").alias("n_ip"),
        F.col("n_phone").cast("int").alias("n_phone"),
    )


_BM25_TERMS = ("data", "processing", "scale")

# BM25 keyword retrieval over documents — the lexical twin of the vector
# top-k, with the Lucene-smoothed RSJ idf. Same ranking discipline as
# every top-k here: round before the cut, tie-break by id.
_BM25_ORACLE = f"""
WITH toks AS (SELECT doc_id, {_TOKS.format(c='text')} AS tk FROM documents),
lens AS (SELECT doc_id, len(tk) AS dl FROM toks),
stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, AVG(dl) AS avgdl FROM lens),
postings AS (SELECT doc_id, unnest(tk) AS term FROM toks),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM postings
  WHERE term IN ('data', 'processing', 'scale') GROUP BY 1, 2
),
dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1)
SELECT t.doc_id,
       ROUND(SUM(
         ln(1 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
         * t.tf * 2.2
         / (t.tf + 1.2 * (0.25 + 0.75 * l.dl / s.avgdl))
       ), 6) AS bm25
FROM tf t
JOIN dfreq d ON d.term = t.term
JOIN lens l ON l.doc_id = t.doc_id
CROSS JOIN stats s
GROUP BY t.doc_id
ORDER BY bm25 DESC, t.doc_id ASC
LIMIT 10
"""


@_register("text_search_bm25", _BM25_ORACLE)
def text_search_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    from whatsapp_vectordb_spark.operators.textops import bm25_search

    return bm25_search(
        _t(spark, sf_dir, "documents"), list(_BM25_TERMS), k1=1.2, b=0.75, top_n=10
    )


# Round 6: RM3 pseudo-relevance feedback — BM25 feedback docs → top-5
# expansion terms (integer counts, term-asc tiebreak, ≥4 chars as the
# portable stopword guard) at weight 0.5 → weighted BM25 re-rank.
_RM3_ORACLE = f"""
WITH toks AS (SELECT doc_id, {_TOKS.format(c='text')} AS tk FROM documents),
lens AS (SELECT doc_id, len(tk) AS dl FROM toks),
stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, AVG(dl) AS avgdl FROM lens),
postings AS (SELECT doc_id, unnest(tk) AS term FROM toks),
tf1 AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM postings
  WHERE term IN ('data', 'processing', 'scale') GROUP BY 1, 2
),
df1 AS (SELECT term, COUNT(*) AS df FROM tf1 GROUP BY 1),
fb AS (
  SELECT t.doc_id,
         ROUND(SUM(
           ln(1 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
           * t.tf * 2.2
           / (t.tf + 1.2 * (0.25 + 0.75 * l.dl / s.avgdl))
         ), 6) AS bm25
  FROM tf1 t
  JOIN df1 d ON d.term = t.term
  JOIN lens l ON l.doc_id = t.doc_id
  CROSS JOIN stats s
  GROUP BY t.doc_id
  ORDER BY bm25 DESC, t.doc_id ASC
  LIMIT 10
),
exp AS (
  SELECT p.term FROM postings p JOIN fb ON fb.doc_id = p.doc_id
  WHERE p.term NOT IN ('data', 'processing', 'scale') AND len(p.term) >= 4
  GROUP BY p.term
  ORDER BY COUNT(*) DESC, p.term ASC
  LIMIT 5
),
w AS (
  SELECT term, 1.0 AS w FROM (VALUES ('data'), ('processing'), ('scale')) s(term)
  UNION ALL
  SELECT term, 0.5 AS w FROM exp
),
tf2 AS (
  SELECT p.doc_id, p.term, COUNT(*) AS tf
  FROM postings p JOIN w ON w.term = p.term GROUP BY 1, 2
),
df2 AS (SELECT term, COUNT(*) AS df FROM tf2 GROUP BY 1)
SELECT t.doc_id,
       ROUND(SUM(
         w.w
         * ln(1 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
         * t.tf * 2.2
         / (t.tf + 1.2 * (0.25 + 0.75 * l.dl / s.avgdl))
       ), 6) AS bm25
FROM tf2 t
JOIN w ON w.term = t.term
JOIN df2 d ON d.term = t.term
JOIN lens l ON l.doc_id = t.doc_id
CROSS JOIN stats s
GROUP BY t.doc_id
ORDER BY bm25 DESC, t.doc_id ASC
LIMIT 10
"""


@_register("text_search_rm3", _RM3_ORACLE)
def text_search_rm3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query expansion the Anserini/Lucene way (RM3 lineage): the whole
    feedback loop — retrieve, mine expansion terms, weighted re-rank —
    stays in ONE plan; the feedback set and term weights are tiny
    broadcast frames, never a driver collect (textops.rm3_search)."""
    from whatsapp_vectordb_spark.operators.textops import rm3_search

    return rm3_search(
        _t(spark, sf_dir, "documents"),
        list(_BM25_TERMS),
        fb_k=10,
        n_expand=5,
        expand_weight=0.5,
        min_term_len=4,
        top_n=10,
    )


# Sparse k-NN (types.SPARSE_VECTOR_SCHEMA, reference main.go:45-48): the
# corpus is thresholded-sparsified embeddings; ranking uses the sparse
# cosine over matching indices only. Candidates are restricted to vectors
# sharing ≥1 sparse index with the query (arrays_overlap) — the same
# inverted-index semantics the oracle's equi-join on idx expresses.
_KNN_SPARSE_ORACLE = """
WITH sp AS (
  SELECT vec_id, i.i AS idx, embedding[i.i + 1]::DOUBLE AS v
  FROM embeddings CROSS JOIN range(0,64) i(i)
  WHERE abs(embedding[i.i + 1]::DOUBLE) > 0.1
),
q AS (SELECT idx, v FROM sp WHERE vec_id = 0),
dots AS (
  SELECT sp.vec_id, SUM(sp.v * q.v) AS dot
  FROM sp JOIN q ON sp.idx = q.idx GROUP BY 1
),
norms AS (SELECT vec_id, sqrt(SUM(v * v)) AS nrm FROM sp GROUP BY 1),
qn AS (SELECT sqrt(SUM(v * v)) AS nrm FROM q)
SELECT d.vec_id, ROUND(d.dot / (n.nrm * qn.nrm), 6) AS score
FROM dots d JOIN norms n ON n.vec_id = d.vec_id CROSS JOIN qn
WHERE n.nrm > 0 AND qn.nrm > 0
ORDER BY score DESC, d.vec_id ASC
LIMIT 10
"""


@_register("knn_topk_sparse", _KNN_SPARSE_ORACLE)
def knn_topk_sparse(spark: SparkSession, sf_dir: str) -> DataFrame:
    from whatsapp_vectordb_spark.functions.vector import dense_to_sparse, sparse_cosine

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", dense_to_sparse("embedding", threshold=0.1).alias("sp")
    )
    q = emb.where(F.col("vec_id") == 0).select(F.col("sp").alias("qsp"))
    scored = (
        emb.crossJoin(F.broadcast(q))
        .where(F.arrays_overlap(F.col("sp.indices"), F.col("qsp.indices")))
        .select(
            "vec_id",
            F.round(sparse_cosine("sp", "qsp"), ROUND_SCORE).alias("score"),
        )
        .where(F.col("score").isNotNull())
    )
    return scored.orderBy(F.col("score").desc(), F.col("vec_id").asc()).limit(10)


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
    "streaming_enriched_counts",
    """
SELECT c.c_mktsegment, e.event_type,
       COUNT(*) AS n_events,
       ROUND(SUM(e.value), 4) AS sum_value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1, 2
""",
)
def streaming_enriched_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static broadcast join: events replayed through the streaming
    engine, enriched with the static customer dim per micro-batch; result
    must equal the batch join+aggregate (the oracle)."""
    from whatsapp_vectordb_spark.streaming.ops import run_stream_static_enrich

    dim = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return run_stream_static_enrich(spark, os.path.join(sf_dir, "events.parquet"), dim)


@_register(
    "streaming_stream_stream_join",
    """
SELECT c.event_id AS click_id, e.event_id AS error_id, c.user_id
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
JOIN (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error') e
  ON e.user_id = c.user_id
 AND e.ts >= c.ts AND e.ts <= c.ts + INTERVAL 300 SECONDS
""",
)
def streaming_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from whatsapp_vectordb_spark.streaming.ops import run_stream_stream_join

    return run_stream_stream_join(spark, os.path.join(sf_dir, "events.parquet"))


# ==========================================================================
# Deterministic sampling (operators/sampling.py) — dataset-curation layer:
# hash-fraction sampling, leakage-proof split assignment, per-group caps.
# All md5-bucket based so the oracle reproduces exact membership.
# ==========================================================================

_BUCKET_SQL = "('0x' || substr(md5('0:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 10000"


@_register(
    "sample_hash_fraction",
    f"""
SELECT doc_id, lang FROM documents WHERE {_BUCKET_SQL} < 1000
""",
)
def sample_hash_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 10% sample: membership is a pure function of doc_id —
    stable under repartitioning, appends, and engine choice (vs
    ``df.sample``, which is partition-layout dependent)."""
    from whatsapp_vectordb_spark.operators.sampling import hash_sample

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    return hash_sample(docs, "doc_id", fraction=0.10)


@_register(
    "sample_split_assign",
    f"""
WITH b AS (SELECT doc_id, lang, {_BUCKET_SQL} AS bucket FROM documents)
SELECT CASE WHEN bucket < 9000 THEN 'train'
            WHEN bucket < 9500 THEN 'val'
            ELSE 'test' END AS split,
       lang, COUNT(*) AS n_docs
FROM b GROUP BY 1, 2
""",
)
def sample_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """90/5/5 train/val/test assignment from cumulative hash-bucket ranges;
    a row's split never changes as the corpus grows, so cross-split leakage
    is impossible by construction. Output: per-(split, lang) counts."""
    from whatsapp_vectordb_spark.operators.sampling import assign_splits

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    return (
        assign_splits(docs, "doc_id")
        .groupBy("split", "lang")
        .agg(F.count("*").alias("n_docs"))
    )


@_register(
    "sample_group_cap",
    f"""
WITH b AS (SELECT doc_id, lang, {_BUCKET_SQL} AS bucket FROM documents),
r AS (SELECT doc_id, lang,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY bucket, doc_id) AS rk
      FROM b)
SELECT doc_id, lang FROM r WHERE rk <= 50
""",
)
def sample_group_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced downsample: ≤50 docs per language, hash-ranked — the
    rebalancing step that stops a dominant language from swamping a
    training mix. One window shuffle keyed by group."""
    from whatsapp_vectordb_spark.operators.sampling import stratified_cap

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    return stratified_cap(docs, "lang", "doc_id", n_per_group=50)


_MIX_WEIGHTS = {"en": 0.4, "de": 0.15, "es": 0.15, "fr": 0.15, "zh": 0.15}

_MIX_WEIGHTS_SQL = ", ".join(f"('{g}', {w})" for g, w in _MIX_WEIGHTS.items())


@_register(
    "sample_weighted_mix",
    f"""
WITH w(lang, wt) AS (VALUES {_MIX_WEIGHTS_SQL}),
counts AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY 1),
gw AS (SELECT c.lang, c.n, w.wt FROM counts c JOIN w ON w.lang = c.lang),
lam AS (SELECT MIN(n / wt) AS lam FROM gw),
cuts AS (
  SELECT lang,
         CAST(round(LEAST(1.0, lam.lam * wt / n) * 10000) AS BIGINT) AS cut
  FROM gw CROSS JOIN lam
)
SELECT d.doc_id, d.lang
FROM documents d JOIN cuts ON cuts.lang = d.lang
WHERE {_BUCKET_SQL.replace('doc_id', 'd.doc_id')} < cuts.cut
""",
)
def sample_weighted_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix rebalancing to target language proportions (40% en,
    15% each of de/es/fr/zh): the scarcest group keeps everything, the
    abundant ones hash-downsample to match — λ-scaled acceptance rates
    computed in-plan, map-only membership."""
    from whatsapp_vectordb_spark.operators.sampling import weighted_mix

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    return weighted_mix(docs, _MIX_WEIGHTS, group_col="lang", id_col="doc_id")


# The capstone: the WHOLE curation pipeline a training-data run executes
# — quality gate → exact dedup (keep lowest id) → language-mix rebalance
# → leak-proof split assignment — composed from the individual operators
# and hash-checked end to end. The corpus is augmented with exact copies
# so the dedup stage has real work.
_CURATE_ORACLE = f"""
WITH aug AS (
  SELECT doc_id, text, lang FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text, lang FROM documents WHERE doc_id % 50 = 0
),
toks AS (SELECT doc_id, text, {_TOKS.format(c='text')} AS tk FROM aug),
q AS (
  SELECT doc_id,
         ROUND(
           (CASE WHEN len(tk) >= 10 AND len(tk) <= 1000 THEN 1.0 ELSE 0.0 END) * 0.25
           + (CASE WHEN (CASE WHEN len(tk) > 0 THEN length(text)::DOUBLE / len(tk) ELSE 0.0 END) >= 3.0
                    AND (CASE WHEN len(tk) > 0 THEN length(text)::DOUBLE / len(tk) ELSE 0.0 END) <= 12.0
               THEN 1.0 ELSE 0.0 END) * 0.25
           + LEAST((CASE WHEN len(tk) > 0 THEN len(list_filter(tk, x -> list_contains({_STOP_SQL}, x)))::DOUBLE / len(tk) ELSE 0.0 END) * 2.0, 1.0) * 0.25
           + (CASE WHEN len(tk) > 0 THEN len(list_distinct(tk))::DOUBLE / len(tk) ELSE 0.0 END) * 0.25,
         6) AS qs
  FROM toks
),
kept AS (
  SELECT a.doc_id, a.text, a.lang FROM aug a JOIN q ON q.doc_id = a.doc_id
  WHERE q.qs >= 0.5
),
dd AS (
  SELECT doc_id, lang,
         MIN(doc_id) OVER (
           PARTITION BY md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
         ) AS keeper
  FROM kept
),
base AS (SELECT doc_id, lang FROM dd WHERE doc_id = keeper),
w(lang, wt) AS (VALUES {_MIX_WEIGHTS_SQL}),
counts AS (SELECT lang, COUNT(*) AS n FROM base GROUP BY 1),
gw AS (SELECT c.lang, c.n, w.wt FROM counts c JOIN w ON w.lang = c.lang),
lam AS (SELECT MIN(n / wt) AS lam FROM gw),
cuts AS (
  SELECT lang, CAST(round(LEAST(1.0, lam.lam * wt / n) * 10000) AS BIGINT) AS cut
  FROM gw CROSS JOIN lam
),
mixed AS (
  SELECT b.doc_id, b.lang
  FROM base b JOIN cuts ON cuts.lang = b.lang
  WHERE {_BUCKET_SQL.replace('doc_id', 'b.doc_id')} < cuts.cut
)
SELECT CASE WHEN {_BUCKET_SQL} < 9000 THEN 'train'
            WHEN {_BUCKET_SQL} < 9500 THEN 'val'
            ELSE 'test' END AS split,
       lang, COUNT(*) AS n_docs
FROM mixed GROUP BY 1, 2
"""


def curate_base_frame(aug: DataFrame) -> DataFrame:
    """Quality gate + exact dedup over skinny (doc_id, lang, _h) rows —
    the curate capstone's pre-checkpoint stage graph over ANY
    (doc_id, text, lang) corpus frame. ONE definition shared by the
    registered query, the plan audit (tests/test_plans.py — no Exchange
    may carry raw text), and tools/stress_pipelines.py (so the 1M-doc
    stress measures the same graph the oracle gates)."""
    from pyspark.sql import Window

    from whatsapp_vectordb_spark.functions.text import normalize_text
    from whatsapp_vectordb_spark.operators.textops import quality_scores

    q = quality_scores(aug).select("doc_id", "quality_score")
    # scale shape (profiled at 1M docs, tools/stress_pipelines.py): hash
    # the text MAP-SIDE and shuffle only (doc_id, lang, _h) — the raw text
    # column never enters the join or the dedup window
    skinny = aug.select("doc_id", "lang", F.md5(normalize_text("text")).alias("_h"))
    kept = skinny.join(q, "doc_id").where(F.col("quality_score") >= 0.5)
    w = Window.partitionBy("_h")
    return (
        kept.withColumn("_keeper", F.min("doc_id").over(w))
        .where(F.col("doc_id") == F.col("_keeper"))
        .select("doc_id", "lang")
    )


def _curate_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fixture corpus (documents + planted every-50th duplicates)
    through ``curate_base_frame`` — the (spark, sf_dir) form the plan
    dump and plan audit call; localCheckpoint in the registered capstone
    truncates its own explain output."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    dupes = docs.where(F.col("doc_id") % 50 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text", "lang"
    )
    return curate_base_frame(docs.unionByName(dupes))


@_register("pipeline_curate_corpus", _CURATE_ORACLE)
def pipeline_curate_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality gate (composite score ≥ 0.5) → exact dedup keeping the
    lowest id per normalized text → weighted language-mix rebalance →
    deterministic train/val/test assignment; reports per-(split, lang)
    counts. Every stage is an operator already oracle-checked on its own;
    this query checks their COMPOSITION end to end."""
    from whatsapp_vectordb_spark.operators.sampling import assign_splits, weighted_mix

    # weighted_mix consumes base TWICE (per-group counts branch + the
    # filtered data branch); without a checkpoint the join+window
    # upstream recomputes per consumer — 83s of the 99s profiled at
    # 250k docs before this change
    base = _curate_base(spark, sf_dir).localCheckpoint()
    mixed = weighted_mix(base, _MIX_WEIGHTS, group_col="lang", id_col="doc_id")
    assigned = assign_splits(mixed, "doc_id")
    return assigned.groupBy("split", "lang").agg(F.count("*").alias("n_docs"))


# ==========================================================================
# Round 3: Gopher-style repetition filters (operators/textops.py
# repetition_scores) — the public repetition rules every LLM corpus
# pipeline applies (Rae et al. 2021 §A1.1). Trigrams reduce to 60-bit md5
# ids in BOTH engines so counts group identically.
# ==========================================================================


@_register(
    "text_repetition_scores",
    f"""
WITH toks AS (SELECT doc_id, {_TOKS.format(c='text')} AS tk FROM documents),
base AS (SELECT doc_id, len(tk) AS n_tokens, tk FROM toks),
tri AS (
  SELECT doc_id,
         unnest(list_transform(
           range(1, CASE WHEN len(tk) >= 3 THEN len(tk) - 1 ELSE 1 END),
           i -> tk[i] || ' ' || tk[i + 1] || ' ' || tk[i + 2])) AS tri
  FROM base
),
trih AS (SELECT doc_id, ('0x' || substr(md5(tri), 1, 15))::BIGINT AS h FROM tri),
c AS (SELECT doc_id, h, COUNT(*) AS c FROM trih GROUP BY 1, 2),
pd AS (SELECT doc_id, SUM(c) AS n_tri, MAX(c) AS mx, COUNT(*) AS nd FROM c GROUP BY 1)
SELECT b.doc_id,
       CAST(b.n_tokens AS INTEGER) AS n_tokens,
       CAST(COALESCE(pd.n_tri, 0) AS INTEGER) AS n_trigrams,
       ROUND(CASE WHEN COALESCE(pd.n_tri, 0) > 0 THEN pd.mx::DOUBLE / pd.n_tri ELSE 0.0 END, 6) AS top_trigram_frac,
       ROUND(CASE WHEN COALESCE(pd.n_tri, 0) > 0 THEN (pd.n_tri - pd.nd)::DOUBLE / pd.n_tri ELSE 0.0 END, 6) AS dup_trigram_frac,
       CAST(CASE WHEN ROUND(CASE WHEN COALESCE(pd.n_tri, 0) > 0 THEN pd.mx::DOUBLE / pd.n_tri ELSE 0.0 END, 6) > 0.18
                   OR ROUND(CASE WHEN COALESCE(pd.n_tri, 0) > 0 THEN (pd.n_tri - pd.nd)::DOUBLE / pd.n_tri ELSE 0.0 END, 6) > 0.30
            THEN 1 ELSE 0 END AS INTEGER) AS repetitive
FROM base b LEFT JOIN pd ON b.doc_id = pd.doc_id
""",
)
def text_repetition_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    from whatsapp_vectordb_spark.operators.textops import repetition_scores

    return repetition_scores(_t(spark, sf_dir, "documents"))


# ==========================================================================
# Round 3: per-label embedding cluster profile (functions/vector.py
# label_centroid_stats) — integer-quantized centroid sums so both engines
# agree bit-for-bit on everything except the final O(1) distance average.
# ==========================================================================


@_register(
    "embeddings_label_centroids",
    """
WITH ex AS (
  SELECT label, vec_id, i.i AS pos,
         CAST(round(embedding[i.i + 1]::DOUBLE * 10000) AS BIGINT) AS q
  FROM embeddings CROSS JOIN range(0, 64) i(i)
),
cent AS (SELECT label, pos, SUM(q) AS S, COUNT(*) AS n FROM ex GROUP BY 1, 2),
norms AS (SELECT label, MAX(n) AS n_vectors, SUM(S * S) AS SS FROM cent GROUP BY 1),
d AS (
  SELECT e.label, e.vec_id,
         SUM((e.q * c.n - c.S) * (e.q * c.n - c.S)) AS dq2, MAX(c.n) AS n
  FROM ex e JOIN cent c ON e.label = c.label AND e.pos = c.pos
  GROUP BY 1, 2
),
dv AS (SELECT label, SQRT(dq2::DOUBLE) / (10000.0 * n) AS dist FROM d)
SELECT nm.label,
       CAST(nm.n_vectors AS BIGINT) AS n_vectors,
       ROUND(SQRT(nm.SS::DOUBLE) / (10000.0 * nm.n_vectors), 6) AS centroid_norm,
       ROUND(AVG(dv.dist), 4) AS avg_dist
FROM norms nm JOIN dv ON nm.label = dv.label
GROUP BY 1, 2, 3
""",
)
def embeddings_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    from whatsapp_vectordb_spark.functions.vector import label_centroid_stats

    return label_centroid_stats(_t(spark, sf_dir, "embeddings"))


# ==========================================================================
# Round 3: streaming top-k maintenance (streaming/ops.py
# run_topk_maintenance_stream) — foreachBatch leaderboard materialization;
# the merge is a semilattice so the replayed result equals the batch SQL.
# ==========================================================================


@_register(
    "streaming_topk_events",
    """
SELECT event_id, user_id, ROUND(value, 6) AS score
FROM events
ORDER BY score DESC, event_id ASC
LIMIT 10
""",
)
def streaming_topk_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from whatsapp_vectordb_spark.streaming.ops import run_topk_maintenance_stream

    state_dir = _tmp_scratch("wvs_topk_stream_")
    return run_topk_maintenance_stream(
        spark, os.path.join(sf_dir, "events.parquet"), state_dir, k=10
    )


@_register(
    "streaming_knn_serving",
    """
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS query_vec
           FROM embeddings WHERE vec_id < 6)
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
def streaming_knn_serving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 6: ONLINE SERVING — the reference's query loop (main.go:95)
    as a stream. Six query vectors arrive as three dropped files (two per
    micro-batch); each batch is answered against the STATIC index with
    the same exact batched top-k plan as the batch engine; after full
    replay the accumulated answers must be bit-equal to the one-shot
    batch over the same queries (this oracle = knn_batched's, vec_id<6)."""
    import shutil
    import tempfile

    from whatsapp_vectordb_spark.streaming.ops import run_knn_serving_stream

    scratch = _tmp_scratch("wvs_knn_serve_")
    drop = os.path.join(scratch, "queries")
    os.makedirs(drop)
    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    queries = (
        spark.read.parquet(emb_path)
        .where(F.col("vec_id") < 6)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec"))
        .orderBy("query_id")
        .collect()
    )
    for i in range(3):
        two = queries[2 * i : 2 * i + 2]
        spark.createDataFrame(
            [(r["query_id"], r["query_vec"]) for r in two],
            "query_id bigint, query_vec array<float>",
        ).coalesce(1).write.mode("overwrite").parquet(os.path.join(scratch, f"stage{i}"))
        part = [
            f
            for f in os.listdir(os.path.join(scratch, f"stage{i}"))
            if f.endswith(".parquet")
        ][0]
        shutil.copy(
            os.path.join(scratch, f"stage{i}", part),
            os.path.join(drop, f"queries_{i}.parquet"),
        )
    return run_knn_serving_stream(
        spark, emb_path, drop, os.path.join(scratch, "answers"), k=3, round_to=6
    )


# ==========================================================================
# Round 3: OPQ — rotation-optimized product quantization (operators/ann.py
# OpqIndex; Ge et al. CVPR 2013). The rotation lives entirely Spark-side;
# the oracle replays the identical integer-ADC probe over persisted codes.
# ==========================================================================

_OPQ_ORACLE_DIR = _oracle_scratch("opq_oracle")

_ANN_OPQ_ORACLE = f"""
WITH codes AS (SELECT * FROM read_parquet('{_OPQ_ORACLE_DIR}/codes/*.parquet')),
lut AS (SELECT * FROM read_parquet('{_OPQ_ORACLE_DIR}/lut/*.parquet')),
s AS (
  SELECT c.vec_id, CAST(SUM(l.w) AS BIGINT) AS score
  FROM codes c CROSS JOIN range(0,8) j(j)
  JOIN lut l ON l.j = j.j AND l.c = c.codes[j.j + 1]
  GROUP BY 1
)
SELECT vec_id, score FROM s
ORDER BY score DESC, vec_id ASC
LIMIT 10
"""


@_register("ann_opq_topk", _ANN_OPQ_ORACLE)
def ann_opq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from whatsapp_vectordb_spark.operators.ann import OpqIndex

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    qvec = emb.where(F.col("vec_id") == 0).head()["embedding"]
    idx = OpqIndex.build(emb, m=8, ksub=16, sample_rows=500, seed=0, opq_iters=4)
    idx.save(_OPQ_ORACLE_DIR, idx.encode(emb))
    lut = idx.lut_int(qvec)
    spark.createDataFrame(
        [(j, c, int(lut[j, c])) for j in range(lut.shape[0]) for c in range(lut.shape[1])],
        "j int, c int, w bigint",
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(_OPQ_ORACLE_DIR, "lut"))
    loaded, codes = OpqIndex.load(spark, _OPQ_ORACLE_DIR)
    return loaded.adc_topk(codes, qvec, k=10)


# ==========================================================================
# Round 3: explicit Bloom-pruned join (operators/bloom.py) — the runtime
# row-level-filter primitive made engine-portable: md5-derived positions,
# 32-bit words in int64, identical bitmap in both engines.
# ==========================================================================


@_register(
    "rel_salted_join",
    """
SELECT o.o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY 1
""",
)
def rel_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The skew-mitigation join under the correctness gate: salted_join
    (functions/skew.py — left side salted by xxhash64 of the full row,
    right side replicated 16×) must be RESULT-IDENTICAL to the plain
    equi-join the oracle runs. Stress evidence (1.8× on a 50%-hot key at
    16M rows, checksum-verified) lives in tools/stress_skew.py; this
    entry pins the equivalence per-round at sf gate scale."""
    from whatsapp_vectordb_spark.functions.skew import salted_join

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"),
        # quantize to cents MAP-SIDE: the sum is an exact BIGINT, immune
        # to double summation order (which the salt would perturb)
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("_cents"),
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    j = salted_join(li, orders, "o_orderkey")
    return j.groupBy("o_orderpriority").agg(
        F.count("*").cast("long").alias("n_items"),
        F.sum("_cents").cast("long").alias("revenue_cents"),
    )



@_register(
    "rel_bloom_pruned_join",
    """
WITH keys AS (
  SELECT DISTINCT o_orderkey AS kk FROM orders WHERE o_orderpriority = '1-URGENT'
),
pos AS (
  SELECT kk, (('0x' || substr(md5(kk::VARCHAR), 1, 15))::BIGINT >> (15 * i.i)) % 32768 AS p
  FROM keys CROSS JOIN range(0, 4) i(i)
),
bits AS (
  SELECT p // 32 AS word, bit_or(1::BIGINT << CAST(p % 32 AS INTEGER)) AS bits
  FROM pos GROUP BY 1
),
dkeys AS (SELECT DISTINCT l_orderkey AS lk FROM lineitem),
ppos AS (
  SELECT lk, (('0x' || substr(md5(lk::VARCHAR), 1, 15))::BIGINT >> (15 * i.i)) % 32768 AS p
  FROM dkeys CROSS JOIN range(0, 4) i(i)
),
pass_keys AS (
  SELECT pp.lk
  FROM ppos pp JOIN bits b ON pp.p // 32 = b.word
  WHERE (b.bits & (1::BIGINT << CAST(pp.p % 32 AS INTEGER))) <> 0
  GROUP BY pp.lk HAVING COUNT(*) = 4
)
SELECT (SELECT COUNT(*) FROM lineitem) AS n_rows,
       (SELECT COUNT(*) FROM lineitem l JOIN pass_keys pk ON l.l_orderkey = pk.lk) AS n_passed,
       (SELECT COUNT(*) FROM lineitem l JOIN keys k ON l.l_orderkey = k.kk) AS n_true
""",
)
def rel_bloom_pruned_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-side pruning with an explicit portable Bloom filter: build the
    bitmap over urgent orders' keys (a KB-scale aggregate), inline it as a
    literal, and count how many lineitem rows pass the map-only filter vs
    how many truly join. The pass count is deterministic (md5 positions),
    so the false-positive behavior itself is hash-checked."""
    from whatsapp_vectordb_spark.operators.bloom import bloom_might_contain, bloom_words

    # ONE pass over the fact side: the bloom predicate rides as a PROJECTED
    # flag (a filter would be pushed below the spreading repartition and
    # evaluate in the single scan task of a one-row-group file — measured
    # 4× slower), the true-join flag as a broadcast left join, and all
    # three counts fold into a single aggregate — no crossJoins, no
    # re-scans. (At real scale inputs arrive in thousands of splits and
    # the spread is moot; the one-pass shape still wins.)
    li = _t(spark, sf_dir, "lineitem").repartition(
        spark.sparkContext.defaultParallelism
    )
    orders = _t(spark, sf_dir, "orders")
    urgent = orders.where(F.col("o_orderpriority") == "1-URGENT")
    words = [
        (r["word"], r["bits"]) for r in bloom_words(urgent, "o_orderkey").collect()
    ]
    truekeys = urgent.select("o_orderkey").dropDuplicates().withColumn(
        "_true", F.lit(1)
    )
    flagged = li.join(
        F.broadcast(truekeys), li["l_orderkey"] == truekeys["o_orderkey"], "left"
    ).select(
        bloom_might_contain(words, F.col("l_orderkey")).alias("_pass"),
        F.col("_true"),
    )
    return flagged.agg(
        F.count("*").alias("n_rows"),
        F.sum(F.when(F.col("_pass"), 1).otherwise(0)).alias("n_passed"),
        F.count(F.col("_true")).alias("n_true"),
    )


# ==========================================================================
# Round 3: corpus profile CUBE — the multi-dimensional curation dashboard
# query ("docs / chars / dedup-relevant length stats by every combination
# of lang and source"), exercising full CUBE grouping-set semantics.
# ==========================================================================


@_register(
    "docs_profile_cube",
    """
SELECT lang, source,
       COUNT(*) AS n_docs,
       ROUND(AVG(n_chars), 4) AS avg_chars,
       CAST(MIN(n_chars) AS BIGINT) AS min_chars,
       CAST(MAX(n_chars) AS BIGINT) AS max_chars
FROM documents
GROUP BY CUBE (lang, source)
""",
)
def docs_profile_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All four grouping sets in one pass: Spark plans a CUBE as a single
    Expand + partial/final aggregate — one scan regardless of how many
    dashboard facets ride on it (the at-scale alternative to N separate
    GROUP BYs over the same 100 TB)."""
    docs = _t(spark, sf_dir, "documents")
    return docs.cube("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


# ==========================================================================
# Round 3: approximate kNN graph (operators/ann.py knn_graph_lsh) — the
# density/diversity curation primitive; candidates from the bit-exact
# portable LSH (32 planes / 8-bit chunks), per-node window top-5.
# ==========================================================================


@_register(
    "ann_knn_graph",
    """
WITH planes AS (
  SELECT p.p AS p, i.i AS i,
         CASE WHEN ('0x' || substr(md5('0:' || CAST(p.p AS VARCHAR) || ':' || CAST(i.i AS VARCHAR)), 1, 1))::BIGINT & 1 = 1
              THEN 1 ELSE -1 END AS s
  FROM range(0,32) p(p) CROSS JOIN range(0,64) i(i)
),
vq AS (
  SELECT vec_id, i.i AS i,
         CAST(round(embedding[i.i + 1]::DOUBLE * 1000000) AS BIGINT) AS q
  FROM embeddings CROSS JOIN range(0,64) i(i)
),
dots AS (
  SELECT vq.vec_id, planes.p, SUM(vq.q * planes.s) AS dot
  FROM vq JOIN planes ON vq.i = planes.i GROUP BY 1, 2
),
sigs AS (
  SELECT vec_id, string_agg(CASE WHEN dot >= 0 THEN '1' ELSE '0' END, '' ORDER BY p) AS sig
  FROM dots GROUP BY vec_id
),
banded AS (
  SELECT vec_id, b.b AS band, substr(sig, b.b * 8 + 1, 8) AS chunk
  FROM sigs CROSS JOIN range(0,4) b(b)
),
cand AS (
  SELECT DISTINCT a.vec_id AS src, b.vec_id AS nbr
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.chunk = b.chunk AND a.vec_id <> b.vec_id
),
scored AS (
  SELECT c.src, c.nbr,
         ROUND(list_cosine_similarity(va.embedding::DOUBLE[], vb.embedding::DOUBLE[]), 6) AS cos_sim
  FROM cand c
  JOIN embeddings va ON va.vec_id = c.src
  JOIN embeddings vb ON vb.vec_id = c.nbr
  WHERE list_cosine_similarity(va.embedding::DOUBLE[], vb.embedding::DOUBLE[]) IS NOT NULL
)
SELECT src, nbr, cos_sim, CAST(rank AS INTEGER) AS rank
FROM (
  SELECT src, nbr, cos_sim,
         ROW_NUMBER() OVER (PARTITION BY src ORDER BY cos_sim DESC, nbr ASC) AS rank
  FROM scored
) WHERE rank <= 5
""",
)
def ann_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    from whatsapp_vectordb_spark.operators.ann import knn_graph_lsh

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return knn_graph_lsh(emb, k=5, n_planes=32, bands=4, impl="numpy", dim=64)


# ==========================================================================
# Round 3: containment dedup (operators/dedup.py containment_near_duplicates)
# — Broder's asymmetric |A∩B|/|A|, catching excerpt/quote/subset copies
# that Jaccard misses. Corpus augmented with half-length excerpts so the
# oracle has real containment structure to verify.
# ==========================================================================

_EXCERPT_SQL = """
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 2000000 AS doc_id,
         substr(text, 1, CAST(floor(length(text) / 2) AS INTEGER)) AS text
  FROM documents WHERE doc_id % 40 = 0
"""


@_register(
    "dedup_containment",
    f"""
WITH corpus AS ({_EXCERPT_SQL}),
toks AS (SELECT doc_id, {_TOKS.format(c='text')} AS tk FROM corpus),
shl AS (SELECT doc_id, {_sh_sql(3)} AS shingles FROM toks),
ex AS (SELECT doc_id, unnest(shingles) AS s FROM shl),
hot AS (SELECT s FROM ex GROUP BY s HAVING COUNT(*) > 100),
exf AS (SELECT e.doc_id, e.s FROM ex e LEFT JOIN hot h ON e.s = h.s WHERE h.s IS NULL),
cand AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM exf a JOIN exf b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM ex GROUP BY 1),
inter AS (
  SELECT c.id_a, c.id_b, COUNT(*) AS n_common
  FROM cand c
  JOIN ex ea ON ea.doc_id = c.id_a
  JOIN ex eb ON eb.doc_id = c.id_b AND eb.s = ea.s
  GROUP BY 1, 2
)
SELECT i.id_a, i.id_b,
       ROUND(i.n_common::DOUBLE / na.n, 6) AS containment_a,
       ROUND(i.n_common::DOUBLE / nb.n, 6) AS containment_b
FROM inter i
JOIN sizes na ON na.doc_id = i.id_a
JOIN sizes nb ON nb.doc_id = i.id_b
WHERE GREATEST(ROUND(i.n_common::DOUBLE / na.n, 6),
               ROUND(i.n_common::DOUBLE / nb.n, 6)) >= 0.6
""",
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from whatsapp_vectordb_spark.operators.dedup import containment_near_duplicates

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    excerpts = docs.where(F.col("doc_id") % 40 == 0).select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.expr("substring(text, 1, CAST(floor(length(text) / 2) AS INT))").alias("text"),
    )
    aug = docs.unionByName(excerpts)
    return containment_near_duplicates(
        aug, shingle_n=3, threshold=0.6, max_shingle_freq=100
    )


# ==========================================================================
# Round 3: duplicate-span coverage (operators/dedup.py duplicate_spans) —
# Lee et al. 2022 ExactSubstr at n-gram granularity: fraction of each
# doc's POSITIONAL 10-token windows that occur verbatim in another doc.
# Runs on the augmented corpus (exact + near-dup copies) so real
# cross-document span structure exists at fixture scale.
# ==========================================================================

def _pos_sh_sql(n: int) -> str:
    """DuckDB positional (non-distinct) n-gram windows over token list tk."""
    gram = " || ' ' || ".join(f"tk[i+{j}]" for j in range(n))
    gram = gram.replace("tk[i+0]", "tk[i]")
    return (
        f"CASE WHEN len(tk) >= {n} THEN "
        f"list_transform(range(1, len(tk) - {n - 2}), i -> {gram}) "
        f"ELSE [array_to_string(tk, ' ')] END"
    )


@_register(
    "dedup_duplicate_spans",
    f"""
WITH corpus AS ({_AUG_SQL}),
toks AS (SELECT doc_id, {_TOKS.format(c='text')} AS tk FROM corpus),
spans AS (SELECT doc_id, unnest({_pos_sh_sql(10)}) AS sp FROM toks),
g AS (SELECT doc_id, ('0x' || substr(md5(sp), 1, 15))::BIGINT AS h FROM spans),
dup AS (
  SELECT h FROM (SELECT DISTINCT doc_id, h FROM g) GROUP BY h HAVING COUNT(*) >= 2
),
sizes AS (SELECT doc_id, COUNT(*) AS n_spans FROM g GROUP BY 1),
hits AS (SELECT g.doc_id, COUNT(*) AS n_dup_spans FROM g JOIN dup USING (h) GROUP BY 1)
SELECT s.doc_id, s.n_spans,
       COALESCE(h.n_dup_spans, 0) AS n_dup_spans,
       ROUND(COALESCE(h.n_dup_spans, 0)::DOUBLE / s.n_spans, 6) AS dup_fraction
FROM sizes s LEFT JOIN hits h ON s.doc_id = h.doc_id
""",
)
def dedup_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from whatsapp_vectordb_spark.operators.dedup import duplicate_spans

    return duplicate_spans(_augmented_docs(spark, sf_dir), span_n=10)


# ==========================================================================
# Round 3: fuzzy join (operators/textops.py fuzzy_join) — SymSpell
# deletion-neighborhood candidate join + exact levenshtein verify.
# Probes are deterministically corrupted part names (3rd char → 'q');
# the oracle is the NAIVE all-pairs edit-distance join, so a hash match
# proves the neighborhood candidate generation loses no pairs.
# ==========================================================================

@_register(
    "text_fuzzy_join",
    """
WITH probes AS (
  SELECT p_partkey + 1000000 AS probe_id,
         substr(p_name, 1, 2) || 'q' || substr(p_name, 4) AS name
  FROM part WHERE p_partkey % 50 = 0
)
SELECT pr.probe_id, p.p_partkey,
       levenshtein(pr.name, p.p_name) AS edit_dist
FROM probes pr JOIN part p ON levenshtein(pr.name, p.p_name) <= 1
""",
)
def text_fuzzy_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from whatsapp_vectordb_spark.operators.textops import fuzzy_join

    parts = _t(spark, sf_dir, "part").select("p_partkey", "p_name")
    probes = parts.where(F.col("p_partkey") % 50 == 0).select(
        (F.col("p_partkey") + 1000000).alias("probe_id"),
        F.concat(
            F.substring("p_name", 1, 2), F.lit("q"), F.expr("substring(p_name, 4)")
        ).alias("name"),
    )
    return fuzzy_join(probes, parts, "name", "p_name", "probe_id", "p_partkey", 1)


# ==========================================================================
# Round 3: integer-exact PageRank over the approximate kNN graph
# (operators/graph.py pagerank) — the centrality/density curation signal.
# The oracle nests the bit-exact kNN-graph SQL (ORACLES["ann_knn_graph"])
# as the edge list and unrolls the fixed iterations as chained CTEs (no
# aggregation inside a recursive term needed), all arithmetic BIGINT.
# ==========================================================================

def _pagerank_oracle_sql(iters: int, scale: int, num: int, den: int) -> str:
    base = scale * (den - num) // den
    steps = []
    prev = "r0"
    for t in range(1, iters + 1):
        steps.append(
            f"""r{t} AS (
  SELECT n.node,
         CAST({base} + ({num} * COALESCE(s.inc, 0)) // {den} AS BIGINT) AS r
  FROM nodes n LEFT JOIN (
    SELECT e.d AS node, SUM(r.r // e.outdeg) AS inc
    FROM e2 e JOIN {prev} r ON r.node = e.s
    GROUP BY 1
  ) s ON s.node = n.node
)"""
        )
        prev = f"r{t}"
    return f"""
WITH knn AS ({ORACLES['ann_knn_graph']}),
edges AS (SELECT src AS s, nbr AS d FROM knn),
deg AS (SELECT s, COUNT(*) AS outdeg FROM edges GROUP BY 1),
e2 AS (SELECT e.s, e.d, g.outdeg FROM edges e JOIN deg g ON g.s = e.s),
nodes AS (
  SELECT DISTINCT node FROM (
    SELECT s AS node FROM edges UNION ALL SELECT d AS node FROM edges
  )
),
r0 AS (SELECT node, CAST({scale} AS BIGINT) AS r FROM nodes),
{",".join(steps)}
SELECT node, r AS rank_scaled FROM {prev}
"""


@_register("graph_pagerank_knn", _pagerank_oracle_sql(3, 1_000_000, 85, 100))
def graph_pagerank_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from whatsapp_vectordb_spark.operators.ann import knn_graph_lsh
    from whatsapp_vectordb_spark.operators.graph import pagerank

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    edges = knn_graph_lsh(emb, k=5, n_planes=32, bands=4, impl="numpy", dim=64).select(
        "src", F.col("nbr").alias("dst")
    )
    return pagerank(edges, iters=3, scale=1_000_000, damping_num=85, damping_den=100)


# ==========================================================================
# Round 3: streaming IVF maintenance (streaming/ops.py
# run_ivf_maintenance_stream) — bootstrap quantizer on history, stream the
# rest through foreachBatch with INTEGER-exact nearest-cell assignment.
# The oracle recomputes every assignment from the PERSISTED centroids with
# the same quantized integer L2 (ties → lower centroid id), proving the
# incremental stream state equals a from-scratch build.
# ==========================================================================

_IVF_STREAM_DIR = _oracle_scratch("ivf_stream_oracle")

_IVF_STREAM_ORACLE = f"""
WITH cents AS (
  SELECT centroid, cvec FROM read_parquet('{_IVF_STREAM_DIR}/centroids/*.parquet')
),
qv AS (
  SELECT vec_id, i.i AS pos,
         CAST(round(embedding[i.i + 1]::DOUBLE * 1000000) AS BIGINT) AS q
  FROM embeddings CROSS JOIN range(0,64) i(i)
),
qc AS (
  SELECT centroid, i.i AS pos,
         CAST(round(cvec[i.i + 1]::DOUBLE * 1000000) AS BIGINT) AS q
  FROM cents CROSS JOIN range(0,64) i(i)
),
d AS (
  SELECT v.vec_id, c.centroid, SUM((v.q - c.q) * (v.q - c.q)) AS dist
  FROM qv v JOIN qc c ON v.pos = c.pos GROUP BY 1, 2
),
a AS (
  SELECT vec_id, centroid FROM (
    SELECT vec_id, centroid,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist ASC, centroid ASC) AS rn
    FROM d
  ) WHERE rn = 1
)
SELECT CAST(centroid AS BIGINT) AS centroid, COUNT(*) AS n_vectors
FROM a GROUP BY 1
"""


@_register("streaming_ivf_maintenance", _IVF_STREAM_ORACLE)
def streaming_ivf_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from whatsapp_vectordb_spark.streaming.ops import run_ivf_maintenance_stream

    return run_ivf_maintenance_stream(
        spark, os.path.join(sf_dir, "embeddings.parquet"), _IVF_STREAM_DIR
    )


# ==========================================================================
# Round 3: histogram quantiles (operators/sketches.py histogram_quantiles)
# — fixed-width mergeable histogram, integer-exact rank selection; the
# portable answer to percentile_approx (whose interpolation is
# implementation-defined and hence un-oracle-able).
# ==========================================================================

@_register(
    "events_value_quantiles",
    """
WITH b AS (
  SELECT event_type, CAST(floor(value::DOUBLE * 10) AS BIGINT) AS bin
  FROM events
),
counts AS (SELECT event_type, bin, COUNT(*) AS c FROM b GROUP BY 1, 2),
cum AS (
  SELECT event_type, bin, c,
         SUM(c) OVER (PARTITION BY event_type ORDER BY bin
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM counts
),
totals AS (SELECT event_type, SUM(c) AS total FROM counts GROUP BY 1),
pcts AS (SELECT unnest([50, 90, 99]) AS pct),
hit AS (
  SELECT cu.event_type, p.pct, MIN(cu.bin) AS qbin
  FROM cum cu JOIN totals t ON t.event_type = cu.event_type
  CROSS JOIN pcts p
  WHERE cu.cum >= (p.pct * t.total + 99) // 100
  GROUP BY 1, 2
)
SELECT event_type, CAST(pct AS INTEGER) AS pct,
       ROUND((qbin + 1) / 10.0, 6) AS quantile_est
FROM hit
""",
)
def events_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from whatsapp_vectordb_spark.operators.sketches import histogram_quantiles

    return histogram_quantiles(
        _t(spark, sf_dir, "events"), value_col="value", group_col="event_type"
    )


# ==========================================================================
# Round 3: sparse TF-IDF cosine similarity join (operators/textops.py
# tfidf_cosine_pairs) — inverted-index candidate join + integer-exact
# scoring (IDF quantized per term, weights BIGINT). Augmented corpus so
# real above-threshold pairs exist at fixture scale.
# ==========================================================================

@_register(
    "text_tfidf_cosine_pairs",
    f"""
WITH corpus AS ({_AUG_SQL}),
toks AS (SELECT doc_id, {_TOKS.format(c='text')} AS tk FROM corpus),
t AS (SELECT doc_id, unnest(tk) AS term FROM toks),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM t GROUP BY 1, 2),
nd AS (SELECT COUNT(*) AS n_docs FROM corpus),
dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
iqt AS (
  SELECT term, df,
         CAST(round((ln((nd.n_docs + 1.0) / (df + 1)) + 1.0) * 10000) AS BIGINT) AS iq
  FROM dfreq, nd
),
w AS (
  SELECT tf.doc_id, tf.term, tf.tf * i.iq AS w, i.df
  FROM tf JOIN iqt i ON tf.term = i.term
),
rare AS (SELECT doc_id, term FROM w WHERE df <= 100),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM rare a JOIN rare b ON a.term = b.term AND a.doc_id < b.doc_id
),
norms AS (SELECT doc_id, SUM(w * w) AS n2 FROM w GROUP BY 1),
num AS (
  SELECT c.id_a, c.id_b, SUM(wa.w * wb.w) AS num
  FROM cand c
  JOIN w wa ON wa.doc_id = c.id_a
  JOIN w wb ON wb.doc_id = c.id_b AND wb.term = wa.term
  GROUP BY 1, 2
)
SELECT u.id_a, u.id_b,
       ROUND(u.num::DOUBLE / (sqrt(na.n2::DOUBLE) * sqrt(nb.n2::DOUBLE)), 6) AS cos_sim
FROM num u
JOIN norms na ON na.doc_id = u.id_a
JOIN norms nb ON nb.doc_id = u.id_b
WHERE ROUND(u.num::DOUBLE / (sqrt(na.n2::DOUBLE) * sqrt(nb.n2::DOUBLE)), 6) >= 0.6
""",
)
def text_tfidf_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from whatsapp_vectordb_spark.operators.textops import tfidf_cosine_pairs

    return tfidf_cosine_pairs(
        _augmented_docs(spark, sf_dir), threshold=0.6, max_df_candidates=100
    )


# ==========================================================================
# Round 3: Z-order layout planning (operators/layout.py) — Morton-key
# clustering + deterministic ntile file assignment; the output is the
# per-file min/max envelope (the parquet-footer stats a 2-D predicate
# would prune with). Pure integer bit math — bit-identical in SQL.
# ==========================================================================

def _morton_sql(x: str, y: str, bits: int = 16) -> str:
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


@_register(
    "events_zorder_layout",
    f"""
WITH keyed AS (
  SELECT user_id AS x, CAST(floor(value::DOUBLE * 10) AS BIGINT) AS y, event_id,
         {_morton_sql('user_id', 'CAST(floor(value::DOUBLE * 10) AS BIGINT)')} AS z
  FROM events
),
assigned AS (
  SELECT x, y, NTILE(16) OVER (ORDER BY z ASC, event_id ASC) AS file_id
  FROM keyed
)
SELECT CAST(file_id AS INTEGER) AS file_id, COUNT(*) AS n_rows,
       MIN(x) AS min_x, MAX(x) AS max_x, MIN(y) AS min_y, MAX(y) AS max_y
FROM assigned GROUP BY 1
""",
)
def events_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    from whatsapp_vectordb_spark.operators.layout import zorder_file_stats

    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.floor(F.col("value").cast("double") * 10).cast("long").alias("vbin"),
    )
    return zorder_file_stats(
        ev, x_col="user_id", y_col="vbin", order_id_col="event_id", n_files=16
    )


# ==========================================================================
# Round 3: PSI drift detection (operators/sketches.py population_stability)
# — per-type drift between the "last snapshot" (user_id < 750) and a
# deterministically drifted current population (value × 1.25 for the
# rest). Bin PSI terms are integer-quantized before summation, so the
# cross-bin sum is associative and engine-exact.
# ==========================================================================

@_register(
    "events_value_drift",
    """
WITH ref AS (
  SELECT event_type, CAST(floor(value::DOUBLE * 10) AS BIGINT) AS bin
  FROM events WHERE user_id < 750
),
cur AS (
  SELECT event_type, CAST(floor(value::DOUBLE * 1.25 * 10) AS BIGINT) AS bin
  FROM events WHERE user_id >= 750
),
br AS (SELECT event_type AS g, bin, COUNT(*) AS c_r FROM ref GROUP BY 1, 2),
bc AS (SELECT event_type AS g, bin, COUNT(*) AS c_c FROM cur GROUP BY 1, 2),
j AS (
  SELECT COALESCE(br.g, bc.g) AS g, COALESCE(br.bin, bc.bin) AS bin,
         COALESCE(c_r, 0) AS c_r, COALESCE(c_c, 0) AS c_c
  FROM br FULL OUTER JOIN bc ON br.g = bc.g AND br.bin = bc.bin
),
t AS (SELECT g, SUM(c_r) AS t_r, SUM(c_c) AS t_c, COUNT(*) AS n_bins FROM j GROUP BY 1),
terms AS (
  SELECT j.g, t.n_bins,
         CAST(round(
           ((c_c + 1.0) / (t_c + n_bins) - (c_r + 1.0) / (t_r + n_bins))
           * ln(((c_c + 1.0) / (t_c + n_bins)) / ((c_r + 1.0) / (t_r + n_bins)))
           * 1000000000) AS BIGINT) AS tq
  FROM j JOIN t ON j.g = t.g
)
SELECT g AS event_type, n_bins, ROUND(SUM(tq) / 1000000000.0, 6) AS psi
FROM terms GROUP BY 1, 2
""",
)
def events_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from whatsapp_vectordb_spark.operators.sketches import population_stability

    ev = _t(spark, sf_dir, "events")
    ref = ev.where(F.col("user_id") < 750)
    cur = ev.where(F.col("user_id") >= 750).withColumn(
        "value", F.col("value").cast("double") * 1.25
    )
    return population_stability(ref, cur, value_col="value", group_col="event_type")


# ==========================================================================
# Round 3: OPQ + residual IVF-PQ composition (operators/ann.py
# OpqIvfPqIndex) — the FAISS "OPQm,IVFc,PQm" recipe: learned rotation,
# then coarse cells + residual codes in rotated space. The probe is the
# identical integer-LUT ADC scan, replayed by the oracle over persisted
# cells + LUTs.
# ==========================================================================

_OPQ_IVFPQ_DIR = _oracle_scratch("opq_ivfpq_oracle")

_ANN_OPQ_IVFPQ_ORACLE = f"""
WITH cells AS (
  SELECT * FROM read_parquet('{_OPQ_IVFPQ_DIR}/cells/*/*.parquet', hive_partitioning = 1)
),
probes AS (SELECT centroid FROM read_parquet('{_OPQ_IVFPQ_DIR}/probe/*.parquet')),
lut AS (SELECT * FROM read_parquet('{_OPQ_IVFPQ_DIR}/lut/*.parquet')),
s AS (
  SELECT c.vec_id, CAST(SUM(l.w) AS BIGINT) AS score
  FROM cells c
  JOIN probes p ON CAST(c.centroid AS BIGINT) = CAST(p.centroid AS BIGINT)
  CROSS JOIN range(0,8) j(j)
  JOIN lut l ON CAST(l.centroid AS BIGINT) = CAST(c.centroid AS BIGINT)
            AND l.j = j.j AND l.c = c.codes[j.j + 1]
  GROUP BY 1
)
SELECT vec_id, score FROM s
ORDER BY score ASC, vec_id ASC
LIMIT 10
"""


@_register("ann_opq_ivfpq_topk", _ANN_OPQ_IVFPQ_ORACLE)
def ann_opq_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from whatsapp_vectordb_spark.operators.ann import OpqIvfPqIndex

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    qvec = emb.where(F.col("vec_id") == 0).head()["embedding"]
    idx = OpqIvfPqIndex.build(
        emb, n_centroids=8, m=8, ksub=16, sample_rows=500, opq_iters=4
    )
    idx.encode(emb).write.partitionBy("centroid").mode("overwrite").parquet(
        os.path.join(_OPQ_IVFPQ_DIR, "cells")
    )
    cells = idx.probe_cells(qvec, nprobe=2)
    spark.createDataFrame([(int(c),) for c in cells], "centroid bigint").coalesce(
        1
    ).write.mode("overwrite").parquet(os.path.join(_OPQ_IVFPQ_DIR, "probe"))
    luts = idx.luts_int(qvec, cells)
    rows = [
        (int(c), j, k, int(luts[c][j, k]))
        for c in cells
        for j in range(luts[c].shape[0])
        for k in range(luts[c].shape[1])
    ]
    spark.createDataFrame(rows, "centroid bigint, j int, c int, w bigint").coalesce(
        1
    ).write.mode("overwrite").parquet(os.path.join(_OPQ_IVFPQ_DIR, "lut"))
    stored = spark.read.parquet(os.path.join(_OPQ_IVFPQ_DIR, "cells"))
    return idx.probe(stored, qvec, k=10, nprobe=2)


# ==========================================================================
# Round 3: diversity sampling (assign_cells_quantized + stratified_cap
# composed) — uniform coverage of embedding space instead of density-
# proportional sampling: cap each quantizer cell at 40 hash-ranked rows.
# The oracle replays the integer-exact assignment from the persisted
# centroids, then the same hash-ranked cap.
# ==========================================================================

_DIVERSE_DIR = _oracle_scratch("diverse_sample_oracle")

_DIVERSE_ORACLE = f"""
WITH cents AS (
  SELECT centroid, cvec FROM read_parquet('{_DIVERSE_DIR}/centroids/*.parquet')
),
qv AS (
  SELECT vec_id, i.i AS pos,
         CAST(round(embedding[i.i + 1]::DOUBLE * 1000000) AS BIGINT) AS q
  FROM embeddings CROSS JOIN range(0,64) i(i)
),
qc AS (
  SELECT centroid, i.i AS pos,
         CAST(round(cvec[i.i + 1]::DOUBLE * 1000000) AS BIGINT) AS q
  FROM cents CROSS JOIN range(0,64) i(i)
),
d AS (
  SELECT v.vec_id, c.centroid, SUM((v.q - c.q) * (v.q - c.q)) AS dist
  FROM qv v JOIN qc c ON v.pos = c.pos GROUP BY 1, 2
),
a AS (
  SELECT vec_id, centroid FROM (
    SELECT vec_id, centroid,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist ASC, centroid ASC) AS rn
    FROM d
  ) WHERE rn = 1
),
r AS (
  SELECT vec_id, centroid,
         ROW_NUMBER() OVER (
           PARTITION BY centroid
           ORDER BY ('0x' || substr(md5('0:' || CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT % 10000,
                    vec_id
         ) AS rk
  FROM a
)
SELECT vec_id, CAST(centroid AS BIGINT) AS centroid FROM r WHERE rk <= 40
"""


@_register("sample_diverse_embeddings", _DIVERSE_ORACLE)
def sample_diverse_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversity sampling: uniform coverage across quantizer cells (cap 40
    per cell, hash-ranked) — keeps rare regions of embedding space that a
    uniform-random sample would starve. Map-only assignment (broadcast
    centroids) + one window per cell."""
    from whatsapp_vectordb_spark.operators.ann import IvfIndex, assign_cells_quantized
    from whatsapp_vectordb_spark.operators.sampling import stratified_cap

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    built = IvfIndex.build(emb, n_centroids=8)
    cents_path = os.path.join(_DIVERSE_DIR, "centroids")
    spark.createDataFrame(
        [(int(i), [float(x) for x in c]) for i, c in enumerate(built.centroids)],
        "centroid bigint, cvec array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(cents_path)
    cents = spark.read.parquet(cents_path)
    assigned = assign_cells_quantized(emb, cents).select("vec_id", "centroid")
    return stratified_cap(assigned, "centroid", "vec_id", n_per_group=40)


# Round 6: ONE full Lloyd iteration oracle-checked end to end — seeds are
# the first 8 stored vectors (deterministic, no RNG), assignment is the
# integer-exact quantized argmin, and the centroid UPDATE is reported as
# exact integer aggregates (member count, component sum, position-weighted
# component sum). Until now only the PROBE phases of k-means-built indexes
# were oracle-checked; this pins the clustering math itself.
_KM_SCALE = 1_000_000
_KM_K = 8


@_register(
    "cluster_kmeans_step",
    f"""
WITH q AS (
  SELECT vec_id, i.i AS pos,
         CAST(round(embedding[i.i + 1]::DOUBLE * {_KM_SCALE}) AS BIGINT) AS qv
  FROM embeddings CROSS JOIN range(0, 64) i(i)
),
seeds AS (SELECT vec_id AS centroid, pos, qv FROM q WHERE vec_id < {_KM_K}),
d AS (
  SELECT v.vec_id, s.centroid, SUM((v.qv - s.qv) * (v.qv - s.qv)) AS d2
  FROM q v JOIN seeds s ON v.pos = s.pos
  GROUP BY 1, 2
),
assign AS (
  SELECT vec_id, centroid FROM (
    SELECT vec_id, centroid,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2 ASC, centroid ASC) AS r
    FROM d
  ) WHERE r = 1
)
SELECT a.centroid,
       CAST(COUNT(DISTINCT a.vec_id) AS BIGINT) AS n_members,
       CAST(SUM(q.qv) AS BIGINT) AS qsum,
       CAST(SUM((q.pos + 1) * q.qv) AS BIGINT) AS qsum_weighted
FROM assign a JOIN q ON q.vec_id = a.vec_id
GROUP BY 1
""",
)
def cluster_kmeans_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd's iteration as a first-class distributed op: broadcast the k
    seed centroids, integer-quantized argmin assignment (map-only,
    codegen'd — operators/ann.assign_cells_quantized), then ONE shuffle
    keyed by centroid for the update aggregates. The new centroid is
    qsum/n per component; the position-weighted sum pins the full update
    vector without emitting 64 columns. At 100 TB this is exactly the
    per-iteration shape of distributed k-means: map + one k-row-bounded
    aggregate."""
    from whatsapp_vectordb_spark.operators.ann import assign_cells_quantized

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    seeds = emb.where(F.col("vec_id") < _KM_K).select(
        F.col("vec_id").alias("centroid"), F.col("embedding").alias("cvec")
    )
    assigned = assign_cells_quantized(emb, seeds).select("vec_id", "centroid")
    qcomp = emb.select(
        "vec_id",
        F.posexplode(
            F.transform(
                "embedding",
                lambda x: F.round(x.cast("double") * _KM_SCALE).cast("long"),
            )
        ).alias("pos", "qv"),
    )
    return (
        assigned.join(qcomp, "vec_id")
        .groupBy("centroid")
        .agg(
            F.count_distinct("vec_id").cast("long").alias("n_members"),
            F.sum("qv").cast("long").alias("qsum"),
            F.sum((F.col("pos") + 1) * F.col("qv")).cast("long").alias("qsum_weighted"),
        )
    )


# Round 7: Lloyd to CONVERGENCE — the multi-iteration loop over the single
# step pinned above. Seeds, argmin, and the floor(qsum/n + 0.5) HALF_UP
# update are engine-portable integer/IEEE-exact math, so the DuckDB oracle
# UNROLLS the iterations as chained CTEs and must land on bit-identical
# centroids, memberships, and L1 movement. Empty cells carry forward.
_KM_ITERS = 2


def _kmeans_converge_sql(k: int, iters: int, scale: int, dim: int = 64) -> str:
    parts = [
        f"""q AS (
  SELECT vec_id, i.i AS pos,
         CAST(round(embedding[i.i + 1]::DOUBLE * {scale}) AS BIGINT) AS qv
  FROM embeddings CROSS JOIN range(0, {dim}) i(i)
),
c0 AS (SELECT vec_id AS centroid, pos, qv AS qc FROM q WHERE vec_id < {k})"""
    ]
    for t in range(1, iters + 1):
        parts.append(
            f"""a{t} AS (
  SELECT vec_id, centroid FROM (
    SELECT vec_id, centroid,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2 ASC, centroid ASC) AS r
    FROM (SELECT v.vec_id, c.centroid, SUM((v.qv - c.qc) * (v.qv - c.qc)) AS d2
          FROM q v JOIN c{t - 1} c ON v.pos = c.pos GROUP BY 1, 2)
  ) WHERE r = 1
),
u{t} AS (
  SELECT a.centroid, q.pos,
         CAST(FLOOR(SUM(q.qv)::DOUBLE / COUNT(*) + 0.5) AS BIGINT) AS qc
  FROM a{t} a JOIN q ON q.vec_id = a.vec_id
  GROUP BY 1, 2
),
c{t} AS (
  SELECT p.centroid, p.pos, COALESCE(u.qc, p.qc) AS qc
  FROM c{t - 1} p LEFT JOIN u{t} u ON u.centroid = p.centroid AND u.pos = p.pos
)"""
        )
    t = iters
    parts.append(
        f"""afin AS (
  SELECT vec_id, centroid FROM (
    SELECT vec_id, centroid,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2 ASC, centroid ASC) AS r
    FROM (SELECT v.vec_id, c.centroid, SUM((v.qv - c.qc) * (v.qv - c.qc)) AS d2
          FROM q v JOIN c{t} c ON v.pos = c.pos GROUP BY 1, 2)
  ) WHERE r = 1
),
m AS (SELECT centroid, COUNT(*) AS n FROM afin GROUP BY 1),
fin AS (
  SELECT centroid, CAST(SUM(qc) AS BIGINT) AS qc_sum,
         CAST(SUM((pos + 1) * qc) AS BIGINT) AS qc_sum_weighted
  FROM c{t} GROUP BY 1
),
mv AS (
  SELECT a.centroid, CAST(SUM(ABS(a.qc - b.qc)) AS BIGINT) AS movement
  FROM c{t} a JOIN c{t - 1} b ON b.centroid = a.centroid AND b.pos = a.pos
  GROUP BY 1
)"""
    )
    body = ",\n".join(parts)
    return f"""
WITH {body}
SELECT f.centroid, CAST(COALESCE(m.n, 0) AS BIGINT) AS n_members,
       f.qc_sum, f.qc_sum_weighted, mv.movement
FROM fin f LEFT JOIN m ON m.centroid = f.centroid
JOIN mv ON mv.centroid = f.centroid
"""


@_register("cluster_kmeans_converge", _kmeans_converge_sql(_KM_K, _KM_ITERS, _KM_SCALE))
def cluster_kmeans_converge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The k-means convergence loop (operators/ann.kmeans_lloyd): each
    iteration is one broadcast-argmin pass plus one k·d-bounded aggregate
    collected to the driver (the MLlib contract — centroids live on the
    driver, data never does), with empty-cell carry-forward and an exact
    integer L1 movement per centroid. The oracle replays the SAME math as
    unrolled CTEs; every value (memberships, centroid checksums, movement)
    must match bit-for-bit, which it can because the update rule is
    quantized-integer + exactly-rounded IEEE division, not float
    accumulation."""
    from whatsapp_vectordb_spark.operators.ann import kmeans_lloyd

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cents, assigned, movement = kmeans_lloyd(emb, k=_KM_K, iters=_KM_ITERS, scale=_KM_SCALE)
    counts = assigned.groupBy("centroid").agg(F.count("*").cast("long").alias("n_members"))
    summary = spark.createDataFrame(
        [
            (
                cid,
                sum(qc),
                sum((j + 1) * x for j, x in enumerate(qc)),
                movement[cid],
            )
            for cid, qc in cents
        ],
        "centroid bigint, qc_sum bigint, qc_sum_weighted bigint, movement bigint",
    )
    return (
        summary.join(counts, "centroid", "left")
        .select(
            "centroid",
            F.coalesce(F.col("n_members"), F.lit(0)).cast("long").alias("n_members"),
            "qc_sum",
            "qc_sum_weighted",
            "movement",
        )
    )


# ==========================================================================
# Round 4: corpus-curation operators (operators/curate.py) — the standard
# pretraining-pipeline stages: boilerplate line removal (CCNet/C4),
# concat-and-chunk sequence packing (distributed prefix sum), snapshot
# diff, SCD2 versioned merge, hard-negative mining.
# ==========================================================================

# Documents have no newlines, so "lines" are synthesized deterministically
# as 8-token chunks — the operator is generic over any (doc, line_no,
# line) frame; the fixture mirrors _media_df's synthesis pattern.
_LINE_TOKS = 8

# Per-row LATERAL range bound (ceil(len/8)) instead of a fixed CROSS JOIN
# cap: exact for ANY document length, so regenerated testdata with longer
# docs can't silently diverge from the unbounded Spark operator.
_LINE_SQL = f"""
  SELECT doc_id, CAST(i.i AS BIGINT) AS line_no,
         array_to_string(tk[1 + {_LINE_TOKS} * i.i : {_LINE_TOKS} + {_LINE_TOKS} * i.i], ' ') AS line
  FROM (SELECT doc_id, {_TOKS.format(c='text')} AS tk FROM documents) t,
       LATERAL unnest(range(0, CAST(ceil(len(tk) / {_LINE_TOKS}.0) AS BIGINT))) i(i)
"""


def _doc_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    from whatsapp_vectordb_spark.functions.text import tokens

    docs = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", tokens("text").alias("_tk"))
        # token-less docs have no lines (F.sequence(0, -1) would DESCEND);
        # the oracle's `8*i < len(tk)` filter drops them identically
        .where(F.size("_tk") > 0)
    )
    n_lines = F.ceil(F.size("_tk") / F.lit(_LINE_TOKS)).cast("int")
    return docs.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_lines - 1),
                lambda i: F.array_join(
                    F.slice(F.col("_tk"), i * _LINE_TOKS + 1, _LINE_TOKS), " "
                ),
            )
        ).alias("line_no", "line"),
    ).select("doc_id", F.col("line_no").cast("long").alias("line_no"), "line")


@_register(
    "text_line_dedup",
    f"""
WITH lines AS ({_LINE_SQL}),
h AS (SELECT doc_id, line_no, line, md5(trim(lower(line))) AS lh FROM lines),
rec AS (
  SELECT lh FROM h GROUP BY lh HAVING COUNT(DISTINCT doc_id) >= 2
),
fl AS (
  SELECT h.doc_id, h.line_no, h.line, (rec.lh IS NOT NULL) AS dup
  FROM h LEFT JOIN rec ON h.lh = rec.lh
)
SELECT doc_id,
       COUNT(*) FILTER (WHERE NOT dup) AS n_lines_kept,
       COUNT(*) FILTER (WHERE dup) AS n_lines_dropped,
       COALESCE(string_agg(CASE WHEN NOT dup THEN line END, ' ' ORDER BY line_no), '')
         AS cleaned_text
FROM fl GROUP BY doc_id
""",
)
def text_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet/C4-style boilerplate removal: drop lines recurring across ≥2
    distinct docs, reassemble the rest in order. One hash-count shuffle +
    one hash join + one reassembly groupBy — linear in corpus lines."""
    from whatsapp_vectordb_spark.operators.curate import duplicate_line_removal

    return duplicate_line_removal(_doc_lines(spark, sf_dir), min_docs=2)


@_register(
    "pack_sequences_blocks",
    """
WITH d AS (
  SELECT doc_id,
         CAST(len({toks}) AS BIGINT) AS n_tokens
  FROM documents
),
c AS (
  -- CAST: DuckDB SUM(BIGINT) yields HUGEINT; the driver's value-hash is
  -- type-sensitive and Spark emits BIGINT, so pin every derived column.
  SELECT doc_id, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
  FROM d
)
SELECT doc_id, n_tokens, cum_before,
       CAST(cum_before // 128 AS BIGINT) AS start_block,
       CAST((cum_before + n_tokens - 1) // 128 AS BIGINT) AS end_block,
       CAST(((cum_before + n_tokens - 1) // 128) - (cum_before // 128) + 1 AS BIGINT) AS n_blocks
FROM c
""".format(toks=_TOKS.format(c="text")),
)
def pack_sequences_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style concat-and-chunk packing plan (seq_len=128): per-doc
    block spans from a two-phase DISTRIBUTED prefix sum — no global
    single-partition window (operators/curate.py ordered_prefix_sum)."""
    from whatsapp_vectordb_spark.functions.text import tokens
    from whatsapp_vectordb_spark.operators.curate import pack_sequences

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.size(tokens("text")).cast("long").alias("n_tokens")
    )
    return pack_sequences(docs, seq_len=128)


@_register(
    "docs_snapshot_diff",
    """
WITH old AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 19 <> 5
),
new AS (
  SELECT doc_id,
         CASE WHEN doc_id % 13 = 2 THEN text || ' v2' ELSE text END AS text
  FROM documents WHERE doc_id % 17 <> 3
),
o AS (SELECT doc_id, md5(text) AS h FROM old),
n AS (SELECT doc_id, md5(text) AS h FROM new)
SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
       CASE WHEN o.doc_id IS NULL THEN 'added'
            WHEN n.doc_id IS NULL THEN 'removed'
            WHEN o.h <> n.h THEN 'changed'
            ELSE 'same' END AS status
FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
""",
)
def docs_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus snapshot diff: old/new versions synthesized deterministically
    from `documents` (identically in both engines), statuses from one
    hash-only full-outer join (operators/curate.py dataset_diff)."""
    from whatsapp_vectordb_spark.operators.curate import dataset_diff

    docs = _t(spark, sf_dir, "documents")
    old = docs.where(F.col("doc_id") % 19 != 5).select("doc_id", "text")
    new = docs.where(F.col("doc_id") % 17 != 3).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 13 == 2, F.concat(F.col("text"), F.lit(" v2"))
        ).otherwise(F.col("text")).alias("text"),
    )
    return dataset_diff(old, new, "doc_id", ["text"])


@_register(
    "customer_scd2_versions",
    """
WITH chg AS (
  SELECT c_custkey, 'SEG_A' AS c_mktsegment, 1 AS eff_seq
  FROM customer WHERE c_custkey % 5 = 0
  UNION ALL
  SELECT c_custkey, 'SEG_B', 2 FROM customer WHERE c_custkey % 10 = 0
  UNION ALL
  SELECT c_custkey, 'SEG_B', 3 FROM customer WHERE c_custkey % 20 = 0
),
v AS (
  SELECT c_custkey, c_mktsegment, CAST(0 AS BIGINT) AS eff_seq FROM customer
  UNION ALL
  SELECT c_custkey, c_mktsegment, CAST(eff_seq AS BIGINT) FROM chg
),
d AS (
  SELECT *, lag(c_mktsegment) OVER (PARTITION BY c_custkey ORDER BY eff_seq) AS prev
  FROM v
),
kept AS (
  SELECT c_custkey, c_mktsegment, eff_seq FROM d
  WHERE prev IS NULL OR prev <> c_mktsegment
)
SELECT c_custkey, c_mktsegment,
       eff_seq AS valid_from_seq,
       lead(eff_seq) OVER (PARTITION BY c_custkey ORDER BY eff_seq) AS valid_to_seq
FROM kept
""",
)
def customer_scd2_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 merge: fold a 3-step deterministic change batch into a
    validity-interval history of customer segments. No-op changes collapse
    (seq-3 re-asserts seq-2's value → no new version). One shuffle by key
    (operators/curate.py scd2_apply)."""
    from whatsapp_vectordb_spark.operators.curate import scd2_apply

    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    k = F.col("c_custkey")
    changes = (
        cust.where(k % 5 == 0).select(k.alias("c_custkey"), F.lit("SEG_A").alias("c_mktsegment"), F.lit(1).alias("eff_seq"))
        .unionByName(cust.where(k % 10 == 0).select(k.alias("c_custkey"), F.lit("SEG_B").alias("c_mktsegment"), F.lit(2).alias("eff_seq")))
        .unionByName(cust.where(k % 20 == 0).select(k.alias("c_custkey"), F.lit("SEG_B").alias("c_mktsegment"), F.lit(3).alias("eff_seq")))
    )
    return scd2_apply(cust, changes, "c_custkey", ["c_mktsegment"])


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


# ==========================================================================
# Round 4: dimensionality reduction (operators/projection.py) — JL random
# projection (stateless, md5-derived ±1 signs, integer-exact in both
# engines) and sample-trained exact PCA (persisted-components oracle).
# ==========================================================================

_JL_SEED, _JL_IN, _JL_OUT = 7, 64, 16


@_register(
    "ann_jl_topk",
    f"""
WITH px AS (
  SELECT e.vec_id, j.j AS j,
         SUM(CAST(round(e.embedding[i.i + 1]::DOUBLE * 1000000) AS BIGINT) *
             CASE WHEN ('0x' || substr(md5('{_JL_SEED}_' || i.i || '_' || j.j), 1, 1))::INT % 2 = 0
                  THEN 1 ELSE -1 END) AS p
  FROM embeddings e
  CROSS JOIN range(0, {_JL_IN}) i(i)
  CROSS JOIN range(0, {_JL_OUT}) j(j)
  GROUP BY 1, 2
),
q AS (SELECT j, p AS qp FROM px WHERE vec_id = 0),
sc AS (
  SELECT px.vec_id,
         SUM(px.p * q.qp) AS dot,
         SUM(px.p * px.p) AS nv,
         SUM(q.qp * q.qp) AS nq
  FROM px JOIN q ON px.j = q.j
  GROUP BY 1
)
SELECT vec_id, ROUND(dot / (sqrt(nv) * sqrt(nq)), 6) AS score
FROM sc WHERE nv > 0
ORDER BY score DESC, vec_id ASC
LIMIT 10
""",
)
def ann_jl_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss pre-filter tier: 64→16-dim ±1 projection
    (integer-exact), exact cosine top-10 in the PROJECTED space. Stateless
    — the sign matrix is a pure function of (seed, i, j), so the oracle
    regenerates it instead of replaying persisted state. Map-only
    projection; top-k is the usual no-shuffle TakeOrderedAndProject."""
    from whatsapp_vectordb_spark.operators.projection import jl_project

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    proj = jl_project(emb, _JL_IN, _JL_OUT, seed=_JL_SEED)
    qproj = [int(v) for v in proj.where(F.col("vec_id") == 0).head()["proj"]]
    nq = sum(v * v for v in qproj)
    qcol = F.lit(qproj).cast("array<long>")
    dot = F.aggregate(
        F.zip_with(F.col("proj"), qcol, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    nv = F.aggregate(
        F.zip_with(F.col("proj"), F.col("proj"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    scored = proj.select(
        "vec_id",
        F.round(
            dot.cast("double") / (F.sqrt(nv.cast("double")) * F.sqrt(F.lit(float(nq)))),
            6,
        ).alias("score"),
        nv.alias("_nv"),
    ).where(F.col("_nv") > 0)
    return (
        scored.orderBy(F.col("score").desc(), F.col("vec_id").asc())
        .limit(10)
        .select("vec_id", "score")
    )


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
    spark.createDataFrame(
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
    return spark.createDataFrame(
        out, "n_remaining bigint, id_checksum bigint, n_deleted bigint"
    )


# ==========================================================================
# Round 4: late-interaction (ColBERT MaxSim) retrieval — per-token integer
# vectors, score = Σ_q max_t <q,t>, exact BIGINT end to end.
# ==========================================================================

_MAXSIM_QUERY = "spark window join"
_MAXSIM_DIM, _MAXSIM_SEED = 16, 11


def _maxsim_oracle() -> str:
    from whatsapp_vectordb_spark.functions.text import py_tokens

    # MUST mirror maxsim_search's query tokenization (shared py_tokens)
    qtoks = py_tokens(_MAXSIM_QUERY, unique=True)
    qvals = ", ".join(f"('{t}')" for t in qtoks)
    return f"""
WITH pairs AS (
  SELECT DISTINCT doc_id, unnest({_TOKS.format(c='text')}) AS tok FROM documents
),
qt AS (SELECT * FROM (VALUES {qvals}) q(qtok)),
dots AS (
  SELECT p.doc_id, p.tok, q.qtok,
         SUM(
           ((('0x' || substr(md5('{_MAXSIM_SEED}:' || p.tok || ':' || d.d), 1, 4))::BIGINT % 2001) - 1000)
           *
           ((('0x' || substr(md5('{_MAXSIM_SEED}:' || q.qtok || ':' || d.d), 1, 4))::BIGINT % 2001) - 1000)
         ) AS dot
  FROM pairs p CROSS JOIN qt q CROSS JOIN range(0, {_MAXSIM_DIM}) d(d)
  GROUP BY 1, 2, 3
),
mx AS (SELECT doc_id, qtok, MAX(dot) AS m FROM dots GROUP BY 1, 2)
SELECT doc_id, CAST(SUM(m) AS BIGINT) AS score
FROM mx GROUP BY doc_id
ORDER BY score DESC, doc_id ASC
LIMIT 10
"""


@_register("text_maxsim_topk", _maxsim_oracle())
def text_maxsim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-interaction retrieval (operators/textops.py maxsim_search):
    each token is its own vector; a doc scores by covering EVERY query
    facet (Σ of per-query-token maxes), not by its average direction.
    Integer token embeddings make the whole pipeline BIGINT-exact."""
    from whatsapp_vectordb_spark.operators.textops import maxsim_search

    docs = _t(spark, sf_dir, "documents")
    return maxsim_search(
        docs, _MAXSIM_QUERY, k=10, dim=_MAXSIM_DIM, seed=_MAXSIM_SEED
    )


# ==========================================================================
# Round 4: streaming drift monitor — per-batch histogram sketches appended
# via foreachBatch, merged by sum (mergeable), PSI vs the batch reference.
# Oracle = the SAME SQL as the batch events_value_drift: a sum-mergeable
# sketch makes stream accumulation ≡ one-shot computation.
# ==========================================================================


@_register(
    "streaming_drift_monitor",
    """
WITH ref AS (
  SELECT event_type, CAST(floor(value::DOUBLE * 10) AS BIGINT) AS bin
  FROM events WHERE user_id < 750
),
cur AS (
  SELECT event_type, CAST(floor(value::DOUBLE * 1.25 * 10) AS BIGINT) AS bin
  FROM events WHERE user_id >= 750
),
br AS (SELECT event_type AS g, bin, COUNT(*) AS c_r FROM ref GROUP BY 1, 2),
bc AS (SELECT event_type AS g, bin, COUNT(*) AS c_c FROM cur GROUP BY 1, 2),
j AS (
  SELECT COALESCE(br.g, bc.g) AS g, COALESCE(br.bin, bc.bin) AS bin,
         COALESCE(c_r, 0) AS c_r, COALESCE(c_c, 0) AS c_c
  FROM br FULL OUTER JOIN bc ON br.g = bc.g AND br.bin = bc.bin
),
t AS (SELECT g, SUM(c_r) AS t_r, SUM(c_c) AS t_c, COUNT(*) AS n_bins FROM j GROUP BY 1),
terms AS (
  SELECT j.g, t.n_bins,
         CAST(round(
           ((c_c + 1.0) / (t_c + n_bins) - (c_r + 1.0) / (t_r + n_bins))
           * ln(((c_c + 1.0) / (t_c + n_bins)) / ((c_r + 1.0) / (t_r + n_bins)))
           * 1000000000) AS BIGINT) AS tq
  FROM j JOIN t ON j.g = t.g
)
SELECT g AS event_type, n_bins, ROUND(SUM(tq) / 1000000000.0, 6) AS psi
FROM terms GROUP BY 1, 2
""",
)
def streaming_drift_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drift monitoring as a STREAM: the current population's histogram
    cells accumulate per micro-batch (foreachBatch append), the merged
    sketch is a sum-groupBy, and the final PSI equals the one-shot batch
    answer exactly — sum-mergeable sketches make micro-batching invisible
    (streaming/ops.py run_drift_monitor_stream)."""
    import shutil
    import tempfile

    from whatsapp_vectordb_spark.streaming.ops import run_drift_monitor_stream

    state = _tmp_scratch("wvs_drift_")
    try:
        out = run_drift_monitor_stream(
            spark, os.path.join(sf_dir, "events.parquet"), state
        ).collect()
    finally:
        shutil.rmtree(state, ignore_errors=True)
    return spark.createDataFrame(out, "event_type string, n_bins bigint, psi double")


# ==========================================================================
# Round 4: metadata-filtered kNN (the Pinecone `filter=` query parameter —
# modeled by the reference's metadata map, main.go:41-55) and the JL
# two-stage recall gate.
# ==========================================================================


@_register(
    "knn_topk_filtered",
    """
WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
SELECT e.vec_id, e.label,
       ROUND(list_cosine_similarity(e.embedding::DOUBLE[], q.qv), 6) AS score
FROM embeddings e, q
WHERE e.label = 3
  AND list_cosine_similarity(e.embedding::DOUBLE[], q.qv) IS NOT NULL
ORDER BY score DESC, e.vec_id ASC
LIMIT 10
""",
)
def knn_topk_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-filtered kNN — Pinecone's `filter=` parameter: the
    predicate applies BEFORE scoring, so the filter pushes down to the
    parquet scan and the top-k heap only ever sees matching rows (the
    wrong plan — score-then-filter — would rank the whole index first).
    Asserted by tests/test_plans.py::test_filtered_knn_pushes_predicate."""
    from whatsapp_vectordb_spark.operators.search import topk

    emb = _t(spark, sf_dir, "embeddings")
    qvec = emb.where(F.col("vec_id") == 0).head()["embedding"]
    return topk(
        emb.where(F.col("label") == 3),
        qvec,
        k=10,
        round_to=ROUND_SCORE,
        payload_cols=("label",),
    )


_JLR_DIM, _JLR_SHORTLIST = 32, 200


@_register(
    "ann_jl_recall_gate",
    f"""
WITH px AS (
  SELECT e.vec_id, j.j AS j,
         SUM(CAST(round(e.embedding[i.i + 1]::DOUBLE * 1000000) AS BIGINT) *
             CASE WHEN ('0x' || substr(md5('{_JL_SEED}_' || i.i || '_' || j.j), 1, 1))::INT % 2 = 0
                  THEN 1 ELSE -1 END) AS p
  FROM embeddings e
  CROSS JOIN range(0, {_JL_IN}) i(i)
  CROSS JOIN range(0, {_JLR_DIM}) j(j)
  GROUP BY 1, 2
),
q AS (SELECT j, p AS qp FROM px WHERE vec_id = 0),
jsc AS (
  SELECT px.vec_id,
         ROUND(SUM(px.p * q.qp) / (sqrt(SUM(px.p * px.p)) * sqrt(SUM(q.qp * q.qp))), 6) AS jscore
  FROM px JOIN q ON px.j = q.j
  GROUP BY 1
  HAVING SUM(px.p * px.p) > 0
),
short AS (
  SELECT vec_id FROM jsc ORDER BY jscore DESC, vec_id ASC LIMIT {_JLR_SHORTLIST}
),
qv AS (SELECT embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id = 0),
rer AS (
  SELECT e.vec_id,
         ROUND(list_cosine_similarity(e.embedding::DOUBLE[], qv.v), 6) AS score
  FROM embeddings e JOIN short s ON e.vec_id = s.vec_id CROSS JOIN qv
  ORDER BY score DESC, e.vec_id ASC
  LIMIT 10
),
exact AS (
  SELECT e.vec_id
  FROM embeddings e CROSS JOIN qv
  WHERE list_cosine_similarity(e.embedding::DOUBLE[], qv.v) IS NOT NULL
  ORDER BY ROUND(list_cosine_similarity(e.embedding::DOUBLE[], qv.v), 6) DESC, e.vec_id ASC
  LIMIT 10
)
SELECT CAST(10 AS BIGINT) AS k,
       ROUND(COUNT(*) / 10.0, 6) AS recall
FROM rer JOIN exact ON rer.vec_id = exact.vec_id
""",
)
def ann_jl_recall_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage JL retrieval quality gate: 32-dim projected shortlist-200
    → exact cosine re-rank top-10, recall vs brute-force top-10 (0.9 at
    sf0.01 — the recall number itself is hash-checked; answer quality is
    part of the contract, not a claim). The shortlist stage halves
    bytes-per-row; the re-rank touches 200 rows. Near-tied corpora want
    wider projections/shortlists — the dim-16/50 sweep measured 0.4."""
    from whatsapp_vectordb_spark.operators.projection import jl_project
    from whatsapp_vectordb_spark.operators.search import topk

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    proj = jl_project(emb, _JL_IN, _JLR_DIM, seed=_JL_SEED)
    qrow = proj.where(F.col("vec_id") == 0).head()
    qproj = [int(v) for v in qrow["proj"]]
    nq = sum(v * v for v in qproj)
    qcol = F.lit(qproj).cast("array<long>")
    dot = F.aggregate(
        F.zip_with(F.col("proj"), qcol, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    nv = F.aggregate(
        F.zip_with(F.col("proj"), F.col("proj"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    short = (
        proj.select(
            "vec_id",
            F.round(
                dot.cast("double")
                / (F.sqrt(nv.cast("double")) * F.sqrt(F.lit(float(nq)))),
                6,
            ).alias("jscore"),
            nv.alias("_nv"),
        )
        .where(F.col("_nv") > 0)
        .orderBy(F.col("jscore").desc(), F.col("vec_id").asc())
        .limit(_JLR_SHORTLIST)
        .select("vec_id")
    )
    qvec = _t(spark, sf_dir, "embeddings").where(F.col("vec_id") == 0).head()[
        "embedding"
    ]
    rer = topk(
        emb.join(F.broadcast(short), "vec_id"), qvec, k=10, round_to=ROUND_SCORE
    ).select("vec_id")
    exact = topk(emb, qvec, k=10, round_to=ROUND_SCORE).select("vec_id")
    return (
        rer.join(exact, "vec_id")
        .agg(F.count("*").alias("hits"))
        .select(
            F.lit(10).cast("long").alias("k"),
            F.round(F.col("hits").cast("double") / F.lit(10.0), 6).alias("recall"),
        )
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
    return spark.createDataFrame(pages, "page bigint, id string")


# ==========================================================================
# Round 4: MMR diversity re-rank (operators/search.py mmr_rerank) — greedy
# λ-tradeoff selection over an integer-quantized shortlist; the oracle
# unrolls the k greedy steps as chained CTEs (each step = one argmax).
# ==========================================================================


def _mmr_oracle(k: int = 5, shortlist: int = 20, lam: int = 7) -> str:
    steps = []
    for n in range(1, k + 1):
        prev = [f"p{m}" for m in range(1, n)]
        if prev:
            gmax = "GREATEST(" + ", ".join(
                f"(SELECT s FROM sim WHERE ia = c.vec_id AND ib = {p}.vec_id)"
                for p in prev
            ) + ")" if len(prev) > 1 else (
                f"(SELECT s FROM sim WHERE ia = c.vec_id AND ib = p1.vec_id)"
            )
            notin = " AND ".join(f"c.vec_id <> {p}.vec_id" for p in prev)
            steps.append(f"""
p{n} AS (
  SELECT c.vec_id, {lam} * c.rel - {10 - lam} * {gmax} AS score
  FROM cand c, {", ".join(prev)}
  WHERE {notin}
  ORDER BY score DESC, c.vec_id ASC LIMIT 1
)""")
        else:
            steps.append(f"""
p1 AS (
  SELECT vec_id, {lam} * rel AS score
  FROM cand ORDER BY score DESC, vec_id ASC LIMIT 1
)""")
    selects = "\nUNION ALL\n".join(
        f"SELECT {n} AS rank, vec_id, score AS mmr_score10 FROM p{n}"
        for n in range(1, k + 1)
    )
    step_ctes = ",\n".join(s.lstrip() for s in steps)
    return f"""
WITH qv AS (SELECT embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id = 0),
cand AS (
  SELECT e.vec_id, e.embedding,
         CAST(round(list_cosine_similarity(e.embedding::DOUBLE[], qv.v) * 1000000) AS BIGINT) AS rel
  FROM embeddings e CROSS JOIN qv
  WHERE list_cosine_similarity(e.embedding::DOUBLE[], qv.v) IS NOT NULL
  ORDER BY rel DESC, e.vec_id ASC LIMIT {shortlist}
),
sim AS (
  SELECT a.vec_id AS ia, b.vec_id AS ib,
         CAST(round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) * 1000000) AS BIGINT) AS s
  FROM cand a CROSS JOIN cand b
),
{step_ctes}
SELECT CAST(rank AS BIGINT) AS rank, vec_id, mmr_score10 FROM ({selects})
"""


@_register("knn_mmr_rerank", _mmr_oracle())
def knn_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversity-aware top-5 via MMR (λ=0.7) over the exact top-20
    shortlist — the redundancy filter plain cosine top-k lacks. Integer
    micro-unit scores make the greedy engine-exact; the oracle replays
    each greedy step as an unrolled argmax CTE."""
    from whatsapp_vectordb_spark.operators.search import mmr_rerank

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    qvec = emb.where(F.col("vec_id") == 0).head()["embedding"]
    return mmr_rerank(emb, qvec, k=5, shortlist=20, lam_tenths=7)


# ==========================================================================
# Round 4: grouped (per-label) kNN — partitioned vector search: top-3 per
# label in ONE pass (window rank within label), not one query per label.
# ==========================================================================


@_register(
    "knn_topk_per_label",
    """
WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
SELECT label, vec_id, score
FROM (
  SELECT e.label, e.vec_id,
         ROUND(list_cosine_similarity(e.embedding::DOUBLE[], q.qv), 6) AS score,
         row_number() OVER (
           PARTITION BY e.label
           ORDER BY ROUND(list_cosine_similarity(e.embedding::DOUBLE[], q.qv), 6) DESC,
                    e.vec_id ASC
         ) AS rk
  FROM embeddings e, q
  WHERE list_cosine_similarity(e.embedding::DOUBLE[], q.qv) IS NOT NULL
)
WHERE rk <= 3
""",
)
def knn_topk_per_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped vector search: the 3 nearest neighbors WITHIN each label in
    one pass — score map-side, one shuffle by label, per-partition rank.
    The shape for 'best matches per tenant/namespace/category' that would
    otherwise be |labels| separate queries."""
    from whatsapp_vectordb_spark.functions.vector import cosine_similarity

    emb = _t(spark, sf_dir, "embeddings")
    qvec = emb.where(F.col("vec_id") == 0).head()["embedding"]
    qcol = F.lit([float(x) for x in qvec]).cast("array<double>")
    scored = emb.select(
        "label",
        "vec_id",
        F.round(cosine_similarity(F.col("embedding"), qcol), 6).alias("score"),
    ).where(F.col("score").isNotNull())
    w = Window.partitionBy("label").orderBy(F.col("score").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= 3)
        .select("label", "vec_id", "score")
    )


# ==========================================================================
# Round 4: chunk-level media search — per-chunk embeddings (fake codec),
# media ranked by BEST chunk (max-pool), persisted-state oracle.
# ==========================================================================

_CHUNK_DIR = _oracle_scratch("chunk_search_oracle")
_CHUNK_QUERY = "stream batch processing"


def _chunk_oracle() -> str:
    from whatsapp_vectordb_spark.embedder import embed_text

    qv = embed_text(_CHUNK_QUERY, dim=64)
    lit = "[" + ", ".join(repr(float(x)) for x in qv) + "]"
    return f"""
WITH idx AS (
  SELECT * FROM read_parquet('{_CHUNK_DIR}/index/*.parquet')
),
q AS (SELECT {lit}::DOUBLE[] AS qv),
sc AS (
  SELECT i.media_id, i.chunk_start_ms,
         ROUND(list_cosine_similarity(i.embedding::DOUBLE[], q.qv), 6) AS score
  FROM idx i CROSS JOIN q
  WHERE list_cosine_similarity(i.embedding::DOUBLE[], q.qv) IS NOT NULL
),
best AS (
  SELECT media_id, chunk_start_ms, score,
         row_number() OVER (
           PARTITION BY media_id ORDER BY score DESC, chunk_start_ms ASC
         ) AS rk
  FROM sc
)
SELECT media_id, chunk_start_ms AS best_chunk_start_ms, score
FROM best WHERE rk = 1
ORDER BY score DESC, media_id ASC
LIMIT 10
"""


@_register("multimodal_chunk_search", _chunk_oracle())
def multimodal_chunk_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-granular media retrieval: every 2-second audio chunk gets its
    own embedding; media rank by their BEST chunk (max-pooling), so a
    short match inside a long item still surfaces it. The chunk index is
    persisted and both engines score the identical float32 parquet
    (the persisted-state oracle template)."""
    from whatsapp_vectordb_spark.embedder import embed_text
    from whatsapp_vectordb_spark.functions.vector import cosine_similarity
    from whatsapp_vectordb_spark.multimodal import extract_chunk_features

    chunks = extract_chunk_features(
        _media_df(spark, sf_dir), chunk_ms=2000, dim=64, modality="audio"
    )
    index_path = os.path.join(_CHUNK_DIR, "index")
    chunks.select("media_id", "chunk_start_ms", "embedding").write.mode(
        "overwrite"
    ).parquet(index_path)
    idx = spark.read.parquet(index_path)
    qvec = embed_text(_CHUNK_QUERY, dim=64)
    qcol = F.lit([float(x) for x in qvec]).cast("array<double>")
    sc = idx.select(
        "media_id",
        "chunk_start_ms",
        F.round(cosine_similarity(F.col("embedding"), qcol), 6).alias("score"),
    ).where(F.col("score").isNotNull())
    w = Window.partitionBy("media_id").orderBy(
        F.col("score").desc(), F.col("chunk_start_ms").asc()
    )
    best = (
        sc.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") == 1)
        .select("media_id", F.col("chunk_start_ms").alias("best_chunk_start_ms"), "score")
    )
    return best.orderBy(F.col("score").desc(), F.col("media_id").asc()).limit(10)


# ==========================================================================
# Round 4: temperature mix rebalancing (mC4/XLM-R q ∝ n^α at α=0.5) —
# no weight table; sqrt is IEEE-correctly-rounded so cuts are engine-exact.
# ==========================================================================


@_register(
    "sample_temperature_mix",
    """
WITH counts AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY 1),
nm AS (SELECT MIN(n) AS nmin FROM counts),
cuts AS (
  SELECT c.lang,
         CAST(round(LEAST(1.0, sqrt(nm.nmin::DOUBLE) / sqrt(c.n::DOUBLE)) * 10000) AS BIGINT) AS cut
  FROM counts c CROSS JOIN nm
)
SELECT d.doc_id, d.lang
FROM documents d JOIN cuts ON d.lang = cuts.lang
WHERE ('0x' || substr(md5('0:' || CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT % 10000 < cuts.cut
""",
)
def sample_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-mix flattening without a weight table: α=0.5 temperature
    sampling keeps every row of the scarcest language and hash-downsamples
    the rest by sqrt-ratio (operators/sampling.py temperature_mix)."""
    from whatsapp_vectordb_spark.operators.sampling import temperature_mix

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    return temperature_mix(docs, group_col="lang", id_col="doc_id")


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


# ==========================================================================
# Round 4: interpolated bigram LM scoring (operators/textops.py
# bigram_loglik) — the fluency signal one order above text_unigram_loglik.
# ==========================================================================


@_register(
    "text_bigram_loglik",
    f"""
WITH base AS (
  SELECT doc_id, {_TOKS.format(c='text')} AS tk FROM documents
),
eligible AS (SELECT * FROM base WHERE len(tk) >= 2),
pairs AS (
  -- per-row LATERAL bound (len(tk)-1 positions): exact for any doc length,
  -- unlike a fixed CROSS JOIN cap that silently truncates longer docs
  SELECT doc_id, tk[i.i] AS w1, tk[i.i + 1] AS w2
  FROM eligible, LATERAL unnest(range(1, len(tk))) i(i)
),
toks AS (SELECT unnest(tk) AS tok FROM eligible),
uni AS (SELECT tok, COUNT(*) AS c1 FROM toks GROUP BY 1),
tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS N FROM toks),
big AS (SELECT w1, w2, COUNT(*) AS c2 FROM pairs GROUP BY 1, 2),
lp AS (
  SELECT b.w1, b.w2,
         CAST(round(ln(0.75 * b.c2 / u1.c1 + 0.25 * u2.c1 / t.N) * 1000000) AS BIGINT) AS lp
  FROM big b
  JOIN uni u1 ON b.w1 = u1.tok
  JOIN uni u2 ON b.w2 = u2.tok
  CROSS JOIN tot t
)
SELECT p.doc_id,
       COUNT(*) AS n_bigrams,
       ROUND(SUM(l.lp) / COUNT(*) / 1000000.0, 6) AS avg_logprob
FROM pairs p JOIN lp l ON p.w1 = l.w1 AND p.w2 = l.w2
GROUP BY 1
""",
)
def text_bigram_loglik(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc average interpolated bigram log-probability (λ=0.75
    bigram, 0.25 unigram backoff) — low scores mark disfluent/garbled
    text. Integer-quantized per-TYPE logprobs make doc sums exact."""
    from whatsapp_vectordb_spark.operators.textops import bigram_loglik

    return bigram_loglik(_t(spark, sf_dir, "documents"))


# ==========================================================================
# Round 4: hybrid search — BM25 keyword list + vector cosine list fused by
# Reciprocal Rank Fusion (Cormack et al. '09): score = Σ 1/(60+rank),
# integer-quantized per (list, rank) so the fuse is BIGINT-exact.
# ==========================================================================

_RRF_K = 60
_RRF_QUANT = 1_000_000_000


@_register(
    "hybrid_search_rrf",
    f"""
WITH toks AS (SELECT doc_id, {{toks}} AS tk FROM documents),
lens AS (SELECT doc_id, len(tk) AS dl FROM toks),
stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, AVG(dl) AS avgdl FROM lens),
postings AS (SELECT doc_id, unnest(tk) AS term FROM toks),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM postings
  WHERE term IN ('data', 'processing', 'scale') GROUP BY 1, 2
),
dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
bm AS (
  SELECT t.doc_id,
         ROUND(SUM(
           ln(1 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
           * t.tf * 2.2
           / (t.tf + 1.2 * (0.25 + 0.75 * l.dl / s.avgdl))
         ), 6) AS bm25
  FROM tf t
  JOIN dfreq d ON d.term = t.term
  JOIN lens l ON l.doc_id = t.doc_id
  CROSS JOIN stats s
  GROUP BY t.doc_id
),
kw AS (
  SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS r
  FROM bm ORDER BY bm25 DESC, doc_id ASC LIMIT 20
),
q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
vs AS (
  SELECT e.vec_id AS doc_id,
         ROUND(list_cosine_similarity(e.embedding::DOUBLE[], q.qv), 6) AS score
  FROM embeddings e, q
  WHERE list_cosine_similarity(e.embedding::DOUBLE[], q.qv) IS NOT NULL
),
vec AS (
  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS r
  FROM vs ORDER BY score DESC, doc_id ASC LIMIT 20
),
fused AS (
  SELECT COALESCE(kw.doc_id, vec.doc_id) AS doc_id,
         COALESCE(CAST(round({_RRF_QUANT}.0 / ({_RRF_K} + kw.r)) AS BIGINT), 0)
         + COALESCE(CAST(round({_RRF_QUANT}.0 / ({_RRF_K} + vec.r)) AS BIGINT), 0) AS rrf_q
  FROM kw FULL OUTER JOIN vec ON kw.doc_id = vec.doc_id
)
SELECT doc_id, ROUND(rrf_q / {_RRF_QUANT}.0, 6) AS rrf
FROM fused
ORDER BY rrf_q DESC, doc_id ASC
LIMIT 10
""".format(toks=_TOKS.format(c="text")),
)
def hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: the BM25 keyword top-20 and the vector cosine
    top-20 fused by Reciprocal Rank Fusion — the standard keyword+vector
    combination (ids align across `documents` and `embeddings`). Each
    list's contribution quantizes to round(10⁹/(60+rank)) so the fused
    ordering is exact integer arithmetic."""
    from whatsapp_vectordb_spark.operators.search import topk
    from whatsapp_vectordb_spark.operators.textops import bm25_search

    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    qvec = emb.where(F.col("vec_id") == 0).head()["embedding"]

    kw = bm25_search(docs, list(_BM25_TERMS), k1=1.2, b=0.75, top_n=20).select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("bm25").desc(), F.col("doc_id").asc()))
        .alias("r_kw"),
    )
    vec = topk(emb, qvec, k=20, round_to=ROUND_SCORE).select(
        F.col("vec_id").alias("doc_id"),
        F.row_number()
        .over(Window.orderBy(F.col("score").desc(), F.col("vec_id").asc()))
        .alias("r_vec"),
    )
    rrf_of = lambda r: F.coalesce(  # noqa: E731
        F.round(F.lit(float(_RRF_QUANT)) / (F.lit(_RRF_K) + r)).cast("long"), F.lit(0)
    )
    fused = kw.join(vec, "doc_id", "full_outer").select(
        "doc_id", (rrf_of(F.col("r_kw")) + rrf_of(F.col("r_vec"))).alias("rrf_q")
    )
    return (
        fused.orderBy(F.col("rrf_q").desc(), F.col("doc_id").asc())
        .limit(10)
        .select("doc_id", F.round(F.col("rrf_q") / _RRF_QUANT, 6).alias("rrf"))
    )


# ==========================================================================
# Round 5: training-data curation tier II — DSIR importance weights,
# token-budget corpus selection, content-defined chunk dedup, SemDeDup
# cluster-scoped semantic dedup, k-NN weak labeling.
# ==========================================================================

_DSIR_B = 4096
_DSIR_SEED = 3


@_register(
    "curate_dsir_weights",
    f"""
WITH t AS (SELECT doc_id, lang, {_TOKS.format(c='text')} AS tk FROM documents),
uni AS (SELECT doc_id, lang, unnest(tk) AS feat FROM t),
bi AS (
  SELECT doc_id, lang, tk[i.i] || ' ' || tk[i.i + 1] AS feat
  FROM t, LATERAL unnest(range(1, len(tk))) i(i)
),
feats AS (
  SELECT doc_id, (lang = 'en') AS is_t,
         {_phash_sql('feat', _DSIR_SEED)} % {_DSIR_B} AS b
  FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi)
),
tgt AS (SELECT b, COUNT(*) AS ct FROM feats WHERE is_t GROUP BY 1),
src AS (SELECT b, COUNT(*) AS cs FROM feats GROUP BY 1),
nt AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nt FROM feats WHERE is_t),
ns AS (SELECT CAST(COUNT(*) AS DOUBLE) AS ns FROM feats),
lp AS (
  SELECT f.doc_id,
         CAST(round((ln((COALESCE(tgt.ct, 0) + 1) / (nt.nt + {_DSIR_B}))
                   - ln((COALESCE(src.cs, 0) + 1) / (ns.ns + {_DSIR_B}))) * 1000000)
              AS BIGINT) AS lr
  FROM feats f
  LEFT JOIN tgt ON tgt.b = f.b
  LEFT JOIN src ON src.b = f.b
  CROSS JOIN nt CROSS JOIN ns
)
SELECT doc_id, COUNT(*) AS n_feats,
       ROUND(SUM(lr)::DOUBLE / 1000000, 6) AS log_weight
FROM lp GROUP BY doc_id
""",
)
def curate_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023): log p_target − log
    p_source under hashed-unigram+bigram models; target = lang='en'
    documents, source = the whole corpus. Both models are ≤4096-row
    broadcast count tables; per-feature log-ratios quantize to micro-units
    before the per-doc sum (operators/curate.py dsir_log_weights)."""
    from whatsapp_vectordb_spark.operators.curate import dsir_log_weights

    docs = _t(spark, sf_dir, "documents")
    return dsir_log_weights(
        docs, F.col("lang") == "en", buckets=_DSIR_B, seed=_DSIR_SEED
    )


_BUDGET_TOKENS = 10_000


@_register(
    "curate_token_budget",
    f"""
WITH toks AS (SELECT doc_id, text, {_TOKS.format(c='text')} AS tk FROM documents),
feats AS (
  SELECT doc_id,
         len(tk) AS n_tokens,
         CASE WHEN len(tk) > 0 THEN length(text)::DOUBLE / len(tk) ELSE 0.0 END AS mwl,
         CASE WHEN len(tk) > 0 THEN len(list_filter(tk, x -> list_contains({_STOP_SQL}, x)))::DOUBLE / len(tk) ELSE 0.0 END AS sr,
         CASE WHEN len(tk) > 0 THEN len(list_distinct(tk))::DOUBLE / len(tk) ELSE 0.0 END AS dv
  FROM toks
),
q AS (
  SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
         CAST(round(ROUND(
           (CASE WHEN n_tokens >= 10 AND n_tokens <= 1000 THEN 1.0 ELSE 0.0 END) * 0.25
           + (CASE WHEN mwl >= 3.0 AND mwl <= 12.0 THEN 1.0 ELSE 0.0 END) * 0.25
           + LEAST(sr * 2.0, 1.0) * 0.25
           + dv * 0.25, 6) * 1000000) AS BIGINT) AS q_micro
  FROM feats
),
c AS (
  SELECT doc_id, q_micro, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY q_micro DESC, doc_id ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
  FROM q
)
SELECT doc_id, q_micro, n_tokens, cum_before
FROM c WHERE cum_before + n_tokens <= {_BUDGET_TOKENS}
""",
)
def curate_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-ordered token-budget selection: rank docs by quality score
    (micro-unit integer), take while the running token total fits the
    budget — running total via the two-phase DISTRIBUTED prefix sum, no
    global single-partition window (operators/curate.py
    token_budget_select)."""
    from whatsapp_vectordb_spark.functions.text import tokens
    from whatsapp_vectordb_spark.operators.curate import token_budget_select
    from whatsapp_vectordb_spark.operators.textops import quality_scores

    docs = _t(spark, sf_dir, "documents")
    scored = quality_scores(docs).select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round(F.col("quality_score") * 1_000_000).cast("long").alias("q_micro"),
    )
    return token_budget_select(scored, budget=_BUDGET_TOKENS)


_CDC_MOD = 8
_CDC_SEED = 5


@_register(
    "text_cdc_chunk_dedup",
    f"""
WITH t AS (SELECT doc_id, {_TOKS.format(c='text')} AS tk FROM documents),
tok AS (
  SELECT doc_id, i.i AS pos, tk[i.i] AS tok
  FROM t, LATERAL unnest(range(1, len(tk) + 1)) i(i)
),
fl AS (
  SELECT doc_id, pos, tok,
         CASE WHEN {_phash_sql('tok', _CDC_SEED)} % {_CDC_MOD} = 0 THEN 1 ELSE 0 END AS cut
  FROM tok
),
ch AS (
  SELECT doc_id, pos, tok,
         CAST(COALESCE(SUM(cut) OVER (PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS chunk_no
  FROM fl
),
chunks AS (
  SELECT doc_id, chunk_no, COUNT(*) AS n_toks,
         string_agg(tok, ' ' ORDER BY pos) AS ctext
  FROM ch GROUP BY 1, 2
),
hashed AS (
  SELECT doc_id, chunk_no, n_toks, {_phash_sql('ctext', _CDC_SEED + 1, 15)} AS chunk_hash
  FROM chunks
)
SELECT chunk_hash,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_occurrences,
       CAST(MIN(n_toks) AS BIGINT) AS n_tokens,
       MIN(doc_id) AS first_doc
FROM hashed GROUP BY 1 HAVING COUNT(DISTINCT doc_id) >= 2
""",
)
def text_cdc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking dedup (FastCDC/rsync applied to token
    streams): hash-boundary chunks are shift-robust, so re-crawled pages
    with small edits still share chunk hashes — the 100 TB chunk-dedup
    shape. Reports chunks recurring across ≥2 docs
    (operators/curate.py cdc_chunks / cdc_duplicate_chunks)."""
    from whatsapp_vectordb_spark.operators.curate import cdc_duplicate_chunks

    docs = _t(spark, sf_dir, "documents")
    return cdc_duplicate_chunks(
        docs, min_docs=2, boundary_mod=_CDC_MOD, seed=_CDC_SEED
    )


@_register(
    "dedup_semdedup",
    """
WITH corpus AS (
  SELECT vec_id, embedding, label FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000 AS vec_id, embedding, label
  FROM embeddings WHERE vec_id % 100 = 0
),
pairs AS (
  SELECT b.vec_id AS vec_id, a.vec_id AS keeper,
         ROUND(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cos_sim,
         ROW_NUMBER() OVER (PARTITION BY b.vec_id ORDER BY a.vec_id ASC) AS rk
  FROM corpus a JOIN corpus b ON a.label = b.label AND a.vec_id < b.vec_id
  WHERE ROUND(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= 0.95
)
SELECT vec_id, keeper, cos_sim FROM pairs WHERE rk = 1
""",
)
def dedup_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic dedup scoped to clusters
    (here the label column stands in for k-means cell ids) — quadratic
    pair generation confined per cluster, lowest-id member survives.
    Planted clones (every 100th vector) are the ground-truth duplicates
    (operators/dedup.py semantic_dedup)."""
    from whatsapp_vectordb_spark.operators.dedup import semantic_dedup

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding", "label")
    clones = emb.where(F.col("vec_id") % 100 == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding", "label"
    )
    return semantic_dedup(emb.unionByName(clones), "label", threshold=0.95)


@_register(
    "knn_label_propagation",
    """
WITH u AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 5 = 0),
l AS (SELECT vec_id, embedding, label FROM embeddings WHERE vec_id % 5 <> 0),
scored AS (
  SELECT u.vec_id, l.vec_id AS lid, l.label,
         CAST(round(list_cosine_similarity(u.embedding::DOUBLE[], l.embedding::DOUBLE[]) * 1000000) AS BIGINT) AS cos6
  FROM u CROSS JOIN l
),
top AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos6 DESC, lid ASC) AS rk
    FROM scored
  ) WHERE rk <= 5
),
v AS (SELECT vec_id, label, COUNT(*) AS votes FROM top GROUP BY 1, 2)
SELECT vec_id, label AS pred_label, votes FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY votes DESC, label ASC) AS vr
  FROM v
) WHERE vr = 1
""",
)
def knn_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN majority-vote weak labeling: every 5th vector plays unlabeled,
    the rest are the broadcast labeled seed; k=5 neighbors by micro-unit
    cosine, deterministic rank and vote tiebreaks
    (operators/search.py knn_label_propagation)."""
    from whatsapp_vectordb_spark.operators.search import knn_label_propagation as _klp

    emb = _t(spark, sf_dir, "embeddings")
    unl = emb.where(F.col("vec_id") % 5 == 0).select("vec_id", "embedding")
    lab = emb.where(F.col("vec_id") % 5 != 0).select("vec_id", "embedding", "label")
    return _klp(unl, lab, k=5)


# ==========================================================================
# Round 5 (batch 2): Matryoshka prefix retrieval + recall gate, CCNet
# perplexity buckets over the grouped distributed prefix sum, index
# compaction as an oracle-checked lifecycle query.
# ==========================================================================

_MRL_DIM = 16
_MRL_SHORT = 50


@_register(
    "ann_mrl_topk",
    f"""
WITH q AS (SELECT embedding[1:{_MRL_DIM}]::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
SELECT e.vec_id,
       ROUND(list_cosine_similarity(e.embedding[1:{_MRL_DIM}]::DOUBLE[], q.qv), 6) AS score
FROM embeddings e CROSS JOIN q
WHERE list_cosine_similarity(e.embedding[1:{_MRL_DIM}]::DOUBLE[], q.qv) IS NOT NULL
ORDER BY score DESC, e.vec_id ASC
LIMIT 10
""",
)
def ann_mrl_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka prefix-cosine top-10 (first 16 of 64 dims): the
    zero-cost dimensionality reduction — a slice, no projection matrix —
    that MRL-trained embedders are built for. Map-only scoring +
    TakeOrderedAndProject, 4× fewer multiply-adds per row
    (operators/projection.py mrl_truncate)."""
    from whatsapp_vectordb_spark.operators.projection import mrl_truncate
    from whatsapp_vectordb_spark.operators.search import topk

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    trunc = mrl_truncate(emb, _MRL_DIM)
    qvec = emb.where(F.col("vec_id") == 0).head()["embedding"][:_MRL_DIM]
    return topk(trunc, qvec, k=10, round_to=ROUND_SCORE, vec_col="mrl_vec")


@_register(
    "ann_mrl_recall_gate",
    f"""
WITH q16 AS (SELECT embedding[1:{_MRL_DIM}]::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
short AS (
  SELECT e.vec_id
  FROM embeddings e CROSS JOIN q16
  WHERE list_cosine_similarity(e.embedding[1:{_MRL_DIM}]::DOUBLE[], q16.qv) IS NOT NULL
  ORDER BY ROUND(list_cosine_similarity(e.embedding[1:{_MRL_DIM}]::DOUBLE[], q16.qv), 6) DESC,
           e.vec_id ASC
  LIMIT {_MRL_SHORT}
),
qv AS (SELECT embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id = 0),
rer AS (
  SELECT e.vec_id
  FROM embeddings e JOIN short s ON e.vec_id = s.vec_id CROSS JOIN qv
  ORDER BY ROUND(list_cosine_similarity(e.embedding::DOUBLE[], qv.v), 6) DESC, e.vec_id ASC
  LIMIT 10
),
exact AS (
  SELECT e.vec_id
  FROM embeddings e CROSS JOIN qv
  WHERE list_cosine_similarity(e.embedding::DOUBLE[], qv.v) IS NOT NULL
  ORDER BY ROUND(list_cosine_similarity(e.embedding::DOUBLE[], qv.v), 6) DESC, e.vec_id ASC
  LIMIT 10
)
SELECT CAST(10 AS BIGINT) AS k,
       ROUND(COUNT(*) / 10.0, 6) AS recall
FROM rer JOIN exact ON rer.vec_id = exact.vec_id
""",
)
def ann_mrl_recall_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage Matryoshka gate: prefix-16 shortlist-50 → exact full-dim
    re-rank top-10, recall vs brute force — measures what the prefix
    truncation costs on THIS corpus (synthetic, not MRL-trained, so the
    gate is the honest contract, same as the JL gate)."""
    from whatsapp_vectordb_spark.operators.projection import mrl_truncate
    from whatsapp_vectordb_spark.operators.search import topk

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    trunc = mrl_truncate(emb, _MRL_DIM)
    qfull = emb.where(F.col("vec_id") == 0).head()["embedding"]
    short = topk(
        trunc, qfull[:_MRL_DIM], k=_MRL_SHORT, round_to=ROUND_SCORE, vec_col="mrl_vec"
    ).select("vec_id")
    rer = topk(
        emb.join(F.broadcast(short), "vec_id"), qfull, k=10, round_to=ROUND_SCORE
    ).select("vec_id")
    exact = topk(emb, qfull, k=10, round_to=ROUND_SCORE).select("vec_id")
    return (
        rer.join(exact, "vec_id")
        .agg(F.count("*").alias("hits"))
        .select(
            F.lit(10).cast("long").alias("k"),
            F.round(F.col("hits").cast("double") / F.lit(10.0), 6).alias("recall"),
        )
    )


@_register(
    "text_perplexity_buckets",
    f"""
WITH base AS (SELECT doc_id, {_TOKS.format(c='text')} AS tk FROM documents),
eligible AS (SELECT * FROM base WHERE len(tk) >= 2),
pairs AS (
  SELECT doc_id, tk[i.i] AS w1, tk[i.i + 1] AS w2
  FROM eligible, LATERAL unnest(range(1, len(tk))) i(i)
),
toks AS (SELECT unnest(tk) AS tok FROM eligible),
uni AS (SELECT tok, COUNT(*) AS c1 FROM toks GROUP BY 1),
tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS N FROM toks),
big AS (SELECT w1, w2, COUNT(*) AS c2 FROM pairs GROUP BY 1, 2),
lp AS (
  SELECT b.w1, b.w2,
         CAST(round(ln(0.75 * b.c2 / u1.c1 + 0.25 * u2.c1 / t.N) * 1000000) AS BIGINT) AS lp
  FROM big b
  JOIN uni u1 ON b.w1 = u1.tok
  JOIN uni u2 ON b.w2 = u2.tok
  CROSS JOIN tot t
),
doc_sc AS (
  SELECT p.doc_id,
         CAST(round(ROUND(SUM(l.lp) / COUNT(*) / 1000000.0, 6) * 1000000) AS BIGINT) AS sm
  FROM pairs p JOIN lp l ON p.w1 = l.w1 AND p.w2 = l.w2
  GROUP BY 1
),
ranked AS (
  SELECT s.doc_id, d.lang,
         CAST(ROW_NUMBER() OVER (PARTITION BY d.lang ORDER BY s.sm DESC, s.doc_id ASC) AS BIGINT) AS rank,
         COUNT(*) OVER (PARTITION BY d.lang) AS n
  FROM doc_sc s JOIN documents d ON d.doc_id = s.doc_id
)
SELECT doc_id, lang, rank,
       CASE WHEN rank * 3 <= n THEN 'head'
            WHEN rank * 3 <= n * 2 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM ranked
""",
)
def text_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet perplexity bucketing (Wenzek et al. 2020): per-language
    head/middle/tail terciles by bigram-LM fluency. The per-language rank
    runs on the GROUPED two-phase distributed prefix sum — no language
    funnels through one task at 100 TB, unlike a naive
    Window.partitionBy(lang) (operators/textops.py perplexity_buckets,
    operators/curate.py grouped_prefix_sum)."""
    from whatsapp_vectordb_spark.operators.textops import perplexity_buckets

    return perplexity_buckets(_t(spark, sf_dir, "documents"))


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
    return spark.createDataFrame(
        out, "n_vectors bigint, id_checksum bigint, max_files_per_bucket bigint"
    )


# ==========================================================================
# Round 5 (batch 3): split-leakage audit and per-source quality
# calibration.
# ==========================================================================

_SPLIT_OF = (
    "CASE WHEN ('0x' || substr(md5('0:' || CAST({id} AS VARCHAR)), 1, 8))::BIGINT % 10000 < 9000 THEN 'train' "
    "WHEN ('0x' || substr(md5('0:' || CAST({id} AS VARCHAR)), 1, 8))::BIGINT % 10000 < 9500 THEN 'val' "
    "ELSE 'test' END"
)


@_register(
    "sample_split_leakage",
    f"""
WITH p AS ({_minhash_pairs_sql(16, 4, 3, 0.5)})
SELECT id_a, id_b, jaccard,
       {_SPLIT_OF.format(id='id_a')} AS split_a,
       {_SPLIT_OF.format(id='id_b')} AS split_b
FROM p
WHERE {_SPLIT_OF.format(id='id_a')} <> {_SPLIT_OF.format(id='id_b')}
""",
)
def sample_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test leakage audit: MinHash near-dup pairs whose two sides
    land in DIFFERENT hash-assigned splits — the contamination a
    train/val/test split inherits when dedup runs after splitting. This
    is the audit run before training; the fix is canonicalizing
    duplicates BEFORE split assignment (dedup_components). Composition of
    two oracle-checked stages: the LSH pair pipeline + the pure-function
    split assignment (map-only on the pair ids — no extra join)."""
    from whatsapp_vectordb_spark.operators.dedup import minhash_near_duplicates
    from whatsapp_vectordb_spark.operators.sampling import assign_splits

    pairs = minhash_near_duplicates(
        _augmented_docs(spark, sf_dir), num_hashes=16, bands=4, shingle_n=3, threshold=0.5
    )
    both = assign_splits(
        assign_splits(pairs, "id_a", split_col="split_a"), "id_b", split_col="split_b"
    )
    return both.where(F.col("split_a") != F.col("split_b")).select(
        "id_a", "id_b", "jaccard", "split_a", "split_b"
    )


@_register(
    "text_quality_calibrated",
    f"""
WITH toks AS (SELECT doc_id, text, source, {_TOKS.format(c='text')} AS tk FROM documents),
feats AS (
  SELECT doc_id, source,
         len(tk) AS n_tokens,
         CASE WHEN len(tk) > 0 THEN length(text)::DOUBLE / len(tk) ELSE 0.0 END AS mwl,
         CASE WHEN len(tk) > 0 THEN len(list_filter(tk, x -> list_contains({_STOP_SQL}, x)))::DOUBLE / len(tk) ELSE 0.0 END AS sr,
         CASE WHEN len(tk) > 0 THEN len(list_distinct(tk))::DOUBLE / len(tk) ELSE 0.0 END AS dv
  FROM toks
),
q AS (
  SELECT doc_id, source,
         CAST(round(ROUND(
           (CASE WHEN n_tokens >= 10 AND n_tokens <= 1000 THEN 1.0 ELSE 0.0 END) * 0.25
           + (CASE WHEN mwl >= 3.0 AND mwl <= 12.0 THEN 1.0 ELSE 0.0 END) * 0.25
           + LEAST(sr * 2.0, 1.0) * 0.25
           + dv * 0.25, 6) * 1000000) AS BIGINT) AS q_micro
  FROM feats
),
r AS (
  SELECT doc_id, source, q_micro,
         CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY q_micro DESC, doc_id ASC) AS BIGINT) AS rank,
         COUNT(*) OVER (PARTITION BY source) AS n
  FROM q
)
SELECT doc_id, source, q_micro, rank, ROUND(rank / CAST(n AS DOUBLE), 6) AS pct
FROM r
""",
)
def text_quality_calibrated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quality percentile (rank calibration): raw heuristic
    scores aren't comparable across sources; the percentile within each
    source is — the per-domain analogue of CCNet buckets, ranked via the
    grouped distributed prefix sum (operators/textops.py
    quality_percentile_by_source)."""
    from whatsapp_vectordb_spark.operators.textops import quality_percentile_by_source

    return quality_percentile_by_source(_t(spark, sf_dir, "documents"))


# ==========================================================================
# Round 5 (batch 4): sign-bit binary quantization (BQ) — 1-bit/dim
# signatures, XOR+popcount Hamming scan, exact re-rank recall gate.
# ==========================================================================

_BQ_SHORT = 64

_BQ_SIGS = """
sigs AS (
  SELECT vec_id,
         CAST(SUM(CASE WHEN i.i < 32 AND embedding[i.i + 1] > 0
                       THEN (1::BIGINT << i.i) ELSE 0 END) AS BIGINT) AS lo,
         CAST(SUM(CASE WHEN i.i >= 32 AND embedding[i.i + 1] > 0
                       THEN (1::BIGINT << (i.i - 32)) ELSE 0 END) AS BIGINT) AS hi
  FROM embeddings CROSS JOIN range(0, 64) i(i)
  GROUP BY 1
),
qsig AS (SELECT lo AS qlo, hi AS qhi FROM sigs WHERE vec_id = 0),
ham AS (
  SELECT s.vec_id,
         CAST(bit_count(xor(s.lo, q.qlo)) + bit_count(xor(s.hi, q.qhi)) AS BIGINT) AS hamming
  FROM sigs s CROSS JOIN qsig q
)
"""


@_register(
    "ann_binary_topk",
    f"""
WITH {_BQ_SIGS}
SELECT vec_id, hamming FROM ham
ORDER BY hamming ASC, vec_id ASC
LIMIT 10
""",
)
def ann_binary_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-quantization top-10: sign-bit signatures (8 bytes/vector,
    32× smaller than float32), distance = two XOR+popcount — the
    cheapest first-stage vector scan there is, integer-exact in both
    engines (operators/ann.py binary_hamming_topk)."""
    from whatsapp_vectordb_spark.operators.ann import binary_hamming_topk

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    qvec = emb.where(F.col("vec_id") == 0).head()["embedding"]
    return binary_hamming_topk(emb, qvec, k=10, dim=64)


@_register(
    "ann_binary_recall_gate",
    f"""
WITH {_BQ_SIGS},
short AS (SELECT vec_id FROM ham ORDER BY hamming ASC, vec_id ASC LIMIT {_BQ_SHORT}),
qv AS (SELECT embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id = 0),
rer AS (
  SELECT e.vec_id
  FROM embeddings e JOIN short s ON e.vec_id = s.vec_id CROSS JOIN qv
  ORDER BY ROUND(list_cosine_similarity(e.embedding::DOUBLE[], qv.v), 6) DESC, e.vec_id ASC
  LIMIT 10
),
exact AS (
  SELECT e.vec_id
  FROM embeddings e CROSS JOIN qv
  WHERE list_cosine_similarity(e.embedding::DOUBLE[], qv.v) IS NOT NULL
  ORDER BY ROUND(list_cosine_similarity(e.embedding::DOUBLE[], qv.v), 6) DESC, e.vec_id ASC
  LIMIT 10
)
SELECT CAST(10 AS BIGINT) AS k,
       ROUND(COUNT(*) / 10.0, 6) AS recall
FROM rer JOIN exact ON rer.vec_id = exact.vec_id
""",
)
def ann_binary_recall_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BQ two-stage gate: Hamming shortlist-64 over 8-byte signatures →
    exact cosine re-rank top-10, recall vs brute force hash-checked —
    the scan reads 32× fewer bytes; the gate prices what the 1-bit
    compression costs on THIS corpus."""
    from whatsapp_vectordb_spark.operators.ann import binary_hamming_topk
    from whatsapp_vectordb_spark.operators.search import topk

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    qvec = emb.where(F.col("vec_id") == 0).head()["embedding"]
    short = binary_hamming_topk(emb, qvec, k=_BQ_SHORT, dim=64).select("vec_id")
    rer = topk(
        emb.join(F.broadcast(short), "vec_id"), qvec, k=10, round_to=ROUND_SCORE
    ).select("vec_id")
    exact = topk(emb, qvec, k=10, round_to=ROUND_SCORE).select("vec_id")
    return (
        rer.join(exact, "vec_id")
        .agg(F.count("*").alias("hits"))
        .select(
            F.lit(10).cast("long").alias("k"),
            F.round(F.col("hits").cast("double") / F.lit(10.0), 6).alias("recall"),
        )
    )


# ==========================================================================
# Round 5 (batch 5): retrieval corpus prep (overlapping chunking, phrase
# search over a positional index), corpus diversity (distinct-n), event
# sequence mining (retention cohorts, Markov transitions), and balanced
# shard assignment over the deterministic hash permutation.
# ==========================================================================

_CHUNK_SIZE = 64
_CHUNK_STRIDE = 32


@_register(
    "text_chunk_overlap",
    f"""
WITH toks AS (SELECT doc_id, {_TOKS.format(c='text')} AS tk FROM documents),
st AS (
  SELECT doc_id, tk, CAST(s.s AS BIGINT) AS start_tok
  FROM toks, LATERAL unnest(range(0, len(tk), {_CHUNK_STRIDE})) s(s)
  WHERE len(tk) > 0
)
SELECT doc_id,
       CAST(start_tok // {_CHUNK_STRIDE} AS BIGINT) AS chunk_id,
       start_tok,
       CAST(LEAST({_CHUNK_SIZE}, len(tk) - start_tok) AS INTEGER) AS n_chunk_tokens,
       md5(array_to_string(tk[start_tok + 1 : start_tok + {_CHUNK_SIZE}], ' ')) AS chunk_md5
FROM st
""",
)
def text_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window RAG chunking: 64-token windows every 32 tokens,
    md5 per chunk (operators/textops.py chunk_overlap). Map-only — no
    shuffle; chunking 100 TB runs at scan speed."""
    from whatsapp_vectordb_spark.operators.textops import chunk_overlap

    return chunk_overlap(
        _t(spark, sf_dir, "documents"), size=_CHUNK_SIZE, stride=_CHUNK_STRIDE
    )


_PHRASE = "sort merge"


@_register(
    "text_phrase_search",
    f"""
WITH toks AS (SELECT doc_id, {_TOKS.format(c='text')} AS tk FROM documents),
q(tok, qi) AS (VALUES ('sort', 0), ('merge', 1)),
pos AS (
  SELECT t.doc_id, CAST(i.i - 1 AS BIGINT) AS pos, t.tk[i.i] AS tok
  FROM toks t, LATERAL unnest(range(1, len(t.tk) + 1)) i(i)
  WHERE t.tk[i.i] IN ('sort', 'merge')
),
anch AS (
  SELECT p.doc_id, p.pos - q.qi AS anchor, q.qi
  FROM pos p JOIN q ON p.tok = q.tok
  WHERE p.pos - q.qi >= 0
),
hit AS (
  SELECT doc_id, anchor FROM anch
  GROUP BY doc_id, anchor
  HAVING COUNT(DISTINCT qi) = 2
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_matches
FROM hit GROUP BY doc_id
""",
)
def text_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-phrase search ("sort merge") via positional postings +
    anchor alignment (operators/textops.py phrase_search): postings are
    filtered to the query's tokens BEFORE the shuffle, so cost follows
    the posting list, not the corpus."""
    from whatsapp_vectordb_spark.operators.textops import phrase_search

    return phrase_search(_t(spark, sf_dir, "documents"), _PHRASE)


@_register(
    "text_distinct_ngrams",
    f"""
WITH toks AS (
  SELECT source, {_TOKS.format(c='text')} AS tk FROM documents
),
nz AS (SELECT source, tk FROM toks WHERE len(tk) > 0),
g AS (
  SELECT source, 1 AS n, unnest(tk) AS g FROM nz
  UNION ALL
  SELECT source, 2 AS n,
         unnest(list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i + 1])) AS g
  FROM nz WHERE len(tk) >= 2
  UNION ALL
  SELECT source, 3 AS n,
         unnest(list_transform(range(1, len(tk) - 1),
                               i -> tk[i] || ' ' || tk[i + 1] || ' ' || tk[i + 2])) AS g
  FROM nz WHERE len(tk) >= 3
)
SELECT source, CAST(n AS INTEGER) AS n,
       CAST(COUNT(*) AS BIGINT) AS n_total,
       CAST(COUNT(DISTINCT g) AS BIGINT) AS n_distinct,
       ROUND(COUNT(DISTINCT g) / CAST(COUNT(*) AS DOUBLE), 6) AS distinct_ratio
FROM g
GROUP BY source, n
""",
)
def text_distinct_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-1/2/3 corpus diversity per source (Li et al. 2016) —
    the degenerate-source detector for pretraining mixes
    (operators/textops.py distinct_ngram_diversity)."""
    from whatsapp_vectordb_spark.operators.textops import distinct_ngram_diversity

    return distinct_ngram_diversity(_t(spark, sf_dir, "documents"))


@_register(
    "events_retention_cohorts",
    """
WITH e AS (
  SELECT user_id, ts,
         MIN(ts) OVER (PARTITION BY user_id) AS first_ts
  FROM events
),
c AS (
  SELECT user_id,
         strftime(date_trunc('week', first_ts), '%Y-%m-%d') AS cohort_week,
         CAST(datediff('day', date_trunc('week', first_ts), date_trunc('week', ts)) // 7
              AS BIGINT) AS week_offset
  FROM e
)
SELECT cohort_week, week_offset,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_active_users,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM c GROUP BY cohort_week, week_offset
""",
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention triangle (operators/events.py
    retention_cohorts): one user-keyed shuffle for the first-event
    window, then a weeks²-sized aggregate."""
    from whatsapp_vectordb_spark.operators.events import retention_cohorts

    return retention_cohorts(_events(spark, sf_dir))


@_register(
    "events_markov_transitions",
    """
WITH seq AS (
  SELECT event_type AS src,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
  FROM events
),
c AS (
  SELECT src, dst, COUNT(*) AS n FROM seq WHERE dst IS NOT NULL GROUP BY src, dst
)
SELECT src, dst, CAST(n AS BIGINT) AS n_transitions,
       ROUND(n / CAST(SUM(n) OVER (PARTITION BY src) AS DOUBLE), 6) AS p
FROM c
""",
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order event-type Markov chain per user sequence, tie-broken
    on (ts, event_id) in both engines (operators/events.py
    markov_transitions)."""
    from whatsapp_vectordb_spark.operators.events import markov_transitions

    return markov_transitions(_events(spark, sf_dir))


_SHARD_TOKENS = 4096
_SHARD_SEED = 7


@_register(
    "pack_shard_assign",
    f"""
WITH toks AS (
  SELECT doc_id, CAST(len({_TOKS.format(c='text')}) AS BIGINT) AS nt FROM documents
),
h AS (
  SELECT doc_id, nt,
         ('0x' || substr(md5('{_SHARD_SEED}:' || doc_id), 1, 15))::BIGINT AS hkey
  FROM toks
),
c AS (
  SELECT doc_id, nt,
         COALESCE(CAST(SUM(nt) OVER (ORDER BY hkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
                  0) AS cum_before
  FROM h
),
s AS (
  SELECT doc_id, nt, CAST(cum_before // {_SHARD_TOKENS} AS BIGINT) AS shard_id FROM c
)
SELECT shard_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(nt) AS BIGINT) AS n_tokens,
       CAST(SUM(doc_id) AS BIGINT) AS doc_id_checksum
FROM s GROUP BY shard_id
""",
)
def pack_shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-permutation shuffle + token-balanced shard cuts
    (operators/curate.py shard_assign over the two-phase prefix sum);
    per-shard doc/token counts and an id checksum prove both engines
    assign identically."""
    from whatsapp_vectordb_spark.functions.text import tokens
    from whatsapp_vectordb_spark.operators.curate import shard_assign

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.size(tokens("text")).cast("long").alias("n_tokens")
    )
    assigned = shard_assign(
        docs, shard_tokens=_SHARD_TOKENS, seed=_SHARD_SEED, tokens_col="n_tokens"
    )
    return assigned.groupBy("shard_id").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.sum("doc_id").cast("long").alias("doc_id_checksum"),
    )


# ==========================================================================
# Round 5 (batch 6): shot-boundary detection over persisted chunk features,
# and cap-constrained water-filling epoch allocation (data-constrained
# scaling) — both integer/rounded-exact across engines.
# ==========================================================================

_SCENE_DIR = _oracle_scratch("scene_cuts_oracle")
_SCENE_THRESHOLD = 0.1


@_register(
    "multimodal_scene_cuts",
    f"""
WITH idx AS (
  SELECT media_id, chunk_start_ms, embedding::DOUBLE[] AS e
  FROM read_parquet('{_SCENE_DIR}/chunks/*.parquet')
),
s AS (
  SELECT media_id, chunk_start_ms,
         ROUND(list_cosine_similarity(
             e, LAG(e) OVER (PARTITION BY media_id ORDER BY chunk_start_ms)), 6) AS sim
  FROM idx
)
SELECT media_id,
       CAST(COUNT(*) AS BIGINT) AS n_chunks,
       CAST(SUM(CASE WHEN sim < {_SCENE_THRESHOLD} THEN 1 ELSE 0 END) AS BIGINT) AS n_cuts,
       CAST(SUM(CASE WHEN sim < {_SCENE_THRESHOLD} THEN chunk_start_ms ELSE 0 END)
            AS BIGINT) AS cut_ms_checksum
FROM s GROUP BY media_id
""",
)
def multimodal_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-based shot detection: 500 ms video chunks → per-chunk
    features (stubbed codec, real Spark plumbing) → a cut wherever
    consecutive-chunk cosine drops below 0.1 (multimodal.py
    scene_cut_stats). Both engines score the identical persisted float32
    chunk index; similarity rounds before the threshold compare."""
    from whatsapp_vectordb_spark.multimodal import extract_chunk_features, scene_cut_stats

    chunks = extract_chunk_features(
        _media_df(spark, sf_dir), chunk_ms=500, dim=64, modality="video"
    )
    path = os.path.join(_SCENE_DIR, "chunks")
    chunks.select("media_id", "chunk_start_ms", "embedding").write.mode(
        "overwrite"
    ).parquet(path)
    return scene_cut_stats(spark.read.parquet(path), threshold=_SCENE_THRESHOLD)


_EPOCH_MAX = 4
_EPOCH_BUDGET_X = 2  # budget = 2× the corpus's total token count


@_register(
    "curate_epoch_waterfill",
    f"""
WITH per AS (
  SELECT source,
         CAST(len(tk) AS BIGINT) AS nt,
         CAST(len(list_distinct(tk)) AS BIGINT) AS nd
  FROM (SELECT source, {_TOKS.format(c='text')} AS tk FROM documents)
),
agg AS (
  SELECT source, CAST(SUM(nt) AS BIGINT) AS n, CAST(SUM(nd) AS BIGINT) AS w
  FROM per GROUP BY source HAVING SUM(nd) > 0
),
tot AS (
  SELECT CAST(SUM(n) AS BIGINT) AS ntot, CAST(SUM(w) AS BIGINT) AS wtot FROM agg
),
ord AS (
  SELECT a.*, {_EPOCH_MAX} * a.n AS cap,
         ROW_NUMBER() OVER (ORDER BY ({_EPOCH_MAX}.0 * a.n) / a.w ASC, a.source ASC) AS p
  FROM agg a
),
pre AS (
  SELECT o.*, t.wtot, {_EPOCH_BUDGET_X} * t.ntot AS b,
         CAST(SUM(o.cap) OVER (ORDER BY o.p) AS BIGINT) AS c_k,
         CAST(SUM(o.w) OVER (ORDER BY o.p) AS BIGINT) AS w_k
  FROM ord o CROSS JOIN tot t
),
cond AS (
  SELECT *,
         CASE WHEN CAST(b - c_k AS HUGEINT) * w >= CAST(cap AS HUGEINT) * (wtot - w_k)
              THEN p END AS capped_p
  FROM pre
),
kstar AS (
  SELECT COALESCE(MAX(capped_p), 0) AS k,
         COALESCE(MAX(CASE WHEN capped_p IS NOT NULL THEN c_k END)
                  FILTER (WHERE p = (SELECT COALESCE(MAX(capped_p), 0) FROM cond)), 0) AS ck,
         COALESCE(MAX(CASE WHEN capped_p IS NOT NULL THEN w_k END)
                  FILTER (WHERE p = (SELECT COALESCE(MAX(capped_p), 0) FROM cond)), 0) AS wk
  FROM cond
),
alloc AS (
  SELECT c.source, c.n, c.w, c.cap,
         CASE WHEN c.p <= k.k THEN CAST(c.cap AS HUGEINT)
              ELSE CAST(c.b - k.ck AS HUGEINT) * c.w // NULLIF(c.wtot - k.wk, 0)
         END AS a
  FROM cond c CROSS JOIN kstar k
)
SELECT source,
       CAST(n AS BIGINT) AS n_tokens,
       CAST(w AS BIGINT) AS weight,
       CAST(cap AS BIGINT) AS cap_tokens,
       CAST(a AS BIGINT) AS alloc_tokens,
       CAST((2 * 1000000 * a + n) // (2 * n) AS BIGINT) AS epochs_micro
FROM alloc
""",
)
def curate_epoch_waterfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget epoch scheduling: distribute a 2×-corpus token budget
    across sources proportional to lexical-diversity weight (Σ distinct
    tokens per doc), each source capped at 4 epochs, leftovers re-flowing
    — closed-form integer water-filling (operators/curate.py
    epoch_waterfill). The corpus-scale per-source aggregate is the
    distributed part; the allocation runs on |sources| rows."""
    from whatsapp_vectordb_spark.functions.text import tokens
    from whatsapp_vectordb_spark.operators.curate import epoch_waterfill

    docs = _t(spark, sf_dir, "documents").select("source", tokens("text").alias("_tk"))
    per_source = (
        docs.select(
            "source",
            F.size("_tk").cast("long").alias("_nt"),
            F.size(F.array_distinct("_tk")).cast("long").alias("_nd"),
        )
        .groupBy("source")
        .agg(
            F.sum("_nt").cast("long").alias("n_tokens"),
            F.sum("_nd").cast("long").alias("weight"),
        )
    )
    ntot = per_source.agg(F.sum("n_tokens")).head()[0]
    return epoch_waterfill(
        per_source, budget=_EPOCH_BUDGET_X * int(ntot), max_epochs=_EPOCH_MAX
    )


# ==========================================================================
# Round 5 (batch 7): sketch rollup tables — persisted per-day HLL registers
# MAX-merged to weekly estimates without rescanning raw events (the 100 TB
# pre-aggregation pattern), checked against exact weekly distincts.
# ==========================================================================

_HLL_ROLLUP_DIR = _oracle_scratch("hll_rollup_oracle")


@_register(
    "events_hll_daily_rollup",
    f"""
WITH regs AS (
  SELECT day, bucket, rho_max
  FROM read_parquet('{_HLL_ROLLUP_DIR}/daily/*.parquet')
),
wk AS (
  SELECT strftime(date_trunc('week', CAST(day AS DATE)), '%Y-%m-%d') AS week,
         bucket, MAX(rho_max) AS rho
  FROM regs GROUP BY 1, 2
),
agg AS (
  SELECT week,
         CAST(SUM(1::BIGINT << (45 - rho)) AS BIGINT) AS s_ne,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM wk GROUP BY week
),
est AS (
  SELECT week,
         s_ne + ({_HLL_M} - cnt) * (1::BIGINT << 45) AS s,
         {_HLL_M} - cnt AS zeros
  FROM agg
),
e2 AS (
  SELECT week,
         CASE WHEN (CAST({(_HLL_ALPHA * _HLL_M * _HLL_M) * float(1 << 45)!r} AS DOUBLE) / s)
                   <= CAST({2.5 * _HLL_M!r} AS DOUBLE) AND zeros > 0
              THEN CAST({_HLL_M} AS DOUBLE) * ln(CAST({_HLL_M} AS DOUBLE) / zeros)
              ELSE CAST({(_HLL_ALPHA * _HLL_M * _HLL_M) * float(1 << 45)!r} AS DOUBLE) / s
         END AS e
  FROM est
),
ex AS (
  SELECT strftime(date_trunc('week', ts), '%Y-%m-%d') AS week,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct
  FROM events GROUP BY 1
)
SELECT e2.week, ROUND(e2.e, 4) AS hll_estimate, ex.exact_distinct
FROM e2 JOIN ex ON e2.week = ex.week
""",
)
def events_hll_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch rollup table: per-DAY sparse HLL registers are persisted
    once (the tiny pre-aggregate a 100 TB pipeline stores instead of raw
    ids), then WEEKLY distinct-user estimates are answered purely by
    MAX-merging the stored registers — the raw events are only touched
    for the exact-count comparison column. Register merge is associative,
    so day→week→month rollups all read sketch rows, never data
    (operators/sketches.py hll_grouped_registers /
    hll_estimate_from_sparse)."""
    from whatsapp_vectordb_spark.operators.sketches import (
        hll_estimate_from_sparse,
        hll_grouped_registers,
    )

    ev = _events(spark, sf_dir)
    daily = hll_grouped_registers(
        ev.withColumn("day", F.date_format("ts", "yyyy-MM-dd")),
        "user_id",
        ["day"],
        log2m=10,
    )
    path = os.path.join(_HLL_ROLLUP_DIR, "daily")
    daily.write.mode("overwrite").parquet(path)

    stored = spark.read.parquet(path)
    weekly = (
        stored.withColumn(
            "week", F.date_format(F.date_trunc("week", F.to_date("day")), "yyyy-MM-dd")
        )
        .groupBy("week", "bucket")
        .agg(F.max("rho_max").alias("rho_max"))
    )
    est = hll_estimate_from_sparse(weekly, ["week"], log2m=10)
    exact = (
        ev.select(
            F.date_format(F.date_trunc("week", "ts"), "yyyy-MM-dd").alias("week"),
            "user_id",
        )
        .groupBy("week")
        .agg(F.countDistinct("user_id").cast("long").alias("exact_distinct"))
    )
    return est.join(exact, "week")


@_register(
    "text_tokenizer_fertility",
    f"""
WITH per AS (
  SELECT lang,
         CAST(len(tk) AS BIGINT) AS nt,
         CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\\s]')) AS BIGINT) AS np,
         CAST(length(text) AS BIGINT) AS nc
  FROM (SELECT lang, text, {_TOKS.format(c='text')} AS tk FROM documents)
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(nt) AS BIGINT) AS n_tokens,
       CAST(SUM(np) AS BIGINT) AS n_pieces,
       ROUND(SUM(np) / CAST(NULLIF(SUM(nt), 0) AS DOUBLE), 6) AS fertility,
       ROUND(SUM(nc) / CAST(NULLIF(SUM(nt), 0) AS DOUBLE), 6) AS chars_per_token
FROM per GROUP BY lang
""",
)
def text_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language tokenizer fertility (subword pieces per word token)
    and chars-per-token — the standard multilingual tokenizer-cost audit
    (a high-fertility language pays more sequence length per word).
    Ratio-of-sums over the corpus, one tiny per-language aggregate; the
    BPE-ish piece regex is the shared deterministic proxy from
    operators/textops.py."""
    from whatsapp_vectordb_spark.functions.text import tokens
    from whatsapp_vectordb_spark.operators.textops import BPE_PIECE_RE

    docs = _t(spark, sf_dir, "documents").select(
        "lang",
        F.size(tokens("text")).cast("long").alias("_nt"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(BPE_PIECE_RE), 0))
        .cast("long")
        .alias("_np"),
        F.length("text").cast("long").alias("_nc"),
    )
    return docs.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("_nt").cast("long").alias("n_tokens"),
        F.sum("_np").cast("long").alias("n_pieces"),
        F.sum("_nc").cast("long").alias("_nc_sum"),
    ).select(
        "lang",
        "n_docs",
        "n_tokens",
        "n_pieces",
        F.round(
            F.col("n_pieces") / F.nullif(F.col("n_tokens"), F.lit(0)).cast("double"), 6
        ).alias("fertility"),
        F.round(
            F.col("_nc_sum") / F.nullif(F.col("n_tokens"), F.lit(0)).cast("double"), 6
        ).alias("chars_per_token"),
    )


@_register(
    "text_rake_keywords",
    f"""
WITH toks AS (SELECT doc_id, {_TOKS.format(c='text')} AS tk FROM documents),
pos AS (
  SELECT t.doc_id, CAST(i.i - 1 AS BIGINT) AS pos, t.tk[i.i] AS tok
  FROM toks t, LATERAL unnest(range(1, len(t.tk) + 1)) i(i)
),
ns AS (SELECT * FROM pos WHERE NOT list_contains({_STOP_SQL}, tok)),
runs AS (
  SELECT doc_id, pos, tok,
         pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS island
  FROM ns
),
phr AS (
  SELECT doc_id, island, COUNT(*) AS phrase_len, MIN(pos) AS phrase_pos
  FROM runs GROUP BY doc_id, island
),
occ AS (
  SELECT r.doc_id, r.pos, r.tok, r.island, p.phrase_len, p.phrase_pos
  FROM runs r JOIN phr p ON r.doc_id = p.doc_id AND r.island = p.island
),
ws AS (
  SELECT doc_id, tok, COUNT(*) AS freq, CAST(SUM(phrase_len) AS BIGINT) AS deg
  FROM occ GROUP BY doc_id, tok
),
sw AS (
  SELECT doc_id, tok, CAST((2000000 * deg + freq) // (2 * freq) AS BIGINT) AS w_micro
  FROM ws
),
psc AS (
  SELECT o.doc_id, o.island,
         CAST(SUM(s.w_micro) AS BIGINT) AS score_micro,
         MIN(o.phrase_pos) AS phrase_pos
  FROM occ o JOIN sw s ON o.doc_id = s.doc_id AND o.tok = s.tok
  GROUP BY o.doc_id, o.island
),
ptxt AS (
  SELECT doc_id, island, string_agg(tok, ' ' ORDER BY pos) AS phrase
  FROM occ GROUP BY doc_id, island
),
ranked AS (
  SELECT p.doc_id, t.phrase, p.score_micro, p.phrase_pos,
         ROW_NUMBER() OVER (
           PARTITION BY p.doc_id ORDER BY p.score_micro DESC, p.phrase_pos ASC
         ) AS rk
  FROM psc p JOIN ptxt t ON p.doc_id = t.doc_id AND p.island = t.island
)
SELECT doc_id, phrase, score_micro, CAST(phrase_pos AS BIGINT) AS phrase_pos
FROM ranked WHERE rk = 1
""",
)
def text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE top keyphrase per document (Rose et al. 2010): stopword-split
    candidate runs, word score = degree/frequency integer-quantized
    BEFORE the phrase sum so totals are order-independent BIGINTs
    (operators/textops.py rake_keywords). All shuffles doc-keyed."""
    from whatsapp_vectordb_spark.operators.textops import rake_keywords

    return rake_keywords(_t(spark, sf_dir, "documents"))


_PHASH_DIR = _oracle_scratch("phash_near_dup_oracle")


@_register(
    "multimodal_phash_near_dup",
    f"""
WITH f AS (
  SELECT media_id, embedding
  FROM read_parquet('{_PHASH_DIR}/features/*.parquet')
),
sigs AS (
  SELECT media_id,
         CAST(SUM(CASE WHEN i.i < 32 AND embedding[i.i + 1] > 0
                       THEN (1::BIGINT << i.i) ELSE 0 END) AS BIGINT) AS lo,
         CAST(SUM(CASE WHEN i.i >= 32 AND embedding[i.i + 1] > 0
                       THEN (1::BIGINT << (i.i - 32)) ELSE 0 END) AS BIGINT) AS hi
  FROM f CROSS JOIN range(0, 64) i(i)
  GROUP BY 1
),
banded AS (
  SELECT media_id, lo, hi, b.b AS band,
         CASE WHEN b.b < 2 THEN (lo >> (16 * b.b)) & 65535
              ELSE (hi >> (16 * (b.b - 2))) & 65535 END AS bval
  FROM sigs CROSS JOIN range(0, 4) b(b)
),
cand AS (
  SELECT DISTINCT a.media_id AS id_a, x.media_id AS id_b,
                  a.lo AS la, a.hi AS ha, x.lo AS lb, x.hi AS hb
  FROM banded a
  JOIN banded x ON a.band = x.band AND a.bval = x.bval AND a.media_id < x.media_id
)
SELECT id_a, id_b,
       CAST(bit_count(xor(la, lb)) + bit_count(xor(ha, hb)) AS BIGINT) AS hamming
FROM cand
WHERE bit_count(xor(la, lb)) + bit_count(xor(ha, hb)) <= 3
""",
)
def multimodal_phash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media near-dup dedup, pHash style: persisted 64-d media features →
    sign-bit signatures → 4×16-bit band candidates → Hamming ≤ 3 verify
    (operators/dedup.py binary_near_dup_pairs). Banding recall is exact
    by pigeonhole (3 < 4 bands); both engines read the identical
    persisted float32 features."""
    from whatsapp_vectordb_spark.multimodal import extract_media_features
    from whatsapp_vectordb_spark.operators.dedup import binary_near_dup_pairs

    feats = (
        extract_media_features(_media_df(spark, sf_dir), dim=64)
        .where(F.col("embedding").isNotNull())
        .select("media_id", "embedding")
    )
    # the synthetic corpus has no byte-identical assets, so near-dup pairs
    # would be vacuously empty; add a deterministic "re-encode" variant of
    # every 25th asset (two feature coordinates sign-flipped → Hamming ≤ 2)
    # so the detector demonstrably FINDS the planted near-dups
    variants = feats.where(
        F.regexp_extract("media_id", r"^m(\d+)$", 1).cast("long") % 25 == 0
    ).select(
        F.concat(F.col("media_id"), F.lit("_v2")).alias("media_id"),
        F.transform(
            "embedding", lambda x, i: F.when(i < 2, -x).otherwise(x)
        ).alias("embedding"),
    )
    path = os.path.join(_PHASH_DIR, "features")
    feats.unionByName(variants).write.mode("overwrite").parquet(path)
    return binary_near_dup_pairs(
        spark.read.parquet(path), id_col="media_id", dim=64
    )


# Round 7: decoder → pHash → banded near-dup in ONE plan (VERDICT r6 #4).
# multimodal_real_decode proved the netpbm decoder; multimodal_phash_near_dup
# proved the banded Hamming join on synthesized features. This composes them:
# REAL P5 bytes (base image per doc + a perturbed re-encode variant for every
# 25th doc), pixel-exact decode, integer 4-px bucket pooling, mean-centered
# sign bits, banded candidates, Hamming ≤ 3 verify — and the oracle derives
# the pixels, bucket sums, signature bits, bands, and candidate pairs all in
# closed form from doc_id. Every stage is integer-exact, so a misread header
# byte, a wrong pooling stride, or a banding bug breaks the hash.
@_register(
    "multimodal_decode_phash_near_dup",
    f"""
WITH ids AS (
  SELECT 'm' || CAST(doc_id AS VARCHAR) AS media_id, doc_id, 0 AS variant
  FROM documents
  UNION ALL
  SELECT 'm' || CAST(doc_id AS VARCHAR) || '_v2', doc_id, 1
  FROM documents WHERE doc_id % 25 = 0
),
px AS (
  SELECT media_id, i.i AS idx,
         ((doc_id * 7 + (i.i % {_PPM_W}) * 3 + (i.i // {_PPM_W}) * 5)
           + CASE WHEN variant = 1 AND i.i < 8 THEN 128 ELSE 0 END) % 256 AS p
  FROM ids CROSS JOIN range(0, {_PPM_W * _PPM_H}) i(i)
),
buckets AS (
  SELECT media_id, idx // 4 AS j, SUM(p) AS bsum
  FROM px GROUP BY 1, 2
),
tot AS (SELECT media_id, SUM(bsum) AS total FROM buckets GROUP BY 1),
bits AS (
  SELECT b.media_id, b.j,
         CASE WHEN 64 * b.bsum > t.total THEN 1 ELSE 0 END AS bit
  FROM buckets b JOIN tot t ON t.media_id = b.media_id
),
sigs AS (
  SELECT media_id,
         CAST(SUM(CASE WHEN j < 32 THEN bit * (1::BIGINT << j) ELSE 0 END) AS BIGINT) AS lo,
         CAST(SUM(CASE WHEN j >= 32 THEN bit * (1::BIGINT << (j - 32)) ELSE 0 END) AS BIGINT) AS hi
  FROM bits GROUP BY 1
),
banded AS (
  SELECT media_id, lo, hi, b.b AS band,
         CASE WHEN b.b < 2 THEN (lo >> (16 * b.b)) & 65535
              ELSE (hi >> (16 * (b.b - 2))) & 65535 END AS bval
  FROM sigs CROSS JOIN range(0, 4) b(b)
),
cand AS (
  SELECT DISTINCT a.media_id AS id_a, x.media_id AS id_b,
                  a.lo AS la, a.hi AS ha, x.lo AS lb, x.hi AS hb
  FROM banded a
  JOIN banded x ON a.band = x.band AND a.bval = x.bval AND a.media_id < x.media_id
)
SELECT id_a, id_b,
       CAST(bit_count(xor(la, lb)) + bit_count(xor(ha, hb)) AS BIGINT) AS hamming
FROM cand
WHERE bit_count(xor(la, lb)) + bit_count(xor(ha, hb)) <= 3
""",
)
def multimodal_decode_phash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decoder → hash → join in a single plan: synthesize real P5 payloads
    executor-side (every 25th doc also gets a re-encode variant with its
    first 8 pixels shifted +128 mod 256), decode actual bytes with
    ``_parse_netpbm``, pool to 64 integer bucket sums, mean-center
    (64·bucket − total, exact integers in double), then the SAME
    ``binary_near_dup_pairs`` banded-Hamming operator as the feature-level
    query. Map-only through the decode; the only shuffles are the banded
    candidate equi-join — never all-pairs."""
    import numpy as _np
    import pandas as _pd

    from whatsapp_vectordb_spark.multimodal import (
        MEDIA_SCHEMA,
        _parse_netpbm,
        extract_media_features,
    )
    from whatsapp_vectordb_spark.operators.dedup import binary_near_dup_pairs

    w, h = _PPM_W, _PPM_H
    docs = _t(spark, sf_dir, "documents").select("doc_id")

    def gen(batches):
        header = f"P5\n{w} {h}\n255\n".encode()
        base = _np.arange(w)[None, :] * 3 + _np.arange(h)[:, None] * 5
        for pdf in batches:
            out_ids, out_content = [], []
            for i in pdf["doc_id"].to_numpy():
                px = ((int(i) * 7 + base) % 256).astype(_np.int64)
                out_ids.append(f"m{int(i)}")
                out_content.append(header + px.astype(_np.uint8).tobytes())
                if int(i) % 25 == 0:
                    flat = px.ravel().copy()
                    flat[:8] = (flat[:8] + 128) % 256
                    out_ids.append(f"m{int(i)}_v2")
                    out_content.append(
                        header + flat.reshape(h, w).astype(_np.uint8).tobytes()
                    )
            yield _pd.DataFrame(
                {
                    "media_id": out_ids,
                    "modality": "image",
                    "content": out_content,
                    "mime": "image/x-portable-graymap",
                    "width": w,
                    "height": h,
                    "duration_ms": None,
                }
            )

    media = docs.mapInPandas(gen, MEDIA_SCHEMA)

    def bucket_sums(b: bytes | None):
        if b is None:
            return None
        px = _np.rint(_parse_netpbm(b) * 255.0).astype(_np.int64).ravel()
        return px.reshape(64, 4).sum(axis=1).astype(float).tolist()

    feats = extract_media_features(media, decoder=bucket_sums)
    total = F.aggregate(
        F.col("embedding"), F.lit(0.0), lambda acc, x: acc + x.cast("double")
    )
    centered = feats.where(F.col("embedding").isNotNull()).select(
        "media_id",
        F.transform(
            "embedding", lambda x: F.lit(64.0) * x.cast("double") - total
        ).alias("embedding"),
    )
    return binary_near_dup_pairs(centered, id_col="media_id", dim=64, max_hamming=3)


_IVF_SWEEP_DIR = _oracle_scratch("ivf_sweep_oracle")


@_register(
    "ann_ivf_nprobe_sweep",
    f"""
WITH cells AS (
  SELECT * FROM read_parquet('{_IVF_SWEEP_DIR}/cells/*/*.parquet', hive_partitioning = 1)
),
probes AS (
  SELECT nprobe, centroid FROM read_parquet('{_IVF_SWEEP_DIR}/probe/*.parquet')
),
q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
scored AS (
  SELECT p.nprobe, c.vec_id,
         ROUND(list_cosine_similarity(c.embedding::DOUBLE[], q.qv), 6) AS score
  FROM cells c
  JOIN probes p ON CAST(c.centroid AS BIGINT) = CAST(p.centroid AS BIGINT)
  CROSS JOIN q
  WHERE list_cosine_similarity(c.embedding::DOUBLE[], q.qv) IS NOT NULL
),
ranked AS (
  SELECT nprobe, vec_id,
         ROW_NUMBER() OVER (PARTITION BY nprobe ORDER BY score DESC, vec_id ASC) AS rk
  FROM scored
),
approx AS (SELECT nprobe, vec_id FROM ranked WHERE rk <= 10),
exact AS (
  SELECT c.vec_id
  FROM cells c CROSS JOIN q
  WHERE list_cosine_similarity(c.embedding::DOUBLE[], q.qv) IS NOT NULL
  ORDER BY ROUND(list_cosine_similarity(c.embedding::DOUBLE[], q.qv), 6) DESC,
           c.vec_id ASC
  LIMIT 10
)
SELECT a.nprobe,
       CAST(COUNT(e.vec_id) AS BIGINT) AS hits,
       CAST(COUNT(e.vec_id) * 100000 AS BIGINT) AS recall_micro
FROM approx a LEFT JOIN exact e ON a.vec_id = e.vec_id
GROUP BY a.nprobe
""",
)
def ann_ivf_nprobe_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall/cost tradeoff curve for the IVF index: probe the SAME
    persisted partition-pruned index at nprobe ∈ {{1, 2, 4}} and report
    recall@10 vs the exact scan per setting — the evaluation every ANN
    deployment runs before picking its operating point. Probed centroid
    ids persist alongside the index so the oracle replays the identical
    sweep; recall is an integer (hits × 100000)."""
    from whatsapp_vectordb_spark.operators.ann import IvfIndex

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    qvec = emb.where(F.col("vec_id") == 0).head()["embedding"]
    IvfIndex.build(emb, n_centroids=8).save(_IVF_SWEEP_DIR)
    loaded = IvfIndex.load(spark, _IVF_SWEEP_DIR)

    sweep = (1, 2, 4)
    probe_rows = [
        (np_, int(c))
        for np_ in sweep
        for c in loaded.probe_centroid_ids(qvec, nprobe=np_)
    ]
    spark.createDataFrame(probe_rows, "nprobe bigint, centroid bigint").coalesce(
        1
    ).write.mode("overwrite").parquet(os.path.join(_IVF_SWEEP_DIR, "probe"))

    approx = None
    for np_ in sweep:
        t = (
            loaded.probe(qvec, k=10, nprobe=np_, round_to=ROUND_SCORE)
            .select(F.lit(np_).cast("long").alias("nprobe"), "vec_id")
        )
        approx = t if approx is None else approx.unionByName(t)
    exact = topk(
        loaded.assigned.select("vec_id", "embedding"), qvec, k=10, round_to=ROUND_SCORE
    ).select("vec_id")
    return (
        approx.join(F.broadcast(exact).withColumn("_hit", F.lit(1)), "vec_id", "left")
        .groupBy("nprobe")
        .agg(F.sum(F.coalesce(F.col("_hit"), F.lit(0))).cast("long").alias("hits"))
        .select(
            "nprobe",
            "hits",
            (F.col("hits") * F.lit(100000)).cast("long").alias("recall_micro"),
        )
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
    return spark.createDataFrame(
        out, "n_remaining bigint, id_checksum bigint, n_deleted bigint"
    )


def _minhash_calibration_sql(num_hashes: int, bands: int, shingle_n: int) -> str:
    r = num_hashes // bands
    sig = _minhash_sig_sql(num_hashes, shingle_n, _AUG_SQL)
    band_selects = "\nUNION ALL\n".join(
        "SELECT doc_id, {b} AS band, md5(concat_ws(',', {cols})) AS band_key FROM sig".format(
            b=b,
            cols=", ".join(f"CAST(s{i} AS VARCHAR)" for i in range(b * r, (b + 1) * r)),
        )
        for b in range(bands)
    )
    match_sum = " + ".join(
        f"CASE WHEN sa.s{i} = sb.s{i} THEN 1 ELSE 0 END" for i in range(num_hashes)
    )
    return f"""
WITH sig AS ({sig}),
banded AS ({band_selects}),
cand AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
est AS (
  SELECT c.id_a, c.id_b, CAST({match_sum} AS INTEGER) AS n_match
  FROM cand c
  JOIN sig sa ON sa.doc_id = c.id_a
  JOIN sig sb ON sb.doc_id = c.id_b
),
corpus2 AS ({_AUG_SQL}),
toks2 AS (SELECT doc_id, {_TOKS.format(c='text')} AS tk FROM corpus2),
shl2 AS (SELECT doc_id, {_sh_sql(shingle_n)} AS shingles FROM toks2),
ex2 AS (SELECT doc_id, unnest(shingles) AS s FROM shl2),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM ex2 GROUP BY doc_id),
inter AS (
  SELECT c.id_a, c.id_b, COUNT(*) AS n_common
  FROM cand c
  JOIN ex2 ea ON ea.doc_id = c.id_a
  JOIN ex2 eb ON eb.doc_id = c.id_b AND eb.s = ea.s
  GROUP BY 1, 2
),
jm AS (
  SELECT c.id_a, c.id_b,
         COALESCE(i.n_common, 0) AS nc,
         na.n + nb.n - COALESCE(i.n_common, 0) AS nu
  FROM cand c
  LEFT JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
  JOIN sizes na ON na.doc_id = c.id_a
  JOIN sizes nb ON nb.doc_id = c.id_b
),
j AS (
  SELECT id_a, id_b, CAST((2000000 * nc + nu) // (2 * nu) AS BIGINT) AS j_micro
  FROM jm
)
SELECT e.n_match,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(j.j_micro) // COUNT(*) AS BIGINT) AS mean_jaccard_micro
FROM est e JOIN j ON j.id_a = e.id_a AND j.id_b = e.id_b
GROUP BY e.n_match
"""


@_register("dedup_minhash_calibration", _minhash_calibration_sql(16, 4, 3))
def dedup_minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimate-vs-exact calibration for the MinHash sketch: per LSH
    candidate pair, agreeing-signature-row count (the k/H Jaccard
    estimator) against exact Jaccard, aggregated per agreement level in
    integer micro-units — what a 12/16 match MEANS on this corpus,
    measured before the sketch replaces the exact verify at scale
    (operators/dedup.py minhash_calibration)."""
    from whatsapp_vectordb_spark.operators.dedup import minhash_calibration

    return minhash_calibration(
        _augmented_docs(spark, sf_dir), num_hashes=16, bands=4, shingle_n=3
    )


@_register(
    "text_langid_confusion",
    f"""
WITH toks AS (SELECT doc_id, lang, {_TOKS.format(c='text')} AS tk FROM documents),
ratios AS (
  SELECT doc_id, lang,
    CASE WHEN len(tk) > 0 THEN len(list_filter(tk, x -> list_contains({_STOP_SQL}, x)))::DOUBLE / len(tk) ELSE 0.0 END AS r_en,
    CASE WHEN len(tk) > 0 THEN len(list_filter(tk, x -> list_contains(['der','die','das','und','ist','nicht','ein','eine','zu','mit','von','auf','für','er','sie','es','ich','du','wir'], x)))::DOUBLE / len(tk) ELSE 0.0 END AS r_de,
    CASE WHEN len(tk) > 0 THEN len(list_filter(tk, x -> list_contains(['el','la','los','las','de','que','y','en','un','una','es','no','por','con','para','su','al','lo','se','mi','tu'], x)))::DOUBLE / len(tk) ELSE 0.0 END AS r_es,
    CASE WHEN len(tk) > 0 THEN len(list_filter(tk, x -> list_contains(['le','la','les','de','des','et','est','une','un','que','ne','pas','pour','dans','ce','il','elle','nous','vous'], x)))::DOUBLE / len(tk) ELSE 0.0 END AS r_fr
  FROM toks
),
pred AS (
  SELECT lang,
         CASE WHEN GREATEST(r_en, r_de, r_es, r_fr) = 0 THEN 'und'
              WHEN r_de = GREATEST(r_en, r_de, r_es, r_fr) THEN 'de'
              WHEN r_en = GREATEST(r_en, r_de, r_es, r_fr) THEN 'en'
              WHEN r_es = GREATEST(r_en, r_de, r_es, r_fr) THEN 'es'
              WHEN r_fr = GREATEST(r_en, r_de, r_es, r_fr) THEN 'fr'
         END AS lang_pred
  FROM ratios
)
SELECT lang, lang_pred, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM pred GROUP BY lang, lang_pred
""",
)
def text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID confusion matrix: heuristic predictions cross-tabbed
    against the corpus's declared lang labels — the evaluation every
    lang-filter stage needs before it silently drops a language
    (operators/textops.py language_id + one tiny aggregate)."""
    from whatsapp_vectordb_spark.operators.textops import language_id

    docs = _t(spark, sf_dir, "documents")
    preds = language_id(docs).select("doc_id", "lang_pred")
    return (
        docs.select("doc_id", "lang")
        .join(preds, "doc_id")
        .groupBy("lang", "lang_pred")
        .agg(F.count("*").cast("long").alias("n_docs"))
    )


@_register(
    "text_novelty_vs_reference",
    f"""
WITH toks AS (SELECT doc_id, {_TOKS.format(c='text')} AS tk FROM documents),
shl AS (SELECT doc_id, {_sh_sql(5)} AS shingles FROM toks),
ex AS (SELECT doc_id, unnest(shingles) AS s FROM shl),
ref AS (SELECT DISTINCT s FROM ex WHERE doc_id % 10 = 0),
tgt AS (SELECT doc_id, s FROM ex WHERE doc_id % 10 <> 0),
tot AS (SELECT doc_id, COUNT(*) AS n_shingles FROM tgt GROUP BY doc_id),
nov AS (
  SELECT t.doc_id, COUNT(*) AS n_novel
  FROM tgt t LEFT JOIN ref r ON t.s = r.s
  WHERE r.s IS NULL
  GROUP BY t.doc_id
)
SELECT t.doc_id,
       CAST(t.n_shingles AS BIGINT) AS n_shingles,
       CAST(COALESCE(n.n_novel, 0) AS BIGINT) AS n_novel,
       CAST((2000000 * COALESCE(n.n_novel, 0) + t.n_shingles) // (2 * t.n_shingles)
            AS BIGINT) AS novelty_micro
FROM tot t LEFT JOIN nov n ON n.doc_id = t.doc_id
""",
)
def text_novelty_vs_reference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Memorization/novelty audit: per non-reference doc, the fraction of
    its distinct 5-gram shingles absent from the reference slice
    (doc_id % 10 == 0) — does new data ADD content or replay its
    sources. One anti-join on 60-bit int64 shingle ids
    (operators/dedup.py novelty_vs_reference)."""
    from whatsapp_vectordb_spark.operators.dedup import novelty_vs_reference

    return novelty_vs_reference(
        _t(spark, sf_dir, "documents"), F.col("doc_id") % 10 == 0, shingle_n=5
    )


_MRL_SWEEP_DIMS = (8, 16, 32)


def _mrl_sweep_sql() -> str:
    blocks = []
    for d in _MRL_SWEEP_DIMS:
        blocks.append(
            f"""
SELECT {d} AS dim, vec_id FROM (
  SELECT e.vec_id
  FROM embeddings e
  CROSS JOIN (SELECT embedding[1:{d}]::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0) q
  WHERE list_cosine_similarity(e.embedding[1:{d}]::DOUBLE[], q.qv) IS NOT NULL
  ORDER BY ROUND(list_cosine_similarity(e.embedding[1:{d}]::DOUBLE[], q.qv), 6) DESC,
           e.vec_id ASC
  LIMIT {_MRL_SHORT}
)"""
        )
    shorts = "\nUNION ALL\n".join(blocks)
    return f"""
WITH shorts AS ({shorts}),
qv AS (SELECT embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id = 0),
rer AS (
  SELECT s.dim, e.vec_id,
         ROW_NUMBER() OVER (
           PARTITION BY s.dim
           ORDER BY ROUND(list_cosine_similarity(e.embedding::DOUBLE[], qv.v), 6) DESC,
                    e.vec_id ASC
         ) AS rk
  FROM embeddings e JOIN shorts s ON e.vec_id = s.vec_id CROSS JOIN qv
),
approx AS (SELECT dim, vec_id FROM rer WHERE rk <= 10),
exact AS (
  SELECT e.vec_id
  FROM embeddings e CROSS JOIN qv
  WHERE list_cosine_similarity(e.embedding::DOUBLE[], qv.v) IS NOT NULL
  ORDER BY ROUND(list_cosine_similarity(e.embedding::DOUBLE[], qv.v), 6) DESC, e.vec_id ASC
  LIMIT 10
)
SELECT a.dim,
       CAST(COUNT(x.vec_id) AS BIGINT) AS hits,
       CAST(COUNT(x.vec_id) * 100000 AS BIGINT) AS recall_micro
FROM approx a LEFT JOIN exact x ON a.vec_id = x.vec_id
GROUP BY a.dim
"""


@_register("ann_mrl_dim_sweep", _mrl_sweep_sql())
def ann_mrl_dim_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka operating-point curve: recall@10 of the
    prefix-d shortlist-50 → exact re-rank pipeline for d ∈ {8, 16, 32}
    — how much prefix you can throw away before recall pays for it, the
    MRL twin of the IVF nprobe sweep. Integer recall (hits × 100000)."""
    from whatsapp_vectordb_spark.operators.projection import mrl_truncate
    from whatsapp_vectordb_spark.operators.search import topk

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    qfull = emb.where(F.col("vec_id") == 0).head()["embedding"]
    exact = topk(emb, qfull, k=10, round_to=ROUND_SCORE).select("vec_id")
    approx = None
    for d in _MRL_SWEEP_DIMS:
        trunc = mrl_truncate(emb, d)
        short = topk(
            trunc, qfull[:d], k=_MRL_SHORT, round_to=ROUND_SCORE, vec_col="mrl_vec"
        ).select("vec_id")
        rer = topk(
            emb.join(F.broadcast(short), "vec_id"), qfull, k=10, round_to=ROUND_SCORE
        ).select(F.lit(d).cast("long").alias("dim"), "vec_id")
        approx = rer if approx is None else approx.unionByName(rer)
    return (
        approx.join(F.broadcast(exact).withColumn("_hit", F.lit(1)), "vec_id", "left")
        .groupBy("dim")
        .agg(F.sum(F.coalesce(F.col("_hit"), F.lit(0))).cast("long").alias("hits"))
        .select(
            "dim",
            "hits",
            (F.col("hits") * F.lit(100000)).cast("long").alias("recall_micro"),
        )
    )


# Streaming HLL maintenance: stream ≡ batch (register MAX-merge is
# associative), so the oracle is literally the batch events_hll_users SQL.
@_register("streaming_hll_registers", ORACLES["events_hll_users"])
def streaming_hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Micro-batched HLL register maintenance via foreachBatch (per-batch
    sparse register deltas, idempotent batch_id-keyed sink); the merged
    estimate must equal the one-shot batch sketch bit-for-bit
    (streaming/ops.py run_hll_register_stream)."""
    import shutil

    from whatsapp_vectordb_spark.streaming.ops import run_hll_register_stream

    state = _oracle_scratch("hll_stream_state")
    shutil.rmtree(state, ignore_errors=True)
    return run_hll_register_stream(
        spark, os.path.join(sf_dir, "events.parquet"), state
    )


_TRI_DIR = _oracle_scratch("triangle_oracle")


@_register(
    "graph_triangle_count",
    f"""
WITH raw AS (SELECT src, dst FROM read_parquet('{_TRI_DIR}/edges/*.parquet')),
und AS (
  SELECT DISTINCT LEAST(src, dst) AS lo, GREATEST(src, dst) AS hi
  FROM raw WHERE src <> dst
),
tris AS (
  SELECT COUNT(*) AS n
  FROM und e1
  JOIN und e2 ON e2.lo = e1.hi                -- (a,b) + (b,c)
  JOIN und e3 ON e3.lo = e1.lo AND e3.hi = e2.hi  -- close (a,c)
)
SELECT CAST(tris.n AS BIGINT) AS n_triangles,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM und) AS n_edges,
       (SELECT CAST(COUNT(DISTINCT v) AS BIGINT)
        FROM (SELECT lo AS v FROM und UNION ALL SELECT hi FROM und)) AS n_nodes
FROM tris
""",
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the kNN graph: edges persisted once, then two
    id-oriented equi-joins count each triangle exactly once
    (operators/graph.py triangle_count) — the local-density signal next
    to PageRank; both engines read the identical persisted edge list."""
    from whatsapp_vectordb_spark.operators.ann import knn_graph_lsh
    from whatsapp_vectordb_spark.operators.graph import triangle_count

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    edges = knn_graph_lsh(emb, k=5, n_planes=32, bands=4, impl="numpy", dim=64).select(
        F.col("src").cast("long").alias("src"), F.col("nbr").cast("long").alias("dst")
    )
    path = os.path.join(_TRI_DIR, "edges")
    edges.write.mode("overwrite").parquet(path)
    return triangle_count(spark.read.parquet(path))


@_register(
    "events_top_paths",
    """
WITH seq AS (
  SELECT event_type AS e1,
         LEAD(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e2,
         LEAD(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e3
  FROM events
)
SELECT e1 || '>' || e2 || '>' || e3 AS path, CAST(COUNT(*) AS BIGINT) AS n
FROM seq WHERE e3 IS NOT NULL
GROUP BY 1
ORDER BY n DESC, path ASC
LIMIT 20
""",
)
def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top 3-event paths across user sequences (the longer-range sibling
    of the Markov transition matrix): one user-keyed window shuffle
    computes both leads, then a |types|³-bounded aggregate and a
    deterministic top-20 cut."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = _events(spark, sf_dir).select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    )
    return (
        seq.where(F.col("e3").isNotNull())
        .select(F.concat_ws(">", "e1", "e2", "e3").alias("path"))
        .groupBy("path")
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy(F.col("n").desc(), F.col("path").asc())
        .limit(20)
    )


_PQ_SWEEP_DIR = _oracle_scratch("pq_distortion_oracle")
_PQ_SWEEP_MS = (4, 8, 16)
_PQ_SWEEP_DIM = 64


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
    from whatsapp_vectordb_spark.operators.ann import PqIndex

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    out = None
    for m in _PQ_SWEEP_MS:
        dsub = _PQ_SWEEP_DIM // m
        idx = PqIndex.build(emb, m=m, ksub=16, sample_rows=500, seed=0)
        idx.save(os.path.join(_PQ_SWEEP_DIR, f"idx_m{m}"), idx.encode(emb))
        spark.read.parquet(
            os.path.join(_PQ_SWEEP_DIR, f"idx_m{m}", "codes")
        ).write.mode("overwrite").parquet(os.path.join(_PQ_SWEEP_DIR, f"codes_m{m}"))
        book_rows = [
            (j, c, d, int(round(float(idx.codebooks[j][c][d]) * 1_000_000)))
            for j in range(m)
            for c in range(idx.codebooks.shape[1])
            for d in range(dsub)
        ]
        spark.createDataFrame(
            book_rows, "bj int, bc int, bd int, v_micro long"
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(_PQ_SWEEP_DIR, f"books_m{m}")
        )

        codes = spark.read.parquet(os.path.join(_PQ_SWEEP_DIR, f"codes_m{m}"))
        books = spark.read.parquet(os.path.join(_PQ_SWEEP_DIR, f"books_m{m}"))
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


@_register(
    "events_quantile_calibration",
    """
WITH b AS (
  SELECT event_type, CAST(FLOOR(value * 10) AS BIGINT) AS bin FROM events
),
counts AS (SELECT event_type, bin, COUNT(*) AS c FROM b GROUP BY 1, 2),
cum AS (
  SELECT event_type, bin,
         SUM(c) OVER (PARTITION BY event_type ORDER BY bin) AS cumc
  FROM counts
),
tot AS (SELECT event_type, COUNT(*) AS total FROM events GROUP BY 1),
pcts(pct) AS (VALUES (50), (90), (99)),
hit AS (
  SELECT c.event_type, p.pct, MIN(c.bin) AS qbin
  FROM cum c JOIN tot t ON t.event_type = c.event_type
  CROSS JOIN pcts p
  WHERE c.cumc >= (p.pct * t.total + 99) // 100
  GROUP BY 1, 2
),
ranked AS (
  SELECT event_type, value,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn
  FROM events
),
exact AS (
  SELECT r.event_type, p.pct, ROUND(r.value, 6) AS exact_q
  FROM ranked r
  JOIN tot t ON t.event_type = r.event_type
  CROSS JOIN pcts p
  WHERE r.rn = (p.pct * t.total + 99) // 100
)
SELECT h.event_type, CAST(h.pct AS INTEGER) AS pct,
       ROUND((h.qbin + 1) / 10.0, 6) AS quantile_est,
       x.exact_q,
       ROUND(ABS(ROUND((h.qbin + 1) / 10.0, 6) - x.exact_q), 6) AS abs_err
FROM hit h JOIN exact x ON x.event_type = h.event_type AND x.pct = h.pct
""",
)
def events_quantile_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-vs-exact quantile calibration: the mergeable histogram
    sketch's p50/p90/p99 against the true rank-selected value per event
    type, with the absolute error — the measured bound (≤ bin width)
    that justifies replacing a full sort with a sketch at 100 TB. Both
    sides use the same integer rank rule, so the comparison itself can't
    disagree across engines."""
    from whatsapp_vectordb_spark.operators.sketches import histogram_quantiles

    ev = _events(spark, sf_dir)
    est = histogram_quantiles(ev, percents=(50, 90, 99), bin_scale=10)
    w = Window.partitionBy("event_type").orderBy(
        F.col("value").cast("double"), "event_id"
    )
    ranked = ev.select(
        "event_type", "value", F.row_number().over(w).alias("_rn")
    )
    totals = ev.groupBy("event_type").agg(F.count("*").alias("_total"))
    pcts = spark.createDataFrame([(50,), (90,), (99,)], "pct int")
    exact = (
        ranked.join(totals, "event_type")
        .join(F.broadcast(pcts))
        .where(F.col("_rn") == F.expr("(pct * _total + 99) div 100"))
        .select("event_type", "pct", F.round("value", 6).alias("exact_q"))
    )
    return est.join(exact, ["event_type", "pct"]).select(
        "event_type",
        "pct",
        "quantile_est",
        "exact_q",
        F.round(F.abs(F.col("quantile_est") - F.col("exact_q")), 6).alias("abs_err"),
    )


_PMI_VOCAB = 200
_PMI_MIN_PAIRS = 5
_PMI_TOPK = 30


@_register(
    "text_pmi_pairs",
    f"""
WITH toks AS (
  SELECT doc_id, unnest(list_distinct({_TOKS.format(c='text')})) AS tok FROM documents
),
cx AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
vocab AS (SELECT tok, c FROM cx ORDER BY c DESC, tok ASC LIMIT {_PMI_VOCAB}),
ft AS (SELECT t.doc_id, t.tok FROM toks t JOIN vocab v ON v.tok = t.tok),
pairs AS (
  SELECT a.tok AS x, b.tok AS y, COUNT(*) AS c_xy
  FROM ft a JOIN ft b ON a.doc_id = b.doc_id AND a.tok < b.tok
  GROUP BY 1, 2
),
n AS (SELECT COUNT(*) AS n_docs FROM documents)
SELECT p.x, p.y, CAST(p.c_xy AS BIGINT) AS c_xy,
       ROUND(ln(CAST(n.n_docs AS DOUBLE) * p.c_xy / (vx.c * vy.c)), 6) AS pmi
FROM pairs p
JOIN vocab vx ON vx.tok = p.x
JOIN vocab vy ON vy.tok = p.y
CROSS JOIN n
WHERE p.c_xy >= {_PMI_MIN_PAIRS}
ORDER BY pmi DESC, x ASC, y ASC
LIMIT {_PMI_TOPK}
""",
)
def text_pmi_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-occurrence mining: top document-level PMI pairs over the
    top-200 vocabulary — collocation discovery for corpus
    analysis. The vocab cap bounds the per-doc pair fan-out (the scale
    guard: pairs explode quadratically in distinct tokens per doc, so at
    100 TB you mine a vocabulary, not the long tail); PMI is computed
    per pair from exact integer counts, so no float accumulates.
    """
    from whatsapp_vectordb_spark.functions.text import tokens

    docs = _t(spark, sf_dir, "documents")
    n_docs = docs.count()
    toks = docs.select(
        "doc_id", F.explode(F.array_distinct(tokens("text"))).alias("tok")
    )
    cx = toks.groupBy("tok").agg(F.count("*").alias("c"))
    vocab = cx.orderBy(F.col("c").desc(), F.col("tok").asc()).limit(_PMI_VOCAB)
    ft = toks.join(F.broadcast(vocab.select("tok")), "tok")
    a = ft.select("doc_id", F.col("tok").alias("x"))
    b = ft.select("doc_id", F.col("tok").alias("y"))
    pairs = (
        a.join(b, "doc_id")
        .where(F.col("x") < F.col("y"))
        .groupBy("x", "y")
        .agg(F.count("*").alias("c_xy"))
        .where(F.col("c_xy") >= _PMI_MIN_PAIRS)
    )
    vx = vocab.select(F.col("tok").alias("x"), F.col("c").alias("_cx"))
    vy = vocab.select(F.col("tok").alias("y"), F.col("c").alias("_cy"))
    return (
        pairs.join(F.broadcast(vx), "x")
        .join(F.broadcast(vy), "y")
        .select(
            "x",
            "y",
            F.col("c_xy").cast("long").alias("c_xy"),
            F.round(
                F.log(
                    F.lit(float(n_docs))
                    * F.col("c_xy")
                    / (F.col("_cx") * F.col("_cy"))
                ),
                6,
            ).alias("pmi"),
        )
        .orderBy(F.col("pmi").desc(), F.col("x").asc(), F.col("y").asc())
        .limit(_PMI_TOPK)
    )


_IVF_BATCH_DIR = _oracle_scratch("ivf_batch_oracle")


@_register(
    "ann_ivf_batched",
    f"""
WITH cells AS (
  SELECT * FROM read_parquet('{_IVF_BATCH_DIR}/cells/*/*.parquet', hive_partitioning = 1)
),
probes AS (
  SELECT query_id, centroid FROM read_parquet('{_IVF_BATCH_DIR}/probe/*.parquet')
),
q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
  FROM embeddings WHERE vec_id IN (0, 1, 2)
),
scored AS (
  SELECT p.query_id, c.vec_id,
         ROUND(list_cosine_similarity(c.embedding::DOUBLE[], q.qv), 6) AS score
  FROM cells c
  JOIN probes p ON CAST(c.centroid AS BIGINT) = p.centroid
  JOIN q ON q.query_id = p.query_id
  WHERE list_cosine_similarity(c.embedding::DOUBLE[], q.qv) IS NOT NULL
),
ranked AS (
  SELECT query_id, vec_id, score,
         ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY score DESC, vec_id ASC
         ) AS rk
  FROM scored
)
SELECT query_id, vec_id, score FROM ranked WHERE rk <= 5
""",
)
def ann_ivf_batched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched IVF probe: 3 queries answered in ONE pass over the union
    of their probed cells (IvfIndex.probe_batched) — per-query rescans of
    shared cells are the thing a 1000-query batch can't afford. The
    (query, centroid) probe map persists next to the index so the oracle
    replays the identical pruning."""
    from whatsapp_vectordb_spark.operators.ann import IvfIndex

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    IvfIndex.build(emb, n_centroids=8).save(_IVF_BATCH_DIR)
    loaded = IvfIndex.load(spark, _IVF_BATCH_DIR)
    queries = [
        (r["vec_id"], r["embedding"])
        for r in emb.where(F.col("vec_id").isin(0, 1, 2)).collect()
    ]
    probe_rows = [
        (int(qid), int(c))
        for qid, vec in queries
        for c in loaded.probe_centroid_ids(vec, nprobe=2)
    ]
    spark.createDataFrame(probe_rows, "query_id long, centroid bigint").coalesce(
        1
    ).write.mode("overwrite").parquet(os.path.join(_IVF_BATCH_DIR, "probe"))
    return loaded.probe_batched(queries, k=5, nprobe=2, round_to=ROUND_SCORE)


_OPQ_CMP_DIR = _oracle_scratch("opq_vs_pq_oracle")
_OPQ_CMP_M = 8
_OPQ_CMP_DSUB = _PQ_SWEEP_DIM // _OPQ_CMP_M


def _opq_cmp_sql() -> str:
    dsub = _OPQ_CMP_DSUB
    xm = "CAST(ROUND(e.embedding[d.d + 1]::DOUBLE * 1000000) AS BIGINT)"
    pq_block = f"""
SELECT 'pq' AS method, e.vec_id,
       CAST(SUM(({xm} - b.v_micro) * ({xm} - b.v_micro)) AS BIGINT) AS dist
FROM embeddings e
CROSS JOIN range(0, {_PQ_SWEEP_DIM}) d(d)
JOIN read_parquet('{_OPQ_CMP_DIR}/codes_pq/*.parquet') c ON c.vec_id = e.vec_id
JOIN read_parquet('{_OPQ_CMP_DIR}/books_pq/*.parquet') b
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
    from whatsapp_vectordb_spark.operators.ann import OpqIndex, PqIndex

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    dsub = _OPQ_CMP_DSUB

    def persist_books(idx, name):
        rows = [
            (j, c, d, int(round(float(idx.codebooks[j][c][d]) * 1_000_000)))
            for j in range(_OPQ_CMP_M)
            for c in range(idx.codebooks.shape[1])
            for d in range(dsub)
        ]
        spark.createDataFrame(rows, "bj int, bc int, bd int, v_micro long").coalesce(
            1
        ).write.mode("overwrite").parquet(os.path.join(_OPQ_CMP_DIR, name))

    pq = PqIndex.build(emb, m=_OPQ_CMP_M, ksub=16, sample_rows=500, seed=0)
    pq.encode(emb).write.mode("overwrite").parquet(
        os.path.join(_OPQ_CMP_DIR, "codes_pq")
    )
    persist_books(pq, "books_pq")

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
    spark.createDataFrame(rot_rows, "d int, k int, r_micro long").coalesce(
        1
    ).write.mode("overwrite").parquet(os.path.join(_OPQ_CMP_DIR, "rot"))

    dims = emb.select("vec_id", F.posexplode("embedding").alias("d", "x")).select(
        "vec_id",
        "d",
        F.round(F.col("x").cast("double") * 1_000_000).cast("long").alias("x_micro"),
    )

    # plain PQ distortion (segment-local reconstruction)
    codes_pq = spark.read.parquet(os.path.join(_OPQ_CMP_DIR, "codes_pq"))
    books_pq = spark.read.parquet(os.path.join(_OPQ_CMP_DIR, "books_pq"))
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


# Streaming ingest-time dedup: the persistent MinHash index fed by the
# STREAMING ENGINE (file source, one file per micro-batch); the union of
# per-batch pair sets must equal the one-shot batch dedup, so the oracle
# is literally dedup_minhash_lsh's SQL.
@_register("streaming_dedup_index", ORACLES["dedup_minhash_lsh"])
def streaming_dedup_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-time near-dup detection as a real Structured Streaming
    pipeline: the augmented corpus is written as 3 files and replayed
    file-per-trigger through foreachBatch; each micro-batch probes the
    stored band keys, emits its pairs (idempotently keyed by batch_id),
    and appends only its own state (operators/dedup_index.py
    MinHashDedupIndex.add_batch). Union of batch pair sets ≡ one-shot
    batch dedup under ANY batch split."""
    import shutil

    from whatsapp_vectordb_spark.operators.dedup_index import MinHashDedupIndex

    root = _oracle_scratch("stream_dedup")
    shutil.rmtree(root, ignore_errors=True)
    aug = _augmented_docs(spark, sf_dir)
    src = os.path.join(root, "src")
    aug.repartition(3).write.mode("overwrite").parquet(src)

    idx = MinHashDedupIndex(
        spark, os.path.join(root, "idx"), num_hashes=16, bands=4, shingle_n=3,
        threshold=0.5,
    )
    pairs_dir = os.path.join(root, "pairs")

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        (
            idx.add_batch(batch_df)
            .withColumn("batch_id", F.lit(batch_id).cast("long"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(pairs_dir)
        )

    stream = (
        spark.readStream.schema(aug.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = stream.writeStream.foreachBatch(handle).trigger(availableNow=True).start()
    q.awaitTermination()

    return (
        spark.read.schema("id_a long, id_b long, jaccard double, batch_id long")
        .parquet(pairs_dir)
        .drop("batch_id")
    )


@_register(
    "rel_scd2_point_in_time",
    """
WITH chg AS (
  SELECT c_custkey, 'SEG_A' AS c_mktsegment, 1 AS eff_seq
  FROM customer WHERE c_custkey % 5 = 0
  UNION ALL
  SELECT c_custkey, 'SEG_B', 2 FROM customer WHERE c_custkey % 10 = 0
  UNION ALL
  SELECT c_custkey, 'SEG_B', 3 FROM customer WHERE c_custkey % 20 = 0
),
v AS (
  SELECT c_custkey, c_mktsegment, CAST(0 AS BIGINT) AS eff_seq FROM customer
  UNION ALL
  SELECT c_custkey, c_mktsegment, CAST(eff_seq AS BIGINT) FROM chg
),
d AS (
  SELECT *, lag(c_mktsegment) OVER (PARTITION BY c_custkey ORDER BY eff_seq) AS prev
  FROM v
),
kept AS (
  SELECT c_custkey, c_mktsegment, eff_seq FROM d
  WHERE prev IS NULL OR prev <> c_mktsegment
),
hist AS (
  SELECT c_custkey, c_mktsegment,
         eff_seq AS valid_from_seq,
         lead(eff_seq) OVER (PARTITION BY c_custkey ORDER BY eff_seq) AS valid_to_seq
  FROM kept
),
o AS (SELECT o_orderkey, o_custkey, o_orderkey % 4 AS as_of_seq FROM orders)
SELECT o.as_of_seq, h.c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(o.o_orderkey) AS BIGINT) AS orderkey_checksum
FROM o
JOIN hist h ON h.c_custkey = o.o_custkey
 AND h.valid_from_seq <= o.as_of_seq
 AND (h.valid_to_seq IS NULL OR o.as_of_seq < h.valid_to_seq)
GROUP BY o.as_of_seq, h.c_mktsegment
""",
)
def rel_scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (time-travel) join against the SCD2 history: each
    order reads the customer version valid AT its as-of sequence — the
    query every versioned dimension exists to answer. Equi-join on the
    customer key plus an interval filter over that key's ≤4 versions;
    one shuffle, no range-join blow-up."""
    from whatsapp_vectordb_spark.operators.curate import scd2_apply

    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    k = F.col("c_custkey")
    changes = (
        cust.where(k % 5 == 0).select(k.alias("c_custkey"), F.lit("SEG_A").alias("c_mktsegment"), F.lit(1).alias("eff_seq"))
        .unionByName(cust.where(k % 10 == 0).select(k.alias("c_custkey"), F.lit("SEG_B").alias("c_mktsegment"), F.lit(2).alias("eff_seq")))
        .unionByName(cust.where(k % 20 == 0).select(k.alias("c_custkey"), F.lit("SEG_B").alias("c_mktsegment"), F.lit(3).alias("eff_seq")))
    )
    hist = scd2_apply(cust, changes, "c_custkey", ["c_mktsegment"])
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.pmod("o_orderkey", F.lit(4)).alias("as_of_seq")
    )
    j = orders.join(hist, orders.o_custkey == hist.c_custkey).where(
        (F.col("valid_from_seq") <= F.col("as_of_seq"))
        & (F.col("valid_to_seq").isNull() | (F.col("as_of_seq") < F.col("valid_to_seq")))
    )
    return j.groupBy("as_of_seq", "c_mktsegment").agg(
        F.count("*").cast("long").alias("n_orders"),
        F.sum("o_orderkey").cast("long").alias("orderkey_checksum"),
    )


_SHARD2_TOKENS = 4096


@_register(
    "pipeline_pretraining_shards",
    f"""
WITH toks AS (SELECT doc_id, text, source, {_TOKS.format(c='text')} AS tk FROM documents),
feats AS (
  SELECT doc_id, source,
         len(tk) AS n_tokens,
         CASE WHEN len(tk) > 0 THEN length(text)::DOUBLE / len(tk) ELSE 0.0 END AS mwl,
         CASE WHEN len(tk) > 0 THEN len(list_filter(tk, x -> list_contains({_STOP_SQL}, x)))::DOUBLE / len(tk) ELSE 0.0 END AS sr,
         CASE WHEN len(tk) > 0 THEN len(list_distinct(tk))::DOUBLE / len(tk) ELSE 0.0 END AS dv
  FROM toks
),
q AS (
  SELECT doc_id, source,
         CAST(round(ROUND(
           (CASE WHEN n_tokens >= 10 AND n_tokens <= 1000 THEN 1.0 ELSE 0.0 END) * 0.25
           + (CASE WHEN mwl >= 3.0 AND mwl <= 12.0 THEN 1.0 ELSE 0.0 END) * 0.25
           + LEAST(sr * 2.0, 1.0) * 0.25
           + dv * 0.25, 6) * 1000000) AS BIGINT) AS q_micro
  FROM feats
),
r AS (
  SELECT doc_id, source, q_micro,
         CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY q_micro DESC, doc_id ASC) AS BIGINT) AS rank,
         COUNT(*) OVER (PARTITION BY source) AS n
  FROM q
),
kept AS (
  SELECT doc_id FROM r WHERE ROUND(rank / CAST(n AS DOUBLE), 6) <= 0.5
),
hashed AS (
  SELECT t.doc_id, md5(trim(regexp_replace(lower(t.text), '\\s+', ' ', 'g'))) AS h,
         CAST(len(t.tk) AS BIGINT) AS nt
  FROM toks t JOIN kept k ON k.doc_id = t.doc_id
),
canon AS (SELECT h, MIN(doc_id) AS keeper FROM hashed GROUP BY h),
surv AS (
  SELECT hs.doc_id, hs.nt FROM hashed hs JOIN canon c ON c.keeper = hs.doc_id
),
hk AS (
  SELECT doc_id, nt,
         ('0x' || substr(md5('7:' || doc_id), 1, 15))::BIGINT AS hkey
  FROM surv
),
c AS (
  SELECT doc_id, nt,
         COALESCE(CAST(SUM(nt) OVER (ORDER BY hkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
                  0) AS cum_before
  FROM hk
),
s AS (
  SELECT doc_id, nt, CAST(cum_before // {_SHARD2_TOKENS} AS BIGINT) AS shard_id FROM c
)
SELECT shard_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(nt) AS BIGINT) AS n_tokens,
       CAST(SUM(doc_id) AS BIGINT) AS doc_id_checksum
FROM s GROUP BY shard_id
""",
)
def pipeline_pretraining_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-5 capstone: prepare a training run end to end — per-source
    quality CALIBRATION (grouped distributed prefix-sum percentiles,
    keep each source's top half), exact-dedup canonicalization (min-id
    per content hash), deterministic hash-permutation shuffle, and
    token-balanced shard cuts — emitted as the per-shard manifest a
    trainer consumes. Every stage is an already-oracle-checked operator;
    this query proves they COMPOSE: calibration never compares scores
    across sources, dedup runs on the kept set only, and the prefix sum
    sees the post-dedup corpus."""
    docs = _t(spark, sf_dir, "documents")
    return pretraining_shards_frame(docs, shard_tokens=_SHARD2_TOKENS, seed=7)


def pretraining_shards_frame(
    docs: DataFrame, shard_tokens: int, seed: int
) -> DataFrame:
    """The pretraining-shards stage graph over ANY (doc_id, text, source)
    corpus frame — shared by the registered capstone and
    tools/stress_pipelines.py so the stress measures exactly the graph
    the oracle gates."""
    from whatsapp_vectordb_spark.functions.text import normalize_text, tokens
    from whatsapp_vectordb_spark.operators.curate import shard_assign
    from whatsapp_vectordb_spark.operators.textops import quality_percentile_by_source

    kept = (
        quality_percentile_by_source(docs)
        .where(F.col("pct") <= 0.5)
        .select("doc_id")
    )
    # hash/token-count MAP-SIDE before the keep-join so the shuffle moves
    # (doc_id, _h, n_tokens) rows, never the raw text (same profiling
    # lesson as pipeline_curate_corpus — tools/stress_pipelines.py)
    proj = docs.select(
        "doc_id",
        F.md5(normalize_text("text")).alias("_h"),
        F.size(tokens("text")).cast("long").alias("n_tokens"),
    )
    hashed = proj.join(kept, "doc_id")
    canon = hashed.groupBy("_h").agg(F.min("doc_id").alias("_keeper"))
    surv = hashed.join(
        canon, hashed.doc_id == canon._keeper, "left_semi"
    ).select("doc_id", "n_tokens")
    assigned = shard_assign(surv, shard_tokens=shard_tokens, seed=seed)
    return assigned.groupBy("shard_id").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.sum("doc_id").cast("long").alias("doc_id_checksum"),
    )


_RES_SEED = 13
_RES_K = 20


@_register(
    "sample_weighted_reservoir",
    f"""
WITH t AS (
  SELECT doc_id, CAST(len({_TOKS.format(c='text')}) AS BIGINT) AS w FROM documents
),
h AS (
  SELECT doc_id, w,
         ('0x' || substr(md5('{_RES_SEED}:' || doc_id), 1, 15))::BIGINT AS hv
  FROM t WHERE w > 0
),
k AS (
  SELECT doc_id, w,
         ROUND(ln((hv % 9007199254740992 + 1) / 9007199254740992.0) / w, 6) AS skey
  FROM h
)
SELECT doc_id, w AS weight, skey
FROM k ORDER BY skey DESC, doc_id ASC
LIMIT {_RES_K}
""",
)
def sample_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement, one pass, no RNG state:
    Efraimidis-Spirakis A-Res — each doc draws u ∈ (0,1] from a seeded
    hash (exact: 53-bit modulus over a power-of-two divisor, so u is the
    same double everywhere) and the top-k by ``ln(u)/w`` are the sample,
    weighted by token count. THE distributed weighted sampler: a single
    TakeOrderedAndProject, mergeable across partitions, reproducible
    across runs and engines."""
    from whatsapp_vectordb_spark.functions.text import portable_hash64, tokens

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.size(tokens("text")).cast("long").alias("w")
    ).where(F.col("w") > 0)
    m = F.pmod(
        portable_hash64(F.col("doc_id").cast("string"), seed=_RES_SEED),
        F.lit(9007199254740992),
    )
    u = (m + 1) / F.lit(9007199254740992.0)
    return (
        docs.select(
            "doc_id",
            F.col("w").alias("weight"),
            F.round(F.log(u) / F.col("w"), 6).alias("skey"),
        )
        .orderBy(F.col("skey").desc(), F.col("doc_id").asc())
        .limit(_RES_K)
    )


@_register(
    "events_cusum_changepoints",
    """
WITH daily AS (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
stats AS (
  SELECT event_type, SUM(n) AS tot, COUNT(*) AS n_days FROM daily GROUP BY 1
),
y AS (
  SELECT d.event_type, d.day, d.n,
         CAST(1000000 * d.n - (1000000 * s.tot) // s.n_days AS BIGINT) AS yv
  FROM daily d JOIN stats s ON s.event_type = d.event_type
),
p AS (
  SELECT event_type, day, n,
         CAST(SUM(yv) OVER (PARTITION BY event_type ORDER BY day) AS BIGINT) AS pv
  FROM y
),
s AS (
  SELECT event_type, day, n,
         CAST(pv - LEAST(0, MIN(pv) OVER (PARTITION BY event_type ORDER BY day))
              AS BIGINT) AS cusum_micro
  FROM p
)
SELECT event_type, day, CAST(n AS BIGINT) AS n_events, cusum_micro,
       cusum_micro > 0 AS alarm
FROM s
""",
)
def events_cusum_changepoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential rate-shift detection (one-sided CUSUM) over daily event
    volumes per type, with the recursion replaced by its closed form
    ``P − min(0, running_min(P))`` — two window functions, all-integer
    micro-units, bit-identical in both engines (operators/events.py
    cusum_changepoints)."""
    from whatsapp_vectordb_spark.operators.events import cusum_changepoints

    return cusum_changepoints(_events(spark, sf_dir))


# LSH recall gate: same candidate machinery as ann_lsh_topk, plus the
# exact-scan comparison — completes the recall-gate family (IVF-PQ, JL,
# MRL, BQ, now LSH): every ANN tier's answer QUALITY is itself gated.
_ANN_LSH_GATE_ORACLE = (
    _ANN_LSH_ORACLE.split("SELECT e.vec_id,")[0].rstrip().rstrip(")")
    + """),
lsh10 AS (
  SELECT e.vec_id
  FROM embeddings e JOIN cand ON e.vec_id = cand.vec_id CROSS JOIN q
  WHERE list_cosine_similarity(e.embedding::DOUBLE[], q.qv) IS NOT NULL
  ORDER BY ROUND(list_cosine_similarity(e.embedding::DOUBLE[], q.qv), 6) DESC,
           e.vec_id ASC
  LIMIT 10
),
exact AS (
  SELECT e.vec_id
  FROM embeddings e CROSS JOIN q
  WHERE list_cosine_similarity(e.embedding::DOUBLE[], q.qv) IS NOT NULL
  ORDER BY ROUND(list_cosine_similarity(e.embedding::DOUBLE[], q.qv), 6) DESC,
           e.vec_id ASC
  LIMIT 10
)
SELECT CAST(10 AS BIGINT) AS k,
       ROUND(COUNT(*) / 10.0, 6) AS recall
FROM lsh10 JOIN exact ON lsh10.vec_id = exact.vec_id
"""
)


@_register("ann_lsh_recall_gate", _ANN_LSH_GATE_ORACLE)
def ann_lsh_recall_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of the bucket-pruned LSH search vs the exact scan —
    the last ANN tier whose answer quality wasn't itself oracle-gated.
    Candidates come from the identical banded-signature machinery as
    ann_lsh_topk; recall is the top-10 intersection size / 10."""
    from whatsapp_vectordb_spark.operators.ann import portable_lsh_topk
    from whatsapp_vectordb_spark.operators.search import topk

    emb = _t(spark, sf_dir, "embeddings")
    lsh10 = portable_lsh_topk(
        emb, query_id=0, k=10, n_planes=16, bands=4, seed=0,
        round_to=ROUND_SCORE, impl="numpy", dim=64,
    ).select("vec_id")
    qvec = emb.where(F.col("vec_id") == 0).head()["embedding"]
    exact = topk(
        emb.select("vec_id", "embedding"), qvec, k=10, round_to=ROUND_SCORE
    ).select("vec_id")
    return (
        lsh10.join(exact, "vec_id")
        .agg(F.count("*").alias("hits"))
        .select(
            F.lit(10).cast("long").alias("k"),
            F.round(F.col("hits").cast("double") / F.lit(10.0), 6).alias("recall"),
        )
    )


@_register(
    "pack_shard_interleave",
    f"""
WITH toks AS (
  SELECT doc_id, source, CAST(len({_TOKS.format(c='text')}) AS BIGINT) AS nt
  FROM documents
),
h AS (
  SELECT doc_id, source, nt,
         ('0x' || substr(md5('{_SHARD_SEED}:' || doc_id), 1, 15))::BIGINT AS hkey
  FROM toks
),
c AS (
  SELECT doc_id, source, nt, hkey,
         COALESCE(CAST(SUM(nt) OVER (ORDER BY hkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
                  0) AS cum_before
  FROM h
),
s AS (
  SELECT doc_id, source, hkey,
         CAST(cum_before // {_SHARD_TOKENS} AS BIGINT) AS shard_id
  FROM c
),
striped AS (
  SELECT doc_id, source, shard_id,
         ROW_NUMBER() OVER (PARTITION BY shard_id, source ORDER BY hkey, doc_id) AS rnd
  FROM s
),
pos AS (
  SELECT doc_id, shard_id,
         CAST(ROW_NUMBER() OVER (PARTITION BY shard_id ORDER BY rnd, source, doc_id) - 1
              AS BIGINT) AS pos_in_shard
  FROM striped
)
SELECT shard_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(doc_id * (pos_in_shard + 1)) AS BIGINT) AS order_checksum
FROM pos GROUP BY shard_id
""",
)
def pack_shard_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-shard source interleaving (operators/curate.py
    shard_interleave) on top of the balanced shard assignment: per-shard
    position-weighted checksums pin the exact ORDER both engines
    produce, not just membership — a sequential reader of any shard sees
    sources striped round-robin."""
    from whatsapp_vectordb_spark.functions.text import tokens
    from whatsapp_vectordb_spark.operators.curate import shard_assign, shard_interleave

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "source", F.size(tokens("text")).cast("long").alias("n_tokens")
    )
    assigned = shard_assign(
        docs.select("doc_id", "n_tokens"),
        shard_tokens=_SHARD_TOKENS,
        seed=_SHARD_SEED,
    ).join(docs.select("doc_id", "source"), "doc_id")
    ordered = shard_interleave(assigned)
    return ordered.groupBy("shard_id").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.col("doc_id") * (F.col("pos_in_shard") + 1))
        .cast("long")
        .alias("order_checksum"),
    )


@_register(
    "rel_priority_shipping",
    """
SELECT l.l_returnflag,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l.l_returnflag
""",
)
def rel_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape on this schema: per return flag, urgent-vs-other
    order counts for lineitems shipped in one year — the conditional
    aggregate over a fact-fact join. The shipdate predicate pushes to
    the lineitem scan (a year of a 7-year span prunes ~6/7 of rows
    before the join); the join shuffles on orderkey with AQE free to
    pick broadcast at small SF."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
    )


@_register(
    "text_cms_calibration",
    f"""
WITH toks AS (SELECT unnest({_TOKS.format(c='text')}) AS tok FROM documents),
cells AS (
  SELECT r.r AS row,
         ('0x' || substr(md5(CAST(r.r AS VARCHAR) || ':' || tok), 1, 15))::BIGINT % 1024 AS col
  FROM toks CROSS JOIN range(0,4) r(r)
),
counters AS (SELECT row, col, COUNT(*) AS cnt FROM cells GROUP BY 1, 2),
vocab AS (SELECT tok, COUNT(*) AS true_count FROM toks GROUP BY 1),
pcells AS (
  SELECT v.tok, r.r AS row,
         ('0x' || substr(md5(CAST(r.r AS VARCHAR) || ':' || v.tok), 1, 15))::BIGINT % 1024 AS col
  FROM vocab v CROSS JOIN range(0,4) r(r)
),
est AS (
  SELECT pc.tok, MIN(COALESCE(c.cnt, 0)) AS est_count
  FROM pcells pc LEFT JOIN counters c ON c.row = pc.row AND c.col = pc.col
  GROUP BY pc.tok
)
SELECT CAST(e.est_count - v.true_count AS BIGINT) AS overestimate,
       CAST(COUNT(*) AS BIGINT) AS n_tokens
FROM est e JOIN vocab v ON v.tok = e.tok
GROUP BY 1
""",
)
def text_cms_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min error profile over the FULL vocabulary: for every
    distinct token, the sketch's overestimate (est − true, always ≥ 0 —
    CMS never undercounts), bucketed by error size — the measured form
    of the ε·N guarantee, completing the sketch-calibration family
    (MinHash pairs, histogram quantiles, now CMS). All integers."""
    from whatsapp_vectordb_spark.functions.text import tokens
    from whatsapp_vectordb_spark.operators.sketches import cms_counters, cms_estimate

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(tokens("text").alias("_tk")).select(
        F.explode("_tk").alias("tok")
    )
    counters = cms_counters(toks, "tok", width=1024)
    vocab = toks.groupBy("tok").agg(F.count("*").alias("true_count"))
    est = cms_estimate(counters, vocab.select("tok"), "tok", width=1024)
    return (
        est.join(vocab, est["probe"] == vocab["tok"])
        .select((F.col("est_count") - F.col("true_count")).cast("long").alias("overestimate"))
        .groupBy("overestimate")
        .agg(F.count("*").cast("long").alias("n_tokens"))
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


@_register(
    "streaming_whatsapp_source",
    f"""
WITH lines AS ({_CHAT_LINE_SQL})
SELECT CASE WHEN ok THEN sender_raw END AS sender,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS n_parsed
FROM (
  SELECT regexp_extract(value, '^\\[(\\d{{2}}\\.\\d{{2}}\\.\\d{{2}}, \\d{{2}}:\\d{{2}}:\\d{{2}})\\] ~?\\s*([^:]+): (.*)$', 1) <> '' AS ok,
         trim(regexp_extract(value, '^\\[(\\d{{2}}\\.\\d{{2}}\\.\\d{{2}}, \\d{{2}}:\\d{{2}}:\\d{{2}})\\] ~?\\s*([^:]+): (.*)$', 2)) AS sender_raw
  FROM lines
)
GROUP BY 1
""",
)
def streaming_whatsapp_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The chat connector as a STREAMING source: the corpus is dropped
    into a folder as 3 export files and tailed via the data source's
    simpleStreamReader (offset = files consumed, exact replay between
    offsets); per-batch rows append through an idempotent batch_id sink
    and the final per-sender tallies must equal the one-shot batch parse
    — connector, ingest loop, and parser all exercised by one oracle."""
    import os as _os
    import shutil

    from whatsapp_vectordb_spark.sources import whatsapp_source

    scratch = _oracle_scratch("whatsapp_stream")
    shutil.rmtree(scratch, ignore_errors=True)
    src_dir = _os.path.join(scratch, "drop")
    _os.makedirs(src_dir)
    rows = _chat_lines_df(spark, sf_dir).orderBy("doc_id").collect()
    third = (len(rows) + 2) // 3
    for i in range(3):
        with open(_os.path.join(src_dir, f"export_{i}.txt"), "w", encoding="utf-8") as f:
            for r in rows[i * third : (i + 1) * third]:
                f.write(r["value"] + "\n")

    fmt = whatsapp_source.register(spark)
    out_dir = _os.path.join(scratch, "rows")

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("batch_id", F.lit(batch_id).cast("long"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out_dir)
        )

    stream = spark.readStream.format(fmt).load(src_dir)
    q = stream.writeStream.foreachBatch(sink).trigger(availableNow=True).start()
    q.awaitTermination()

    collected = spark.read.schema(
        "line_no long, ts_raw string, sender string, message string, "
        "parse_ok boolean, batch_id long"
    ).parquet(out_dir)
    return collected.groupBy("sender").agg(
        F.count("*").cast("long").alias("n_lines"),
        F.sum(F.when(F.col("parse_ok"), 1).otherwise(0)).cast("long").alias("n_parsed"),
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


# ==========================================================================
# Round 7: STREAMING CAPSTONE (VERDICT r6 #5) — ingest → quarantine →
# ingest-time dedup → index maintenance → kNN serving composed in ONE
# streaming pipeline. The corpus is delivered as JSONL vector files (the
# reference ingests vectors from flat files too, embed/embed.go:85-96):
# file f carries vec_id % 3 == f, every line with (vec_id*7 + f) % 37 == 0
# truncated mid-array (malformed JSON → quarantined), and file 2 ALSO
# re-delivers every vec_id % 5 == 0 (at-least-once delivery). Each
# micro-batch drops malformed rows, dedups within-batch AND against the
# persisted index (insert-if-absent), and appends only new vectors; after
# full replay, serving answers fixed queries against the stream-built
# index. The oracle is the BATCH COMPOSITION, fully analytic: membership
# = "some delivery of v was valid", scores from the source table — no
# persisted Spark state is consulted, so replay ≡ batch is a real check.
# The checksum row (query_id = -1) pins exact index membership: sum of
# ids, sum of squared ids, and the member count.
@_register(
    "streaming_pipeline_capstone",
    """
WITH member AS (
  SELECT vec_id, embedding FROM embeddings
  WHERE ((vec_id * 7 + vec_id % 3) % 37 <> 0)
     OR (vec_id % 5 = 0 AND (vec_id * 7 + 2) % 37 <> 0)
),
q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS query_vec
  FROM embeddings WHERE vec_id < 4
),
answers AS (
  SELECT query_id, vec_id, score, CAST(rank AS INTEGER) AS rank FROM (
    SELECT q.query_id, m.vec_id,
           ROUND(list_cosine_similarity(m.embedding::DOUBLE[], q.query_vec), 6) AS score,
           ROW_NUMBER() OVER (
             PARTITION BY q.query_id
             ORDER BY ROUND(list_cosine_similarity(m.embedding::DOUBLE[], q.query_vec), 6) DESC,
                      m.vec_id ASC
           ) AS rank
    FROM member m CROSS JOIN q
  ) WHERE rank <= 3
)
SELECT * FROM answers
UNION ALL
SELECT CAST(-1 AS BIGINT), CAST(SUM(vec_id) AS BIGINT),
       CAST(SUM(vec_id * vec_id) AS DOUBLE), CAST(COUNT(*) AS INTEGER)
FROM member
""",
)
def streaming_pipeline_capstone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-stage streaming pipeline, end to end (streaming/ops.py twins
    composed): JSONL ingest with quarantine → at-least-once dedup against
    persisted index state (left_anti on the ids already indexed, within-
    batch dropDuplicates) → per-batch index append → batched kNN serving
    over the final index. Per-batch work is bounded: one batch-sized JSON
    scan, one anti-join whose right side is the (skinny, id-only) index
    projection, one append of only the NEW rows — no stage rereads
    history beyond the id column, and no state grows except the index
    itself."""
    import json as _json

    root = _tmp_scratch("wvs_capstone_")
    drop = os.path.join(root, "drop")
    os.makedirs(drop)
    index_path = os.path.join(root, "index")

    rows = (
        _t(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    )

    def _line(v: int, emb, f: int) -> str:
        line = _json.dumps({"vec_id": v, "embedding": [float(x) for x in emb]})
        if (v * 7 + f) % 37 == 0:
            line = line[: max(8, len(line) // 2)]
        return line

    for f in range(3):
        with open(os.path.join(drop, f"deliver_{f}.jsonl"), "w", encoding="utf-8") as fh:
            for r in rows:
                v = int(r["vec_id"])
                if v % 3 == f:
                    fh.write(_line(v, r["embedding"], f) + "\n")
                if f == 2 and v % 5 == 0:
                    fh.write(_line(v, r["embedding"], 2) + "\n")

    stream = (
        spark.readStream.schema("vec_id bigint, embedding array<double>")
        .option("maxFilesPerTrigger", "1")
        .json(drop)
    )

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        sp = batch_df.sparkSession
        valid = (
            batch_df.where(
                F.col("vec_id").isNotNull()
                & F.col("embedding").isNotNull()
                & (F.size("embedding") == 64)
            )
            .dropDuplicates(["vec_id"])
        )
        if os.path.exists(index_path):
            seen = sp.read.parquet(index_path).select("vec_id")
            valid = valid.join(seen, "vec_id", "left_anti")
        # pin before appending to the directory the anti-join reads
        valid.localCheckpoint(eager=True).write.mode("append").parquet(index_path)

    q = stream.writeStream.foreachBatch(ingest).trigger(availableNow=True).start()
    q.awaitTermination()

    index = spark.read.parquet(index_path)
    queries = (
        _t(spark, sf_dir, "embeddings")
        .where(F.col("vec_id") < 4)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec"))
    )
    from whatsapp_vectordb_spark.operators.search import topk_batched

    answers = topk_batched(index, queries, k=3, round_to=6)
    checksum = index.agg(
        F.lit(-1).cast("long").alias("query_id"),
        F.sum("vec_id").cast("long").alias("vec_id"),
        F.sum(F.col("vec_id") * F.col("vec_id")).cast("double").alias("score"),
        F.count("*").cast("int").alias("rank"),
    )
    return answers.unionByName(checksum)
