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
        if name in QUERIES:
            # A silent overwrite shrinks the registry invisibly: the
            # shadowed query loses its driver row and sweep --check
            # parity can't see it (it audits the post-collision
            # registry). Fail at import time instead. (VERDICT r14 #3;
            # this class of bug has lost a registration before.)
            raise ValueError(
                f"duplicate query registration: {name!r} is already "
                f"registered (by {QUERIES[name].__module__})"
            )
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
        # three levels up: harness/_core.py → harness/ → package → REPO
        # (the pre-split harness.py sat one level shallower)
        base = os.path.join(
            os.path.dirname(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
            ),
            "spark-warehouse",
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

    from whatsapp_vectordb_spark.session import local_scratch_root

    # dir= pins the scratch to the fast local disk (r16: /tmp can be a
    # 10-100× slower overlay write path — see local_scratch_root)
    d = tempfile.mkdtemp(prefix=prefix, dir=local_scratch_root())
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


# Non-ASCII twin of the chat fixture — the reference's Hebrew export path
# (main.go:296-302 routes `he` chats through the same parse). Senders and a
# message prefix are Hebrew, so the full source-file → connector →
# regex-parse → Arrow-hash path is exercised on multi-byte UTF-8 in both
# engines. The parse regex is byte-for-byte the same as the ASCII fixture's
# ([^:]+ is already script-agnostic).

_CHAT_LINE_HE_SQL = """
SELECT doc_id,
       CASE WHEN doc_id % 7 = 0 THEN text
            ELSE '[09.09.23, 14:35:02] ~ משתמש' || CAST(doc_id % 5 AS VARCHAR) || ': שלום עולם ' || text
       END AS value
FROM documents
"""


def _chat_lines_he_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 7 == 0, F.col("text"))
        .otherwise(
            F.concat(
                F.lit("[09.09.23, 14:35:02] ~ משתמש"),
                (F.col("doc_id") % 5).cast("string"),
                F.lit(": שלום עולם "),
                F.col("text"),
            )
        )
        .alias("value"),
    )


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


def _minhash_pairs_sql(
    num_hashes: int,
    bands: int,
    shingle_n: int,
    threshold: float,
    source: str = _AUG_SQL,
) -> str:
    r = num_hashes // bands
    sig = _minhash_sig_sql(num_hashes, shingle_n, source)
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
corpus AS ({source}),
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


# ==========================================================================
# Text analysis (extension surface: token stats, quality, language-ID,
# fingerprints) — all map-only Catalyst expressions over `documents`.
# ==========================================================================

_STOP_SQL = (
    "['the','a','an','and','or','of','to','in','is','are','was','were','be','been',"
    "'it','this','that','for','on','with','as','at','by','from','not','no','i','you',"
    "'he','she','we','they','do','does','did','have','has','had']"
)


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


_BM25_TERMS = ("data", "processing", "scale")


def _semdedup_certificate_sql(scratch_dir: str, tau: float = 0.95) -> str:
    """The SemDedupIndex greedy-uniqueness certificate, shared by the
    batch row (dedup_semdedup_index) and the streaming twin: re-derive
    every kept flag NON-recursively from the persisted state (a row is
    kept iff no earlier-ranked KEPT row in its cluster clears τ — the
    unique fixpoint of the greedy election, so one pair join reproduces
    the flags exactly iff the index elected correctly), and recompute
    cent_sim from raw embeddings + the frozen centroids as a
    cross-engine check of the kernel's cosine math."""
    return f"""
WITH cells AS (SELECT * FROM read_parquet('{scratch_dir}/cells/*.parquet')),
cents AS (SELECT * FROM read_parquet('{scratch_dir}/cents/*.parquet')),
dom AS (
  SELECT DISTINCT a.vec_id
  FROM cells a
  JOIN cells b
    ON a.centroid = b.centroid
   AND b.kept
   AND a.vec_id <> b.vec_id
   AND ROUND(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6)
       >= {tau}
   AND (b.batch_no < a.batch_no
        OR (b.batch_no = a.batch_no
            AND (b.cent_sim < a.cent_sim
                 OR (b.cent_sim = a.cent_sim AND b.vec_id < a.vec_id))))
)
SELECT c.vec_id, c.batch_no, c.centroid,
       ROUND(list_cosine_similarity(c.embedding::DOUBLE[], ct.cvec), 6) AS cent_sim,
       (d.vec_id IS NULL) AS kept
FROM cells c
JOIN cents ct ON ct.centroid = c.centroid
LEFT JOIN dom d ON d.vec_id = c.vec_id
"""
