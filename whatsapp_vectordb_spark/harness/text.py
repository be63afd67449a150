"""Text-analysis and retrieval queries.

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

from whatsapp_vectordb_spark.harness._core import _AUG_SQL, _BM25_TERMS, _STOP_SQL, _TOKS, _augmented_docs, _phash_sql, _register, _sh_sql, _t  # noqa: E501



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
    probes = local_df(spark, [(t,) for t in _BM25_TERMS], "tok string")
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
    runs eagerly in two checkpointed phases sharing ONE tokenization
    (tokenized corpus checkpointed, released after the re-rank lands in a
    ≤top_n-row result checkpoint); the feedback set and term weights are
    tiny broadcast frames, never a driver collect (textops.rm3_search)."""
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


def _bpe_ctes(n_merges: int) -> tuple[list[str], list[str]]:
    """Shared CTE builder for the BPE oracles: word-freq once, then per
    round (pair counts over the zipped symbol unnest → argmax with the
    count DESC / lexicographic tie-break → literal boundary-anchored
    string replace, whose left-to-right continue-after-replacement scan
    IS BPE's leftmost merge order). Returns (ctes, per-round merge-row
    selects)."""
    # MATERIALIZED is load-bearing: DuckDB inlines plain CTEs, and each
    # w{n+1} references w{n} twice (directly and through m{n}→p{n}), so
    # inlining expands to 2^n scans of the documents table — at 16 rounds
    # that exhausts file descriptors before it exhausts patience.
    # Materializing each round keeps the chain linear; values are
    # unchanged (same operations, same order, just computed once).
    ctes = [
        f"toks AS MATERIALIZED (SELECT {_TOKS.format(c='text')} AS tk FROM documents)",
        "wf AS MATERIALIZED (SELECT w, COUNT(*) AS freq FROM "
        "(SELECT unnest(tk) AS w FROM toks) GROUP BY w)",
        # DOUBLE separators between symbols (and at the ends): each merge
        # replace consumes one separator per side and leaves the other
        # for the neighboring match, so adjacent occurrences (abab, aaa)
        # merge exactly as BPE's leftmost scan requires
        "w0 AS MATERIALIZED (SELECT chr(31) || chr(31) || array_to_string("
        "list_transform(range(1, len(w) + 1), i -> w[i]), chr(31) || chr(31)) "
        "|| chr(31) || chr(31) AS ws, freq FROM wf)",
    ]
    finals = []
    for n in range(n_merges):
        ctes.append(
            f"""p{n} AS MATERIALIZED (
  SELECT lhs, rhs, SUM(freq) AS pair_count FROM (
    SELECT unnest(list_transform(range(1, len(sym)), i -> sym[i])) AS lhs,
           unnest(list_transform(range(1, len(sym)), i -> sym[i + 1])) AS rhs,
           freq
    FROM (SELECT list_filter(string_split(ws, chr(31)), s -> s <> '') AS sym,
                 freq FROM w{n})
  ) GROUP BY 1, 2
)"""
        )
        # Degenerate-corpus guard (ADVICE r11): if the corpus runs out of
        # learnable pairs before round n, p{n} is empty and a bare LIMIT 1
        # would empty m{n} — and every downstream CTE that cross-joins it.
        # Fall back to a chr(30) sentinel pair instead: tokens are
        # [a-z0-9]+ so its replace can never match (a no-op round), which
        # is exactly how bpe_learn degrades (it stops merging). The learn
        # oracle filters sentinel rows out of its output below.
        ctes.append(
            f"m{n} AS MATERIALIZED (SELECT lhs, rhs, pair_count FROM ("
            f"  SELECT * FROM (SELECT lhs, rhs, pair_count, 0 AS _pri FROM p{n} "
            "   ORDER BY pair_count DESC, lhs, rhs LIMIT 1)"
            "  UNION ALL SELECT chr(30), chr(30), 0, 1"
            ") ORDER BY _pri LIMIT 1)"
        )
        ctes.append(
            f"w{n + 1} AS MATERIALIZED (SELECT replace(ws, "
            "chr(31) || lhs || chr(31) || chr(31) || rhs || chr(31), "
            "chr(31) || lhs || rhs || chr(31)) AS ws, freq "
            f"FROM w{n}, m{n})"
        )
        finals.append(
            f"SELECT {n} AS merge_rank, lhs, rhs, "
            f"CAST(pair_count AS BIGINT) AS pair_count FROM m{n} "
            "WHERE lhs <> chr(30)"
        )
    return ctes, finals


def _bpe_sql(n_merges: int) -> str:
    """DuckDB replay of operators.textops.bpe_learn (the merge table)."""
    ctes, finals = _bpe_ctes(n_merges)
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(finals)


def _bpe_fertility_sql(n_merges: int) -> str:
    """Replay of learn-then-segment: the same merge CTEs, then every
    document token is ␟-bounded, run through the n replaces in rank
    order (nested innermost-first), and piece-counted."""
    ctes, _ = _bpe_ctes(n_merges)
    expr = "ws"
    for n in range(n_merges):
        expr = (
            f"replace({expr}, chr(31) || m{n}.lhs || chr(31) || chr(31) || "
            f"m{n}.rhs || chr(31), chr(31) || m{n}.lhs || m{n}.rhs || chr(31))"
        )
    merge_tables = ", ".join(f"m{n}" for n in range(n_merges))
    ctes.append(
        "dtoks AS (SELECT doc_id, "
        f"{_TOKS.format(c='text')} AS tk FROM documents)"
    )
    ctes.append(
        "dws AS (SELECT doc_id, chr(31) || chr(31) || array_to_string("
        "list_transform(range(1, len(w) + 1), i -> w[i]), chr(31) || chr(31)) "
        "|| chr(31) || chr(31) AS ws "
        "FROM (SELECT doc_id, unnest(tk) AS w FROM dtoks))"
    )
    ctes.append(
        f"seg AS (SELECT doc_id, len(list_filter(string_split({expr}, chr(31)), "
        f"s -> s <> '')) AS n_p FROM dws, {merge_tables})"
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + """
SELECT doc_id, COUNT(*) AS n_tokens, CAST(SUM(n_p) AS BIGINT) AS n_pieces,
       ROUND(SUM(n_p)::DOUBLE / COUNT(*), 6) AS fertility
FROM seg GROUP BY doc_id
"""
    )


def _bpe_encode_sql(n_merges: int) -> str:
    """Replay of learn-then-ENCODE: the merge CTEs, then every document
    token (kept in document order) run through the n replaces in rank
    order; output per doc is the piece count AND an md5 over the ordered
    space-joined subword stream — so the Arrow priority-apply path is
    hash-pinned on full segmentation CONTENT, not just counts."""
    ctes, _ = _bpe_ctes(n_merges)
    expr = "ws"
    for n in range(n_merges):
        expr = (
            f"replace({expr}, chr(31) || m{n}.lhs || chr(31) || chr(31) || "
            f"m{n}.rhs || chr(31), chr(31) || m{n}.lhs || m{n}.rhs || chr(31))"
        )
    merge_tables = ", ".join(f"m{n}" for n in range(n_merges))
    ctes.append(
        "dtoks AS MATERIALIZED (SELECT doc_id, "
        f"{_TOKS.format(c='text')} AS tk FROM documents)"
    )
    # parallel unnest zips word with its 1-based document position
    ctes.append(
        "dws AS MATERIALIZED (SELECT doc_id, i, "
        "chr(31) || chr(31) || array_to_string("
        "list_transform(range(1, len(w) + 1), j -> w[j]), chr(31) || chr(31)) "
        "|| chr(31) || chr(31) AS ws "
        "FROM (SELECT doc_id, unnest(tk) AS w, "
        "unnest(range(1, len(tk) + 1)) AS i FROM dtoks))"
    )
    ctes.append(
        f"seg AS MATERIALIZED (SELECT doc_id, i, "
        f"list_filter(string_split({expr}, chr(31)), s -> s <> '') AS ps "
        f"FROM dws, {merge_tables})"
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + """
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(len(ps)) AS BIGINT) AS n_pieces,
       md5(string_agg(array_to_string(ps, ' '), ' ' ORDER BY i)) AS pieces_hash
FROM seg GROUP BY doc_id
"""
    )


@_register("text_bpe_encode_arrow", _bpe_encode_sql(16))
def text_bpe_encode_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train 16 merges with the at-scale trainer, then segment the corpus
    with the at-scale APPLY path (operators/textops.py bpe_encode: one
    pandas UDF, rank-dict priority application, cost independent of
    merge-table depth) and hash the full ordered subword stream per doc.
    The oracle replays learn + the sequential replace chain — a green
    row proves priority-apply ≡ sequential-apply ≡ SQL on content."""
    from whatsapp_vectordb_spark.operators.textops import (
        bpe_encode,
        bpe_learn_local,
    )

    docs = _t(spark, sf_dir, "documents")
    merges = [
        (r["lhs"], r["rhs"])
        for r in bpe_learn_local(docs, n_merges=16).collect()
    ]
    enc = bpe_encode(docs, merges)
    return enc.select(
        "doc_id",
        "n_tokens",
        "n_pieces",
        F.md5(F.col("pieces")).alias("pieces_hash"),
    )


@_register("text_bpe_learn", _bpe_sql(8))
def text_bpe_learn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training on the documents corpus, 8 merge rounds —
    selection AND application replayed bit-for-bit by the unrolled-CTE
    oracle (the one iterative-training op alongside kmeans_lloyd with a
    fully-analytic replay)."""
    from whatsapp_vectordb_spark.operators.textops import bpe_learn

    return bpe_learn(_t(spark, sf_dir, "documents"), n_merges=8)


@_register("text_bpe_learn_full", _bpe_sql(16))
def text_bpe_learn_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The at-scale BPE trainer (VERDICT r11 #1): word count distributed,
    merge loop finished executor-side in ONE applyInPandas stage
    (operators/textops.py bpe_learn_local) instead of one driver job per
    merge. The oracle is the 16-round unrolled-CTE replay of the
    DISTRIBUTED variant's selection semantics — a green hash row IS the
    twin-equality gate (local trainer ≡ per-round distributed ≡ SQL
    replay, merge-for-merge). 16 rounds: deeper than the 8-round demo
    pair, still CTE-replayable; the 1k-merge capability record lives in
    BASELINE.md via tools/stress_winnow_bpe.py."""
    from whatsapp_vectordb_spark.operators.textops import bpe_learn_local

    return bpe_learn_local(_t(spark, sf_dir, "documents"), n_merges=16)


@_register("text_bpe_fertility", _bpe_fertility_sql(8))
def text_bpe_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-then-apply: learn 8 merges on the documents corpus, segment
    the same corpus with them, report per-doc piece counts + fertility.
    The oracle replays the whole composition (learn CTEs + nested
    replaces + piece counts), so the segmentation itself is
    hash-checked, not just the merge table."""
    from whatsapp_vectordb_spark.operators.textops import (
        bpe_learn,
        bpe_segment_fertility,
    )

    docs = _t(spark, sf_dir, "documents")
    merges = [(r["lhs"], r["rhs"]) for r in bpe_learn(docs, n_merges=8).collect()]
    return bpe_segment_fertility(docs, merges)
