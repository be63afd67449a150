"""Exact and near-dedup queries.

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

from whatsapp_vectordb_spark.harness._core import ROUND_SCORE, _AUG_SQL, _TOKS, _augmented_docs, _minhash_pairs_sql, _minhash_sig_sql, _oracle_scratch, _phash_sql, _register, _semdedup_certificate_sql, _sh_sql, _t  # noqa: E501



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


@_register("minhash_signatures", _minhash_sig_sql(16, 3, "SELECT doc_id, text FROM documents"))
def minhash_signatures_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from whatsapp_vectordb_spark.operators.dedup import minhash_signatures

    return minhash_signatures(_t(spark, sf_dir, "documents"), num_hashes=16, shingle_n=3)


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


# Round 7: quality-elected canonicals — min-id election (dedup_components)
# is deterministic but arbitrary; real curation keeps the BEST member of
# each duplicate cluster. Clusters come from the same MinHash-LSH pairs as
# dedup_minhash_lsh; the election score is the integer distinct-token
# count (the augmented corpus's near-dup variants append extra words, so
# the elected doc is demonstrably NOT the min id). The oracle recomputes
# pairs, connected components (recursive CTE), and the window election.
@_register(
    "dedup_canonical_by_quality",
    f"""
WITH RECURSIVE pairs AS (SELECT id_a, id_b FROM ({_minhash_pairs_sql(16, 4, 3, 0.5)})),
edges AS (SELECT id_a AS a, id_b AS b FROM pairs UNION SELECT id_b, id_a FROM pairs),
reach(node, r) AS (
  SELECT DISTINCT a AS node, a AS r FROM edges
  UNION
  SELECT e.b AS node, reach.r FROM reach JOIN edges e ON e.a = reach.node
),
comp AS (SELECT node, MIN(r) AS component FROM reach GROUP BY node),
corpus AS ({_AUG_SQL}),
toks AS (SELECT doc_id, {_TOKS.format(c='text')} AS tk FROM corpus),
dt AS (SELECT doc_id, CAST(len(list_distinct(tk)) AS INTEGER) AS n_distinct FROM toks),
scored AS (
  SELECT c.node, c.component, d.n_distinct
  FROM comp c JOIN dt d ON d.doc_id = c.node
)
SELECT cluster_id, cluster_size, elected_id, elected_score FROM (
  SELECT component AS cluster_id,
         CAST(COUNT(*) OVER (PARTITION BY component) AS BIGINT) AS cluster_size,
         node AS elected_id,
         n_distinct AS elected_score,
         ROW_NUMBER() OVER (PARTITION BY component ORDER BY n_distinct DESC, node ASC) AS rn
  FROM scored
) WHERE rn = 1
""",
)
def dedup_canonical_by_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters (MinHash-LSH pairs → connected components) with
    the canonical member elected by an integer-exact quality proxy
    (distinct-token count, ties to the lower id) instead of min-id —
    operators/dedup.elect_canonical. One skinny id join + one
    cluster-keyed window; per-cluster rows are duplicate-group-sized."""
    from whatsapp_vectordb_spark.operators.dedup import (
        canonicalize_duplicates,
        elect_canonical,
        minhash_near_duplicates,
    )
    from whatsapp_vectordb_spark.operators.textops import token_stats

    aug = _augmented_docs(spark, sf_dir)
    pairs = minhash_near_duplicates(aug, num_hashes=16, bands=4, shingle_n=3, threshold=0.5)
    clusters = canonicalize_duplicates(pairs)
    scores = token_stats(aug).select(
        F.col("doc_id").alias("id"), F.col("n_distinct_tokens").alias("score")
    )
    return elect_canonical(clusters, scores)


# Round 8: the left-join election contract (ADVICE r7) as a first-class
# query — clusters are cheap analytic 5-member groups, the score table
# deliberately covers only part of the corpus: mixed clusters must elect
# the best SCORED member while counting everyone, and fully-unscored
# clusters must still appear (min-id elected, NULL score) instead of
# silently vanishing as the old inner join did.
@_register(
    "dedup_canonical_unscored",
    """
WITH m AS (SELECT doc_id, CAST(doc_id // 5 AS BIGINT) AS cluster_id FROM documents),
s AS (
  SELECT doc_id, CAST(length(text) AS INTEGER) AS score
  FROM documents WHERE doc_id % 20 < 8
)
SELECT cluster_id, cluster_size, elected_id, elected_score FROM (
  SELECT m.cluster_id,
         CAST(COUNT(*) OVER (PARTITION BY m.cluster_id) AS BIGINT) AS cluster_size,
         m.doc_id AS elected_id,
         s.score AS elected_score,
         ROW_NUMBER() OVER (
           PARTITION BY m.cluster_id
           ORDER BY s.score DESC NULLS LAST, m.doc_id ASC
         ) AS rn
  FROM m LEFT JOIN s ON s.doc_id = m.doc_id
) WHERE rn = 1
""",
)
def dedup_canonical_unscored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """elect_canonical with partial score coverage: consecutive-id
    5-member clusters, character-length scores present only for
    doc_id % 20 < 8 — so the corpus contains fully-scored, mixed, and
    fully-unscored clusters and the output pins all three behaviors of
    the left-join election (operators/dedup.elect_canonical)."""
    from whatsapp_vectordb_spark.operators.dedup import elect_canonical

    docs = _t(spark, sf_dir, "documents")
    clusters = docs.select(
        F.col("doc_id").alias("id"),
        F.expr("doc_id div 5").cast("long").alias("canonical_id"),
    )
    scores = docs.where(F.col("doc_id") % 20 < 8).select(
        F.col("doc_id").alias("id"), F.length("text").cast("int").alias("score")
    )
    return elect_canonical(clusters, scores)


# --- winnowing substring dedup + Bloom decontamination (r11 wiring) ----------

_WINNOW_PB = 1 << 20  # mirrors operators.dedup._WINNOW_PBASE


def _winnow_fp_sql(k: int, w: int, source: str) -> str:
    """DuckDB replay of operators.dedup.winnow_fingerprints: positional
    k-gram shingles → portable hash packed with (PBASE-1-pos) → plain
    windowed MIN over w consecutive hashes (rightmost-on-ties falls out
    of the packing, exactly as in Spark) → full-window filter with the
    short-document (n < w) degenerate case → distinct unpacked
    (fp_pos, fp_hash)."""
    pb = _WINNOW_PB
    return f"""
WITH corpus AS ({source}),
toks AS (SELECT doc_id, {_TOKS.format(c='text')} AS tk FROM corpus),
shl AS (SELECT doc_id, {_pos_sh_sql(k)} AS shingles FROM toks),
ex AS (SELECT doc_id, unnest(shingles) AS gram,
              unnest(range(0, len(shingles))) AS pos FROM shl),
keyed AS (SELECT doc_id, pos,
                 {_phash_sql('gram')} * {pb} + ({pb - 1} - pos) AS hkey FROM ex),
win AS (SELECT doc_id, pos,
               MIN(hkey) OVER (PARTITION BY doc_id ORDER BY pos
                               ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING) AS m,
               COUNT(*) OVER (PARTITION BY doc_id) AS n
        FROM keyed),
picked AS (SELECT doc_id, m FROM win
           WHERE pos <= n - {w} OR (n < {w} AND pos = 0))
SELECT DISTINCT doc_id, {pb - 1} - (m % {pb}) AS fp_pos, m // {pb} AS fp_hash
FROM picked
"""


def _winnow_pairs_sql(k: int, w: int, min_shared: int, source: str) -> str:
    return f"""
WITH fps AS (
  SELECT DISTINCT doc_id, fp_hash FROM ({_winnow_fp_sql(k, w, source)})
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared
FROM fps a JOIN fps b ON a.fp_hash = b.fp_hash AND a.doc_id < b.doc_id
GROUP BY 1, 2
HAVING COUNT(*) >= {min_shared}
"""


@_register(
    "dedup_winnow_fingerprints",
    _winnow_fp_sql(5, 4, "SELECT doc_id, text FROM documents"),
)
def dedup_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (MOSS) fingerprint selection at operator defaults
    (k=5-token shingles, w=4 windows): every selected (position, hash)
    per document — the building block the pair query joins on. The
    oracle replays the packed-int64 window MIN verbatim, so the
    rightmost-tie rule and the short-document degenerate case are both
    hash-checked."""
    from whatsapp_vectordb_spark.operators.dedup import winnow_fingerprints

    return winnow_fingerprints(
        _t(spark, sf_dir, "documents").select("doc_id", "text"), k=5, w=4
    )


@_register("dedup_winnow_pairs", _winnow_pairs_sql(5, 4, 2, _AUG_SQL))
def dedup_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level duplicate pairs over the augmented corpus (exact
    copies at +1e6, trailing-append near copies at +2e6 — the latter are
    EXACTLY the case document-level MinHash can miss and winnowing
    guarantees: every shared ≥ w+k-1-token run yields a shared
    fingerprint). min_shared=2, no max_df (gate scale) so the oracle is
    a straight 3-CTE replay; at 100 TB set max_df to a few hundred."""
    from whatsapp_vectordb_spark.operators.dedup import winnow_duplicate_pairs

    return winnow_duplicate_pairs(
        _augmented_docs(spark, sf_dir), k=5, w=4, min_shared=2
    )


def _bloom_sql(shingle_n: int, m_bits: int, k_hashes: int, bench_mod: int) -> str:
    """DuckDB replay of operators.dedup.bloom_decontaminate: the SAME
    Kirsch-Mitzenmacher bits (md5-half double hashing, bit_j =
    (x1 + j·x2) & (m-1)) are set from the bench side and tested per
    corpus shingle, so every false positive reproduces bit-for-bit."""
    mask = m_bits - 1
    return f"""
WITH toks AS (SELECT doc_id, {_TOKS.format(c='text')} AS tk FROM documents),
shl AS (SELECT doc_id, {_sh_sql(shingle_n)} AS shingles FROM toks),
ex AS (SELECT doc_id, unnest(shingles) AS s FROM shl),
hs AS (SELECT doc_id, s,
              ('0x' || substr(md5(s), 1, 8))::BIGINT AS x1,
              ('0x' || substr(md5(s), 9, 8))::BIGINT AS x2 FROM ex),
bench_bits AS (
  SELECT DISTINCT (x1 + j * x2) & {mask} AS bit
  FROM hs, range(0, {k_hashes}) t(j) WHERE doc_id % {bench_mod} = 0
),
cb AS (SELECT doc_id, s, (x1 + j * x2) & {mask} AS bit
       FROM hs, range(0, {k_hashes}) t(j)),
hits AS (
  SELECT doc_id, COUNT(*) AS n_hits FROM (
    SELECT cb.doc_id, cb.s
    FROM cb LEFT JOIN bench_bits b ON b.bit = cb.bit
    GROUP BY cb.doc_id, cb.s
    HAVING COUNT(b.bit) = {k_hashes}
  ) GROUP BY 1
),
sizes AS (SELECT doc_id, COUNT(*) AS n_shingles FROM hs GROUP BY 1)
SELECT z.doc_id, z.n_shingles,
       COALESCE(h.n_hits, 0) AS n_hits,
       ROUND(COALESCE(h.n_hits, 0)::DOUBLE / z.n_shingles, 6) AS contamination
FROM sizes z LEFT JOIN hits h ON h.doc_id = z.doc_id
"""


# m=2^14 is deliberately UNDERSIZED for the gate corpus so the filter
# produces real false positives — the hash check then proves the Bloom
# bits reproduce bit-for-bit against the SQL replay, not just that the
# exact-join answer survives. Same bench split (every 37th doc) and
# 5-gram rule as dedup_benchmark_contamination, so the two queries
# diff cleanly: bloom n_hits ≥ exact n_hits, gap = false positives.
@_register("dedup_bloom_decontaminate", _bloom_sql(5, 1 << 14, 3, 37))
def dedup_bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from whatsapp_vectordb_spark.operators.dedup import bloom_decontaminate

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    bench = docs.where(F.col("doc_id") % 37 == 0)
    return bloom_decontaminate(docs, bench, shingle_n=5, m_bits=1 << 14, k_hashes=3)


def _winnow_spans_sql(k: int, w: int, min_fps: int, source: str) -> str:
    """Replay of winnow_shared_spans: collinear shared fingerprints
    (constant pos_a - pos_b offset) island-split on pos_a gaps > w,
    reported as inclusive token spans."""
    return f"""
WITH fp AS ({_winnow_fp_sql(k, w, source)}),
m AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.fp_pos AS pos_a,
         a.fp_pos - b.fp_pos AS off
  FROM fp a JOIN fp b ON a.fp_hash = b.fp_hash AND a.doc_id < b.doc_id
),
g AS (
  SELECT *, CASE WHEN pos_a - LAG(pos_a) OVER (
                   PARTITION BY id_a, id_b, off ORDER BY pos_a) > {w}
                 THEN 1 ELSE 0 END AS brk
  FROM m
),
isl AS (
  SELECT *, SUM(brk) OVER (PARTITION BY id_a, id_b, off ORDER BY pos_a
                           ROWS UNBOUNDED PRECEDING) AS isl
  FROM g
)
SELECT id_a, id_b, MIN(pos_a) AS start_a, MAX(pos_a) + {k - 1} AS end_a,
       MIN(pos_a) - off AS start_b, MAX(pos_a) + {k - 1} - off AS end_b,
       COUNT(*) AS n_fps
FROM isl GROUP BY id_a, id_b, off, isl HAVING COUNT(*) >= {min_fps}
"""


@_register("dedup_winnow_spans", _winnow_spans_sql(5, 4, 2, _AUG_SQL))
def dedup_winnow_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level substring dedup over the augmented corpus: each exact
    copy (+1e6) and trailing-append near copy (+2e6) must report WHERE
    it matches its base — inclusive token bounds on both sides from
    collinear winnowing fingerprints. The oracle replays the offset
    grouping and island split verbatim, so span boundaries are
    hash-checked, not just pair existence."""
    from whatsapp_vectordb_spark.operators.dedup import winnow_shared_spans

    return winnow_shared_spans(
        _augmented_docs(spark, sf_dir), k=5, w=4, min_fps=2
    )


@_register("dedup_incremental_winnow_index", _winnow_pairs_sql(5, 4, 2, _AUG_SQL))
def dedup_incremental_winnow_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The persistent winnow-fingerprint index fed the augmented corpus
    in TWO batches (even doc_ids, then odd + the synthetic copies); the
    union of the incremental pair sets must equal the one-shot
    ``winnow_duplicate_pairs`` — the oracle is literally
    ``dedup_winnow_pairs``'s SQL. Ingest-time substring dedup: each
    batch probes the stored fingerprint inverted index and appends only
    its own rows."""
    import shutil

    from whatsapp_vectordb_spark.operators.dedup_index import WinnowDedupIndex

    path = _oracle_scratch("winnow_incr_oracle")
    shutil.rmtree(path, ignore_errors=True)
    aug = _augmented_docs(spark, sf_dir)
    idx = WinnowDedupIndex(spark, path, k=5, w=4, min_shared=2)
    p1 = idx.add_batch(aug.where(F.col("doc_id") % 2 == 0))
    p2 = idx.add_batch(aug.where(F.col("doc_id") % 2 == 1))
    return p1.unionByName(p2)


def _winnow_cut_sql(k: int, w: int, min_fps: int, source: str) -> str:
    """Replay of winnow_cut_duplicates: b-side span regions, per-doc
    interval merge (running-max island split, +1 adjacency), positional
    anti-filter, ordered token re-join."""
    return f"""
WITH spans AS ({_winnow_spans_sql(k, w, min_fps, source)}),
cuts AS (SELECT DISTINCT id_b AS doc_id, start_b AS s, end_b AS e FROM spans),
g AS (
  SELECT *, MAX(e) OVER (PARTITION BY doc_id ORDER BY s, e
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
  FROM cuts
),
isl AS (
  SELECT *, SUM(CASE WHEN pm IS NULL OR s > pm + 1 THEN 1 ELSE 0 END)
              OVER (PARTITION BY doc_id ORDER BY s, e
                    ROWS UNBOUNDED PRECEDING) AS isl
  FROM g
),
mg AS (SELECT doc_id, MIN(s) AS s, MAX(e) AS e FROM isl GROUP BY doc_id, isl),
corpus AS ({source}),
dtoks AS (SELECT doc_id, {_TOKS.format(c='text')} AS tk FROM corpus),
pos AS (SELECT doc_id, unnest(tk) AS tok,
               unnest(range(0, len(tk))) AS p FROM dtoks),
kept AS (
  SELECT doc_id, tok, p FROM pos
  WHERE NOT EXISTS (SELECT 1 FROM mg
                    WHERE mg.doc_id = pos.doc_id AND pos.p BETWEEN mg.s AND mg.e)
),
agg AS (SELECT doc_id, COUNT(*) AS n_kept,
               string_agg(tok, ' ' ORDER BY p) AS text_deduped
        FROM kept GROUP BY doc_id),
sizes AS (SELECT doc_id, COUNT(*) AS n_tokens FROM pos GROUP BY doc_id)
SELECT z.doc_id, z.n_tokens,
       z.n_tokens - COALESCE(a.n_kept, 0) AS n_removed,
       COALESCE(a.text_deduped, '') AS text_deduped
FROM sizes z LEFT JOIN agg a USING (doc_id)
"""


@_register("dedup_winnow_cut", _winnow_cut_sql(5, 4, 2, _AUG_SQL))
def dedup_winnow_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ExactSubstr cut over the augmented corpus: every exact
    copy (+1e6) and trailing-append near copy (+2e6) loses its copied
    region to the base doc (min-id keeps); the reconstructed per-doc
    text itself is inside the hash check, so the cut boundaries AND the
    surviving tokens are verified, not just counts."""
    from whatsapp_vectordb_spark.operators.dedup import winnow_cut_duplicates

    return winnow_cut_duplicates(_augmented_docs(spark, sf_dir), k=5, w=4, min_fps=2)


@_register("dedup_index_compact", _minhash_pairs_sql(16, 4, 3, 0.5))
def dedup_index_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VERDICT r13 #3: ``MinHashDedupIndex.compact()`` — the atomic
    per-micro-batch dir commits (right for durability) accumulate one
    ``batches/<uuid>`` dir per trigger; compact merges them under the
    same single-rename atomicity with a count+xxhash64 checksum gate.
    The corpus arrives in THREE batches with a compaction after the
    second: the third batch probes the COMPACTED state, so the oracle
    (the one-shot batch dedup SQL, same as ``dedup_incremental_index``)
    hash-gates that compaction changed no bit of stored state — any
    lost/duplicated shingle row would corrupt a Jaccard denominator and
    break the hash."""
    import shutil

    from whatsapp_vectordb_spark.operators.dedup_index import MinHashDedupIndex

    path = _oracle_scratch("mh_compact_oracle")
    shutil.rmtree(path, ignore_errors=True)
    aug = _augmented_docs(spark, sf_dir)
    idx = MinHashDedupIndex(
        spark, path, num_hashes=16, bands=4, shingle_n=3, threshold=0.5
    )
    p1 = idx.add_batch(aug.where(F.col("doc_id") % 3 == 0))
    p2 = idx.add_batch(aug.where(F.col("doc_id") % 3 == 1))
    merged = idx.compact()
    if merged != 2 or idx.compact() != 0:  # merged both dirs; idempotent
        raise RuntimeError(f"compaction merged {merged} dirs, expected 2")
    p3 = idx.add_batch(aug.where(F.col("doc_id") % 3 == 2))
    return p1.unionByName(p2).unionByName(p3)


@_register("dedup_winnow_index_compact", _winnow_pairs_sql(5, 4, 2, _AUG_SQL))
def dedup_winnow_index_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnow twin of ``dedup_index_compact``: the per-batch single-file
    commits accumulate one file per micro-batch; ``compact()`` merges
    them into one ``compact_<uuid>`` dir (manifest supersession, single
    rename, checksum gate). Batch 3 probes the compacted fingerprint
    inverted index; the one-shot SQL oracle hash-gates that no
    fingerprint row was lost or duplicated (either would shift an
    ``n_shared`` count across the ``min_shared`` threshold)."""
    import shutil

    from whatsapp_vectordb_spark.operators.dedup_index import WinnowDedupIndex

    path = _oracle_scratch("winnow_compact_oracle")
    shutil.rmtree(path, ignore_errors=True)
    aug = _augmented_docs(spark, sf_dir)
    idx = WinnowDedupIndex(spark, path, k=5, w=4, min_shared=2)
    p1 = idx.add_batch(aug.where(F.col("doc_id") % 3 == 0))
    p2 = idx.add_batch(aug.where(F.col("doc_id") % 3 == 1))
    merged = idx.compact()
    if merged != 2 or idx.compact() != 0:
        raise RuntimeError(f"compaction merged {merged} entries, expected 2")
    p3 = idx.add_batch(aug.where(F.col("doc_id") % 3 == 2))
    return p1.unionByName(p2).unionByName(p3)


_SEMDEDUP_DIR = _oracle_scratch("semdedup_oracle")
_SEMDEDUP_TAU = 0.95

# SemDeDup's k-means build stays unchecked (not SQL-expressible, same
# contract as every IVF oracle); the QUERY phase — within-cluster cosine
# pairs + the deterministic keep-least-central rule — replays in full
# over the persisted assignment (vec_id, embedding, centroid, cent_sim).
_SEMDEDUP_SQL = f"""
WITH cells AS (SELECT * FROM read_parquet('{_SEMDEDUP_DIR}/cells/*.parquet')),
rm AS (
  SELECT DISTINCT a.vec_id
  FROM cells a
  JOIN cells b
    ON a.centroid = b.centroid
   AND a.vec_id <> b.vec_id
   AND ROUND(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6)
       >= {_SEMDEDUP_TAU}
   AND (b.cent_sim < a.cent_sim
        OR (b.cent_sim = a.cent_sim AND b.vec_id < a.vec_id))
)
SELECT c.vec_id, c.centroid, c.cent_sim, (rm.vec_id IS NULL) AS kept
FROM cells c LEFT JOIN rm ON rm.vec_id = c.vec_id
"""


@_register("dedup_semdedup_kmeans", _SEMDEDUP_SQL)
def dedup_semdedup_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023) over a REAL k-means partition — the
    paper's actual shape, complementing ``dedup_semdedup`` (which scopes
    pairs by the label column as a cluster stand-in and elects min-id):
    here the quantizer is a balanced Lloyd fit, the election is the
    paper's keep-least-central rule, and every row comes back with its
    cluster + kept flag. The corpus is augmented with
    EXACT copies of every 25th vector (cosine 1.0 — guaranteed
    within-threshold mass wherever the copies cluster), so the
    keep-least-central election is exercised non-vacuously; the oracle
    replays pair discovery AND the election over the persisted
    assignment, so cluster scoping, the τ cut, and the deterministic
    keeper rule are all inside the hash."""
    from whatsapp_vectordb_spark.operators.ann import semdedup

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    copies = emb.where(F.col("vec_id") % 25 == 0).select(
        (F.col("vec_id") + 100_000).alias("vec_id"), "embedding"
    )
    aug = emb.unionByName(copies)
    out = semdedup(
        aug, n_clusters=8, threshold=_SEMDEDUP_TAU, round_to=6
    )
    # persist the assignment the oracle replays (embedding re-acquired by
    # id; cent_sim/centroid come from the SAME deterministic run)
    aug.join(out.select("vec_id", "centroid", "cent_sim"), "vec_id").write.mode(
        "overwrite"
    ).parquet(os.path.join(_SEMDEDUP_DIR, "cells"))
    return out


_SDIDX_DIR = _oracle_scratch("semdedup_index_oracle")

# Oracle = the shared greedy-uniqueness certificate (see
# _core._semdedup_certificate_sql for the full argument); the k-means
# fit itself stays unchecked (house IVF-oracle contract).
_SDIDX_SQL = _semdedup_certificate_sql(_SDIDX_DIR, 0.95)


@_register("dedup_semdedup_index", _SDIDX_SQL)
def dedup_semdedup_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SEMANTIC tier of the incremental index family
    (``SemDedupIndex`` — MinHash is document-level, Winnow is
    substring-level, this is embedding-level): the augmented corpus
    (exact copies of every 25th vector) arrives in THREE batches; the
    quantizer freezes after batch 1; each batch's rows elect greedily
    against the STORED representatives (first decision wins, stored
    state append-only — the ε-net ingest semantics, deliberately
    distinct from the batch operator's least-central election). The
    oracle re-derives every kept flag non-recursively from the
    persisted state via the greedy-uniqueness certificate and
    recomputes cent_sim from raw embeddings + frozen centroids."""
    import shutil

    from whatsapp_vectordb_spark.operators.dedup_index import SemDedupIndex

    shutil.rmtree(_SDIDX_DIR, ignore_errors=True)
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    copies = emb.where(F.col("vec_id") % 25 == 0).select(
        (F.col("vec_id") + 100_000).alias("vec_id"), "embedding"
    )
    aug = emb.unionByName(copies)
    idx = SemDedupIndex(
        spark, os.path.join(_SDIDX_DIR, "idx"), threshold=0.95, n_clusters=8
    )
    parts = []
    for i in range(3):
        b = aug.where(F.pmod(F.col("vec_id"), F.lit(3)) == i)
        parts.append(idx.add_batch(b).withColumn("batch_no", F.lit(i)))
    res = parts[0].unionByName(parts[1]).unionByName(parts[2])
    aug.join(res, "vec_id").select(
        "vec_id", "embedding", "batch_no", "centroid", "cent_sim", "kept"
    ).write.mode("overwrite").parquet(os.path.join(_SDIDX_DIR, "cells"))
    cents = idx._load_centroids()
    local_df(spark, 
        [(int(i), [float(x) for x in c]) for i, c in enumerate(cents)],
        "centroid int, cvec array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(_SDIDX_DIR, "cents"))
    return res.select("vec_id", "batch_no", "centroid", "cent_sim", "kept")


_SDIDX_COMPACT_DIR = _oracle_scratch("semdedup_index_compact_oracle")


@_register(
    "dedup_semdedup_index_compact",
    _semdedup_certificate_sql(_SDIDX_COMPACT_DIR, 0.95),
)
def dedup_semdedup_index_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic twin of ``dedup_index_compact`` — the last of the three
    incremental-index tiers to get its compaction invariant oracle-gated
    (VERDICT r14 #2; MinHash and Winnow landed theirs in r14).
    ``SemDedupIndex`` inherits ``_BatchDirIndex.compact()`` (manifest
    supersession, single rename, count+xxhash64-XOR checksum gate over
    BOTH state tables ``kept``/``ids``); here the augmented corpus
    arrives in three batches with a compaction after the second, so
    batch 3 elects greedily against the COMPACTED representatives. The
    greedy-uniqueness certificate oracle re-derives every kept flag
    non-recursively from the persisted flags — a compaction that lost or
    duplicated any ``kept`` row would change batch 3's election and
    break the certificate; a corrupted ``ids`` row would re-admit a
    seen id and shift the flags the same way."""
    import shutil

    from whatsapp_vectordb_spark.operators.dedup_index import SemDedupIndex

    shutil.rmtree(_SDIDX_COMPACT_DIR, ignore_errors=True)
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    copies = emb.where(F.col("vec_id") % 25 == 0).select(
        (F.col("vec_id") + 100_000).alias("vec_id"), "embedding"
    )
    aug = emb.unionByName(copies)
    idx = SemDedupIndex(
        spark, os.path.join(_SDIDX_COMPACT_DIR, "idx"), threshold=0.95, n_clusters=8
    )
    parts = []
    for i in range(3):
        b = aug.where(F.pmod(F.col("vec_id"), F.lit(3)) == i)
        if i == 2:
            merged = idx.compact()
            if merged != 2 or idx.compact() != 0:  # merged both; idempotent
                raise RuntimeError(f"compaction merged {merged} dirs, expected 2")
        parts.append(idx.add_batch(b).withColumn("batch_no", F.lit(i)))
    res = parts[0].unionByName(parts[1]).unionByName(parts[2])
    aug.join(res, "vec_id").select(
        "vec_id", "embedding", "batch_no", "centroid", "cent_sim", "kept"
    ).write.mode("overwrite").parquet(os.path.join(_SDIDX_COMPACT_DIR, "cells"))
    cents = idx._load_centroids()
    local_df(spark, 
        [(int(i), [float(x) for x in c]) for i, c in enumerate(cents)],
        "centroid int, cvec array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(_SDIDX_COMPACT_DIR, "cents")
    )
    return res.select("vec_id", "batch_no", "centroid", "cent_sim", "kept")


# ==========================================================================
# Dedup-index TIME TRAVEL (r16 verdict #4) — the three incremental index
# tiers get the serving layouts' snapshot story: batch commits are seq-
# numbered, a compaction RETAINS the dirs it supersedes (dead-by-manifest
# for tip readers only), and `pairs_at(as_of)` / `verdicts_at(as_of)`
# replay the verdict set — which docs the corpus considered duplicates,
# and why — as of any retained commit. Each row ingests the augmented
# corpus in three batches (seqs 1-3), COMPACTS (seq 4), ingests a fourth
# batch (seq 5 — the tip differs from every pre-compaction bound), then
# reads the bound at seq 3 THROUGH the compaction. The oracle is fully
# SEMANTIC — it never reads the index files: documents are immutable, so
# the verdict set at commit 3 equals the one-shot batch operator over
# exactly the docs ingested by then (the union-of-batches ≡ one-shot
# invariant, bounded) — a lost retained dir, a mis-scoped manifest, or a
# seq misparse surfaces as a missing/phantom pair and breaks the hash.

_MH_TT_SRC = f"SELECT doc_id, text FROM ({_AUG_SQL}) WHERE doc_id % 4 IN (0, 1, 2)"


@_register(
    "dedup_minhash_index_time_travel",
    _minhash_pairs_sql(16, 4, 3, 0.5, source=_MH_TT_SRC),
)
def dedup_minhash_index_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-tier time travel (section comment above): ingest in
    four batches with a compaction between #3 and #4, then serve
    ``pairs_at(3)`` — the full verified near-dup pair set over the
    first three batches' corpus, read from the RETAINED pre-compaction
    commits (the seq-4 compaction's manifest is ignored at this bound,
    the seq-5 batch never opens)."""
    import shutil

    from whatsapp_vectordb_spark.operators.dedup_index import MinHashDedupIndex

    path = _oracle_scratch("mh_tt_oracle")
    shutil.rmtree(path, ignore_errors=True)
    aug = _augmented_docs(spark, sf_dir)
    idx = MinHashDedupIndex(
        spark, path, num_hashes=16, bands=4, shingle_n=3, threshold=0.5
    )
    for i in range(3):  # seqs 1-3
        idx.add_batch(aug.where(F.pmod(F.col("doc_id"), F.lit(4)) == i))
    if idx.compact() != 3:  # seq 4 — retains the three ingest dirs
        raise RuntimeError("compaction shape drifted")
    idx.add_batch(aug.where(F.pmod(F.col("doc_id"), F.lit(4)) == 3))  # seq 5
    if idx.snapshots() != [0, 1, 2, 3, 4, 5]:
        raise RuntimeError(f"commit log shape drifted: {idx.snapshots()}")
    return idx.pairs_at(3)


_WN_TT_SRC = f"SELECT doc_id, text FROM ({_AUG_SQL}) WHERE doc_id % 4 IN (0, 1, 2)"


@_register(
    "dedup_winnow_index_time_travel",
    _winnow_pairs_sql(5, 4, 2, _WN_TT_SRC),
)
def dedup_winnow_index_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-tier time travel — same scenario, same bound, over the
    winnowing-fingerprint index (loose per-batch files + a retained
    compaction dir): ``pairs_at(3)`` returns every pair sharing >= 2
    fingerprints within the first three batches' corpus."""
    import shutil

    from whatsapp_vectordb_spark.operators.dedup_index import WinnowDedupIndex

    path = _oracle_scratch("wn_tt_oracle")
    shutil.rmtree(path, ignore_errors=True)
    aug = _augmented_docs(spark, sf_dir)
    idx = WinnowDedupIndex(spark, path, k=5, w=4, min_shared=2)
    for i in range(3):  # seqs 1-3
        idx.add_batch(aug.where(F.pmod(F.col("doc_id"), F.lit(4)) == i))
    if idx.compact() != 3:  # seq 4
        raise RuntimeError("compaction shape drifted")
    idx.add_batch(aug.where(F.pmod(F.col("doc_id"), F.lit(4)) == 3))  # seq 5
    return idx.pairs_at(3)


_SDIDX_TT_DIR = _oracle_scratch("semdedup_index_tt_oracle")


@_register(
    "dedup_semdedup_index_time_travel",
    f"SELECT vec_id, kept FROM ({_semdedup_certificate_sql(_SDIDX_TT_DIR, 0.95)})",
)
def dedup_semdedup_index_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic-tier time travel: three ingest batches (greedy ε-net
    election, flags persisted for the certificate), a compaction, a
    fourth batch — then ``verdicts_at(3)`` replays every pre-compaction
    kept/removed verdict from the retained commits. The oracle
    re-derives the flags non-recursively via the greedy-uniqueness
    certificate over the first three batches' persisted election — the
    seq-5 batch's ids must NOT appear."""
    import shutil

    from whatsapp_vectordb_spark.operators.dedup_index import SemDedupIndex

    shutil.rmtree(_SDIDX_TT_DIR, ignore_errors=True)
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    copies = emb.where(F.col("vec_id") % 25 == 0).select(
        (F.col("vec_id") + 100_000).alias("vec_id"), "embedding"
    )
    aug = emb.unionByName(copies)
    idx = SemDedupIndex(
        spark, os.path.join(_SDIDX_TT_DIR, "idx"), threshold=0.95, n_clusters=8
    )
    parts = []
    for i in range(3):  # seqs 1-3
        b = aug.where(F.pmod(F.col("vec_id"), F.lit(4)) == i)
        parts.append(idx.add_batch(b).withColumn("batch_no", F.lit(i)))
    if idx.compact() != 3:  # seq 4
        raise RuntimeError("compaction shape drifted")
    idx.add_batch(aug.where(F.pmod(F.col("vec_id"), F.lit(4)) == 3))  # seq 5
    res = parts[0].unionByName(parts[1]).unionByName(parts[2])
    aug.join(res, "vec_id").select(
        "vec_id", "embedding", "batch_no", "centroid", "cent_sim", "kept"
    ).write.mode("overwrite").parquet(os.path.join(_SDIDX_TT_DIR, "cells"))
    cents = idx._load_centroids()
    local_df(spark, 
        [(int(i), [float(x) for x in c]) for i, c in enumerate(cents)],
        "centroid int, cvec array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(_SDIDX_TT_DIR, "cents")
    )
    return idx.verdicts_at(3)
