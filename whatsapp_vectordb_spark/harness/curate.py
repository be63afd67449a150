"""Corpus-curation / sampling / packing queries.

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

from whatsapp_vectordb_spark.harness._core import _STOP_SQL, _TOKS, _augmented_docs, _minhash_pairs_sql, _oracle_scratch, _phash_sql, _register, _t  # noqa: E501



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
    built = IvfIndex.build_balanced(emb, n_centroids=8)
    cents_path = os.path.join(_DIVERSE_DIR, "centroids")
    local_df(spark, 
        [(int(i), [float(x) for x in c]) for i, c in enumerate(built.centroids)],
        "centroid bigint, cvec array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(cents_path)
    cents = spark.read.parquet(cents_path)
    assigned = assign_cells_quantized(emb, cents).select("vec_id", "centroid")
    return stratified_cap(assigned, "centroid", "vec_id", n_per_group=40)


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
