"""Text-analysis operators for training-data pipelines (extension surface;
reference has none — SURVEY.md §2.10, BASELINE.json north star).

All pure Catalyst expressions over the ``documents`` table: map-only,
codegen'd, no shuffle except where an aggregate is the point. Every op is
SQL-expressible for the DuckDB oracle.

Evaluation pattern: every operator tokenizes ONCE into a materialized
``_tk`` projection and derives all features from that array column —
CollapseProject won't merge the projections (it would duplicate the
non-cheap split), so the regex split runs once per row, not once per
feature expression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window

from whatsapp_vectordb_spark.session import local_df
from pyspark.sql import functions as F

from whatsapp_vectordb_spark.functions.text import (
    EN_STOPWORDS,
    normalize_text,
    portable_hash,
    shingles_from_tokens,
    tokens,
)

# BPE-ish subword proxy: runs of letters, digits, or single non-space
# symbols — a deterministic stand-in for a real tokenizer's piece count.
BPE_PIECE_RE = r"[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\s]"


def _with_tokens(df: DataFrame, text_col: str, id_col: str, *extra) -> DataFrame:
    return df.select(F.col(id_col), F.col(text_col), tokens(text_col).alias("_tk"), *extra)


def token_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace-token and subword-piece counts + char length per doc."""
    t = F.col("_tk")
    return _with_tokens(df, text_col, id_col).select(
        F.col(id_col),
        F.length(text_col).alias("n_chars_measured"),
        F.size(t).alias("n_tokens"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_PIECE_RE), 0)).alias("n_pieces"),
        F.size(F.array_distinct(t)).alias("n_distinct_tokens"),
    )


def quality_scores(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality features + composite score ∈ [0,1]:
    length band, mean word length band, stopword presence, lexical
    diversity. Deterministic and engine-portable (round 6)."""
    t = F.col("_tk")
    n_tok = F.size(t)
    n_chars = F.length(text_col)
    mean_word_len = F.when(n_tok > 0, n_chars.cast("double") / n_tok).otherwise(F.lit(0.0))
    stop_ratio = F.when(
        n_tok > 0,
        F.size(F.filter(t, lambda x: x.isin(*EN_STOPWORDS))).cast("double") / n_tok,
    ).otherwise(F.lit(0.0))
    diversity = F.when(
        n_tok > 0, F.size(F.array_distinct(t)).cast("double") / n_tok
    ).otherwise(F.lit(0.0))
    len_ok = (n_tok >= 10) & (n_tok <= 1000)
    word_len_ok = (mean_word_len >= 3.0) & (mean_word_len <= 12.0)
    score = (
        len_ok.cast("double") * 0.25
        + word_len_ok.cast("double") * 0.25
        + F.least(stop_ratio * 2.0, F.lit(1.0)) * 0.25
        + diversity * 0.25
    )
    return _with_tokens(df, text_col, id_col).select(
        F.col(id_col),
        F.size(t).alias("n_tokens"),
        F.round(mean_word_len, 6).alias("mean_word_len"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(diversity, 6).alias("lexical_diversity"),
        F.round(score, 6).alias("quality_score"),
    )


def language_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic language ID: stopword-hit ratio against a per-language
    function-word list; argmax with deterministic tiebreak, 'und' when no
    list scores > 0. (On the synthetic corpus every text is English-like —
    the operator's value is its *shape*: per-language broadcastable lists,
    map-only scoring.)"""
    lists = {
        "en": EN_STOPWORDS,
        "de": "der die das und ist nicht ein eine zu mit von auf für er sie es ich du wir".split(),
        "es": "el la los las de que y en un una es no por con para su al lo se mi tu".split(),
        "fr": "le la les de des et est une un que ne pas pour dans ce il elle nous vous".split(),
    }
    t = F.col("_tk")
    n_tok = F.size(t)
    ratios = {
        lang: F.when(
            n_tok > 0,
            F.size(F.filter(t, lambda x: x.isin(*words))).cast("double") / n_tok,
        ).otherwise(F.lit(0.0))
        for lang, words in lists.items()
    }
    best_score = F.greatest(*ratios.values())
    # deterministic tiebreak: alphabetically-first language at the max wins
    pred = F.lit("und")
    for lang in reversed(sorted(lists)):
        pred = F.when((ratios[lang] == best_score) & (best_score > 0), F.lit(lang)).otherwise(pred)
    return _with_tokens(df, text_col, id_col).select(
        F.col(id_col),
        F.round(ratios["en"], 6).alias("en_ratio"),
        F.round(best_score, 6).alias("best_ratio"),
        pred.alias("lang_pred"),
    )


def tfidf(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 1,
    round_to: int = 6,
) -> DataFrame:
    """Smoothed TF-IDF per (doc, term): ``tf · (ln((N+1)/(df+1)) + 1)``.

    Pure DataFrame restatement of the HashingTF+IDF pipeline with exact
    terms instead of feature hashing (collision-free and SQL-oracle-able).
    Two narrow shuffles: terms-per-doc aggregate, then doc-frequency join —
    the doc-frequency side is a broadcast (|vocabulary| rows).
    """
    toks = _with_tokens(df, text_col, id_col).select(
        F.col(id_col), F.explode("_tk").alias("term")
    )
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    n_docs = df.count()
    dfreq = (
        tf.groupBy("term")
        .agg(F.count("*").alias("df"))
        .where(F.col("df") >= min_df)
    )
    idf = F.log((F.lit(float(n_docs + 1))) / (F.col("df") + 1)) + 1.0
    return tf.join(F.broadcast(dfreq), "term").select(
        id_col,
        "term",
        F.col("tf").alias("term_count"),
        F.round(F.col("tf") * idf, round_to).alias("tfidf"),
    )


def fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 5,
) -> DataFrame:
    """Document fingerprints: exact (md5 of normalized text) and a
    winnowing-style content fingerprint (min portable-hash over distinct
    word 5-grams — stable under small edits away from the minimum)."""
    sh = F.array_distinct(shingles_from_tokens(F.col("_tk"), shingle_n))
    min_h = F.array_min(F.transform(sh, lambda s: portable_hash(s)))
    return _with_tokens(df, text_col, id_col).select(
        F.col(id_col),
        F.md5(normalize_text(text_col)).alias("exact_fp"),
        min_h.alias("content_fp"),
    )


def _bm25_frames(df, text_col: str, id_col: str, materialize: bool = False):
    """(toked, lens, stats) — the three frames every BM25 variant reads.
    Shared so the scoring formula below has exactly one definition.

    ``materialize=True`` localCheckpoints the tokenized frame so a caller
    that consumes it MORE THAN ONCE (RM3's two BM25 passes + feedback-term
    extraction) tokenizes the corpus exactly once instead of once per
    consumer — Catalyst has no common-subplan elimination across separate
    scan subtrees. The price is materializing the tokenized corpus to
    executor-local storage; at 100 TB you'd persist the tokenized frame
    as a table instead, which is the same contract with durable storage."""
    toked = df.select(F.col(id_col), tokens(text_col).alias("_tk"))
    if materialize:
        toked = toked.localCheckpoint()
    lens = toked.select(id_col, F.size("_tk").alias("_dl"))
    stats = lens.agg(
        F.count("*").cast("double").alias("_n_docs"), F.avg("_dl").alias("_avgdl")
    )
    return toked, lens, stats


def _bm25_score(
    tf: DataFrame,
    lens: DataFrame,
    stats: DataFrame,
    id_col: str,
    k1: float,
    b: float,
    top_n: int,
    round_to: int,
    weight_col: str | None = None,
) -> DataFrame:
    """The ONE BM25 scoring tail (df/idf/norm/rank) both the literal-terms
    and weighted-terms entry points share — a k1/b/idf tweak lands in both
    or neither, which oracle parity depends on."""
    dfreq = tf.groupBy("term").agg(F.count("*").alias("_df"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(lens, id_col)
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("_n_docs") - F.col("_df") + F.lit(0.5)) / (F.col("_df") + F.lit(0.5))
    )
    norm = F.col("_tf") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("_dl") / F.col("_avgdl")
    )
    term_score = idf * F.col("_tf") * F.lit(k1 + 1.0) / norm
    if weight_col is not None:
        term_score = F.col(weight_col) * term_score
    return (
        scored.groupBy(id_col)
        .agg(F.round(F.sum(term_score), round_to).alias("bm25"))
        .orderBy(F.col("bm25").desc(), F.col(id_col).asc())
        .limit(top_n)
    )


def bm25_search(
    df: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    top_n: int = 10,
    round_to: int = 6,
    frames=None,
) -> DataFrame:
    """BM25 keyword retrieval: top-``top_n`` docs for a bag of query terms.

    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·|d|/avgdl)),
    idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)) (the Lucene-smoothed
    Robertson–Spärck Jones form, always ≥ 0).

    Scale shape: the corpus is tokenized once; the explode is immediately
    filtered to the query's terms (a tiny IN-list pushed below the
    aggregate), so the shuffled postings are O(docs containing a query
    term), never the full inverted index. Corpus stats (N, avgdl) and the
    per-term document frequencies ride in as one-row / |terms|-row
    broadcast frames — no driver-side collect. Ties break by id ascending;
    scores round before the rank so the cut is engine-portable.
    """
    terms = [t.lower() for t in query_terms]
    toked, lens, stats = frames or _bm25_frames(df, text_col, id_col)
    postings = toked.select(id_col, F.explode("_tk").alias("term")).where(
        F.col("term").isin(terms)
    )
    tf = postings.groupBy(id_col, "term").agg(F.count("*").alias("_tf"))
    return _bm25_score(tf, lens, stats, id_col, k1, b, top_n, round_to)


def bm25_search_weighted(
    df: DataFrame,
    terms_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    top_n: int = 10,
    round_to: int = 6,
    frames=None,
) -> DataFrame:
    """BM25 over a WEIGHTED term frame ``(term, w)`` — the general form
    behind query expansion: score(d) = Σ_t w_t · bm25_t(d).

    Same plan shape as ``bm25_search`` except the postings filter is a
    broadcast semi-join against the tiny term frame instead of a literal
    IN-list (the IN-list is kept there — a literal filter beats a join
    when the terms ARE literals) — still pruned before any shuffle; term
    frames are a handful of rows by construction."""
    toked, lens, stats = frames or _bm25_frames(df, text_col, id_col)
    postings = toked.select(id_col, F.explode("_tk").alias("term")).join(
        F.broadcast(terms_df), "term"
    )
    tf = postings.groupBy(id_col, "term").agg(
        F.count("*").alias("_tf"), F.first("w").alias("_w")
    )
    return _bm25_score(
        tf, lens, stats, id_col, k1, b, top_n, round_to, weight_col="_w"
    )


def rm3_search(
    df: DataFrame,
    seed_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    fb_k: int = 10,
    n_expand: int = 5,
    expand_weight: float = 0.5,
    min_term_len: int = 4,
    top_n: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """RM3-style pseudo-relevance feedback (Lavrenko & Croft '01 lineage;
    the Anserini/Lucene default expansion): BM25 retrieves ``fb_k``
    feedback docs for the seed terms, the ``n_expand`` most frequent
    feedback-doc terms (excluding seeds; ≥ ``min_term_len`` chars as the
    engine-portable stopword guard; ties by term ascending) join the
    query at ``expand_weight``, and a weighted BM25 re-ranks.

    No driver collect anywhere — the feedback set and the expansion terms
    are ≤ fb_k / ≤ n_expand-row frames that broadcast. Deterministic end
    to end: expansion selection is integer counts + lexicographic
    tiebreak, scores round before the final cut.

    EXECUTES EAGERLY, in two checkpointed phases (not one lazy plan): the
    corpus is tokenized ONCE into a localCheckpoint
    (``_bm25_frames(materialize=True)``) shared by all three consumers
    (seed BM25, feedback-term extraction, weighted re-rank) — previously
    each pass re-tokenized, ~3× the tokenization cost — then the weighted
    re-rank runs at construction time into a ≤ ``top_n``-row result
    checkpoint so the corpus-sized tokenized blocks can be released
    before returning (no per-call storage residue; see the canary test
    ``tests/test_textops.py::test_rm3_releases_tokenized_checkpoint``).
    Consequence: calling this costs a full job even if the returned frame
    is only schema-inspected; what you get back is a tiny materialized
    result, so composing over it is cheap."""
    from pyspark.sql import Window

    seeds = [t.lower() for t in seed_terms]
    frames = _bm25_frames(df, text_col, id_col, materialize=True)
    toked = frames[0]
    fb = bm25_search(
        df,
        seeds,
        text_col=text_col,
        id_col=id_col,
        top_n=fb_k,
        round_to=round_to,
        frames=frames,
    ).select(id_col)
    fb_postings = (
        toked.join(F.broadcast(fb), id_col)
        .select(F.explode("_tk").alias("term"))
        .where(~F.col("term").isin(seeds) & (F.length("term") >= min_term_len))
    )
    counts = fb_postings.groupBy("term").agg(F.count("*").alias("_cnt"))
    # global window is BOUNDED: its input is the distinct vocabulary of
    # fb_k documents (hundreds of rows regardless of corpus size), not a
    # corpus-wide frame
    w_rank = Window.orderBy(F.col("_cnt").desc(), F.col("term").asc())
    expansion = (
        counts.withColumn("_r", F.row_number().over(w_rank))
        .where(F.col("_r") <= n_expand)
        .select("term", F.lit(float(expand_weight)).alias("w"))
    )
    spark = df.sparkSession
    seeds_df = local_df(spark, [(t, 1.0) for t in seeds], "term string, w double")
    terms_df = seeds_df.unionByName(expansion)
    out = bm25_search_weighted(
        df,
        terms_df,
        text_col=text_col,
        id_col=id_col,
        top_n=top_n,
        round_to=round_to,
        frames=frames,
    )
    # Run the weighted re-rank NOW into a ≤top_n-row checkpoint (the
    # tokenized checkpoint is the plan's only lineage), then release the
    # corpus-sized tokenized blocks eagerly — ContextCleaner frees them
    # only on driver GC of the RDD handle, so repeated rm3 calls in one
    # session (registry sweep + driver suite) would otherwise accumulate
    # one tokenized-corpus copy per call (ADVICE r8). The tokenization
    # was already eager (materialize=True), so this adds no extra pass.
    out = out.localCheckpoint()
    from whatsapp_vectordb_spark.operators._checkpoint import free_local_checkpoint

    free_local_checkpoint(toked)
    return out


# PII scrub patterns — deliberately simple, RE2/Java-regex-portable
# expressions (no lookarounds) so the SQL oracle applies the identical
# automaton. Order matters: URLs are redacted before emails so an address
# embedded in a URL is consumed by the URL rule in both engines.
PII_PATTERNS = (
    ("url", r"https?://[^\s]+", "<URL>"),
    ("email", r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d[\d\- ]{7,}\d", "<PHONE>"),
)


def redact_pii(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Training-data PII scrub: URLs, emails, IPv4s and phone-shaped digit
    runs replaced by typed placeholders, with per-category match counts.
    Map-only chained ``regexp_replace``/``regexp_count`` — JVM regex, no
    Python, pushdown-friendly; at 100 TB this is a pure scan-transform.

    Returns ``(id, redacted, n_url, n_email, n_ip, n_phone)``. Counts are
    taken on the *pre-redaction* text stage for each rule in order, so a
    URL-embedded email counts as URL only — matching the replacement
    semantics exactly.
    """
    text = F.col(text_col)
    counts = []
    for name, pat, repl in PII_PATTERNS:
        counts.append(F.regexp_count(text, F.lit(pat)).alias(f"n_{name}"))
        text = F.regexp_replace(text, pat, repl)
    return df.select(F.col(id_col), text.alias("redacted"), *counts)


def repetition_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_frac_threshold: float = 0.18,
    dup_frac_threshold: float = 0.30,
    round_to: int = 6,
) -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021, §A1.1 — the
    public repetition rules LLM corpus pipelines apply): per document, the
    fraction of word-trigram occurrences taken by the single most frequent
    trigram (``top_trigram_frac``) and the fraction that are repeats of an
    earlier occurrence (``dup_trigram_frac``), plus a ``repetitive`` 0/1
    verdict against the thresholds. Boilerplate, keyword-stuffed and
    looping generations light up both ratios.

    Scale shape: tokens are materialized once; trigrams immediately reduce
    to 60-bit md5 ids (the same portable-hash trick as the shingle
    pipeline), so both shuffles — (doc, trigram-id) count and the per-doc
    rollup — move 8-byte keys, never trigram strings. Docs with fewer than
    3 tokens produce no trigrams and score 0.0 via the left join.
    """
    toked = df.select(F.col(id_col), tokens(text_col).alias("_tk"))
    base = toked.select(id_col, F.size("_tk").alias("n_tokens"), "_tk")
    tk = F.col("_tk")
    tri = base.where(F.col("n_tokens") >= 3).select(
        F.col(id_col),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.col("n_tokens") - 3),
                lambda i: F.concat_ws(" ", tk[i], tk[i + 1], tk[i + 2]),
            )
        ).alias("_tri"),
    )
    md5 = F.md5(F.col("_tri"))
    tri_h = tri.select(
        F.col(id_col), F.conv(F.substring(md5, 1, 15), 16, 10).cast("long").alias("_h")
    )
    counts = tri_h.groupBy(id_col, "_h").agg(F.count("*").alias("_c"))
    per_doc = counts.groupBy(id_col).agg(
        F.sum("_c").alias("_n_tri"),
        F.max("_c").alias("_max"),
        F.count("*").alias("_nd"),
    )
    out = base.select(id_col, "n_tokens").join(per_doc, id_col, "left")
    n_tri = F.coalesce(F.col("_n_tri"), F.lit(0))
    top = F.round(
        F.when(n_tri > 0, F.col("_max") / n_tri).otherwise(F.lit(0.0)), round_to
    )
    dup = F.round(
        F.when(n_tri > 0, (n_tri - F.col("_nd")) / n_tri).otherwise(F.lit(0.0)), round_to
    )
    return out.select(
        F.col(id_col),
        F.col("n_tokens").cast("int").alias("n_tokens"),
        n_tri.cast("int").alias("n_trigrams"),
        top.alias("top_trigram_frac"),
        dup.alias("dup_trigram_frac"),
        (
            (top > F.lit(top_frac_threshold)) | (dup > F.lit(dup_frac_threshold))
        ).cast("int").alias("repetitive"),
    )


def _deletion_neighborhood(c) -> "F.Column":
    """All strings obtainable by deleting ≤1 character (SymSpell k=1
    neighborhood, Garbe 2012): two strings within Levenshtein distance 1
    always share a member — a substitution at position i collapses to the
    same string when i is deleted from both; an insertion/deletion pair
    collapses to the shorter string. Distinct, includes the string itself.

    Guarded so the empty string yields just itself (Spark's ``sequence``
    would otherwise produce a DESCENDING [1,0] range — not empty)."""
    dels = F.transform(
        F.sequence(F.lit(1), F.length(c)),
        lambda i: F.concat(
            F.substring(c, F.lit(1), i - 1),
            F.substring(c, i + 1, F.length(c)),
        ),
    )
    return F.when(
        F.length(c) >= 1, F.array_distinct(F.concat(F.array(c), dels))
    ).otherwise(F.array(c))


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    left_id: str,
    right_id: str,
    max_dist: int = 1,
) -> DataFrame:
    """Edit-distance record linkage — join rows whose strings are within
    Levenshtein distance ``max_dist`` WITHOUT a cross product, the
    operation behind entity resolution / canonical-name matching in a
    curation pipeline (merge near-identical titles, authors, source names).

    Candidate generation is a SymSpell deletion-neighborhood equi-join:
    each side explodes its ≤``max_dist``-deletion variants (currently
    max_dist=1 ⇒ len+1 variants/row), variants reduce map-side to 60-bit
    md5 ids, and candidates are rows sharing a variant id. Exact
    ``levenshtein`` then verifies survivors — candidate recall is total
    (the shared-variant property is exact for distance ≤ 1), so the result
    equals the naive all-pairs join, at inverted-index cost.

    Scale shape: explode factor is ~avg_len per row, the join shuffles
    8-byte keys, and verification runs only on colliding pairs. No
    all-pairs anywhere; hot variants (very common short strings) behave
    like hot shingles and can be capped upstream if a corpus needs it.
    """
    if max_dist != 1:
        raise ValueError("fuzzy_join currently supports max_dist=1 only")
    lv = left.select(
        F.col(left_id), F.col(left_col).alias("_ls"),
        F.explode(_deletion_neighborhood(F.col(left_col))).alias("_v"),
    ).select(
        left_id, "_ls",
        F.conv(F.substring(F.md5("_v"), 1, 15), 16, 10).cast("long").alias("_h"),
    )
    rv = right.select(
        F.col(right_id), F.col(right_col).alias("_rs"),
        F.explode(_deletion_neighborhood(F.col(right_col))).alias("_v"),
    ).select(
        right_id, "_rs",
        F.conv(F.substring(F.md5("_v"), 1, 15), 16, 10).cast("long").alias("_h"),
    )
    cand = lv.join(rv, "_h").select(left_id, right_id, "_ls", "_rs").distinct()
    return cand.select(
        left_id,
        right_id,
        F.levenshtein("_ls", "_rs").alias("edit_dist"),
    ).where(F.col("edit_dist") <= max_dist)


def tfidf_cosine_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    max_df_candidates: int = 100,
    idf_scale: int = 10_000,
    round_to: int = 6,
) -> DataFrame:
    """Sparse-vector similarity join: all document pairs whose TF-IDF
    cosine similarity clears ``threshold``, via an inverted-index join —
    the similarity-search primitive for HIGH-dimensional sparse vectors
    (vocabulary-sized), complementing the dense-embedding ANN tiers.

    Determinism: IDF is quantized ONCE per term to an integer
    (``round((ln((N+1)/(df+1))+1)·idf_scale)``), so every per-(doc,term)
    weight ``tf·iq`` is a BIGINT and the pair dot products / norms are
    integer sums — associative, engine-exact. The only float ops are one
    ln per vocabulary term and the final ``num/(√na·√nb)``, both on
    identical inputs in any engine.

    Candidate generation joins the inverted index only on terms with
    document frequency ≤ ``max_df_candidates`` (stop-phrase guard — the
    same quadratic-blowup control as ``max_shingle_freq`` in the dedup
    family); candidate pairs are then scored over ALL their shared terms,
    so scores are exact — only pairs sharing nothing but stopwords can be
    missed, and those sit far below any useful threshold anyway.

    Scale shape: tf/df aggregates shuffle on (doc, term) / term; the
    candidate join and the scoring joins shuffle on the term string's
    doc pairs and 8-byte doc ids. No all-pairs product anywhere.
    """
    toks = _with_tokens(df, text_col, id_col).select(
        F.col(id_col), F.explode("_tk").alias("term")
    )
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    n_docs = df.count()
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    iq = F.round(
        (F.log((F.lit(float(n_docs + 1))) / (F.col("df") + 1)) + 1.0) * idf_scale
    ).cast("long")
    w = tf.join(F.broadcast(dfreq.withColumn("_iq", iq)), "term").select(
        F.col(id_col), "term", (F.col("tf") * F.col("_iq")).alias("_w"), "df"
    ).cache()

    rare = w.where(F.col("df") <= max_df_candidates)
    cand = (
        rare.select(F.col(id_col).alias("id_a"), "term")
        .join(rare.select(F.col(id_col).alias("id_b"), "term"), "term")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    norms = w.groupBy(id_col).agg(F.sum(F.col("_w") * F.col("_w")).alias("_n2"))
    wa = w.select(F.col(id_col).alias("id_a"), "term", F.col("_w").alias("_wa"))
    wb = w.select(F.col(id_col).alias("id_b"), "term", F.col("_w").alias("_wb"))
    num = (
        cand.join(wa, "id_a")
        .join(wb, ["id_b", "term"])
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.col("_wa") * F.col("_wb")).alias("_num"))
    )
    na = norms.select(F.col(id_col).alias("id_a"), F.col("_n2").alias("_na"))
    nb = norms.select(F.col(id_col).alias("id_b"), F.col("_n2").alias("_nb"))
    return (
        num.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("_num")
                / (F.sqrt(F.col("_na").cast("double")) * F.sqrt(F.col("_nb").cast("double"))),
                round_to,
            ).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )


def _token_vec_int(tok, dim: int, seed: int) -> "F.Column":
    """Deterministic integer token embedding for late-interaction scoring:
    component d = (('0x'+md5('{seed}:{token}:{d}')[:4]) % 2001) − 1000,
    an int in [−1000, 1000] — reproducible verbatim in any engine with
    md5 (the portable-LSH recipe applied to per-TOKEN vectors)."""
    return F.array(
        *[
            F.conv(
                F.substring(F.md5(F.concat_ws(":", F.lit(str(seed)), tok, F.lit(str(d)))), 1, 4),
                16,
                10,
            ).cast("long")
            % 2001
            - 1000
            for d in range(dim)
        ]
    )


def maxsim_search(
    docs: DataFrame,
    query: str,
    k: int = 10,
    dim: int = 16,
    seed: int = 11,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Late-interaction (ColBERT-style MaxSim) retrieval: every token is
    its own vector; ``score(doc) = Σ_{q ∈ query tokens} max_{t ∈ doc
    tokens} ⟨q, t⟩``. Unlike single-vector cosine, a document matches if
    it covers EACH query facet somewhere, not if its average does.

    Token vectors here are the deterministic integer embeddings
    (``_token_vec_int``) so every dot and max is an exact BIGINT — the
    full pipeline is hash-reproducible in a SQL oracle. Swapping in real
    learned token vectors changes one column expression, not the plan.

    Scale shape: distinct doc tokens get their vectors once (a token
    dimension table, typically ≪ corpus size) and broadcast back to the
    (doc, token) pairs; per query token the dot is a codegen'd fold; one
    shuffle by doc for the max/Σ aggregate; top-k is the no-shuffle
    TakeOrderedAndProject. Query cost grows with |query tokens| only.
    """
    from whatsapp_vectordb_spark.functions.text import py_tokens, tokens

    # same regex as tokens(): query and doc tokenization must agree or a
    # punctuated query contributes facets that can never match any doc token
    qtoks = py_tokens(query, unique=True)
    if not qtoks:
        raise ValueError("query has no tokens")

    pairs = (
        docs.select(F.col(id_col), F.explode(tokens(text_col)).alias("tok"))
        .distinct()
    )
    vocab = pairs.select("tok").distinct().withColumn(
        "tv", _token_vec_int(F.col("tok"), dim, seed)
    )
    with_v = pairs.join(F.broadcast(vocab), "tok")

    # one literal query-token vector per query token; spark computes the
    # SAME md5-derived ints the oracle does, so no Python-side hashing
    maxes = []
    for qi, qt in enumerate(qtoks):
        qv = _token_vec_int(F.lit(qt), dim, seed)
        dot = F.aggregate(
            F.zip_with(F.col("tv"), qv, lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
        maxes.append(F.max(dot).alias(f"_m{qi}"))
    scored = with_v.groupBy(id_col).agg(*maxes)
    total = sum((F.col(f"_m{qi}") for qi in range(1, len(qtoks))), F.col("_m0"))
    return (
        scored.select(F.col(id_col), total.cast("long").alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


def bigram_loglik(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lam: float = 0.75,
    quant: int = 1_000_000,
) -> DataFrame:
    """Interpolated bigram language-model score per document — the
    CCNet/KenLM-style fluency signal one order up from the unigram:
    ``p(w2|w1) = λ·c(w1,w2)/c(w1) + (1−λ)·c(w2)/N`` (fixed-weight
    interpolation — the simplest smoothing whose arithmetic is identical
    in any engine), scored as the per-doc average log-probability over its
    bigrams.

    Determinism: each bigram TYPE's logprob quantizes once to an integer
    (``round(ln(p)·quant)``) in the stats table — the per-doc sum of
    integers is order-exact; only the final per-doc average divides.

    Scale shape: bigram extraction is a map-only zip of two array slices;
    corpus stats are two count-groupBys over narrow token keys; scoring
    joins bigram rows to the type-level stats (vocab²-bounded, usually
    broadcastable) and aggregates by doc. Docs with < 2 tokens have no
    bigrams and are absent (same as the SQL twin).
    """
    from whatsapp_vectordb_spark.functions.text import tokens

    base = docs.select(F.col(id_col), tokens(text_col).alias("_tk")).where(
        F.size("_tk") >= 2
    )
    pairs = base.select(
        F.col(id_col),
        F.explode(
            F.arrays_zip(
                F.expr("slice(_tk, 1, size(_tk) - 1)").alias("w1"),
                F.expr("slice(_tk, 2, size(_tk) - 1)").alias("w2"),
            )
        ).alias("_bg"),
    ).select(F.col(id_col), F.col("_bg.w1").alias("w1"), F.col("_bg.w2").alias("w2"))

    toks = base.select(F.explode("_tk").alias("tok"))
    uni = toks.groupBy("tok").agg(F.count("*").alias("c1"))
    total = toks.agg(F.count("*").cast("double").alias("N"))
    big = pairs.groupBy("w1", "w2").agg(F.count("*").alias("c2"))

    lp = (
        big.join(uni.select(F.col("tok").alias("w1"), F.col("c1").alias("c1w1")), "w1")
        .join(uni.select(F.col("tok").alias("w2"), F.col("c1").alias("c1w2")), "w2")
        .crossJoin(F.broadcast(total))
        .select(
            "w1",
            "w2",
            F.round(
                F.log(
                    F.lit(lam) * F.col("c2") / F.col("c1w1")
                    + F.lit(1.0 - lam) * F.col("c1w2") / F.col("N")
                )
                * quant
            )
            .cast("long")
            .alias("lp"),
        )
    )
    return (
        pairs.join(lp, ["w1", "w2"])
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.sum("lp").cast("double") / F.count("*") / quant, 6).alias(
                "avg_logprob"
            ),
        )
    )


def perplexity_buckets(
    docs: DataFrame,
    lang_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    lam: float = 0.75,
) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): within each
    language, rank documents by LM fluency (:func:`bigram_loglik`) and
    split into *head* / *middle* / *tail* terciles — the standard quality
    stratification pretraining mixes sample from (head kept, tail dropped
    or down-weighted).

    Determinism: ranks order on (micro-unit score desc, id asc); bucket
    edges are integer arithmetic (``rank·3 ≤ n`` → head, ``≤ 2n`` →
    middle), so tie handling and edges are engine-exact.

    Scale shape: the per-language rank comes from the grouped two-phase
    prefix sum (operators/curate.py grouped_prefix_sum) — no language ever
    funnels through a single task, unlike a naive
    ``Window.partitionBy(lang).orderBy(score)`` whose biggest language
    dominates one partition at 100 TB. Per-language doc counts are a
    broadcast join.
    """
    from whatsapp_vectordb_spark.operators.curate import grouped_prefix_sum

    scored = bigram_loglik(docs, text_col=text_col, id_col=id_col, lam=lam).select(
        F.col(id_col),
        F.round(F.col("avg_logprob") * 1_000_000).cast("long").alias("_sm"),
    )
    with_lang = scored.join(
        docs.select(F.col(id_col), F.col(lang_col).alias("lang")), id_col
    )
    # unique ASC order key encoding (score desc, id asc): scores are
    # micro-unit log-probs in (-1e8, 0]; ids < 1e10
    keyed = with_lang.withColumn(
        "_key",
        ((F.lit(100_000_000) - F.col("_sm")) * F.lit(10_000_000_000) + F.col(id_col)).cast(
            "long"
        ),
    ).withColumn("_one", F.lit(1).cast("long"))
    ranked = grouped_prefix_sum(keyed, "lang", "_key", "_one", out_col="_rb").withColumn(
        "rank", (F.col("_rb") + 1).cast("long")
    )
    n_by_lang = with_lang.groupBy("lang").agg(F.count("*").alias("_n"))
    return (
        ranked.join(F.broadcast(n_by_lang), "lang")
        .select(
            F.col(id_col),
            "lang",
            "rank",
            F.when(F.col("rank") * 3 <= F.col("_n"), F.lit("head"))
            .when(F.col("rank") * 3 <= F.col("_n") * 2, F.lit("middle"))
            .otherwise(F.lit("tail"))
            .alias("bucket"),
        )
    )


def quality_percentile_by_source(
    docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-source quality-score calibration: each document's quality as a
    PERCENTILE within its own source (rank/n). Raw heuristic scores are
    not comparable across sources (a clean-wiki 0.6 ≠ a web-crawl 0.6);
    rank calibration is the standard fix before a single global quality
    cut — the per-domain analogue of CCNet's per-language buckets.

    Determinism: ranks on (micro-unit score desc, id asc); percentile is
    ``round(rank/n, 6)``. Scale shape: the per-source rank runs on the
    grouped two-phase distributed prefix sum — a 50-billion-doc web
    source never funnels through one task — and per-source counts are a
    broadcast join.
    """
    from whatsapp_vectordb_spark.operators.curate import grouped_prefix_sum

    scored = quality_scores(docs, text_col=text_col, id_col=id_col).select(
        F.col(id_col),
        F.round(F.col("quality_score") * 1_000_000).cast("long").alias("q_micro"),
    )
    with_src = scored.join(
        docs.select(F.col(id_col), F.col(source_col).alias("source")), id_col
    )
    keyed = with_src.withColumn(
        "_key",
        (
            (F.lit(1_000_000) - F.col("q_micro")) * F.lit(10_000_000_000)
            + F.col(id_col)
        ).cast("long"),
    ).withColumn("_one", F.lit(1).cast("long"))
    ranked = grouped_prefix_sum(
        keyed, "source", "_key", "_one", out_col="_rb"
    ).withColumn("rank", (F.col("_rb") + 1).cast("long"))
    n_by_src = with_src.groupBy("source").agg(F.count("*").alias("_n"))
    return (
        ranked.join(F.broadcast(n_by_src), "source")
        .select(
            F.col(id_col),
            "source",
            "q_micro",
            "rank",
            F.round(F.col("rank") / F.col("_n"), 6).alias("pct"),
        )
    )


def chunk_overlap(
    df: DataFrame,
    size: int = 64,
    stride: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """RAG-style sliding-window chunking: cut each document's token stream
    into windows of ``size`` tokens every ``stride`` tokens (overlapping
    when ``stride < size``), the standard passage unit for retrieval
    corpora. Output: ``(id, chunk_id, start_tok, n_chunk_tokens,
    chunk_md5)`` — the md5 of the space-joined window stands in for the
    chunk text so results stay hashable and compact.

    Scale shape: map-only (tokenize → explode window starts → slice), no
    shuffle at all; a 100 TB corpus chunks at scan speed and the output
    inherits the input partitioning. Token-less documents produce no
    chunks (the window-start sequence needs ≥1 token).
    """
    t = _with_tokens(df, text_col, id_col)
    # explode(when(empty, NULL)) emits no rows for token-less docs — unlike
    # a .where(size>0), which Catalyst pushes into the scan and thereby
    # re-evaluates the tokenize split a second time per row
    starts = F.when(
        F.size("_tk") > 0, F.sequence(F.lit(0), F.size("_tk") - 1, F.lit(stride))
    )
    return (
        t.select(
            F.col(id_col),
            F.size("_tk").alias("_n"),
            F.col("_tk"),
            F.explode(starts).alias("_start"),
        )
        .select(
            F.col(id_col),
            (F.col("_start") / F.lit(stride)).cast("long").alias("chunk_id"),
            F.col("_start").cast("long").alias("start_tok"),
            F.least(F.lit(size), F.col("_n") - F.col("_start"))
            .cast("int")
            .alias("n_chunk_tokens"),
            F.md5(
                F.array_join(F.slice(F.col("_tk"), F.col("_start") + 1, size), " ")
            ).alias("chunk_md5"),
        )
    )


def phrase_search(
    df: DataFrame,
    phrase: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact-phrase search over a positional inverted index: tokenize,
    posexplode into ``(doc, pos, token)`` postings, keep only postings for
    the query's tokens (the selective filter runs BEFORE any shuffle — at
    scale this is the difference between shuffling a corpus and shuffling
    a posting list), broadcast-join the tiny ``(token, offset)`` query
    table, and count anchors where every query offset aligns:
    ``anchor = pos - offset`` groups with ``count(distinct offset) == m``
    are exact phrase occurrences. Output: ``(id, n_matches)`` per
    matching document.

    The query is tokenized with the SAME regex as documents
    (``py_tokens``), so punctuation in the phrase can't silently produce
    unmatchable tokens. Repeated query tokens are handled by counting
    DISTINCT offsets. One shuffle, keyed by ``(doc, anchor)`` — cost
    scales with postings of the query's tokens, not corpus size.
    """
    from whatsapp_vectordb_spark.functions.text import py_tokens

    qtoks = py_tokens(phrase)
    if not qtoks:
        raise ValueError(f"phrase {phrase!r} has no tokens")
    m = len(qtoks)
    qdf = df.sparkSession.createDataFrame(
        [(t, i) for i, t in enumerate(qtoks)], "tok string, qi int"
    )
    postings = df.select(
        F.col(id_col), F.posexplode(tokens(text_col)).alias("pos", "tok")
    ).where(F.col("tok").isin(*set(qtoks)))
    anchors = (
        postings.join(F.broadcast(qdf), "tok")
        .select(F.col(id_col), (F.col("pos") - F.col("qi")).alias("anchor"), "qi")
        .where(F.col("anchor") >= 0)
        .groupBy(id_col, "anchor")
        .agg(F.count_distinct("qi").alias("_nq"))
        .where(F.col("_nq") == m)
    )
    return anchors.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_matches")
    )


def distinct_ngram_diversity(
    df: DataFrame,
    ns: tuple[int, ...] = (1, 2, 3),
    by: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Corpus diversity metrics: per ``by`` group and n-gram order, the
    distinct-n ratio ``|unique n-grams| / |n-grams|`` (Li et al. 2016's
    distinct-1/distinct-2) — the standard detector for degenerate or
    templated text sources (a low distinct-2 source is boilerplate or
    model-generated loops) when triaging pretraining mixes.

    N-grams are contiguous and NON-deduplicated within documents (the
    total must count repeats, that's the point of the metric). Shuffle is
    keyed by ``(group, n, gram)`` for the distinct count with map-side
    partial aggregation; documents shorter than n contribute nothing at
    that order.
    """
    t = df.select(F.col(by), tokens(text_col).alias("_tk")).where(F.size("_tk") > 0)

    # ONE tokenize pass emitting every order's grams (r18): the previous
    # per-n self-union re-ran the tokenization once per order. Each n
    # contributes an array of (n, gram) structs (empty when the doc is
    # shorter than n — same rows as the old per-branch size filter), all
    # orders concatenated and exploded in the same map.
    def _gram_structs(n: int):
        if n == 1:
            grams = F.col("_tk")
        else:
            grams = F.transform(
                F.sequence(F.lit(0), F.size("_tk") - n),
                lambda i: F.array_join(F.slice(F.col("_tk"), i + 1, n), " "),
            )
        arr = F.transform(
            grams,
            lambda g: F.struct(F.lit(n).cast("int").alias("n"), g.alias("_g")),
        )
        return F.coalesce(
            F.when(F.size("_tk") >= n, arr),
            F.array().cast("array<struct<n:int,_g:string>>"),
        )

    allg = t.select(
        F.col(by),
        F.explode(F.concat(*[_gram_structs(n) for n in ns])).alias("s"),
    ).select(F.col(by), F.col("s.n").alias("n"), F.col("s._g").alias("_g"))
    return allg.groupBy(by, "n").agg(
        F.count("*").cast("long").alias("n_total"),
        F.count_distinct("_g").cast("long").alias("n_distinct"),
        F.round(F.count_distinct("_g") / F.count("*"), 6).alias("distinct_ratio"),
    )


def rake_keywords(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010): candidate phrases are
    maximal runs of consecutive NON-stopword tokens; each word scores
    ``degree/frequency`` within its document (degree = Σ length of the
    phrases it appears in, frequency = its occurrence count among
    candidates); a phrase scores the sum of its words' scores; the top
    phrase per document wins. The standard zero-model keyphrase baseline.

    Determinism: per-word scores integer-quantize to micro-units with
    half-away rounding ``(2·10⁶·deg + freq) // (2·freq)`` BEFORE the
    phrase sum, so the total is an order-independent integer in every
    engine. Ties rank by earliest phrase position.

    Scale shape: phrase runs come from one gaps-and-islands window
    (``pos − row_number`` over non-stopword tokens), and every
    subsequent join/aggregate is keyed by document (or doc+word) — the
    shuffles all reuse the same doc-hash exchange; nothing is
    corpus-global.
    """
    toks = df.select(
        F.col(id_col), F.posexplode(tokens(text_col)).alias("pos", "tok")
    ).where(~F.col("tok").isin(*EN_STOPWORDS))
    w = Window.partitionBy(id_col).orderBy("pos")
    # localCheckpoint: runs feeds BOTH downstream aggregates; without it
    # Catalyst re-tokenizes + re-windows the corpus once per consumer
    runs = (
        toks.withColumn("island", F.col("pos") - F.row_number().over(w))
        .localCheckpoint(eager=False)
    )
    # one aggregate yields length, first position, AND the phrase text
    phrases = runs.groupBy(id_col, "island").agg(
        F.count("*").alias("phrase_len"),
        F.min("pos").alias("phrase_pos"),
        F.array_join(
            F.array_sort(F.collect_list(F.struct("pos", "tok"))).tok, " "
        ).alias("phrase"),
    )
    occ = runs.join(
        phrases.select(id_col, "island", "phrase_len", "phrase_pos"),
        [id_col, "island"],
    )
    word_stats = occ.groupBy(id_col, "tok").agg(
        F.count("*").alias("freq"), F.sum("phrase_len").alias("deg")
    )
    scored_words = word_stats.select(
        F.col(id_col),
        "tok",
        F.expr("(2000000 * deg + freq) div (2 * freq)").cast("long").alias("w_micro"),
    )
    phrase_scores = (
        occ.join(scored_words, [id_col, "tok"])
        .groupBy(id_col, "island")
        .agg(
            F.sum("w_micro").cast("long").alias("score_micro"),
            F.min("phrase_pos").alias("phrase_pos"),
        )
    )
    rk = Window.partitionBy(id_col).orderBy(
        F.col("score_micro").desc(), F.col("phrase_pos").asc()
    )
    return (
        phrase_scores.join(phrases.select(id_col, "island", "phrase"), [id_col, "island"])
        .withColumn("_rk", F.row_number().over(rk))
        .where(F.col("_rk") == 1)
        .select(F.col(id_col), "phrase", "score_micro", F.col("phrase_pos").cast("long").alias("phrase_pos"))
    )


# Unit separator: cannot occur inside tokens (TOKEN_SPLIT_RE admits only
# letter/digit ranges), so it is a safe symbol-boundary marker for the
# BPE merge-by-string-replace representation below.
BPE_SEP = "\x1f"


def bpe_learn(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_merges: int = 8,
) -> DataFrame:
    """TRAIN a byte-pair-encoding tokenizer on the corpus (Sennrich et al.
    2016): reduce the corpus to a word-frequency table once, then
    repeatedly merge the highest-count adjacent symbol pair (ties broken
    deterministically: count DESC, then lexicographic lhs, rhs).
    Complements ``tokenization_fertility``-style ops, which only MEASURE
    an existing tokenizer. Returns the learned merge table
    ``(merge_rank, lhs, rhs, pair_count)`` — merge_rank 0 is the first
    merge learned.

    Engine-portable representation (and why there is no UDF): each word
    is one string with DOUBLE ``BPE_SEP`` boundaries between symbols
    (``␟␟h␟␟e␟␟y␟␟``), and merge (a,b)→ab is the LITERAL replace of
    ``␟a␟␟b␟`` with ``␟ab␟``. The doubled boundary is load-bearing:
    each match consumes ONE separator from each side's pair and leaves
    the other for the neighboring match, so adjacent occurrences
    (``abab`` → ``ab ab``, ``aaa`` → ``aa a``) merge exactly as BPE's
    leftmost-non-overlapping scan requires — a single-separator
    representation silently skips every other adjacent occurrence
    because the shared boundary is consumed. Both the JVM and DuckDB
    replace scan left-to-right continuing AFTER each replacement, so
    the SQL oracle unrolls the rounds as CTEs and replays merge
    selection AND application bit-for-bit.

    Scale shape: the merge loop runs over the DISTINCT-WORD table, not
    the corpus — the corpus is touched exactly once (tokenize → explode →
    word count, one shuffle on words). Each round is one map-side pair
    explode + one (lhs, rhs)-keyed aggregate over the word table, a
    1-row argmax collect (bounded like the k·d k-means collect), and a
    map-only replace; the word table is re-cached per round and the
    previous round's cache released, so plans stay constant-size. At
    100 TB the word table is ~10⁷ rows — trivially distributable, and
    tiny next to the corpus scan that builds it.
    """
    sep = BPE_SEP
    words = (
        df.select(F.explode(tokens(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
        .select(
            F.concat(
                F.lit(sep * 2),
                F.array_join(
                    F.filter(F.split("w", ""), lambda s: s != ""), sep * 2
                ),
                F.lit(sep * 2),
            ).alias("ws"),
            "freq",
        )
        .cache()
    )
    words.count()
    spark = df.sparkSession
    merges: list[tuple[int, str, str, int]] = []
    prev = words
    for rank in range(n_merges):
        pairs = (
            prev.select(
                F.filter(F.split("ws", sep), lambda s: s != "").alias("sym"), "freq"
            )
            .select(
                F.explode(
                    F.expr(
                        "CASE WHEN size(sym) >= 2 THEN "
                        "transform(sequence(0, size(sym) - 2), "
                        "i -> struct(sym[i] AS lhs, sym[i + 1] AS rhs)) "
                        "ELSE array() END"
                    )
                ).alias("p"),
                "freq",
            )
            .groupBy("p.lhs", "p.rhs")
            .agg(F.sum("freq").alias("pair_count"))
        )
        best = (
            pairs.orderBy(F.col("pair_count").desc(), "lhs", "rhs").limit(1).collect()
        )
        if not best:
            break
        lhs, rhs, cnt = best[0]["lhs"], best[0]["rhs"], best[0]["pair_count"]
        merges.append((rank, lhs, rhs, int(cnt)))
        nxt = prev.select(
            F.replace(
                F.col("ws"),
                F.lit(f"{sep}{lhs}{sep}{sep}{rhs}{sep}"),
                F.lit(f"{sep}{lhs}{rhs}{sep}"),
            ).alias("ws"),
            "freq",
        ).cache()
        nxt.count()
        if prev is not words:
            prev.unpersist(blocking=True)
        prev = nxt
    if prev is not words:
        prev.unpersist(blocking=True)
    words.unpersist(blocking=True)
    return local_df(spark, 
        merges, "merge_rank int, lhs string, rhs string, pair_count long"
    )


def _bpe_train_inmem(
    word_freqs: list, n_merges: int
) -> list[tuple[int, str, str, int]]:
    """In-memory BPE trainer over a (word, freq) table — the merge LOOP
    of ``bpe_learn`` with identical semantics (count DESC / lex lhs, rhs
    argmax; leftmost non-overlapping application; stop when pairs run
    dry) but incremental pair-count maintenance (Sennrich et al. 2016
    §3): each merge touches only the words that contain the winning
    pair and adjusts counts by delta, so a round costs O(affected
    symbols), not O(corpus) — the shape that makes a 30k-merge vocab
    tractable where the per-round distributed loop is 30k driver jobs.
    Pure function of the multiset of (word, freq): row order never
    matters (counts are sums; the argmax is total-ordered)."""
    from collections import Counter, defaultdict

    words: list[list[str]] = []
    freqs: list[int] = []
    for w, f in word_freqs:
        if w:
            words.append(list(w))
            freqs.append(int(f))
    pair_counts: Counter = Counter()
    where: defaultdict = defaultdict(set)
    for wid, (s, f) in enumerate(zip(words, freqs)):
        for i in range(len(s) - 1):
            p = (s[i], s[i + 1])
            pair_counts[p] += f
            where[p].add(wid)

    out: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        if not pair_counts:
            break
        (lhs, rhs), cnt = min(
            pair_counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        out.append((rank, lhs, rhs, int(cnt)))
        merged = lhs + rhs
        for wid in list(where[(lhs, rhs)]):
            s = words[wid]
            f = freqs[wid]
            # the where-index is maintained lazily (stale wids possible
            # after earlier merges rewrote the word) — verify live
            if not any(
                s[i] == lhs and s[i + 1] == rhs for i in range(len(s) - 1)
            ):
                continue
            ns: list[str] = []
            i = 0
            while i < len(s):
                if i < len(s) - 1 and s[i] == lhs and s[i + 1] == rhs:
                    ns.append(merged)
                    i += 2
                else:
                    ns.append(s[i])
                    i += 1
            for i in range(len(s) - 1):
                p = (s[i], s[i + 1])
                pair_counts[p] -= f
                if pair_counts[p] <= 0:
                    del pair_counts[p]
            for i in range(len(ns) - 1):
                p = (ns[i], ns[i + 1])
                pair_counts[p] += f
                where[p].add(wid)
            words[wid] = ns
    return out


def bpe_learn_local(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_merges: int = 1000,
) -> DataFrame:
    """``bpe_learn`` at REALISTIC vocabulary scale: the corpus-side work
    (tokenize → explode → word count, the only part that touches the
    100 TB) stays distributed and runs ONCE; the merge loop then
    finishes executor-side in ONE ``applyInPandas`` stage over the
    distinct-word table, instead of one driver round-trip per merge
    (8 merges = 8 jobs is oracle-demonstrative; 30k merges = 30k jobs
    is a latency story — VERDICT r11 #1).

    Twin-equality contract: ``_bpe_train_inmem`` replays ``bpe_learn``'s
    selection semantics exactly (count DESC / lexicographic argmax,
    leftmost non-overlapping application, stop when pairs run dry), so
    for any corpus and any n the first n merges of both variants are
    identical — pinned by test and by the ``text_bpe_learn_full``
    registry row, whose oracle is the unrolled 8-round CTE replay.

    Scale shape: the word table is ~10⁷ distinct rows at 100 TB —
    megabytes per executor after the count shuffle, far below task
    memory; one Arrow transfer in, a merge-table out. The trainer is
    incremental: per merge it touches only words CONTAINING the winning
    pair, so per-merge cost is O(affected words), not O(vocab) — but
    that is a corpus-shape bound, not a constant (measured r13,
    BASELINE.md "BPE at vocabulary merge counts": 1k merges in 244 s vs
    8k in 1,916 s on the adversarial 1M-distinct-word stress corpus
    where popular pairs touch ~1M words each — ~240 ms marginal per
    merge there; Zipfian natural corpora sit far below). The
    single-task stage is a deliberate serial section: training has a
    sequential dependency between merges, and shipping it to ONE
    executor beats 30k scheduler round-trips by orders of magnitude
    regardless (the measured 8k-merge loop ≈ 32 min vs an extrapolated
    ~14 h of driver jobs)."""
    words = (
        df.select(F.explode(tokens(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
    )

    def train(pdf):
        import pandas as pd

        merges = _bpe_train_inmem(
            list(zip(pdf["w"].tolist(), pdf["freq"].tolist())), n_merges
        )
        out = pd.DataFrame(
            merges, columns=["merge_rank", "lhs", "rhs", "pair_count"]
        )
        return out.astype({"merge_rank": "int32", "pair_count": "int64"})

    return (
        words.withColumn("_g", F.lit(0))
        .groupBy("_g")
        .applyInPandas(
            train, "merge_rank int, lhs string, rhs string, pair_count long"
        )
        .orderBy("merge_rank")
    )


def bpe_apply_word(w: str, merge_list: list, ranks: dict) -> list[str]:
    """Segment ONE word with a trained merge table: repeatedly apply the
    LOWEST-RANK merge whose pair is present, exhaustively left-to-right
    (continue after each replacement). Provably equal to applying every
    merge once in rank order (the training rewrite and the F.replace
    chain of ``bpe_segment_fertility``): a merge's output symbol l+r is
    strictly longer than either side, so applying a later merge can
    never create an occurrence of an earlier merge's pair — priority
    order and sequential order coincide. Cost is O(|word|) amortized and
    INDEPENDENT of merge-table size (dict lookups), which is the whole
    point at a 30k-merge vocabulary."""
    s = list(w)
    while len(s) >= 2:
        best = None
        for i in range(len(s) - 1):
            r = ranks.get((s[i], s[i + 1]))
            if r is not None and (best is None or r < best):
                best = r
        if best is None:
            break
        lhs, rhs = merge_list[best]
        merged = lhs + rhs
        ns: list[str] = []
        i = 0
        while i < len(s):
            if i < len(s) - 1 and s[i] == lhs and s[i + 1] == rhs:
                ns.append(merged)
                i += 2
            else:
                ns.append(s[i])
                i += 1
        s = ns
    return s


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """APPLY a trained merge table at REAL vocabulary scale — the encode
    twin of ``bpe_learn_local``. ``bpe_segment_fertility`` chains one
    ``F.replace`` per merge inside a single expression: exact and
    oracle-replayable, but the expression tree is n_merges deep — fine
    at the ≤16-round gate, pathological for Catalyst at a 30k-merge
    vocabulary. This is the Arrow path: tokenization stays the shared
    Spark expression (``tokens``, so the two paths can never disagree on
    word boundaries), then ONE pandas UDF segments each token with the
    rank-dict priority algorithm (``bpe_apply_word``) and a per-batch
    word→pieces cache (corpus cost ~O(distinct words), like the trainer).
    Returns ``(doc_id, n_tokens, n_pieces, pieces)`` with ``pieces`` the
    space-joined subword stream in document order — hash-comparable
    against the expression path and the SQL replay (pinned by the
    ``text_bpe_encode_arrow`` registry row at gate scale).

    Scale shape: map-only (no shuffle, no state); the merge table ships
    once per task as a closure (a 30k-merge vocab is ~1 MB — broadcast
    territory, far under task overhead); zero-token documents are
    omitted, mirroring the explode-then-group oracle shape."""
    merge_list = [(str(l), str(r)) for l, r in merges]
    ranks = {p: i for i, p in enumerate(merge_list)}

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("struct<n_pieces: long, pieces: string>")
    def seg(tok_col):
        import pandas as pd

        cache: dict = {}
        n_out, p_out = [], []
        for toks in tok_col:
            pieces: list[str] = []
            for w in toks:
                got = cache.get(w)
                if got is None:
                    got = bpe_apply_word(w, merge_list, ranks)
                    cache[w] = got
                pieces.extend(got)
            n_out.append(len(pieces))
            p_out.append(" ".join(pieces))
        return pd.DataFrame({"n_pieces": n_out, "pieces": p_out})

    t = df.select(F.col(id_col), tokens(text_col).alias("_tk"))
    return (
        t.where(F.size("_tk") > 0)
        .select(
            id_col,
            F.size("_tk").cast("long").alias("n_tokens"),
            seg("_tk").alias("_s"),
        )
        .select(
            id_col,
            "n_tokens",
            F.col("_s.n_pieces").alias("n_pieces"),
            F.col("_s.pieces").alias("pieces"),
        )
    )


def bpe_segment_fertility(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """APPLY a learned BPE merge table (rank order) and measure real
    tokenizer fertility per document: ``(doc_id, n_tokens, n_pieces,
    fertility)`` where fertility = subword pieces per word — the
    trained-tokenizer replacement for the ``BPE_PIECE_RE`` regex proxy
    in ``token_stats``. Together with ``bpe_learn`` this closes the
    train → apply → measure loop.

    Map-only: each token is ␟-bounded (the ``bpe_learn`` representation)
    and run through the merges as a chain of literal replaces inside a
    ``transform`` lambda — leftmost-non-overlapping application for
    free, no UDF, no shuffle except the nothing-shuffles of a per-row
    projection. Documents with zero tokens are omitted (mirrors the
    oracle's explode-then-group shape)."""
    sep = BPE_SEP

    def pieces(t):
        w = F.concat(
            F.lit(sep * 2),
            F.array_join(F.filter(F.split(t, ""), lambda s: s != ""), sep * 2),
            F.lit(sep * 2),
        )
        for lhs, rhs in merges:
            w = F.replace(
                w,
                F.lit(f"{sep}{lhs}{sep}{sep}{rhs}{sep}"),
                F.lit(f"{sep}{lhs}{rhs}{sep}"),
            )
        return F.size(F.filter(F.split(w, sep), lambda s: s != ""))

    t = df.select(F.col(id_col), tokens(text_col).alias("_tk"))
    return (
        t.where(F.size("_tk") > 0)
        .select(
            id_col,
            F.size("_tk").cast("long").alias("n_tokens"),
            F.aggregate(
                F.transform(F.col("_tk"), pieces), F.lit(0), lambda a, x: a + x
            )
            .cast("long")
            .alias("n_pieces"),
        )
        .withColumn(
            "fertility", F.round(F.col("n_pieces") / F.col("n_tokens"), 6)
        )
    )
