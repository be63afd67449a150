"""Corpus-curation operators for LLM training-data pipelines (extension
surface — the reference, Pisush/whatsapp-vectorDB, has no curation ops;
these are the standard pretraining-pipeline stages expressed Spark-first).

- ``duplicate_line_removal`` — CCNet/C4-style boilerplate stripping:
  drop lines that recur across ≥ N distinct documents, keep line order.
- ``ordered_prefix_sum`` / ``pack_sequences`` — GPT-style concat-and-chunk
  packing: exclusive prefix sum of token counts in id order → fixed-length
  training-block spans, via a two-phase DISTRIBUTED prefix sum (a global
  ``Window.orderBy`` collapses to one partition — the classic scale trap).
- ``dataset_diff`` — snapshot compare by id + content hash: added /
  removed / changed / same, the audit step between corpus versions.
- ``scd2_apply`` — slowly-changing-dimension type-2 merge: fold a change
  batch into a validity-interval (``valid_from_seq``/``valid_to_seq``)
  history table. The temporal sibling of the last-writer-wins upsert
  (operators/upsert.py — reference upsert/upsert.go:113-215).
- ``hard_negative_mine`` — contrastive-training pair mining: per query,
  top-k most-similar items with a DIFFERENT label.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window

from whatsapp_vectordb_spark.session import local_df
from pyspark.sql import functions as F


def duplicate_line_removal(
    lines: DataFrame,
    doc_col: str = "doc_id",
    line_no_col: str = "line_no",
    line_col: str = "line",
    min_docs: int = 2,
    sep: str = " ",
) -> DataFrame:
    """Remove lines that occur (normalized-exact) in ≥ ``min_docs``
    distinct documents, then reassemble each document's remaining lines in
    order: ``(doc_id, n_lines_kept, n_lines_dropped, cleaned_text)``.

    This is the CCNet/C4 boilerplate-removal stage (headers, nav bars,
    cookie banners recur across pages; prose doesn't).

    Scale shape: one shuffle to count distinct docs per line hash (the
    md5 keeps wide lines out of the shuffle — 16 bytes/row), one join of
    lines against the recurring-hash set (hash-keyed, and the recurring
    set is typically tiny → broadcastable by AQE), one groupBy(doc) to
    reassemble. No all-pairs anything; cost is linear in corpus lines.
    """
    h = F.md5(F.trim(F.lower(F.col(line_col))))
    with_h = lines.select(
        F.col(doc_col), F.col(line_no_col), F.col(line_col), h.alias("_lh")
    )
    recurring = (
        with_h.groupBy("_lh")
        .agg(F.count_distinct(F.col(doc_col)).alias("_nd"))
        .where(F.col("_nd") >= min_docs)
        .select("_lh", F.lit(True).alias("_dup"))
    )
    flagged = with_h.join(recurring, "_lh", "left")
    kept_struct = F.when(
        F.col("_dup").isNull(),
        F.struct(F.col(line_no_col).alias("n"), F.col(line_col).alias("l")),
    )
    return flagged.groupBy(doc_col).agg(
        F.count(F.when(F.col("_dup").isNull(), 1)).alias("n_lines_kept"),
        F.count(F.when(F.col("_dup").isNotNull(), 1)).alias("n_lines_dropped"),
        F.concat_ws(
            sep,
            F.transform(
                F.array_sort(F.collect_list(kept_struct)), lambda s: s["l"]
            ),
        ).alias("cleaned_text"),
    )


def ordered_prefix_sum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "cum_before",
    n_parts: int | None = None,
) -> DataFrame:
    """EXCLUSIVE prefix sum of ``value_col`` in ``order_col`` order,
    computed scalably: ``Window.orderBy`` with no partitionBy funnels the
    whole table through ONE task; instead this range-partitions on the
    order key, cumsums within each partition, and adds per-partition base
    offsets (computed from ≤ n_parts subtotal rows on the driver) — the
    textbook two-phase parallel scan, O(rows/partition) per task.

    ``order_col`` must be unique (a key); the sum is exact for integers.

    The two phases (per-partition window pass, driver-collected subtotal
    pass) are separate Spark jobs that must see IDENTICAL partition
    boundaries and ``_pid`` assignment. ``localCheckpoint`` materializes
    the range-partitioned frame once so both jobs read the same blocks —
    without it, a nondeterministic input (``df.sample``, a changed
    upstream file set between jobs) would silently produce wrong offsets.
    """
    n_parts = n_parts or df.sparkSession.sparkContext.defaultParallelism
    part = (
        df.repartitionByRange(n_parts, F.col(order_col))
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy(F.col(order_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = part.withColumn("_local_before", F.coalesce(F.sum(value_col).over(w), F.lit(0)))
    totals = (
        part.groupBy("_pid")
        .agg(F.sum(value_col).alias("_tot"), F.min(order_col).alias("_min_key"))
        .orderBy("_min_key")
        .collect()
    )
    base, offsets = 0, {}
    for r in totals:
        offsets[r["_pid"]] = base
        base += int(r["_tot"])
    off = F.element_at(
        F.create_map(
            *[F.lit(x) for kv in offsets.items() for x in kv]
        ),
        F.col("_pid"),
    )
    return local.withColumn(out_col, (F.col("_local_before") + off).cast("long")).drop(
        "_pid", "_local_before"
    )


def pack_sequences(
    docs: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    n_tokens_col: str = "n_tokens",
) -> DataFrame:
    """GPT-style concat-and-chunk packing plan: concatenate all documents'
    tokens in ``id_col`` order, cut into fixed ``seq_len`` training blocks,
    and report each document's span: ``(doc_id, n_tokens, cum_before,
    start_block, end_block, n_blocks)``.

    This is the packing scheme real pretraining uses (no padding waste, no
    bin-packing search) and — unlike first-fit — it is order-deterministic
    and embarrassingly parallel: everything after the prefix sum is a
    map-only projection.
    """
    cum = ordered_prefix_sum(docs, id_col, n_tokens_col)
    start = F.floor(F.col("cum_before") / seq_len)
    end = F.floor((F.col("cum_before") + F.col(n_tokens_col) - 1) / seq_len)
    return cum.select(
        F.col(id_col),
        F.col(n_tokens_col).cast("long").alias("n_tokens"),
        F.col("cum_before"),
        start.cast("long").alias("start_block"),
        end.cast("long").alias("end_block"),
        (end - start + 1).cast("long").alias("n_blocks"),
    )


def dataset_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str,
    content_cols: list[str],
) -> DataFrame:
    """Snapshot diff by id + content hash: one row per id with status
    ``added`` / ``removed`` / ``changed`` / ``same`` — the audit operator
    between two corpus versions (what changed since the last crawl?).

    Scale shape: content collapses to one md5 per row BEFORE the join, so
    the full-outer join shuffles (id, 32-char hash) pairs only — never the
    documents themselves.
    """
    def fingerprint(df: DataFrame) -> DataFrame:
        return df.select(
            F.col(id_col),
            F.md5(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in content_cols])).alias(
                "_h"
            ),
        )

    o = fingerprint(old).withColumnRenamed("_h", "_h_old")
    n = fingerprint(new).withColumnRenamed("_h", "_h_new")
    j = o.join(n, id_col, "full_outer")
    status = (
        F.when(F.col("_h_old").isNull(), F.lit("added"))
        .when(F.col("_h_new").isNull(), F.lit("removed"))
        .when(F.col("_h_old") != F.col("_h_new"), F.lit("changed"))
        .otherwise(F.lit("same"))
    )
    return j.select(F.col(id_col), status.alias("status"))


def scd2_apply(
    current: DataFrame,
    changes: DataFrame,
    id_col: str,
    attr_cols: list[str],
    seq_col: str = "eff_seq",
) -> DataFrame:
    """Type-2 slowly-changing-dimension merge: fold a batch of attribute
    changes into a validity-interval history. Output one row per version:
    ``(id, attrs..., valid_from_seq, valid_to_seq)`` with ``valid_to_seq
    NULL`` on the current version — consecutive same-attribute changes
    collapse (no zero-width or duplicate versions).

    ``current`` rows are treated as the seq-0 opening version; ``changes``
    carry ``seq_col`` (monotone ingest sequence — micro-batch id, CDC
    LSN). Deterministic: ties on (id, seq) are invalid input by contract.

    Scale shape: one shuffle by id, per-id window scans (history per key
    is small); no driver-side state. The temporal generalization of the
    replace-by-id upsert (operators/upsert.py).
    """
    opening = current.select(
        F.col(id_col), *[F.col(c) for c in attr_cols], F.lit(0).cast("long").alias(seq_col)
    )
    versions = opening.unionByName(
        changes.select(
            F.col(id_col), *[F.col(c) for c in attr_cols], F.col(seq_col).cast("long")
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.col(seq_col).asc())
    attr_struct = F.struct(*[F.col(c) for c in attr_cols])
    dedup = versions.withColumn("_prev_attrs", F.lag(attr_struct).over(w)).where(
        F.col("_prev_attrs").isNull() | (F.col("_prev_attrs") != attr_struct)
    )
    w2 = Window.partitionBy(id_col).orderBy(F.col(seq_col).asc())
    return (
        dedup.withColumn("_next_seq", F.lead(F.col(seq_col)).over(w2))
        .select(
            F.col(id_col),
            *[F.col(c) for c in attr_cols],
            F.col(seq_col).alias("valid_from_seq"),
            F.col("_next_seq").alias("valid_to_seq"),
        )
    )


def hard_negative_mine(
    index: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    round_to: int = 6,
) -> DataFrame:
    """Contrastive hard-negative mining: for each query row, the top-k
    most-cosine-similar index rows with a DIFFERENT label — the negatives
    that actually teach an embedding model (random negatives are too easy).

    ``queries`` is a small frame (``(id, vec, label)``) — it broadcasts;
    the index side is scanned once with a per-task heap (the same
    no-shuffle shape as batched k-NN). Ranks on (rounded score, id) for
    engine-exact ordering.
    """
    from whatsapp_vectordb_spark.functions.vector import cosine_similarity

    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        F.col(label_col).alias("q_label"),
    )
    scored = (
        index.alias("i")
        .crossJoin(F.broadcast(q))
        .where(F.col(label_col) != F.col("q_label"))
        .select(
            "q_id",
            F.col(id_col).alias("neg_id"),
            F.col(label_col).alias("neg_label"),
            F.round(cosine_similarity(F.col(vec_col), F.col("q_vec")), round_to).alias(
                "score"
            ),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("score").desc(), F.col("neg_id").asc())
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
        .drop("_rk")
    )


def dsir_log_weights(
    docs: DataFrame,
    target_filter,
    buckets: int = 4096,
    seed: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_to: int = 6,
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every document
    by ``log p_target(x) − log p_source(x)`` under two bag-of-hashed-ngram
    unigram models — the cheap, trainable-free way to surface documents
    that look like a target domain. Select-by-top-weight replaces DSIR's
    Gumbel sampling step with a deterministic rank (oracle-replayable).

    Features are hashed unigrams AND bigrams (``portable_hash % buckets``,
    engine-portable md5); both models use add-one smoothing over the same
    ``buckets`` space, so every bucket has a finite log-ratio.

    Scale shape: each model is a ≤``buckets``-row count table (one partial
    agg over the feature stream), broadcast back onto the feature stream
    for map-side scoring — no shuffle beyond the two bounded aggregations
    and the final per-doc sum. Per-feature log-ratios are quantized to
    integer micro-units BEFORE summation so the fold order can't change
    the result (oracle-parity pattern).
    """
    from whatsapp_vectordb_spark.functions.text import portable_hash, tokens

    t = F.col("_tk")
    bg = F.when(
        F.size(t) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - 1),
            lambda i: F.concat(F.element_at(t, i), F.lit(" "), F.element_at(t, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    feats = (
        docs.select(
            F.col(id_col), tokens(text_col).alias("_tk"), target_filter.alias("_is_t")
        )
        .select(F.col(id_col), F.explode(F.concat(t, bg)).alias("feat"), "_is_t")
        .select(
            F.col(id_col),
            (portable_hash(F.col("feat"), seed=seed) % buckets).alias("b"),
            "_is_t",
        )
    )
    tgt = feats.where(F.col("_is_t")).groupBy("b").agg(F.count("*").alias("ct"))
    src = feats.groupBy("b").agg(F.count("*").alias("cs"))
    nt = feats.where(F.col("_is_t")).agg(F.count("*").cast("double").alias("nt"))
    ns = feats.agg(F.count("*").cast("double").alias("ns"))
    lp = (
        feats.join(F.broadcast(tgt), "b", "left")
        .join(F.broadcast(src), "b", "left")
        .crossJoin(F.broadcast(nt))
        .crossJoin(F.broadcast(ns))
        .select(
            F.col(id_col),
            F.round(
                (
                    F.log((F.coalesce(F.col("ct"), F.lit(0)) + 1) / (F.col("nt") + buckets))
                    - F.log((F.coalesce(F.col("cs"), F.lit(0)) + 1) / (F.col("ns") + buckets))
                )
                * 1_000_000
            )
            .cast("long")
            .alias("lr"),
        )
    )
    return lp.groupBy(id_col).agg(
        F.count("*").alias("n_feats"),
        F.round(F.sum("lr").cast("double") / 1_000_000, round_to).alias("log_weight"),
    )


def token_budget_select(
    docs_scored: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    n_tokens_col: str = "n_tokens",
    quality_micro_col: str = "q_micro",
) -> DataFrame:
    """Quality-ordered corpus selection under a token budget: take
    documents in (quality desc, id asc) order while the running token
    total still fits ``budget`` — the deterministic version of the
    "fill the training mix from the top of the quality ranking" step.

    ``quality_micro_col`` must be an integer quality score in [0, 1e6]
    (micro-units) and ``id_col`` a non-negative key < 1e10; the two fold
    into ONE unique BIGINT sort key so the distributed
    :func:`ordered_prefix_sum` (no global single-partition window) drives
    the running total. Selection keeps a doc iff its whole token count
    fits: ``cum_before + n_tokens <= budget``.
    """
    keyed = docs_scored.select(
        F.col(id_col),
        F.col(n_tokens_col).cast("long").alias("n_tokens"),
        F.col(quality_micro_col).cast("long").alias("q_micro"),
        ((F.lit(1_000_000) - F.col(quality_micro_col)) * F.lit(10_000_000_000)
         + F.col(id_col)).cast("long").alias("_sort_key"),
    )
    cum = ordered_prefix_sum(keyed, "_sort_key", "n_tokens")
    return (
        cum.where(F.col("cum_before") + F.col("n_tokens") <= budget)
        .select(F.col(id_col), "q_micro", "n_tokens", "cum_before")
    )


def cdc_chunks(
    docs: DataFrame,
    boundary_mod: int = 8,
    seed: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Content-defined chunking over token streams (the FastCDC/rsync idea
    applied to text): cut AFTER any token whose portable hash ≡ 0 mod
    ``boundary_mod``, so chunk boundaries move WITH the content — an
    insertion near the top of a document shifts every fixed-width block
    but leaves all content-defined chunks after the next boundary intact.
    This is what makes chunk-level dedup robust at 100 TB: re-crawled
    pages with small edits still share almost all their chunk hashes.

    Output: one row per chunk — ``(doc_id, chunk_no, n_tokens,
    chunk_hash)`` with ``chunk_hash`` the engine-portable 63-bit hash of
    the space-joined chunk text.

    Scale shape: posexplode fans out JVM-side; the running boundary count
    is a per-document window (shuffle keyed by doc — bounded partitions,
    no global ordering); chunk reassembly is one groupBy on
    ``(doc, chunk_no)``. Expected chunk length is ``boundary_mod`` tokens.
    """
    from whatsapp_vectordb_spark.functions.text import (
        portable_hash,
        portable_hash64,
        tokens,
    )

    toks = docs.select(
        F.col(id_col), F.posexplode(tokens(text_col)).alias("pos", "tok")
    )
    flagged = toks.select(
        F.col(id_col),
        "pos",
        "tok",
        (portable_hash(F.col("tok"), seed=seed) % boundary_mod == 0)
        .cast("int")
        .alias("cut"),
    )
    w = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    chunked = flagged.withColumn(
        "chunk_no", F.coalesce(F.sum("cut").over(w), F.lit(0)).cast("long")
    )
    return (
        chunked.groupBy(id_col, "chunk_no")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                    lambda s: s["tok"],
                ),
                " ",
            ).alias("_chunk_text"),
        )
        .select(
            F.col(id_col),
            "chunk_no",
            "n_tokens",
            portable_hash64(F.col("_chunk_text"), seed=seed + 1).alias("chunk_hash"),
        )
    )


def cdc_duplicate_chunks(
    docs: DataFrame,
    min_docs: int = 2,
    boundary_mod: int = 8,
    seed: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-document duplicate-chunk report over :func:`cdc_chunks`:
    chunks (by content hash) appearing in ≥ ``min_docs`` distinct
    documents, with occurrence counts — the candidate set a chunk-level
    deduplicator would strip. One hash-keyed aggregation over the chunk
    stream; candidate volume is bounded by recurring content, not corpus
    size."""
    ch = cdc_chunks(
        docs, boundary_mod=boundary_mod, seed=seed, text_col=text_col, id_col=id_col
    )
    return (
        ch.groupBy("chunk_hash")
        .agg(
            F.countDistinct(id_col).cast("long").alias("n_docs"),
            F.count("*").cast("long").alias("n_occurrences"),
            F.min("n_tokens").cast("long").alias("n_tokens"),
            F.min(id_col).alias("first_doc"),
        )
        .where(F.col("n_docs") >= min_docs)
    )


def grouped_prefix_sum(
    df: DataFrame,
    group_col: str,
    order_col: str,
    value_col: str,
    out_col: str = "cum_before",
    n_parts: int | None = None,
) -> DataFrame:
    """Per-GROUP exclusive prefix sum of ``value_col`` in ``order_col``
    order — the grouped sibling of :func:`ordered_prefix_sum`, for ranks
    and running totals *within* a partition key (per-language perplexity
    ranks, per-domain token budgets) without funnelling each group through
    one task.

    Range-partitions on ``(group, order)`` so a group's rows are
    contiguous across partitions and each partition only sorts its slice;
    per-``(partition, group)`` subtotals (≤ ``n_parts + groups`` rows — a
    group spans a partition boundary at most once per boundary) are
    collected once and broadcast-joined back as base offsets.
    ``order_col`` must be unique within its group. localCheckpoint for the
    same two-job determinism reason as :func:`ordered_prefix_sum`.
    """
    spark = df.sparkSession
    n_parts = n_parts or spark.sparkContext.defaultParallelism
    part = (
        df.repartitionByRange(n_parts, F.col(group_col), F.col(order_col))
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    w = (
        Window.partitionBy("_pid", group_col)
        .orderBy(F.col(order_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = part.withColumn(
        "_local_before", F.coalesce(F.sum(value_col).over(w), F.lit(0))
    )
    totals = (
        part.groupBy("_pid", group_col)
        .agg(F.sum(value_col).alias("_tot"))
        .collect()
    )
    running: dict = {}
    rows = []
    for r in sorted(totals, key=lambda r: r["_pid"]):
        g = r[group_col]
        rows.append((r["_pid"], g, running.get(g, 0)))
        running[g] = running.get(g, 0) + int(r["_tot"])
    gtype = dict(part.dtypes)[group_col]
    off = local_df(spark, 
        rows, f"_pid int, {group_col} {gtype}, _off long"
    )
    return (
        local.join(F.broadcast(off), ["_pid", group_col])
        .withColumn(out_col, (F.col("_local_before") + F.col("_off")).cast("long"))
        .drop("_pid", "_local_before", "_off")
    )


def shard_assign(
    docs: DataFrame,
    shard_tokens: int,
    seed: int = 7,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Deterministic global shuffle + balanced output sharding: order
    documents by a seeded 63-bit hash of their id (a reproducible random
    permutation — the "shuffle" every pretraining run needs, with no RNG
    state), then cut the permuted token stream into shards of
    ``shard_tokens`` tokens via the distributed prefix sum:
    ``shard_id = cum_tokens_before // shard_tokens``. Every shard lands
    within one document of the target size — unlike count-based sharding,
    which skews bytes/shard by document length.

    Scale shape: the hash is map-side; the prefix sum is the two-phase
    range-partitioned scan (no single-task window); the assignment is an
    exact integer ``div``. Hash ties (two ids colliding in 63 bits,
    ~1e-12 at 10^5 docs) could order differently across engines, which
    matters only if the tied pair straddles a shard boundary.

    Input needs an integer ``tokens_col``; pair with
    ``textops.token_stats`` when starting from raw text.
    """
    from whatsapp_vectordb_spark.functions.text import portable_hash64

    keyed = docs.select(
        F.col(id_col),
        F.col(tokens_col).cast("long").alias("_nt"),
        portable_hash64(F.col(id_col).cast("string"), seed=seed).alias("_h"),
    )
    cum = ordered_prefix_sum(keyed, "_h", "_nt")
    return cum.select(
        F.col(id_col),
        F.col("_nt").alias(tokens_col),
        F.col("_h").alias("perm_key"),
        F.col("cum_before"),
        F.expr(f"cum_before div {int(shard_tokens)}").cast("long").alias("shard_id"),
    )


def epoch_waterfill(
    per_source: DataFrame,
    budget: int,
    max_epochs: int = 4,
    source_col: str = "source",
    tokens_col: str = "n_tokens",
    weight_col: str = "weight",
) -> DataFrame:
    """Data-constrained epoch scheduling (in the spirit of Muennighoff et
    al. 2023): split a total token ``budget`` across sources proportional
    to integer ``weight``, capping every source at ``max_epochs`` passes
    over its own tokens, with capped sources' leftover re-flowing to the
    rest — exact cap-constrained water-filling, solved in closed form.

    Sources sort by ratio ``cap/weight`` ascending (the order in which
    the water level λ reaches each cap); with inclusive prefix sums C_k
    (caps) and W_k (weights), source k is capped iff
    ``(budget − C_k)·w_k ≥ cap_k·(W_total − W_k)`` — the cap set is the
    maximal satisfying prefix. Uncapped sources get
    ``(budget − C_k*)·w_s // (W_total − W_k*)``.

    ALL arithmetic is integer (Python bigint here, HUGEINT in the SQL
    twin), including the reported ``epochs_micro = round(1e6·alloc/n)``
    via ``(2·10⁶·alloc + n) // (2n)`` — no float ever touches the
    result, so engines agree bit-for-bit. The ratio sort key is one IEEE
    double division, identical in every engine, tie-broken by source.

    Scale shape: ``per_source`` is the OUTPUT of a corpus-scale
    aggregate; this step runs on |sources| rows (tens), collected to the
    driver by construction — the distributed work is upstream.
    Zero-weight sources are dropped (they'd divide by zero in the ratio
    and can't absorb budget anyway).
    """
    spark = per_source.sparkSession
    rows = (
        per_source.select(
            F.col(source_col).alias("source"),
            F.col(tokens_col).cast("long").alias("n"),
            F.col(weight_col).cast("long").alias("w"),
        )
        .where(F.col("w") > 0)
        .collect()
    )
    wtot = sum(r["w"] for r in rows)
    order = sorted(rows, key=lambda r: (max_epochs * r["n"] / r["w"], r["source"]))
    ck = wk = 0
    kstar, ckstar, wkstar = 0, 0, 0
    for p, r in enumerate(order, 1):
        cap = max_epochs * r["n"]
        ck += cap
        wk += r["w"]
        if (budget - ck) * r["w"] >= cap * (wtot - wk):
            kstar, ckstar, wkstar = p, ck, wk
    out = []
    for p, r in enumerate(order, 1):
        cap = max_epochs * r["n"]
        if p <= kstar:
            alloc = cap
        else:
            alloc = (budget - ckstar) * r["w"] // (wtot - wkstar)
        epochs_micro = (2 * 1_000_000 * alloc + r["n"]) // (2 * r["n"])
        out.append((r["source"], r["n"], r["w"], cap, alloc, epochs_micro))
    return local_df(spark, 
        out,
        "source string, n_tokens long, weight long, cap_tokens long, "
        "alloc_tokens long, epochs_micro long",
    )


def shard_interleave(
    assigned: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
    shard_col: str = "shard_id",
) -> DataFrame:
    """Source-striped ordering WITHIN each training shard: documents
    interleave round-robin across sources (1st of each source, then 2nd
    of each, ...) so a sequential reader never sees a long single-source
    run — the intra-shard complement of the global hash permutation
    (without it, a shard that happens to be 80% web-crawl feeds the
    trainer correlated batches).

    Output adds ``pos_in_shard`` (0-based). Determinism: within a
    (shard, source) stripe docs order by the permutation key; stripes
    merge by (round, source, id). Scale shape: two row_number windows,
    both keyed by shard — the same exchange, each shard a bounded
    ~shard_tokens sequence.
    """
    w_src = Window.partitionBy(shard_col, source_col).orderBy("perm_key", id_col)
    w_shard = Window.partitionBy(shard_col).orderBy(
        "_round", source_col, F.col(id_col)
    )
    return (
        assigned.withColumn("_round", F.row_number().over(w_src))
        .withColumn("pos_in_shard", (F.row_number().over(w_shard) - 1).cast("long"))
        .drop("_round")
    )
