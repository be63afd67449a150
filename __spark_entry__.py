"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in the ``whatsapp_vectordb_spark/harness`` package
(per-family query modules registering into ``harness._core``).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY.md §2.5 Q1) on sf0.001: embed the documents
    corpus with the deterministic embedder, embed a query string, return
    the top-10 most similar documents with scores."""
    import os

    from pyspark.sql import functions as F

    from whatsapp_vectordb_spark.embedder import with_embedding
    from whatsapp_vectordb_spark.operators.search import search_text

    sf_dir = os.environ.get("SPARK_GRAFT_ENTRY_SF_DIR", "/root/testdata/sf0.001")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    index = with_embedding(docs, "text", "embedding").select(
        F.col("doc_id").cast("string").alias("id"), "text", "embedding"
    )
    return search_text(
        index,
        "spark join sort merge window query",
        k=10,
        id_col="id",
        vec_col="embedding",
        payload_cols=("text",),
    )


# RULE (README round policy §3): frontload slots go FIRST to queries
# whose implementation or oracle changed since their latest driver row
# (a green row that predates the change verifies nothing) and to new
# registrations, THEN to the oldest stale cohort. Clear entries once
# their fresh row lands.
#
# r14: all 29 r13 entries landed green r13 rows — cleared (VERDICT r13
# #7 pattern). This round's entries: (a) six new registrations — the
# two compaction rows (VERDICT r13 #3), the k-means SemDeDup row, the
# semantic-index pair (batch + streaming), and the IvfSq8Index ingest
# roundtrip; (b) queries whose executed code changed this round —
# the distortion pair's shared per-m builds (VERDICT r13 #6), the
# batched-probe per-query cell dedup, the IvfSq8Index atomic
# save/add_batch + batch-dir load union, and the dedup index classes'
# staging GC + manifest-aware state listing (ADVICE r13); (c) the
# ENTIRE r9-stale cohort, 31 rows, drained per VERDICT r13 #1 so the
# oldest latest-row moves to r10. 48 total — inside the ~50-row driver
# sample.
_FRONTLOAD: list[str] = [
    # (a) new registrations this round
    "dedup_index_compact",
    "dedup_winnow_index_compact",
    "dedup_semdedup_kmeans",
    "dedup_semdedup_index",
    "streaming_semdedup_index",
    "ann_ivf_sq8_index_ingest",
    # (b) implementation changed this round
    "embed_pq_distortion_sweep",
    "embed_opq_vs_pq_distortion",
    "ann_ivf_sq8_batched_topk",
    "ann_ivf_sq8_batched_rerank_topk",
    "ann_ivfpq_batched_topk",
    "ann_ivf_sq8_index_serving",
    "dedup_incremental_index",
    "dedup_incremental_winnow_index",
    "streaming_dedup_index",
    "streaming_winnow_index",
    "dedup_winnow_pairs",  # winnow_duplicate_pairs gained durable_path (r14)
    # (c) the r9-stale cohort, oldest-first drain (VERDICT r13 #1)
    "curate_dsir_weights",
    "curate_epoch_waterfill",
    "curate_token_budget",
    "events_cusum_changepoints",
    "events_hll_daily_rollup",
    "events_markov_transitions",
    "events_quantile_calibration",
    "events_retention_cohorts",
    "events_top_paths",
    "graph_triangle_count",
    "multimodal_phash_near_dup",
    "multimodal_scene_cuts",
    "pack_sequences_blocks",
    "pack_shard_assign",
    "pack_shard_interleave",
    "pipeline_pretraining_shards",
    "rel_priority_shipping",
    "rel_scd2_point_in_time",
    "sample_split_leakage",
    "sample_weighted_reservoir",
    "streaming_hll_registers",
    "text_chunk_overlap",
    "text_distinct_ngrams",
    "text_langid_confusion",
    "text_novelty_vs_reference",
    "text_perplexity_buckets",
    "text_phrase_search",
    "text_pmi_pairs",
    "text_quality_calibrated",
    "text_rake_keywords",
    "text_tokenizer_fertility",
]


def _driver_status() -> dict[str, tuple[int, bool]]:
    """name → (latest round with a driver row, did that row pass)."""
    import glob
    import json
    import os
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    latest: dict[str, tuple[int, bool]] = {}
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", os.path.basename(path))
        if m is None:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            passed = (
                row.get("err") is None
                and row.get("rows_match") is not False
                and row.get("schema_match") is not False
                and row.get("hash_match") is not False
            )
            if name not in latest or rnd > latest[name][0]:
                latest[name] = (rnd, passed)
    return latest


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Registry, ordered for the driver's ~50-row-per-round sample cap:

    1. ``_FRONTLOAD`` — queries fixed since their last driver row;
    2. never-snapshotted names (no driver row at all);
    3. names whose LATEST driver row is a FAIL;
    4. green names, stalest round first (oldest green gets re-verified
       soonest — a green row from round 1 says nothing about today);
    5. freshest greens last.

    tools/check_correctness.py keeps full-surface local coverage either way.
    """
    from whatsapp_vectordb_spark.harness import QUERIES

    status = _driver_status()
    front = {n: i for i, n in enumerate(_FRONTLOAD)}

    def key(item: tuple[int, str]) -> tuple:
        idx, name = item
        if name in front:
            return (0, front[name])
        if name not in status:
            return (1, idx)
        rnd, passed = status[name]
        if not passed:
            return (2, idx)
        return (3, rnd, idx)

    ordered = sorted(((i, n) for i, n in enumerate(QUERIES)), key=key)
    return {n: QUERIES[n] for _, n in ordered}


def oracle_sql() -> dict[str, str]:
    from whatsapp_vectordb_spark.harness import ORACLES

    return dict(ORACLES)
