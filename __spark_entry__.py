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
# r15: all 48 r14 entries landed green r14 rows — cleared. This
# round's entries: (a) one new registration — the semantic tier's
# compaction row (VERDICT r14 #2, completing the family invariant);
# (b) queries whose executed code changed this round — the Z-order
# layout's two-phase distributed ntile (VERDICT r14 #7), the winnow
# compact None-guard + IvfSq8Index save store-drop fix (ADVICE r14),
# and the distortion pair's cache-hit artifact check (ADVICE r14);
# (c) the ENTIRE r10-stale cohort, 46 rows, drained per VERDICT r14
# #1. The continuation session added 4 more new registrations (the
# mutation/filter/CDC family) and 1 more changed-code row (the serving
# roundtrip, whose load path gained tombstone masking): 59 total
# (7 new + 6 changed + 46 cohort) — the last ~9 cohort rows may fall
# past the ~50-row driver cap; they sort first in category (4) either
# way, so they drain next regardless.
_FRONTLOAD: list[str] = [
    # (a) new registrations this round (the continuation session added
    # the mutation/filter/CDC family on the persisted serving artifacts)
    "ann_ivf_sq8_index_mutate",
    "ann_ivfpq_index_mutate",
    "ann_ivf_sq8_filtered_topk",
    "streaming_ivf_sq8_cdc",
    "ann_ivfpq_batched_rerank_topk",
    "dedup_semdedup_index_compact",
    "ann_ivfpq_index_ingest",
    "streaming_ivfpq_index",
    # (b) implementation changed this round (the index classes' load
    # path gained seq-aware tombstone masking; ingest commits are now
    # seq-named and carry _seq)
    "ann_ivf_sq8_index_serving",
    "ann_ivf_sq8_batched_rerank_topk",
    "events_zorder_layout",
    "dedup_winnow_index_compact",
    "ann_ivf_sq8_index_ingest",
    "embed_pq_distortion_sweep",
    "embed_opq_vs_pq_distortion",
    # (c) the r10-stale cohort, oldest-first drain (VERDICT r14 #1)
    "ann_ivf_portable_nprobe_sweep",
    "ann_ivfpq_residual_topk",
    "ann_lsh_multiprobe",
    "ann_lsh_topk",
    "ann_pq_topk",
    "ann_recall_gate",
    "cluster_kmeans_step",
    "dedup_components",
    "dedup_components_lsh",
    "dedup_embedding_lsh",
    "embed_centroid_outliers",
    "embed_hard_negatives",
    "embed_pca_project",
    "events_asof_purchase",
    "events_hll_users",
    "events_hourly_windows",
    "events_session_windows",
    "index_lifecycle",
    "index_scan_pages",
    "knn_batched",
    "knn_topk_cosine",
    "knn_topk_dotproduct",
    "knn_topk_euclidean",
    "multimodal_features",
    "multimodal_frame_sample",
    "multimodal_real_decode",
    "rel_nation_revenue",
    "rel_orders_topk_per_cust",
    "rel_pricing_summary",
    "rel_salted_join",
    "rel_salted_join_counts",
    "rel_top_customers",
    "streaming_jsonl_ingest",
    "streaming_knn_serving",
    "streaming_whatsapp_source",
    "text_cms_calibration",
    "text_cms_token_freq",
    "text_fingerprints",
    "text_heavy_hitters",
    "text_language_id",
    "text_quality_scores",
    "text_search_rm3",
    "text_token_stats",
    "text_unigram_loglik",
    "upsert_metrics",
    "vector_quantize_int8",
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
