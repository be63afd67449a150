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
# r17 (OPTIMIZATION round): the r16-build list was never consumed (the
# driver's last run wrote CORRECTNESS_r16 before the build session's
# additions). This round changed EXECUTED CODE across most of the
# surface (clustered layout writes, Arrow local frames, thread-pooled
# staged commits, schema-reuse loads, mapside kmeans in the 4 sq8
# serving rows, trimmed CDC handlers) — all 248 rows re-gated green
# locally (see OPTIMIZATION_r17.md). Frontload order: (a) rows whose
# code changed DEEPEST this optimization (layout lifecycle verbs on
# both persisted tiers, CDC, dedup/graph incremental indexes, the
# mapside-switched serving rows); never-driver-snapshotted rows (the
# build round's new registrations) sort into category (2) on their
# own. Then (b) the standing r11-stale cohort (VERDICT r16 #5).
_FRONTLOAD: list[str] = [
    # (a) deepest-changed executed code this round
    "ann_ivf_sq8_index_mutate",
    "ann_ivfpq_index_mutate",
    "ann_ivf_sq8_time_travel",
    "ann_ivfpq_time_travel",
    "ann_ivf_sq8_maintenance_tick",
    "ann_ivfpq_maintenance_tick",
    "ann_ivf_sq8_rebuild",
    "ann_ivfpq_rebuild",
    "streaming_ivf_sq8_cdc",
    "streaming_ivfpq_cdc",
    "streaming_ivf_sq8_cdc_with_tick",
    "streaming_ivf_sq8_cdc_ordered",
    "ann_ivf_sq8_index_serving",
    "ann_ivf_sq8_index_ingest",
    "ann_ivfpq_index_ingest",
    "streaming_ivf_sq8_index",
    "streaming_sq8_index",
    "streaming_ivfpq_index",
    "ann_ivf_sq8_topk",
    "ann_ivf_sq8_rerank_topk",
    "ann_ivf_sq8_batched_topk",
    "ann_ivf_sq8_batched_rerank_topk",
    "ann_ivf_sq8_filtered_topk",
    "ann_ivfpq_filtered_topk",
    "ann_ivfpq_batched_topk",
    "ann_ivfpq_batched_rerank_topk",
    "dedup_semdedup_index",
    "dedup_semdedup_index_compact",
    "dedup_index_compact",
    "cluster_kmeans_converge",
    "cluster_kmeans_mapside",
    "ann_ivf_portable_build_probe",
    # (b) the r11-stale cohort (21 rows)
    "docs_profile_cube",
    "events_json_props",
    "events_value_drift",
    "events_value_outliers",
    "events_value_quantiles",
    "graph_pagerank_knn",
    "multimodal_decode_phash_near_dup",
    "multimodal_resize_dims",
    "rel_bloom_pruned_join",
    "rel_salted_distinct_users",
    "rel_set_ops",
    "sample_group_cap",
    "sample_hash_fraction",
    "sample_split_assign",
    "sample_weighted_mix",
    "streaming_enriched_counts",
    "streaming_topk_events",
    "text_fuzzy_join",
    "text_repetition_scores",
    "text_search_bm25",
    "text_tfidf_cosine_pairs",
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
