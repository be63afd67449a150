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
# r16: all 50 r15 entries landed green r15 rows — cleared. This
# round's entries: (a) two new registrations completing the persisted
# index family symmetry (PQ filtered serving, PQ CDC — VERDICT r15
# #5/#6); (b) every row exercising IvfSq8Index/IvfPqIndex
# save/load/add_batch — those paths changed this round (upsert
# in-batch dedupe + strict seq parse per ADVICE r15, and the bounded
# O(touched-cells) fold per VERDICT r15 #3); (c) the LAST 11-row
# r10-stale cohort (VERDICT r15 #4) — this drain ends cohort
# management. 25 total; the remaining ~25 driver slots fall to the
# stalest greens (r11) automatically via category (4).
_FRONTLOAD: list[str] = [
    # (a) new registrations this round
    "ann_ivf_sq8_time_travel",
    "ann_ivfpq_time_travel",
    "ann_ivf_sq8_rebuild",
    "ann_ivfpq_rebuild",
    "ann_ivf_sq8_maintenance_tick",
    "ann_ivfpq_maintenance_tick",
    "streaming_ivf_sq8_cdc_with_tick",
    "ann_ivfpq_filtered_topk",
    "streaming_ivfpq_cdc",
    "streaming_ivf_sq8_cdc_ordered",
    # (b) executed code changed this round (persisted-index mutation
    # paths: in-batch upsert dedupe, 8-digit seq parse, bounded fold)
    "ann_ivf_sq8_index_mutate",
    "ann_ivfpq_index_mutate",
    "streaming_ivf_sq8_cdc",
    "ann_ivf_sq8_index_serving",
    "ann_ivf_sq8_index_ingest",
    "ann_ivf_sq8_filtered_topk",
    "ann_ivf_sq8_batched_rerank_topk",
    "ann_ivfpq_index_ingest",
    "ann_ivfpq_batched_rerank_topk",
    "streaming_ivf_sq8_index",
    "streaming_sq8_index",
    "streaming_ivfpq_index",
    # (c) the FINAL r10-stale cohort (11 rows) — drains for good
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
