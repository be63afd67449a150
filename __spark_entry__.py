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


# RULE (VERDICT r9 #2): any query whose oracle SQL or implementation
# changed since its latest driver row goes here THE SAME ROUND the change
# lands — a green driver row that predates the change verifies nothing.
# Clear entries once their fresh row lands.
#
# r12: the r11 registrations all landed green rows — cleared. This
# round's entries, grouped by reason (see inline comments): (a) the LAST
# two r7-stale rows (VERDICT r11 #3) plus the five r12 registrations;
# (b) queries whose implementation changed (durable-pairs ordering,
# winnow cache release, single-file index commit, SQ8 batch guard);
# (c) queries whose ORACLE changed (BPE CTEs materialized + degeneracy
# sentinel); (d) queries whose build path changed (build_balanced).
# All 23+ were re-verified locally this round (gate 206/206, sweep
# 206/206); the frontload buys them fresh DRIVER rows too.
_FRONTLOAD: list[str] = [
    # (a) the LAST two r7-stale rows + this round's new registrations
    "streaming_ivf_maintenance",
    "streaming_pipeline_capstone",
    "ann_sq8_cosine_topk",
    "text_bpe_learn_full",
    "text_bpe_encode_arrow",
    "ann_ivf_sq8_topk",
    "streaming_sq8_index",
    "ann_sq8_rerank_topk",
    # (b) implementation changed this round: add_batch durable-pairs
    # ordering (both incremental indexes' streaming twins), winnow cache
    # release + single-file index commit, SQ8 zero-row batch guard
    "streaming_winnow_index",
    "streaming_dedup_index",
    "dedup_winnow_pairs",
    "dedup_winnow_spans",
    "dedup_winnow_cut",
    "dedup_incremental_winnow_index",
    "dedup_incremental_index",
    "ann_sq8_topk",
    "ann_sq8_euclidean_topk",
    # (c) oracle changed this round: BPE CTEs materialized + the
    # degenerate-corpus sentinel guard
    "text_bpe_learn",
    "text_bpe_fertility",
    # (d) build path changed this round: registry IVF builds route
    # through build_balanced
    "ann_ivf_topk",
    "ann_ivf_nprobe_sweep",
    "ann_ivf_batched",
    "ann_ivfpq_topk",
    "sample_diverse_embeddings",
    "pipeline_curate_corpus",
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
