"""Dump .explain('formatted') for the round-17 optimization targets.

    python tools/dump_r18_plans.py <suffix> [name ...]

Writes plans/r18/<name>_<suffix>.txt for each query (default: the round's
touched set). Runs each query's builder (side effects included) at
$SPARK_GRAFT_SF_DIR (default sf0.1 — the bench scale the optimization
claims are made at), then captures the RETURNED DataFrame's formatted
plan. Composites' pre-plan phases (builds, commits) run for real so the
final plan reads the same artifacts the bench reads.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

if "SPARK_GRAFT_ORACLE_SCRATCH" not in os.environ:
    import atexit
    import shutil
    import tempfile

    from whatsapp_vectordb_spark.session import local_scratch_root

    _scratch = tempfile.mkdtemp(prefix="wvs-plans-", dir=local_scratch_root())
    os.environ["SPARK_GRAFT_ORACLE_SCRATCH"] = _scratch
    atexit.register(shutil.rmtree, _scratch, ignore_errors=True)

DEFAULT = [
    "dedup_minhash_index_time_travel",
    "dedup_winnow_index_time_travel",
    "dedup_incremental_index",
    "dedup_incremental_winnow_index",
    "dedup_index_compact",
    "dedup_semdedup_index",
    "ann_ivf_sq8_topk",
    "ann_ivf_sq8_rerank_topk",
    "ann_ivf_sq8_batched_topk",
    "ann_ivf_sq8_batched_rerank_topk",
    "ann_ivf_sq8_filtered_topk",
    "ann_ivf_sq8_index_ingest",
    "ann_ivf_sq8_index_mutate",
    "ann_ivf_sq8_time_travel",
    "ann_ivf_sq8_maintenance_tick",
    "ann_ivf_sq8_snapshot_retention",
    "streaming_ivf_sq8_cdc",
    "streaming_ivfpq_cdc",
    "ann_graph_beam_topk",
    "knn_topk_1536_expr",
    "ann_pq1536_adc_topk",
]


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F

    from whatsapp_vectordb_spark.harness import QUERIES, _t
    from whatsapp_vectordb_spark.session import get_spark

    out_dir = os.path.join(REPO, "plans", "r18")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="wvs-r18-plans")
    spark.sparkContext.setLogLevel("ERROR")

    # The two 1536-dim entries are bench-only (VERDICT r17 item 1) —
    # build their frames exactly as bench.py does.
    def _emb1536():
        emb = _t(spark, sf_dir, "embeddings")
        e = emb.select(
            "vec_id",
            F.flatten(F.array_repeat(F.col("embedding"), 24)).alias("embedding"),
        )
        q = e.where(F.col("vec_id") == 0).head()["embedding"]
        return e, q

    def _knn_topk_1536_expr(spark, sf_dir):
        from whatsapp_vectordb_spark.operators.search import topk

        e, q = _emb1536()
        return topk(e, q, k=10)

    def _ann_pq1536_adc_topk(spark, sf_dir):
        from whatsapp_vectordb_spark.operators.ann import PqIndex

        e, q = _emb1536()
        pq = PqIndex.build(e, m=16, ksub=16, sample_rows=1000, seed=0)
        return pq.adc_topk(pq.encode(e), q, k=10)

    BENCH_ONLY = {
        "knn_topk_1536_expr": _knn_topk_1536_expr,
        "ann_pq1536_adc_topk": _ann_pq1536_adc_topk,
    }
    for name in names:
        t0 = time.time()
        try:
            df = BENCH_ONLY.get(name, QUERIES.get(name))(spark, sf_dir)
            em = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
            plan = df._jdf.queryExecution().explainString(em)
        except Exception as e:  # keep going; record the failure
            plan = f"ERROR building plan: {e!r}"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(f"-- {name} ({suffix}) sf_dir={sf_dir}\n")
            f.write(plan.rstrip() + "\n")
        print(f"{name}: {time.time() - t0:.1f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
