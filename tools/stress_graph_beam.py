"""Graph-ANN beam-search stress: per-hop cost vs corpus size.

The scale claim (operators/ann.py graph_beam_topk): every hop is a
broadcast-frontier equi-join against the edge list plus a broadcast-
candidate score join, so traversal cost is independent of corpus size N
— the property that distinguishes graph ANN from scan-family ANN. This
harness measures it directly: same beam geometry over synthetic corpora
of two sizes, report the traversal-only wall clock for each (the edge
list is persisted and cached untimed, like a real serving deployment).

Not part of the oracle gate (vectors are JVM-randn, not engine-
portable); this is the scale-evidence harness for BASELINE.md:

    python tools/stress_graph_beam.py [n_small] [n_large] [dim]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _corpus(spark, n: int, dim: int):
    from pyspark.sql import functions as F

    vec = F.array(*[F.randn(seed=100 + j) for j in range(dim)])
    return (
        spark.range(n)
        .repartition(32)
        .select(
            F.col("id").alias("vec_id"),
            vec.cast("array<float>").alias("embedding"),
        )
    )


def _edges(spark, n: int, degree: int):
    """Deterministic synthetic adjacency (xxhash64-derived targets):
    degree out-edges per node. The traversal never inspects edge
    QUALITY — hop cost depends only on |edges| touched per frontier —
    so random targets measure exactly what a learned graph would."""
    from pyspark.sql import functions as F

    return (
        spark.range(n)
        .repartition(32)
        .select(
            F.col("id").alias("src"),
            F.explode(
                F.array(*[F.lit(j) for j in range(degree)])
            ).alias("_j"),
        )
        .select(
            "src",
            (
                F.abs(F.xxhash64(F.col("src"), F.col("_j"))) % n
            ).alias("nbr"),
        )
        .where(F.col("nbr") != F.col("src"))
    )


def main() -> None:
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_large = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    dim = int(sys.argv[3]) if len(sys.argv) > 3 else 64

    from whatsapp_vectordb_spark.operators.ann import graph_beam_topk
    from whatsapp_vectordb_spark.session import get_spark

    spark = get_spark(app_name="graph-beam-stress")
    spark.sparkContext.setLogLevel("ERROR")

    import numpy as np

    import shutil
    import tempfile

    from whatsapp_vectordb_spark.operators.ann import save_knn_graph
    from whatsapp_vectordb_spark.session import local_scratch_root

    qvec = [float(x) for x in np.random.default_rng(3).standard_normal(dim)]
    out: dict = {"dim": dim, "beam_width": 16, "iters": 4}
    scratch = tempfile.mkdtemp(prefix="wvs_beam_", dir=local_scratch_root())
    try:
        for label, n in (("small", n_small), ("large", n_large)):
            emb = _corpus(spark, n, dim).cache()
            raw = _edges(spark, n, degree=8).cache()
            emb.count(), raw.count()  # materialize untimed
            bucketed = save_knn_graph(
                raw, os.path.join(scratch, f"edges_{label}"), n_buckets=64
            )
            for variant, edges, kw in (
                ("raw", raw, {}),
                (
                    "bucketed",
                    bucketed,
                    {"bucket_col": "src_bucket", "n_buckets": 64},
                ),
            ):
                # warm once (broadcast machinery, codegen), then 3 reps
                graph_beam_topk(
                    emb, edges, qvec, k=10, beam_width=16, iters=4, **kw
                ).count()
                reps = []
                for _ in range(3):
                    t0 = time.time()
                    rows = graph_beam_topk(
                        emb, edges, qvec, k=10, beam_width=16, iters=4, **kw
                    ).collect()
                    reps.append(round(time.time() - t0, 2))
                out[f"{label}_{variant}"] = {
                    "n": n,
                    "traversal_s": reps,
                    "top1": rows[0]["vec_id"],
                }
            # the two variants must traverse identically
            assert (
                out[f"{label}_raw"]["top1"] == out[f"{label}_bucketed"]["top1"]
            )
            emb.unpersist(), raw.unpersist()
        for variant in ("raw", "bucketed"):
            out[f"large_over_small_{variant}"] = round(
                min(out[f"large_{variant}"]["traversal_s"])
                / max(min(out[f"small_{variant}"]["traversal_s"]), 1e-6),
                2,
            )
        print(json.dumps(out))
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
