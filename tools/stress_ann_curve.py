"""ANN operating curve at 1M vectors: recall@10 vs probe latency across
nprobe, against a PERSISTED index — build once, probe many. This is the
index-persistence-amortized large-N evidence VERDICT r6 asked for (the
per-op stress in stress_ann.py is build-inclusive and tops out at 200k).

Protocol:
  * synthesize N×dim vectors (JVM randn, planted near-neighbor structure),
    WRITE them to parquet, and build everything from the on-disk table;
  * IVF: coarse quantizer fit on a bounded sample (the documented scale
    path — the quantizer is immutable between rebuilds), full corpus
    assigned map-only, SAVED partitionBy(centroid), then RELOADED; probes
    hit only the reloaded layout (partition pruning at the file level);
  * IVF-PQ-residual: codebooks trained on the same sample, full corpus
    encoded, codes persisted partitionBy(centroid), probes over the codes;
  * recall is vs the exact numpy-kernel top-10 for Q planted+noise
    queries; latency is the median over those queries, per nprobe.

Also records k-means iterations-to-stability at the 200k×1536 stress
shape (kmeans_lloyd history) when --kmeans is passed.

    python tools/stress_ann_curve.py [n] [dim] [--kmeans]
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

def _scratch_root():
    from whatsapp_vectordb_spark.session import local_scratch_root

    return local_scratch_root()


NPROBES = [1, 2, 4, 8, 16]
N_CENTROIDS = 64
N_QUERIES = 4


def _kmeans_section(spark, corpus_path, out) -> None:
    from pyspark.sql import functions as F

    from whatsapp_vectordb_spark.operators.ann import kmeans_lloyd

    km_src = spark.read.parquet(corpus_path).where(F.col("vec_id") < 200_000)
    hist: list = []
    kmeans_lloyd(km_src, k=8, iters=10, history=hist, stop_when_stable=True)
    out["kmeans_200k_history"] = [
        {"iter": i, "total_l1_movement": mv, "sec": s} for i, mv, s in hist
    ]
    print(json.dumps({"kmeans": out["kmeans_200k_history"]}), flush=True)


def _kmeans_compare_section(spark, corpus_path, out, iters: int = 4) -> None:
    """Portable (N·d join+groupBy) vs map-side (mapInPandas partial-sum)
    Lloyd update at 200k×1536: assert the movement histories are
    bit-identical (the at-scale parity check), record per-iteration wall
    time for both — the BASELINE.md evidence that the k·d·partitions
    shuffle beats the N·d shuffle."""
    from pyspark.sql import functions as F

    from whatsapp_vectordb_spark.operators.ann import kmeans_lloyd

    km_src = spark.read.parquet(corpus_path).where(F.col("vec_id") < 200_000)
    res = {}
    for mode in ("portable", "mapside"):
        hist: list = []
        cents, _, _ = kmeans_lloyd(
            km_src, k=8, iters=iters, history=hist, update_mode=mode
        )
        res[mode] = {"cents": cents, "hist": hist}
        out[f"kmeans_200k_{mode}"] = [
            {"iter": i, "total_l1_movement": mv, "sec": s} for i, mv, s in hist
        ]
        print(json.dumps({f"kmeans_{mode}": out[f"kmeans_200k_{mode}"]}), flush=True)
    assert res["portable"]["cents"] == res["mapside"]["cents"], "parity break: centroids"
    assert [(i, m) for i, m, _ in res["portable"]["hist"]] == [
        (i, m) for i, m, _ in res["mapside"]["hist"]
    ], "parity break: movement history"
    print(json.dumps({"kmeans_parity_200k": "bit-equal"}), flush=True)


def _kmeans_mapside_full_section(spark, corpus_path, out, iters: int = 4) -> None:
    """Map-side Lloyd over the FULL synthesized corpus (no 200k cap) —
    the portable path cannot even materialize its N·d component table at
    1M×1536 (1.5B rows; its 200k checkpoint already needed a ~90 GB
    heap), so the 1M iteration-time evidence is mapside-only by
    construction."""
    from whatsapp_vectordb_spark.operators.ann import kmeans_lloyd

    km_src = spark.read.parquet(corpus_path)
    hist: list = []
    kmeans_lloyd(km_src, k=8, iters=iters, history=hist, update_mode="mapside")
    out["kmeans_full_mapside"] = [
        {"iter": i, "total_l1_movement": mv, "sec": s} for i, mv, s in hist
    ]
    print(json.dumps({"kmeans_full_mapside": out["kmeans_full_mapside"]}), flush=True)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = int(args[0]) if args else 1_000_000
    dim = int(args[1]) if len(args) > 1 else 1536
    do_kmeans = "--kmeans" in sys.argv
    do_kmeans_compare = "--kmeans-compare" in sys.argv
    do_kmeans_mapside_full = "--kmeans-mapside-full" in sys.argv
    skip_ivf = "--skip-ivf" in sys.argv
    skip_pq = "--skip-pq" in sys.argv
    # --lloyd-quantizer: fit the coarse quantizer with IvfIndex.build_portable
    # (kmeans_lloyd, whose Lloyd update now DEFAULTS to the map-side pass)
    # instead of MLlib KMeans — the r10 proof that the persisted layout and
    # recall@10 at 1M×1536 are unchanged under the mapside-built quantizer
    # (VERDICT r9 item 7). Same sample, same assign/save/reload/probe path.
    lloyd_quantizer = "--lloyd-quantizer" in sys.argv
    shortlist = int(os.environ.get("WVS_SHORTLIST", "100"))

    import numpy as np
    from pyspark.sql import functions as F

    from whatsapp_vectordb_spark.operators.ann import IvfIndex, IvfPqResidualIndex
    from whatsapp_vectordb_spark.operators.search import topk
    from whatsapp_vectordb_spark.session import get_spark

    # local mode: the driver JVM IS the executor — at 1M×1536 the default
    # 8g heap OOMs, and a dim-wide F.array(randn×dim) expression tree blows
    # whole-stage codegen's 64KB method limit. Big heap + numpy synthesis.
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")
    spark = get_spark(app_name="ann-curve-stress")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="wvs_ann_curve_", dir=_scratch_root())
    # exception-path cleanup too (an OOM-killed run once leaked a 6 GB
    # corpus in /tmp); SIGKILL still can't be caught — sweep stale
    # wvs_ann_curve_* dirs manually after a hard kill
    import atexit

    atexit.register(shutil.rmtree, root, ignore_errors=True)
    out: dict = {"metric": "ann_curve_stress", "n": n, "dim": dim}

    # --- corpus: isotropic noise + planted near-neighbors of one base
    # vector (every 1000th row), synthesized in numpy inside mapInPandas —
    # Arrow-batched, no dim-wide expression tree, no codegen limit
    base = np.random.default_rng(7).standard_normal(dim)

    def synth(batches):
        import pandas as pd

        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rng = np.random.default_rng(1_000_003 + int(ids[0]))
            m = rng.standard_normal((len(ids), dim)).astype(np.float32)
            planted = ids % 1000 == 0
            if planted.any():
                m[planted] = (
                    base[None, :]
                    + 0.25 * rng.standard_normal((int(planted.sum()), dim))
                ).astype(np.float32)
            yield pd.DataFrame({"vec_id": ids, "embedding": list(m)})

    corpus_path = os.path.join(root, "corpus")
    t0 = time.perf_counter()
    (
        spark.range(n)
        .repartition(64)
        .mapInPandas(synth, schema="vec_id long, embedding array<float>")
        .write.mode("overwrite")
        .parquet(corpus_path)
    )
    out["synth_write_s"] = round(time.perf_counter() - t0, 1)
    index = spark.read.parquet(corpus_path)

    qrows = index.where(F.col("vec_id").isin([0, 1, 2, 1000])).collect()
    queries = {int(r["vec_id"]): r["embedding"] for r in qrows}

    # --- exact ground truth (numpy kernel — the at-scale exact path)
    exact: dict[int, list[int]] = {}
    lat = []
    for qid, qv in queries.items():
        t0 = time.perf_counter()
        exact[qid] = [
            r["vec_id"] for r in topk(index, qv, k=10, round_to=6, impl="numpy").collect()
        ]
        lat.append(time.perf_counter() - t0)
    out["exact_topk_median_s"] = round(statistics.median(lat), 3)
    print(json.dumps({"partial": {k: out[k] for k in ("synth_write_s", "exact_topk_median_s")}}), flush=True)

    # --- IVF: sample-fit quantizer, map-only full assignment, persist,
    # reload, probe (build once, probe many)
    sample = index.sample(fraction=min(1.0, 50_000 / n), seed=1)
    if skip_ivf:
        out["ivf_curve"] = "skipped"
    t0 = time.perf_counter()
    if skip_ivf:
        proto = None
    elif lloyd_quantizer:
        out["quantizer"] = "kmeans_lloyd/mapside-default"
        proto = IvfIndex.build_portable(sample, n_centroids=N_CENTROIDS, iters=5)
    else:
        proto = IvfIndex.build(sample, n_centroids=N_CENTROIDS, max_iter=5)
    if not skip_ivf:
        out["ivf_quantizer_fit_s"] = round(time.perf_counter() - t0, 1)
        t0 = time.perf_counter()
        full = IvfIndex(proto.assign(index), proto.centroids, "vec_id", "embedding")
        ivf_path = os.path.join(root, "ivf")
        full.save(ivf_path)
        out["ivf_assign_save_s"] = round(time.perf_counter() - t0, 1)
        ivf = IvfIndex.load(spark, ivf_path)
        print(json.dumps({"partial": {k: out[k] for k in ("ivf_quantizer_fit_s", "ivf_assign_save_s")}}), flush=True)

        curve = []
        for nprobe in NPROBES:
            # warm pass first: at nprobe=2..4 the probed cell directories
            # are cold OS file cache on the first read, which inverted the
            # r7 first-recording (nprobe=2 slower than nprobe=16); timing
            # the second pass measures plan cost, not cache state
            for qv in queries.values():
                ivf.probe(qv, k=10, nprobe=nprobe, impl="numpy").collect()
            lats, recalls = [], []
            for qid, qv in queries.items():
                t0 = time.perf_counter()
                hits = [
                    r["vec_id"]
                    for r in ivf.probe(qv, k=10, nprobe=nprobe, impl="numpy").collect()
                ]
                lats.append(time.perf_counter() - t0)
                recalls.append(len(set(hits) & set(exact[qid])) / 10)
            curve.append(
                {
                    "nprobe": nprobe,
                    "probe_median_s": round(statistics.median(lats), 3),
                    "recall_at_10": round(sum(recalls) / len(recalls), 3),
                    # per-query split: planted queries (0, 1000) have real
                    # cluster structure to exploit; noise queries (1, 2)
                    # have none — a balanced layout CANNOT co-locate their
                    # top-10 (isotropic high-dim neighbors are directionless),
                    # so their recall measures honesty of pruning, not
                    # index quality. A degenerate layout (one mega-cell)
                    # fakes 1.0 here by scanning everything.
                    "recall_per_query": {
                        str(qid): round(r, 2)
                        for qid, r in zip(queries.keys(), recalls)
                    },
                }
            )
            print(json.dumps({"ivf": curve[-1]}), flush=True)
        out["ivf_curve"] = curve
        # cell-balance fingerprint of the layout the curve probed — the
        # r11 diagnosis dimension: MLlib KMeans at 1M×1536 isotropic
        # collapses to one ~100% cell (probe == hidden full scan) while
        # the Lloyd/mapside quantizer yields ~1/64 shares (real pruning)
        out["ivf_cell_balance"] = ivf.cell_stats()
        print(json.dumps({"ivf_cell_balance": out["ivf_cell_balance"]}), flush=True)

    if skip_pq:
        out["ivfpq_curve"] = "skipped"
        if do_kmeans:
            _kmeans_section(spark, corpus_path, out)
        if do_kmeans_compare:
            _kmeans_compare_section(spark, corpus_path, out)
        if do_kmeans_mapside_full:
            _kmeans_mapside_full_section(spark, corpus_path, out)
        print(json.dumps(out), flush=True)
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()
        return

    # --- IVF-PQ-residual: codebooks from the sample, encode full corpus,
    # persist codes partitioned by cell, probe the integer-ADC scan
    t0 = time.perf_counter()
    # m=16 / ksub=256 (16-byte codes) — the realistic byte budget for
    # dim ≥ 1000 (FAISS-style 8-bit codebooks); ksub=16 is the gate-scale
    # oracle shape, far too coarse to rank 1536-d noise
    ivfpq = IvfPqResidualIndex.build(
        sample, n_centroids=N_CENTROIDS, m=int(os.environ.get("WVS_PQ_M", "16")), ksub=256, sample_rows=8192, seed=0
    )
    out["ivfpq_train_s"] = round(time.perf_counter() - t0, 1)
    t0 = time.perf_counter()
    codes_path = os.path.join(root, "ivfpq_codes")
    ivfpq.encode(index).write.partitionBy("centroid").mode("overwrite").parquet(codes_path)
    out["ivfpq_encode_save_s"] = round(time.perf_counter() - t0, 1)
    codes = spark.read.parquet(codes_path)
    print(json.dumps({"partial": {k: out[k] for k in ("ivfpq_train_s", "ivfpq_encode_save_s")}}), flush=True)

    # raw ADC recall@10 is the SHORTLIST tier; the production pattern is
    # filter-then-rerank: ADC shortlist of 100, exact cosine over those
    # 100 vectors (IN-filter pushed to the parquet scan), top-10
    curve = []
    for nprobe in NPROBES:
        lats, recalls, rr_lats, rr_recalls = [], [], [], []
        for qid, qv in queries.items():
            t0 = time.perf_counter()
            short = [
                r["vec_id"]
                for r in ivfpq.probe(codes, qv, k=shortlist, nprobe=nprobe).collect()
            ]
            t_short = time.perf_counter() - t0
            lats.append(t_short)
            recalls.append(len(set(short[:10]) & set(exact[qid])) / 10)
            t0 = time.perf_counter()
            rr = [
                r["vec_id"]
                for r in topk(
                    index.where(F.col("vec_id").isin(short)),
                    qv, k=10, round_to=6, impl="numpy",
                ).collect()
            ]
            rr_lats.append(t_short + (time.perf_counter() - t0))
            rr_recalls.append(len(set(rr) & set(exact[qid])) / 10)
        curve.append(
            {
                "nprobe": nprobe,
                "shortlist": shortlist,
                "probe_median_s": round(statistics.median(lats), 3),
                "recall_at_10": round(sum(recalls) / len(recalls), 3),
                "rerank_median_s": round(statistics.median(rr_lats), 3),
                "rerank_recall_at_10": round(sum(rr_recalls) / len(rr_recalls), 3),
            }
        )
        print(json.dumps({"ivfpq": curve[-1]}), flush=True)
    out["ivfpq_curve"] = curve

    # --- k-means iterations-to-stability at the 200k stress shape
    if do_kmeans:
        _kmeans_section(spark, corpus_path, out)
    if do_kmeans_compare:
        _kmeans_compare_section(spark, corpus_path, out)
    if do_kmeans_mapside_full:
        _kmeans_mapside_full_section(spark, corpus_path, out)

    print(json.dumps(out), flush=True)
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
