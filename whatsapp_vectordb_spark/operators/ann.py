"""Approximate nearest-neighbor search — the 100 TB scale path.

Exact brute force (operators/search.py) is a full scan per query batch;
fine up to ~10^8 vectors × small query counts, wrong at 100 TB. Two
ANN strategies, both pure DataFrame-to-DataFrame (no custom Catalyst):

- **Random-hyperplane LSH** (``cosine_lsh_*``): sign-bit signatures under
  ``n_planes`` fixed random hyperplanes → vectors bucketed by signature
  band; a query probes only matching buckets. Collision probability for
  angle θ is (1 - θ/π)^bits — band/rows tuning identical to MinHash.
  Implemented with HOF expressions (JVM-side); the plane matrix is a
  broadcast literal.
- **IVF (inverted-file) partitioning** (``IvfIndex``): k-means coarse
  centroids (MLlib); each vector is assigned to its nearest centroid and
  the table is *written partitioned by centroid id*. A query scores the
  ``nprobe`` nearest centroids and scans only those partitions —
  partition pruning does the work of an index.

Recall is tested against exact top-k in tests/test_ann.py.
"""

from __future__ import annotations

import math
import os

import numpy as np
from pyspark.sql import DataFrame

from whatsapp_vectordb_spark.session import local_df
from pyspark.sql import functions as F

from whatsapp_vectordb_spark.functions.vector import cosine_similarity
from whatsapp_vectordb_spark.operators.search import topk


def _cluster_for_write(df: DataFrame, col: str = "centroid") -> DataFrame:
    """Cluster rows by the partition column before a ``partitionBy(col)``
    parquet write. Without it every input task writes one file per value
    it happens to hold — tasks × cells files (256 ~3 KB files per layout
    table at the bench scale; measured r17: the 256-file commit made the
    same write 4× slower and every later pruned scan ~2× slower). AQE's
    REBALANCE both coalesces small cells into shared write tasks and
    splits oversized cells at ``advisoryPartitionSizeInBytes``, so files
    come out near target size at ANY corpus scale — the Iceberg
    ``write.distribution-mode=hash`` layout, per the optimization
    guide's small-files rule. Row contents are untouched."""
    return df.hint("rebalance", col)


def _run_writes(thunks) -> None:
    """Run independent write actions concurrently (guide §2.6: Spark's
    scheduler happily runs several jobs at once; actions are only
    sequential because driver code calls them sequentially). The staged
    layout tables of one commit — codes, co-located floats, tombstones —
    are independent jobs over the same pinned input, so submitting them
    from a small thread pool lets each job's task tail back-fill the
    others' idle cores instead of serializing three commit latencies."""
    if len(thunks) == 1:
        thunks[0]()
        return
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=len(thunks)) as pool:
        futures = [pool.submit(t) for t in thunks]
        for f in futures:
            f.result()


def _random_planes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def _resolve_dim(index_df: DataFrame, vec_col: str, dim: int | None) -> int:
    """Vector dimension, preferably caller-provided (from the index
    registry, ``types.INDEX_REGISTRY_SCHEMA.dimension``). The ``head()``
    fallback is a driver-side scan-first-row job BEFORE the real query —
    acceptable interactively, wrong in a hot path on a big index."""
    if dim is not None:
        return dim
    row = index_df.select(vec_col).where(F.col(vec_col).isNotNull()).head()
    if row is None:
        raise ValueError(
            f"cannot infer vector dimension: no non-null '{vec_col}' rows in "
            "the index; pass dim= explicitly (it lives in the index registry)"
        )
    return len(row[0])


def _stored_query_vec(index_df: DataFrame, id_col: str, vec_col: str, query_id):
    """Fetch a stored query vector by id — a point-lookup job — with a
    clear error instead of `NoneType is not subscriptable` when absent."""
    row = index_df.where(F.col(id_col) == query_id).select(vec_col).head()
    if row is None or row[0] is None:
        raise ValueError(
            f"query_id {query_id!r} not found in index (or its '{vec_col}' is null)"
        )
    return row[0]


def _signature_col(vec_col, planes: np.ndarray):
    """Bit-signature as a string of sign bits — computed with zip_with/
    aggregate HOFs per plane, whole-stage codegen'd."""
    bits = []
    for row in planes:
        plane = F.array(*[F.lit(float(x)) for x in row])
        dot = F.aggregate(
            F.zip_with(vec_col, plane, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(dot >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def cosine_lsh_bucketize(
    df: DataFrame,
    vec_col: str = "embedding",
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Attach ``band``/``bucket`` columns: the signature is split into
    ``bands`` chunks; each (band, chunk) pair is a bucket key. Output has
    one row per input row per band (multi-probe)."""
    dim = _resolve_dim(df, vec_col, dim)
    planes = _random_planes(dim, n_planes, seed)
    sig = _signature_col(F.col(vec_col), planes).alias("_sig")
    with_sig = df.withColumn("_sig", sig)
    rows_per_band = n_planes // bands
    out = None
    for b in range(bands):
        part = with_sig.select(
            "*",
            F.lit(b).alias("band"),
            F.substring("_sig", b * rows_per_band + 1, rows_per_band).alias("bucket"),
        )
        out = part if out is None else out.unionByName(part)
    return out.drop("_sig")


def cosine_lsh_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str = "id_a",
    right_id: str = "id_b",
    vec_col: str = "embedding",
    threshold: float = 0.8,
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 42,
    round_to: int = 6,
    dim: int | None = None,
) -> DataFrame:
    """Approximate similarity join: candidate pairs share an LSH bucket in
    ≥1 band, then exact cosine verification ≥ threshold. The join is on
    (band, bucket) — shuffle proportional to collisions, never |L|×|R|."""
    dim = _resolve_dim(left, vec_col, dim)
    lb = cosine_lsh_bucketize(left, vec_col, n_planes, bands, seed, dim=dim).select(
        F.col(left_id), F.col(vec_col).alias("_va"), "band", "bucket"
    )
    rb = cosine_lsh_bucketize(right, vec_col, n_planes, bands, seed, dim=dim).select(
        F.col(right_id), F.col(vec_col).alias("_vb"), "band", "bucket"
    )
    cand = (
        lb.join(rb, ["band", "bucket"])
        .where(F.col(left_id) < F.col(right_id))
        .select(left_id, right_id, "_va", "_vb")
        .dropDuplicates([left_id, right_id])
    )
    return cand.select(
        left_id,
        right_id,
        F.round(cosine_similarity("_va", "_vb"), round_to).alias("cos_sim"),
    ).where(F.col("cos_sim") >= threshold)


# ---------------------------------------------------------------------------
# Portable LSH: same sign-random-projection idea as cosine_lsh_*, but every
# arithmetic step is exact-integer so a SQL oracle reproduces buckets
# bit-for-bit: components quantized to round(x·10^6) BIGINT, hyperplanes are
# ±1 vectors derived from md5 nibbles. Integer sums are order-independent, so
# Spark's fold and DuckDB's vectorized sum agree exactly — no float-sign
# flakiness at the bucket boundary.
# ---------------------------------------------------------------------------

PORTABLE_QUANT = 1_000_000


def portable_planes(dim: int, n_planes: int, seed: int = 0) -> list[list[int]]:
    """±1 hyperplanes from md5: component (p, i) is +1 iff the low bit of
    the first hex nibble of md5('<seed>:<p>:<i>') is set. SQL twin:
    ``('0x' || substr(md5(seed||':'||p||':'||i), 1, 1))::BIGINT & 1``."""
    import hashlib

    return [
        [
            1 if (int(hashlib.md5(f"{seed}:{p}:{i}".encode()).hexdigest()[0], 16) & 1) else -1
            for i in range(dim)
        ]
        for p in range(n_planes)
    ]


def portable_signature(vec_col, planes: list[list[int]]):
    """Bit-string signature over quantized integer dot products (exact)."""
    vec_col = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    q = F.transform(
        vec_col, lambda x: F.round(x.cast("double") * PORTABLE_QUANT).cast("long")
    )
    bits = []
    for row in planes:
        plane = F.array(*[F.lit(int(s)) for s in row])
        dot = F.aggregate(
            F.zip_with(q, plane, lambda a, b: a * b),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(dot >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def portable_signature_numpy(df: DataFrame, planes, id_col: str, vec_col: str) -> DataFrame:
    """The same integer-exact signature as ``portable_signature``, computed
    as one Arrow-batched int64 matmul per partition instead of ``n_planes``
    interpreted HOF folds per row. Bit-for-bit identical buckets (quantize →
    integer dot → sign); use at scale, keep the expression form for the SQL
    oracle's sake at verification scale."""
    import pandas as pd
    from pyspark.sql.types import StringType, StructField, StructType

    pl = np.asarray(planes, dtype=np.int64)  # (P, dim)
    # (id, _sig) ONLY: every consumer bands the signature and re-acquires
    # vectors by id afterwards, so carrying the vector through the Python
    # hop would ship the whole index through Arrow twice for nothing
    # (2.4 GB each way at 200k × dim 1536)
    out_schema = StructType(
        [df.schema[id_col], StructField("_sig", StringType())]
    )

    def sign_bits(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            v = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            q = np.round(v * PORTABLE_QUANT).astype(np.int64)  # (n, dim)
            bits = (q @ pl.T) >= 0  # (n, P)
            sigs = ["".join("1" if b else "0" for b in row) for row in bits]
            yield pd.DataFrame({id_col: pdf[id_col], "_sig": sigs})

    return df.select(id_col, vec_col).mapInPandas(sign_bits, schema=out_schema)


def _query_signature(query_vec, planes) -> str:
    """One vector's portable signature, driver-side — identical math to
    ``portable_signature_numpy`` (quantize → int64 dot → sign)."""
    pl = np.asarray(planes, dtype=np.int64)
    q = np.round(np.asarray(query_vec, dtype=np.float64) * PORTABLE_QUANT).astype(np.int64)
    return "".join("1" if b else "0" for b in (pl @ q) >= 0)


def portable_lsh_topk(
    index_df: DataFrame,
    query_id,
    k: int = 10,
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int | None = 6,
    impl: str = "expr",
    dim: int | None = None,
) -> DataFrame:
    """ANN top-k for a stored query vector (`query_id` row): candidates are
    vectors sharing ≥1 LSH band bucket with the query, then exact cosine
    top-k over candidates only.

    Plan shape: one signature map over the index, a broadcast join against
    the query's ``bands`` bucket keys, then the TakeOrderedAndProject top-k
    — the full-scan cosine of ``topk`` is replaced by a bucket-pruned scan;
    recall and candidate volume are governed by (planes, bands): each band
    chunk has ``n_planes/bands`` bits, so a random non-neighbor collides
    w.p. ≈ bands · 2^-(n_planes/bands) — size chunks ≥ 8 bits at scale.

    ``impl='expr'`` builds signatures with integer HOF expressions (exactly
    reproducible in the SQL oracle); ``impl='numpy'`` computes the SAME
    bits via an Arrow-batched int64 matmul (~n_planes× fewer per-row ops —
    the form to run on a big index).
    """
    rows_per_band = n_planes // bands
    dim = _resolve_dim(index_df, vec_col, dim)
    planes = portable_planes(dim, n_planes, seed)
    if impl == "numpy":
        sig = portable_signature_numpy(index_df, planes, id_col, vec_col)
    else:
        sig = index_df.select(
            F.col(id_col), portable_signature(vec_col, planes).alias("_sig")
        )
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.substring("_sig", b * rows_per_band + 1, rows_per_band).alias("chunk"),
        )
        for b in range(bands)
    ]
    # band only (id, band, chunk) — never drag the wide vector through the
    # explode + join; candidates re-acquire vectors by id afterwards
    banded = sig.select(id_col, F.explode(F.array(*band_structs)).alias("bk")).select(
        id_col, F.col("bk.band").alias("band"), F.col("bk.chunk").alias("chunk")
    )
    qvec = _stored_query_vec(index_df, id_col, vec_col, query_id)
    if impl == "numpy":
        # the query's band keys DRIVER-SIDE (same quantize → int64 dot →
        # sign rule as the distributed numpy scan, so buckets agree
        # bit-for-bit): a point lookup + a (P,) matvec replaces a second
        # full signature scan of the index just to read one row
        qsig = _query_signature(qvec, planes)
        qb_local = index_df.sparkSession.createDataFrame(
            [(b, qsig[b * rows_per_band : (b + 1) * rows_per_band]) for b in range(bands)],
            "band int, chunk string",
        )
        qb = qb_local.select(F.col("band"), F.col("chunk"))
    else:
        qb = banded.where(F.col(id_col) == query_id).select("band", "chunk")
    cand_ids = (
        banded.join(F.broadcast(qb), ["band", "chunk"])
        .select(id_col)
        .dropDuplicates([id_col])
    )
    cand = index_df.join(cand_ids, id_col).select(id_col, vec_col)
    return topk(cand, qvec, k=k, id_col=id_col, vec_col=vec_col, round_to=round_to)


def portable_lsh_topk_multiprobe(
    index_df: DataFrame,
    query_id,
    k: int = 10,
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int | None = 6,
    impl: str = "expr",
    dim: int | None = None,
) -> DataFrame:
    """Multi-probe ANN top-k: in each band, probe the query's own bucket
    AND every bucket at Hamming distance 1 (each single-bit flip of the
    chunk). Near-neighbors that straddle one hyperplane land one bit away,
    so probing 1+rows_per_band buckets per band recovers most of the recall
    of doubling the table count — without a second signature pass or any
    extra index state (Lv et al., VLDB'07, applied to sign-LSH).

    Scale shape is unchanged from ``portable_lsh_topk``: one signature map
    over the index, probe keys built on the tiny query side (bands ×
    (1+rows_per_band) rows) and broadcast; candidate volume grows ~5× for
    4-bit chunks but the index is still scanned once and never |probes|×N.
    """
    rows_per_band = n_planes // bands
    dim = _resolve_dim(index_df, vec_col, dim)
    planes = portable_planes(dim, n_planes, seed)
    if impl == "numpy":
        sig = portable_signature_numpy(index_df, planes, id_col, vec_col)
    else:
        sig = index_df.select(
            F.col(id_col), portable_signature(vec_col, planes).alias("_sig")
        )
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.substring("_sig", b * rows_per_band + 1, rows_per_band).alias("chunk"),
        )
        for b in range(bands)
    ]
    banded = sig.select(id_col, F.explode(F.array(*band_structs)).alias("bk")).select(
        id_col, F.col("bk.band").alias("band"), F.col("bk.chunk").alias("chunk")
    )
    # probe keys: the query's chunk plus each 1-bit flip of it, per band
    qchunks = banded.where(F.col(id_col) == query_id).select(
        "band", F.col("chunk").alias("_chunk_src")
    )
    variants = [F.col("_chunk_src")] + [
        F.concat(
            F.substring("_chunk_src", 1, j),
            F.when(F.substring("_chunk_src", j + 1, 1) == "1", F.lit("0")).otherwise(
                F.lit("1")
            ),
            F.substring("_chunk_src", j + 2, rows_per_band),
        )
        for j in range(rows_per_band)
    ]
    qb = (
        qchunks.select("band", F.explode(F.array(*variants)).alias("chunk"))
        .dropDuplicates(["band", "chunk"])
    )
    cand_ids = (
        banded.join(F.broadcast(qb), ["band", "chunk"])
        .select(id_col)
        .dropDuplicates([id_col])
    )
    cand = index_df.join(cand_ids, id_col).select(id_col, vec_col)
    qvec = _stored_query_vec(index_df, id_col, vec_col, query_id)
    return topk(cand, qvec, k=k, id_col=id_col, vec_col=vec_col, round_to=round_to)


def portable_lsh_join(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 0,
    round_to: int = 6,
    impl: str = "expr",
    dim: int | None = None,
) -> DataFrame:
    """Scale-safe embedding near-duplicate SELF-join: candidate pairs
    share ≥1 portable-LSH band bucket, then exact cosine verify ≥
    ``threshold``. This is the 100 TB shape for what
    ``dedup.embedding_near_duplicates`` computes all-pairs: the join is on
    (band, chunk) keys — shuffle proportional to bucket collisions, never
    O(n²) — and vectors never ride through the band explode; survivors
    re-acquire them by id for verification.

    Integer-exact signatures (quantize → ±1 md5 planes → sign) make the
    candidate set bit-reproducible in a SQL oracle. Recall follows the
    band S-curve: a true cos≈τ pair lands together w.p.
    1-(1-p^r)^b with p = 1 - θ/π; exact duplicates always collide.

    Sizing: the defaults (16 planes / 4 bands = 4-bit chunks, 16 buckets
    per band) are gate-scale; at n ≥ ~2k random collisions flood the band
    join (~n²/16 pairs per band). Grow chunk width with n — 32 planes /
    4 bands (8-bit chunks) measured 2.5× faster end-to-end at 2k+ rows
    (BASELINE.md), and at larger n keep ~n per band bucket ≪ collision
    budget by raising n_planes. Oracle-pinned queries pass these
    explicitly, so the defaults stay stable.
    """
    rows_per_band = n_planes // bands
    dim = _resolve_dim(df, vec_col, dim)
    planes = portable_planes(dim, n_planes, seed)
    if impl == "numpy":
        sig = portable_signature_numpy(df, planes, id_col, vec_col)
    else:
        sig = df.select(
            F.col(id_col), portable_signature(vec_col, planes).alias("_sig")
        )
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.substring("_sig", b * rows_per_band + 1, rows_per_band).alias("chunk"),
        )
        for b in range(bands)
    ]
    banded = sig.select(id_col, F.explode(F.array(*band_structs)).alias("bk")).select(
        id_col, F.col("bk.band").alias("band"), F.col("bk.chunk").alias("chunk")
    )
    # cache the tiny banded frame (ids × bands): the self-join otherwise
    # evaluates the whole signature pass once PER SIDE — the broadcast
    # build job materializes the cache, the probe side reuses it (r18;
    # same discipline as minhash_near_duplicates' banded cache)
    banded = banded.cache()
    a, b_ = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b_,
            on=[
                F.col("a.band") == F.col("b.band"),
                F.col("a.chunk") == F.col("b.chunk"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
            ],
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    va = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    vb = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(cosine_similarity("_va", "_vb"), round_to).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )


def assign_nearest_centroid(df: DataFrame, centroids, vec_col: str) -> DataFrame:
    """Map-only nearest-centroid (Euclidean) assignment against a FROZEN
    centroid matrix — one Arrow-batched argmin per partition, no re-fit,
    no shuffle. Shared by ``IvfIndex.assign`` and ``IvfSq8Index``: the
    coarse quantizer is immutable between rebuilds, so ingesting new
    vectors is a pure map."""
    from pyspark.sql.types import IntegerType, StructField, StructType

    cent = np.asarray(centroids, dtype=np.float64)  # (C, dim)
    cent_sq = (cent * cent).sum(axis=1)  # |c|^2, reused per batch
    # NB: StructType.add mutates in place — never call it on df.schema
    out_schema = StructType(
        list(df.schema.fields) + [StructField("centroid", IntegerType(), False)]
    )

    def nearest(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            v = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            # argmin ||v-c||^2 = argmin (|c|^2 - 2 v.c); |v|^2 constant per row
            d = cent_sq[None, :] - 2.0 * (v @ cent.T)
            out = pdf.copy()
            out["centroid"] = d.argmin(axis=1).astype("int32")
            yield out

    return df.mapInPandas(nearest, schema=out_schema)


class IvfIndex:
    """Inverted-file index: coarse k-means quantizer + centroid-partitioned
    vectors. Build once, probe per query.

    On a cluster the assigned table would be ``write.partitionBy("centroid")``
    parquet so probing prunes file partitions; in-memory here, the same
    pruning happens via the partition filter.
    """

    def __init__(self, assigned: DataFrame, centroids: np.ndarray, id_col: str, vec_col: str):
        self.assigned = assigned
        self.centroids = centroids
        self.id_col = id_col
        self.vec_col = vec_col

    def cell_stats(self) -> dict:
        """Layout-balance fingerprint: {n_cells, nonempty, total, max_share,
        top5_shares}. One groupBy-count (k rows to the driver).

        Why it exists (round 11): MLlib KMeans at 1M×1536 isotropic noise
        CONVERGES to one ~100%-occupancy mega-cell (its k-means|| seeds
        collapse toward the data mean in high dimension) — every probe of
        such a layout silently degrades to a full scan, which *looks* like
        recall 1.0 at any nprobe while pruning nothing. The deterministic
        Lloyd builder (``build_portable``) yields ~1/k shares on the same
        data. Check ``max_share`` after building: a value near 1.0 means
        the index is a scan in disguise — rebuild with ``build_portable``
        or raise the sample/iteration budget."""
        counts = [
            r["c"]
            for r in self.assigned.groupBy("centroid")
            .agg(F.count("*").alias("c"))
            .collect()
        ]
        counts.sort(reverse=True)
        total = sum(counts)
        return {
            "n_cells": int(self.centroids.shape[0]),
            "nonempty": len(counts),
            "total": total,
            "max_share": round(counts[0] / total, 4) if total else 0.0,
            "top5_shares": [round(c / total, 4) for c in counts[:5]],
        }

    @classmethod
    def build(
        cls,
        df: DataFrame,
        n_centroids: int = 16,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        seed: int = 42,
        max_iter: int = 10,
    ) -> "IvfIndex":
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector, vector_to_array

        feat = df.withColumn("_features", array_to_vector(F.col(vec_col).cast("array<double>")))
        km = KMeans(k=n_centroids, seed=seed, maxIter=max_iter, featuresCol="_features")
        model = km.fit(feat)
        centroids = np.array([np.asarray(c) for c in model.clusterCenters()])
        assigned = (
            model.transform(feat)
            .withColumnRenamed(model.getPredictionCol(), "centroid")
            .drop("_features")
        )
        return cls(assigned, centroids, id_col, vec_col)

    @classmethod
    def build_balanced(
        cls,
        df: DataFrame,
        n_centroids: int = 16,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        seed: int = 42,
        max_iter: int = 10,
        iters: int = 5,
        max_share: float = 0.5,
    ) -> "IvfIndex":
        """MLlib build with a degenerate-layout tripwire: if the fitted
        quantizer puts more than ``max_share`` of the vectors in one cell
        (the 1M×1536 mega-cell failure — BASELINE.md round 11: MLlib's
        k-means|| collapses on high-dim isotropic data, turning every
        probe into a hidden full scan), rebuild with the deterministic
        Lloyd quantizer (``build_portable``), which produced ~1/k shares
        on the same data. Costs one extra groupBy-count over the
        assignment; use where the data's clusterability is unknown."""
        idx = cls.build(
            df, n_centroids=n_centroids, id_col=id_col, vec_col=vec_col,
            seed=seed, max_iter=max_iter,
        )
        if idx.cell_stats()["max_share"] > max_share:
            idx = cls.build_portable(
                df, n_centroids=n_centroids, id_col=id_col, vec_col=vec_col,
                iters=iters,
            )
        return idx

    @classmethod
    def build_portable(
        cls,
        df: DataFrame,
        n_centroids: int = 16,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        iters: int = 5,
        scale: int = 1_000_000,
    ) -> "IvfIndex":
        """Engine-portable build: the coarse quantizer is ``kmeans_lloyd``
        (integer-exact quantized Lloyd — seeds are the ``n_centroids``
        smallest ids, updates are ``floor(qsum/n + 0.5)`` half-toward-+inf
        integer math), so the ENTIRE build is replayable bit-for-bit by a
        SQL oracle with no persisted state (harness
        ``ann_ivf_portable_build_probe``). The update runs in the
        map-side mode (bit-equal to the portable formula the oracle
        unrolls; the portable N·d join is oracle plumbing only). MLlib's
        ``build`` stays the default for speed/quality at high k; this is
        the verifiable twin. Assignment comes back from the same loop —
        one extra map pass joins the vectors for the cell layout."""
        cents, assigned, _ = kmeans_lloyd(
            df, k=n_centroids, iters=iters, id_col=id_col, vec_col=vec_col, scale=scale
        )
        # kmeans_lloyd labels cells by SEED id (the k smallest vector ids);
        # IvfIndex addresses centroids positionally — remap via a literal map
        centroids = np.array([[c / scale for c in qc] for _, qc in cents], dtype=np.float64)
        pos_of = {cid: i for i, (cid, _) in enumerate(cents)}
        mapping = F.create_map(
            *[F.lit(x) for cid, i in pos_of.items() for x in (cid, i)]
        )
        remapped = assigned.select(
            id_col, mapping[F.col("centroid")].cast("int").alias("centroid")
        )
        with_vecs = df.join(remapped, id_col)
        return cls(with_vecs, centroids, id_col, vec_col)

    def save(self, path: str) -> "IvfIndex":
        """Persist the inverted file: vectors written ``partitionBy(centroid)``
        (one directory per coarse cell) + the centroid matrix. A probe
        against the saved index prunes to ``nprobe`` directories at the file
        level — the parquet-native form of an IVF index."""
        import json
        import os

        _cluster_for_write(self.assigned).write.partitionBy("centroid").mode(
            "overwrite"
        ).parquet(os.path.join(path, "cells"))
        with open(os.path.join(path, "centroids.json"), "w") as f:
            json.dump(
                {
                    "centroids": self.centroids.tolist(),
                    "id_col": self.id_col,
                    "vec_col": self.vec_col,
                },
                f,
            )
        return self

    @classmethod
    def load(cls, spark, path: str) -> "IvfIndex":
        import json
        import os

        with open(os.path.join(path, "centroids.json")) as f:
            meta = json.load(f)
        assigned = spark.read.parquet(os.path.join(path, "cells"))
        return cls(
            assigned, np.asarray(meta["centroids"]), meta["id_col"], meta["vec_col"]
        )

    def assign(self, df: DataFrame) -> DataFrame:
        """Map-only nearest-centroid (Euclidean, matching the k-means
        objective) assignment of NEW vectors against the FROZEN centroid
        matrix — one Arrow-batched argmin per partition, no re-fit, no
        shuffle. This is how an IVF index ingests a stream of additions at
        scale: the coarse quantizer is immutable between rebuilds."""
        return assign_nearest_centroid(df, self.centroids, self.vec_col)

    def add_batch(self, batch: DataFrame, path: str | None = None) -> "IvfIndex":
        """Incremental maintenance: assign a batch to the existing cells
        and append it (to the in-memory table, and — when ``path`` is given
        — to the saved index's ``cells`` directory, where dynamic append
        touches only the assigned centroids' partitions). Centroids do NOT
        move; monitor ``drift()`` and rebuild when it degrades."""
        import os

        assigned = self.assign(batch)
        if path is not None:
            _cluster_for_write(assigned).write.partitionBy("centroid").mode(
                "append"
            ).parquet(os.path.join(path, "cells"))
        self.assigned = self.assigned.unionByName(assigned, allowMissingColumns=True)
        return self

    def drift(self) -> float:
        """Fraction of stored vectors whose nearest centroid disagrees with
        their stored cell — 0 right after a build, grows as incremental
        adds shift the data distribution. One map + one aggregate over the
        index (a maintenance-time scan, not a query-path cost); rebuild
        when it crosses the pipeline's tolerance (a few percent)."""
        stored = self.assigned.select(
            F.col("centroid").alias("_stored"), F.col(self.vec_col)
        )
        re_assigned = self.assign(stored)
        row = re_assigned.agg(
            F.avg((F.col("centroid") != F.col("_stored")).cast("double")).alias("d")
        ).head()
        return float(row["d"] or 0.0)

    def probe_centroid_ids(self, query_vec, nprobe: int = 3) -> list[int]:
        """The ``nprobe`` centroid ids nearest the query by EUCLIDEAN
        distance — the same metric the k-means build/assign uses, so the
        probed cells are exactly those that would own the query. (Ranking
        centroids by cosine while cells were cut by Euclidean k-means
        silently probes the wrong cells on unnormalized data; the
        normalized-layout variant is ``IvfPqResidualIndex``.) Driver-side:
        the centroid matrix is tiny."""
        q = np.asarray(query_vec, dtype=np.float64)
        d = ((self.centroids - q[None, :]) ** 2).sum(axis=1)
        return [int(i) for i in np.argsort(d)[:nprobe]]

    def probe(
        self,
        query_vec,
        k: int = 10,
        nprobe: int = 3,
        round_to: int | None = None,
        impl: str = "expr",
    ) -> DataFrame:
        """Top-k among vectors in the ``nprobe`` centroids nearest (by
        cosine) to the query — a partition-pruned exact search.
        ``impl="numpy"`` scores the pruned cells with the Arrow/matmul
        kernel (the at-scale path for high dims — see ``topk``); the
        default stays expr for SQL-oracle bit-parity."""
        probe_ids = self.probe_centroid_ids(query_vec, nprobe)
        subset = self.assigned.where(F.col("centroid").isin(probe_ids))
        return topk(
            subset,
            query_vec,
            k=k,
            id_col=self.id_col,
            vec_col=self.vec_col,
            round_to=round_to,
            impl=impl,
        )

    def probe_batched(
        self,
        queries: list,
        k: int = 10,
        nprobe: int = 3,
        round_to: int | None = None,
    ) -> DataFrame:
        """Batched probe: top-k for MANY queries in ONE pass over the
        union of their probed cells. ``queries`` is a list of
        ``(query_id, vector)``. The (query, centroid) probe map is tiny
        (|Q|·nprobe rows, computed driver-side against the in-memory
        centroid matrix) and broadcasts; the index is scanned once,
        pruned to the union of probed cells, and each vector scores only
        against the queries that probed ITS cell — |Q| separate probes
        would rescan shared cells |Q| times. Ranking is one shuffle
        keyed by query_id (bounded per query by its probed-cell rows).
        """
        from whatsapp_vectordb_spark.functions.vector import cosine_similarity

        from pyspark.sql import Window

        spark = self.assigned.sparkSession
        probe_rows = [
            (int(qid), int(c))
            for qid, vec in queries
            for c in self.probe_centroid_ids(vec, nprobe)
        ]
        qdf = local_df(spark, 
            [(int(qid), [float(x) for x in vec]) for qid, vec in queries],
            "query_id long, _qv array<double>",
        )
        probes = local_df(spark, 
            probe_rows, "query_id long, _pcell bigint"
        ).join(F.broadcast(qdf), "query_id")
        cells = sorted({c for _, c in probe_rows})
        subset = self.assigned.where(F.col("centroid").isin(cells))
        score = cosine_similarity(F.col(self.vec_col), F.col("_qv"))
        if round_to is not None:
            score = F.round(score, round_to)
        scored = (
            subset.join(F.broadcast(probes), F.col("centroid") == F.col("_pcell"))
            .select("query_id", F.col(self.id_col), score.alias("score"))
            .where(F.col("score").isNotNull())
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("score").desc(), F.col(self.id_col).asc()
        )
        return (
            scored.withColumn("_rk", F.row_number().over(w))
            .where(F.col("_rk") <= k)
            .drop("_rk")
        )


def _train_sample(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    sample_rows: int,
    oversample: int = 8,
) -> np.ndarray:
    """Deterministic, UNBIASED bounded sample for codebook training.

    ``orderBy(id).limit(n)`` trains on the lowest-id rows — on real corpora
    id correlates with ingest time, so codebooks would train on the oldest
    data and drift immediately. Ranking on ``xxhash64(id)`` instead is a
    uniform pseudo-random draw over the whole corpus, still fully
    deterministic and reproducible (id tiebreak makes the order total).

    Scale shape: when the corpus is much larger than the sample, a
    hash-bucket pre-filter (``xxhash64(id) % denom = 0``) prunes the
    TakeOrderedAndProject input to ~``oversample × sample_rows`` expected
    rows, so the heap never ranks the full index — at 100 TB the scan is
    still one pass over ids+vectors, but the sort side is tiny. (The
    ``count()`` sizing pass is column-pruned and runs once per build.)
    """
    h = F.xxhash64(F.col(id_col).cast("string"))
    n = df.count()
    cand = df
    denom = int(n // (sample_rows * oversample))
    if denom > 1:
        cand = df.where(F.pmod(h, F.lit(denom)) == 0)
    rows = (
        cand.select(F.col(vec_col).alias("_v"), h.alias("_h"), F.col(id_col).alias("_id"))
        .orderBy(F.col("_h").asc(), F.col("_id").asc())
        .limit(sample_rows)
        .collect()
    )
    return np.asarray([r["_v"] for r in rows], dtype=np.float64)


def _argmin_sq(x: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """Row-wise ``argmin_c ||x - c||²`` via the matmul identity
    ``argmin_c (||c||² - 2 x·c)`` — O(n·C) memory instead of the
    O(n·C·dim) broadcast-difference tensor (which at n=10⁴, C=64,
    dim=1536 is 7.9 GB float64 per worker and OOM-killed the 1M stress).
    Caveat: catastrophic cancellation in ``||c||² - 2x·c`` can flip the
    argmin on NEAR-ties (distances equal within a few ulps), not just
    exact ties — do not assume bit-stable assignments from this path;
    the property test accordingly asserts chosen-DISTANCE equality, not
    index equality."""
    return ((cents * cents).sum(axis=1)[None, :] - 2.0 * (x @ cents.T)).argmin(axis=1)


def _lloyd_codebooks(
    x: np.ndarray, m: int, ksub: int, seed: int, iters: int
) -> np.ndarray:
    """Per-subspace Lloyd k-means on a driver-side sample → (m, ksub,
    dim/m) codebooks. Deterministic under a fixed seed and sample."""
    dim = x.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    rng = np.random.default_rng(seed)
    books = np.empty((m, ksub, dsub))
    for j in range(m):
        sub = x[:, j * dsub : (j + 1) * dsub]
        cent = sub[rng.choice(len(sub), size=ksub, replace=False)].copy()
        for _ in range(iters):  # Lloyd: assign to nearest, move to mean
            a = _argmin_sq(sub, cent)
            for c in range(ksub):
                pts = sub[a == c]
                if len(pts):
                    cent[c] = pts.mean(axis=0)
        books[j] = cent
    return books


class PqIndex:
    """Product quantization — the compressed-storage ANN tier.

    The vector space is split into ``m`` subspaces of ``dim/m`` components;
    each subspace gets its own ``ksub``-centroid codebook (Lloyd k-means on
    a bounded driver-side sample — codebooks train on samples by design);
    a vector encodes as ``m`` small integer codes: 64-dim float32 (256 B)
    → 8 bytes at m=8, a 32× storage cut (Jégou et al., TPAMI'11).

    Query scoring is asymmetric (ADC): the query stays full-precision; a
    per-subspace lookup table ``lut[j][c] = <q_j, codebook_j[c]>`` turns
    each stored vector's score into ``Σ_j lut[j][code_j]`` — m table reads
    per row, no float vector ever touched at scan time. The LUT here is
    **integer-quantized** (round(dot·10⁶)), so scores are exact integer
    sums — order-independent and bit-reproducible in a SQL oracle over the
    persisted codes, exactly like the portable LSH.

    Inputs are L2-normalized at build/encode/query time, so the ADC dot
    approximates cosine. Scale shape: encode is a map-only Arrow batch;
    the scan shuffles nothing (TakeOrderedAndProject over an integer sum).
    """

    LUT_QUANT = 1_000_000

    def __init__(self, codebooks: np.ndarray, id_col: str, vec_col: str):
        self.codebooks = codebooks  # (m, ksub, dsub)
        self.id_col = id_col
        self.vec_col = vec_col

    @property
    def m(self) -> int:
        return self.codebooks.shape[0]

    @property
    def dsub(self) -> int:
        return self.codebooks.shape[2]

    @staticmethod
    def _normalize(x: np.ndarray) -> np.ndarray:
        n = np.linalg.norm(x, axis=-1, keepdims=True)
        return x / np.where(n == 0, 1.0, n)

    @classmethod
    def build(
        cls,
        df: DataFrame,
        m: int = 8,
        ksub: int = 16,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        sample_rows: int = 2048,
        seed: int = 0,
        iters: int = 10,
    ) -> "PqIndex":
        x = cls._normalize(_train_sample(df, id_col, vec_col, sample_rows))
        books = _lloyd_codebooks(x, m, ksub, seed, iters)
        return cls(books, id_col, vec_col)

    def encode(self, df: DataFrame) -> DataFrame:
        """``(id, codes ARRAY<INT>)`` — per-subspace nearest-centroid codes,
        one Arrow-batched argmin per partition."""
        import pandas as pd
        from pyspark.sql.types import ArrayType, IntegerType, StructField, StructType

        books = self.codebooks
        m, dsub = self.m, self.dsub
        id_col, vec_col = self.id_col, self.vec_col
        out_schema = StructType(
            [df.schema[id_col], StructField("codes", ArrayType(IntegerType()), False)]
        )

        def enc(batches):
            for pdf in batches:
                if pdf.empty:
                    continue
                v = PqIndex._normalize(np.asarray(pdf[vec_col].tolist(), dtype=np.float64))
                codes = np.empty((len(v), m), dtype=np.int32)
                for j in range(m):
                    sub = v[:, j * dsub : (j + 1) * dsub]
                    # argmin ||x-c||² = argmin ||c||² - 2x·c — one (n,dsub)
                    # @ (dsub,ksub) matmul instead of an (n,ksub,dsub)
                    # broadcast temporary (~16× the flops' memory at
                    # dim=1536); identical argmin up to FP rounding of
                    # mathematically-equal distances
                    d = (books[j] ** 2).sum(axis=1)[None, :] - 2.0 * (sub @ books[j].T)
                    codes[:, j] = d.argmin(axis=1)
                yield pd.DataFrame({id_col: pdf[id_col], "codes": list(codes)})

        return df.select(id_col, vec_col).mapInPandas(enc, schema=out_schema)

    def quantization_mse(self, df: DataFrame, sample_rows: int = 2048) -> float:
        """Mean squared reconstruction error on a bounded sample (the
        OPQ-vs-PQ comparison metric; lower is better)."""
        x = self._normalize(_train_sample(df, self.id_col, self.vec_col, sample_rows))
        recon = OpqIndex._reconstruct(x, self.codebooks)
        return float(((x - recon) ** 2).sum(axis=1).mean())

    def lut_int(self, query_vec) -> np.ndarray:
        """Integer-quantized ADC lookup table: ``(m, ksub)`` int64 of
        round(<q_j, codebook_j[c]> · 10⁶)."""
        q = self._normalize(np.asarray(query_vec, dtype=np.float64))
        luts = np.empty((self.m, self.codebooks.shape[1]))
        for j in range(self.m):
            luts[j] = self.codebooks[j] @ q[j * self.dsub : (j + 1) * self.dsub]
        return np.round(luts * self.LUT_QUANT).astype(np.int64)

    def adc_topk(self, encoded: DataFrame, query_vec, k: int = 10) -> DataFrame:
        """Top-k over the codes table by exact-integer ADC score
        ``Σ_j lut[j][code_j]`` — returns ``(id, score)`` with score the
        int64 quantized dot. The scan never touches a float vector; the
        top-k is TakeOrderedAndProject (no shuffle of the table)."""
        import pandas as pd
        from pyspark.sql.types import LongType, StructField, StructType

        lut = self.lut_int(query_vec)
        id_col = self.id_col
        out_schema = StructType(
            [encoded.schema[id_col], StructField("score", LongType(), False)]
        )
        j_idx = np.arange(self.m)

        def score(batches):
            for pdf in batches:
                if pdf.empty:
                    continue
                codes = np.asarray(pdf["codes"].tolist(), dtype=np.int64)  # (n, m)
                s = lut[j_idx[None, :], codes].sum(axis=1)
                yield pd.DataFrame({id_col: pdf[id_col], "score": s})

        scored = encoded.mapInPandas(score, schema=out_schema)
        return scored.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)

    def save(self, path: str, encoded: DataFrame) -> "PqIndex":
        """Persist codes (parquet) + codebooks (json) — the disk form a
        100 TB deployment scans: 8 bytes/vector instead of 256."""
        import json
        import os

        encoded.write.mode("overwrite").parquet(os.path.join(path, "codes"))
        with open(os.path.join(path, "codebooks.json"), "w") as f:
            json.dump(
                {
                    "codebooks": self.codebooks.tolist(),
                    "id_col": self.id_col,
                    "vec_col": self.vec_col,
                },
                f,
            )
        return self

    @classmethod
    def load(cls, spark, path: str) -> tuple["PqIndex", DataFrame]:
        import json
        import os

        with open(os.path.join(path, "codebooks.json")) as f:
            meta = json.load(f)
        idx = cls(np.asarray(meta["codebooks"]), meta["id_col"], meta["vec_col"])
        return idx, spark.read.parquet(os.path.join(path, "codes"))


class OpqIndex(PqIndex):
    """Optimized Product Quantization (Ge et al., CVPR 2013; public): PQ
    applied after a learned orthogonal rotation ``R`` that decorrelates
    the subspaces, so the same ``m`` bytes of codes capture more variance
    — higher recall at identical storage/scan cost.

    Training alternates on a bounded driver sample: (a) Lloyd codebooks on
    the rotated sample, (b) the orthogonal-Procrustes update
    ``R = U·Vᵀ`` from ``SVD(Xᵀ·X̂)`` where ``X̂`` is the codebook
    reconstruction — monotonically non-increasing quantization error,
    deterministic under a fixed seed/sample. The QUERY path is byte-for-
    byte PqIndex's (rotate the query driver-side, integer LUT, ADC over
    persisted codes), so the identical SQL oracle shape hash-checks it.
    """

    def __init__(self, codebooks: np.ndarray, rotation: np.ndarray, id_col: str, vec_col: str):
        super().__init__(codebooks, id_col, vec_col)
        self.rotation = rotation  # (dim, dim), orthogonal

    @staticmethod
    def _reconstruct(xr: np.ndarray, books: np.ndarray) -> np.ndarray:
        m, _, dsub = books.shape
        out = np.empty_like(xr)
        for j in range(m):
            sub = xr[:, j * dsub : (j + 1) * dsub]
            out[:, j * dsub : (j + 1) * dsub] = books[j][_argmin_sq(sub, books[j])]
        return out

    @classmethod
    def build(
        cls,
        df: DataFrame,
        m: int = 8,
        ksub: int = 16,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        sample_rows: int = 2048,
        seed: int = 0,
        iters: int = 10,
        opq_iters: int = 8,
    ) -> "OpqIndex":
        x = cls._normalize(_train_sample(df, id_col, vec_col, sample_rows))
        dim = x.shape[1]
        r = np.eye(dim)
        for _ in range(opq_iters):
            xr = x @ r
            books = _lloyd_codebooks(xr, m, ksub, seed, iters)
            recon = cls._reconstruct(xr, books)
            u, _, vt = np.linalg.svd(x.T @ recon)
            r = u @ vt
        books = _lloyd_codebooks(x @ r, m, ksub, seed, iters)
        return cls(books, r, id_col, vec_col)

    def encode(self, df: DataFrame) -> DataFrame:
        """``(id, codes)`` over ROTATED vectors — one extra (dim × dim)
        matmul inside the same Arrow batch, nothing else changes."""
        import pandas as pd
        from pyspark.sql.types import ArrayType, IntegerType, StructField, StructType

        books = self.codebooks
        rot = self.rotation
        m, dsub = self.m, self.dsub
        id_col, vec_col = self.id_col, self.vec_col
        out_schema = StructType(
            [df.schema[id_col], StructField("codes", ArrayType(IntegerType()), False)]
        )

        def enc(batches):
            for pdf in batches:
                if pdf.empty:
                    continue
                v = PqIndex._normalize(np.asarray(pdf[vec_col].tolist(), dtype=np.float64))
                v = v @ rot
                codes = np.empty((len(v), m), dtype=np.int32)
                for j in range(m):
                    sub = v[:, j * dsub : (j + 1) * dsub]
                    codes[:, j] = _argmin_sq(sub, books[j])
                yield pd.DataFrame({id_col: pdf[id_col], "codes": list(codes)})

        return df.select(id_col, vec_col).mapInPandas(enc, schema=out_schema)

    def lut_int(self, query_vec) -> np.ndarray:
        q = self._normalize(np.asarray(query_vec, dtype=np.float64)) @ self.rotation
        luts = np.empty((self.m, self.codebooks.shape[1]))
        for j in range(self.m):
            luts[j] = self.codebooks[j] @ q[j * self.dsub : (j + 1) * self.dsub]
        return np.round(luts * self.LUT_QUANT).astype(np.int64)

    def save(self, path: str, encoded: DataFrame) -> "OpqIndex":
        import json
        import os

        encoded.write.mode("overwrite").parquet(os.path.join(path, "codes"))
        with open(os.path.join(path, "codebooks.json"), "w") as f:
            json.dump(
                {
                    "codebooks": self.codebooks.tolist(),
                    "rotation": self.rotation.tolist(),
                    "id_col": self.id_col,
                    "vec_col": self.vec_col,
                },
                f,
            )
        return self

    @classmethod
    def load(cls, spark, path: str) -> tuple["OpqIndex", DataFrame]:
        import json
        import os

        with open(os.path.join(path, "codebooks.json")) as f:
            meta = json.load(f)
        idx = cls(
            np.asarray(meta["codebooks"]),
            np.asarray(meta["rotation"]),
            meta["id_col"],
            meta["vec_col"],
        )
        return idx, spark.read.parquet(os.path.join(path, "codes"))

    def quantization_mse(self, df: DataFrame, sample_rows: int = 2048) -> float:
        """Mean squared reconstruction error on a bounded sample — the
        quantity OPQ training minimizes; compare against PqIndex to verify
        the rotation helps (tests/test_ann.py)."""
        x = self._normalize(_train_sample(df, self.id_col, self.vec_col, sample_rows))
        xr = x @ self.rotation
        return float(((xr - self._reconstruct(xr, self.codebooks)) ** 2).sum(axis=1).mean())


def pq_topk_rerank(
    pq: "PqIndex",
    encoded: DataFrame,
    index_df: DataFrame,
    query_vec,
    k: int = 10,
    shortlist: int = 100,
) -> DataFrame:
    """The standard PQ deployment shape: the 8-byte-code ADC scan produces
    a ``shortlist`` of candidates (coarse scores tie aggressively — PQ is
    a *filter*, not a final ranking), then ONLY those rows' full vectors
    are fetched and exactly re-ranked. At 100 TB the float vectors are
    read for ``shortlist`` rows instead of N — the scan stays on codes."""
    cand = pq.adc_topk(encoded, query_vec, k=shortlist).select(pq.id_col)
    sub = index_df.join(cand, pq.id_col).select(pq.id_col, pq.vec_col)
    return topk(
        sub, query_vec, k=k, id_col=pq.id_col, vec_col=pq.vec_col, round_to=6
    )


def ivfpq_topk(
    ivf: IvfIndex,
    pq: PqIndex,
    codes_assigned: DataFrame,
    query_vec,
    k: int = 10,
    nprobe: int = 3,
    index_df: DataFrame | None = None,
    shortlist: int | None = None,
) -> DataFrame:
    """IVF-PQ — the canonical big-index ANN layout: the IVF coarse
    quantizer prunes the scan to ``nprobe`` cells (on a saved index,
    file-level partition pruning), and the survivors are scored from their
    8-byte PQ codes with the integer-exact ADC table — the query never
    touches a float vector column at scan time. ``codes_assigned`` is the
    encoded table carrying a ``centroid`` column (encode ⋈ assign).

    When ``index_df`` (the full-vector table) is given — the DEFAULT
    deployment shape — the ADC scan only produces a ``shortlist``
    (``max(10·k, 100)`` unless set) of candidates whose float vectors are
    then fetched and exactly re-ranked: ADC over 8-byte codes ties
    aggressively (measured recall@10 as low as 0.1 raw vs 0.7-1.0
    reranked — BASELINE.md stress table), so raw ADC order is a filter,
    not an answer. Pass ``index_df=None`` explicitly to get the raw ADC
    ranking (ties broken by id) for oracle/debug use.

    At 100 TB this is the compound win: I/O ∝ nprobe/n_centroids of the
    (already 32×-compressed) index, compute is m int64 table reads per
    candidate, and the float vectors are read for ``shortlist`` rows, not
    N. The result is still a TakeOrderedAndProject."""
    probe_ids = ivf.probe_centroid_ids(query_vec, nprobe)
    subset = codes_assigned.where(F.col("centroid").isin(probe_ids))
    if index_df is None:
        return pq.adc_topk(subset, query_vec, k=k)
    if shortlist is None:
        shortlist = max(10 * k, 100)
    cand = pq.adc_topk(subset, query_vec, k=shortlist).select(pq.id_col)
    sub = index_df.join(cand, pq.id_col).select(pq.id_col, pq.vec_col)
    return topk(sub, query_vec, k=k, id_col=pq.id_col, vec_col=pq.vec_col, round_to=6)


def ivfpq_batched_topk(
    pq: "PqIndex",
    codes_assigned: DataFrame,
    queries: list,
    probe_map: dict,
    k: int = 10,
    centroid_col: str = "centroid",
    impl: str = "expr",
) -> DataFrame:
    """Batched IVF-PQ probe: raw-ADC top-k for MANY queries in ONE scan
    over the union of their probed cells — the PQ twin of
    ``ivf_sq8_batched_topk`` (and of ``IvfIndex.probe_batched``).
    ``queries`` is ``[(query_id, vector)]``; ``probe_map`` maps each
    query_id to its probed cell ids (computed driver-side against the
    in-memory coarse centroids, as the single-query ``ivfpq_topk`` does).

    Each query's integer ADC LUT (``PqIndex.lut_int``: round(<q_j,
    codebook_j[c]>·10⁶), m·ksub int64s) broadcasts with the (query, cell)
    probe map; a code row is scored only against the queries that probed
    ITS cell as the exact int64 sum ``Σ_j lut[j][code_j]`` — so per-query
    results equal |Q| separate raw-ADC ``ivfpq_topk`` calls bit-for-bit
    (pinned by test). The codes table (8 bytes/vector at m=8 — 32×
    compressed) is scanned ONCE with file-level partition pruning on a
    ``partitionBy(centroid)`` layout; float vectors never load. Ranking
    is one shuffle keyed by query_id, bounded per query by its probed
    cells' rows.

    ``impl``: ``"expr"`` (default, SQL-oracle-parity form) scores every
    (row, probing query) pair with a zip_with fold over a flattened
    ``m·ksub`` LUT array; ``"numpy"`` groups each Arrow batch by cell and
    scores all of that cell's probing queries with per-query LUT gathers
    and a per-(partition, query) k-heap emitting ≤ k rows each — the
    at-scale path (the HOF re-parses the LUT array per pair; the gather
    amortizes the batch). Bit-identical scores (exact int64 both ways).
    """
    from pyspark.sql import Window

    # dedup per-query cells (ADVICE r13) — same duplicate-slot hazard as
    # ``ivf_sq8_batched_topk``: a repeated cell id would double-score its
    # rows for that query in both the expr join and the numpy grouping
    probe_rows = [
        (int(qid), c)
        for qid, cells in probe_map.items()
        for c in sorted({int(c) for c in cells})
    ]
    if not probe_rows:
        raise ValueError("ivfpq_batched_topk needs at least one probe cell")
    spark = codes_assigned.sparkSession
    id_col = pq.id_col
    m, ksub = pq.m, pq.codebooks.shape[1]
    luts = {int(qid): pq.lut_int(vec) for qid, vec in queries}  # (m, ksub) int64
    cells = sorted({c for _, c in probe_rows})
    subset = codes_assigned.where(F.col(centroid_col).isin(cells))
    if impl == "numpy":
        cell_qids: dict[int, list[int]] = {}
        for qid, c in probe_rows:  # deduped above — one qid per (cell, query)
            cell_qids.setdefault(c, []).append(qid)
        j_idx = np.arange(m)
        kk = k

        def part_topk(batches):
            import pandas as pd

            best: dict[int, pd.DataFrame] = {}
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                for cell, grp in pdf.groupby(centroid_col):
                    qids = cell_qids.get(int(cell))
                    if not qids:
                        continue
                    codes = np.asarray(grp["codes"].tolist(), dtype=np.int64)
                    ids = grp[id_col].to_numpy()
                    for qid in qids:
                        s = luts[qid][j_idx[None, :], codes].sum(axis=1)
                        cur = pd.DataFrame({id_col: ids, "score_int": s})
                        prev = best.get(qid)
                        cur = cur if prev is None else pd.concat((prev, cur))
                        best[qid] = cur.sort_values(
                            ["score_int", id_col], ascending=[False, True]
                        ).head(kk)
            for qid, b in best.items():
                b = b.copy()
                b.insert(0, "query_id", np.int64(qid))
                yield b

        partial = subset.select(id_col, "codes", centroid_col).mapInPandas(
            part_topk, schema=f"query_id long, {id_col} long, score_int long"
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("score_int").desc(), F.col(id_col).asc()
        )
        return (
            partial.withColumn("_rk", F.row_number().over(w))
            .where(F.col("_rk") <= k)
            .drop("_rk")
        )
    wdf = local_df(spark, 
        [(qid, [int(x) for x in lut.ravel()]) for qid, lut in luts.items()],
        "query_id long, _lut array<bigint>",
    )
    probes = local_df(spark, 
        probe_rows, "query_id long, _pcell bigint"
    ).join(F.broadcast(wdf), "query_id")
    # Σ_j lut[j·ksub + code_j] over the flattened per-query LUT (F.get is
    # 0-based), the same exact int64 sum as PqIndex.adc_topk.
    score = F.aggregate(
        F.zip_with(
            F.col("codes"),
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda c, j: F.get(F.col("_lut"), j * ksub + c),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = subset.join(
        F.broadcast(probes), F.col(centroid_col) == F.col("_pcell")
    ).select("query_id", F.col(id_col), score.alias("score_int"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_int").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
        .drop("_rk")
    )


class IvfPqResidualIndex:
    """Residual IVF-PQ — the layout production vector stores (FAISS
    ``IVFxx,PQyy``) actually deploy: vectors are L2-normalized, assigned
    to a coarse centroid, and PQ encodes the RESIDUAL ``v − c`` instead of
    the vector — residuals are small and centered, so the same byte
    budget quantizes much finer than whole-vector PQ (Jégou et al.
    TPAMI'11 §IV).

    Query scoring is per-cell asymmetric L2: for each probed centroid c,
    ``lut_c[j][k] = ||(q−c)_j − codebook_j[k]||²`` and a row's distance is
    ``Σ_j lut_c[j][code_j]`` — on unit vectors the L2 ranking equals the
    cosine ranking. LUTs are integer-quantized (round(d·10⁶)), so scores
    are exact int64 sums, reproducible in a SQL oracle over persisted
    codes + LUTs, exactly like the flat-PQ probe.
    """

    LUT_QUANT = 1_000_000

    def __init__(
        self,
        centroids: np.ndarray,
        codebooks: np.ndarray,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ):
        self.centroids = centroids  # (C, dim) — unit-normalized space
        self.codebooks = codebooks  # (m, ksub, dim/m) — residual space
        self.id_col = id_col
        self.vec_col = vec_col

    @property
    def m(self) -> int:
        return self.codebooks.shape[0]

    @property
    def dsub(self) -> int:
        return self.codebooks.shape[2]

    @classmethod
    def build(
        cls,
        df: DataFrame,
        n_centroids: int = 8,
        m: int = 8,
        ksub: int = 16,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        sample_rows: int = 2048,
        seed: int = 0,
        iters: int = 10,
    ) -> "IvfPqResidualIndex":
        """Coarse centroids (Lloyd on the normalized sample) + residual
        codebooks trained on the SAME sample's residuals — both stages on
        a bounded driver-side sample, as codebook training always is."""
        x = PqIndex._normalize(_train_sample(df, id_col, vec_col, sample_rows))
        # coarse quantizer: one "subspace" spanning the full dim
        cent = _lloyd_codebooks(x, 1, n_centroids, seed, iters)[0]  # (C, dim)
        res = x - cent[_argmin_sq(x, cent)]
        books = _lloyd_codebooks(res, m, ksub, seed + 1, iters)
        return cls(cent, books, id_col, vec_col)

    def encode(self, df: DataFrame) -> DataFrame:
        """``(id, centroid, codes)``: one Arrow batch does normalize →
        coarse assign → residual → per-subspace code — the whole ingest
        map in a single pass, no shuffle."""
        import pandas as pd
        from pyspark.sql.types import (
            ArrayType,
            IntegerType,
            StructField,
            StructType,
        )

        cent, books = self.centroids, self.codebooks
        m, dsub = self.m, self.dsub
        id_col, vec_col = self.id_col, self.vec_col
        out_schema = StructType(
            [
                df.schema[id_col],
                StructField("centroid", IntegerType(), False),
                StructField("codes", ArrayType(IntegerType()), False),
            ]
        )

        # matmul-argmin: argmin_c ||v-c||² = argmin_c (||c||² - 2 v·c) —
        # never materialize the (batch, C, dim) broadcast-difference tensor
        # (at batch=10⁴, C=64, dim=1536 that tensor is 7.9 GB float64 PER
        # WORKER; ×32 workers it OOM-killed the 1M×1536 stress). The
        # (batch, C) matmul form is KBs-to-MBs and mathematically the same
        # argmin up to float rounding of exact ties.
        cent_sq = (cent * cent).sum(axis=1)
        books_t = [b.T.copy() for b in books]
        books_sq = [(b * b).sum(axis=1) for b in books]

        def enc(batches):
            for pdf in batches:
                if pdf.empty:
                    continue
                v = PqIndex._normalize(np.asarray(pdf[vec_col].tolist(), dtype=np.float64))
                cell = (cent_sq[None, :] - 2.0 * (v @ cent.T)).argmin(axis=1)
                res = v - cent[cell]
                codes = np.empty((len(v), m), dtype=np.int32)
                for j in range(m):
                    sub = res[:, j * dsub : (j + 1) * dsub]
                    codes[:, j] = (books_sq[j][None, :] - 2.0 * (sub @ books_t[j])).argmin(
                        axis=1
                    )
                yield pd.DataFrame(
                    {
                        id_col: pdf[id_col],
                        "centroid": cell.astype("int32"),
                        "codes": list(codes),
                    }
                )

        return df.select(id_col, vec_col).mapInPandas(enc, schema=out_schema)

    def probe_cells(self, query_vec, nprobe: int) -> list[int]:
        q = PqIndex._normalize(np.asarray(query_vec, dtype=np.float64))
        d = ((self.centroids - q) ** 2).sum(axis=1)
        return [int(i) for i in np.argsort(d)[:nprobe]]

    def luts_int(self, query_vec, cells: list[int]) -> dict[int, np.ndarray]:
        """Per-probed-cell integer LUT: (m, ksub) int64 of
        round(||(q−c)_j − codebook_j[k]||² · 10⁶)."""
        q = PqIndex._normalize(np.asarray(query_vec, dtype=np.float64))
        out = {}
        for c in cells:
            r = q - self.centroids[c]
            lut = np.empty((self.m, self.codebooks.shape[1]))
            for j in range(self.m):
                sub = r[j * self.dsub : (j + 1) * self.dsub]
                lut[j] = ((self.codebooks[j] - sub) ** 2).sum(axis=1)
            out[c] = np.round(lut * self.LUT_QUANT).astype(np.int64)
        return out

    def probe(
        self, encoded: DataFrame, query_vec, k: int = 10, nprobe: int = 2
    ) -> DataFrame:
        """Top-k (ascending integer distance) over the probed cells'
        codes — centroid filter prunes partitions on a saved layout, the
        scan reads codes only, ties break by id."""
        import pandas as pd
        from pyspark.sql.types import LongType, StructField, StructType

        cells = self.probe_cells(query_vec, nprobe)
        luts = self.luts_int(query_vec, cells)
        id_col = self.id_col
        m = self.m
        out_schema = StructType(
            [encoded.schema[id_col], StructField("score", LongType(), False)]
        )
        j_idx = np.arange(m)

        def score(batches):
            for pdf in batches:
                if pdf.empty:
                    continue
                codes = np.asarray(pdf["codes"].tolist(), dtype=np.int64)
                cellv = pdf["centroid"].to_numpy()
                s = np.empty(len(pdf), dtype=np.int64)
                for c in np.unique(cellv):
                    mask = cellv == c
                    s[mask] = luts[int(c)][j_idx[None, :], codes[mask]].sum(axis=1)
                yield pd.DataFrame({id_col: pdf[id_col], "score": s})

        subset = encoded.where(F.col("centroid").isin(cells))
        scored = subset.mapInPandas(score, schema=out_schema)
        return scored.orderBy(F.col("score").asc(), F.col(id_col).asc()).limit(k)


def ivfpq_residual_batched_topk(
    index: "IvfPqResidualIndex",
    codes_assigned: DataFrame,
    queries: list,
    probe_map: dict,
    k: int = 10,
    centroid_col: str = "centroid",
) -> DataFrame:
    """Batched RESIDUAL IVF-PQ probe: quantized top-k for MANY queries in
    ONE scan over the union of their probed cells — the residual twin of
    ``ivfpq_batched_topk``. The flat-PQ batched probe broadcasts one LUT
    per query; here the ADC table depends on the probed CELL too (the
    LUT is built on the residual ``q − c``, Jégou et al. TPAMI'11 §IV),
    so the broadcast side carries one flattened ``m·ksub`` int64 LUT per
    (query, cell) pair — |Q|·nprobe·m·ksub int64s, kilobytes at serving
    shapes. A code row joins only the (query, cell) rows of ITS cell and
    scores as the exact int64 sum ``Σ_j lut[j·ksub + code_j]``, so
    per-query results equal |Q| separate ``IvfPqResidualIndex.probe``
    calls bit-for-bit (pinned by test). Codes scan ONCE with file-level
    pruning on a ``partitionBy(centroid)`` layout; float vectors never
    load; ranking is one shuffle keyed by query_id. ASCENDING integer
    distances (ties by id), matching the single-query probe."""
    from pyspark.sql import Window

    probe_items = [
        (int(qid), sorted({int(c) for c in cells}))
        for qid, cells in probe_map.items()
    ]
    if not any(cells for _, cells in probe_items):
        raise ValueError("ivfpq_residual_batched_topk needs at least one probe cell")
    spark = codes_assigned.sparkSession
    id_col = index.id_col
    m, ksub = index.m, index.codebooks.shape[1]
    qvecs = {int(qid): vec for qid, vec in queries}
    lut_rows = []
    for qid, cells in probe_items:
        luts = index.luts_int(qvecs[qid], cells)
        for c in cells:
            lut_rows.append((qid, int(c), [int(x) for x in luts[c].ravel()]))
    probes = local_df(spark, 
        lut_rows, "query_id long, _pcell bigint, _lut array<bigint>"
    )
    cells_all = sorted({c for _, cells in probe_items for c in cells})
    subset = codes_assigned.where(F.col(centroid_col).isin(cells_all))
    score = F.aggregate(
        F.zip_with(
            F.col("codes"),
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda c, j: F.get(F.col("_lut"), j * ksub + c),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = subset.join(
        F.broadcast(probes), F.col(centroid_col) == F.col("_pcell")
    ).select("query_id", F.col(id_col), score.alias("score"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").asc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
        .drop("_rk")
    )


def mllib_lsh_topk(
    index_df: DataFrame,
    query_vec,
    k: int = 10,
    bucket_length: float = 2.0,
    num_hash_tables: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """ANN top-k via MLlib ``BucketedRandomProjectionLSH`` (Euclidean LSH;
    on L2-normalized vectors the Euclidean and cosine rankings coincide:
    ||a-b||² = 2 - 2·cos). Returns ``(id, distance)`` for the ~k nearest.

    This is the library path SURVEY.md §4.2 names; ``portable_lsh_topk`` is
    the oracle-checkable equivalent. approxNearestNeighbors probes only the
    query's hash buckets — index scan is bucket-pruned exactly like IVF.
    """
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    from whatsapp_vectordb_spark.functions.vector import l2_normalize

    feat = index_df.select(
        F.col(id_col),
        array_to_vector(l2_normalize(F.col(vec_col))).alias("_features"),
    ).where(F.col("_features").isNotNull())
    lsh = BucketedRandomProjectionLSH(
        inputCol="_features",
        outputCol="_hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=seed,
    )
    model = lsh.fit(feat)
    q = np.asarray(query_vec, dtype=np.float64)
    n = np.linalg.norm(q)
    if n > 0:
        q = q / n
    from pyspark.ml.linalg import Vectors

    out = model.approxNearestNeighbors(feat, Vectors.dense(q), k, distCol="distance")
    return out.select(F.col(id_col), F.round("distance", 6).alias("distance"))


def portable_lsh_topk_batched(
    index_df: DataFrame,
    query_ids: list,
    k: int = 5,
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int | None = 6,
    impl: str = "expr",
    dim: int | None = None,
) -> DataFrame:
    """Batched ANN: many stored query vectors probed in ONE pass. The
    signature map runs once over the index; all queries' bucket keys
    broadcast together; per-query candidates verify + window-rank.

    Returns ``(query_id, id, score, rank)``. Scale shape: index scanned
    once regardless of |Q| (vs |Q| passes for repeated single probes);
    shuffle is candidates only, never |Q|×N.
    """
    rows_per_band = n_planes // bands
    dim = _resolve_dim(index_df, vec_col, dim)
    planes = portable_planes(dim, n_planes, seed)
    if impl == "numpy":
        sig = portable_signature_numpy(index_df, planes, id_col, vec_col)
    else:
        sig = index_df.select(
            F.col(id_col), portable_signature(vec_col, planes).alias("_sig")
        )
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.substring("_sig", b * rows_per_band + 1, rows_per_band).alias("chunk"),
        )
        for b in range(bands)
    ]
    banded = sig.select(id_col, F.explode(F.array(*band_structs)).alias("bk")).select(
        id_col, F.col("bk.band").alias("band"), F.col("bk.chunk").alias("chunk")
    )
    qb = banded.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), "band", "chunk"
    )
    cand = (
        banded.join(F.broadcast(qb), ["band", "chunk"])
        .select("query_id", id_col)
        .dropDuplicates(["query_id", id_col])
    )
    qvecs = index_df.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    scored = (
        cand.join(index_df.select(id_col, vec_col), id_col)
        .join(F.broadcast(qvecs), "query_id")
    )
    score = cosine_similarity(F.col("_qv"), F.col(vec_col))
    if round_to is not None:
        score = F.round(score, round_to)
    scored = scored.select("query_id", id_col, score.alias("score")).where(
        F.col("score").isNotNull()
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", id_col, "score", "rank")
    )


def knn_graph_lsh(
    df: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 32,
    bands: int = 4,
    seed: int = 0,
    round_to: int = 6,
    impl: str = "numpy",
    dim: int | None = None,
) -> DataFrame:
    """Approximate kNN GRAPH over the whole corpus — for every vector, its
    top-``k`` cosine neighbors among LSH bucket candidates. This is the
    curation primitive behind density-based filtering, diversity sampling
    and duplicate clustering (a kNN graph feeds connected components /
    community detection the same way near-dup pairs do).

    Scale shape: candidate generation is ``portable_lsh_join`` verbatim
    (band-key equi-join — bucket collisions, never O(n²)); the only
    addition is symmetrizing the edges and one window rank per source
    node over its candidate edges, shuffled on the 8-byte node id.
    Recall per edge follows the LSH S-curve, so distant nodes may have
    < k edges — exactly the sparsity a density filter wants to see.
    """
    from pyspark.sql import Window

    pairs = portable_lsh_join(
        df,
        id_col=id_col,
        vec_col=vec_col,
        threshold=-1.0,
        n_planes=n_planes,
        bands=bands,
        seed=seed,
        round_to=round_to,
        impl=impl,
        dim=dim,
    )
    # symmetrize with ONE explode instead of a self-union (r18, guide
    # §1.2): a union of two selects over `pairs` duplicates the whole
    # upstream pipeline in the physical plan — the signature pass, the
    # band self-join, its dedup exchange and the cosine verify all ran
    # TWICE (once per branch; Spark does not share common subplans).
    # The exploded directed-edge rows are identical to the union's.
    sym = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("id_a").alias("src"),
                    F.col("id_b").alias("nbr"),
                    F.col("cos_sim"),
                ),
                F.struct(
                    F.col("id_b").alias("src"),
                    F.col("id_a").alias("nbr"),
                    F.col("cos_sim"),
                ),
            )
        ).alias("e")
    ).select("e.src", "e.nbr", "e.cos_sim")
    w = Window.partitionBy("src").orderBy(F.col("cos_sim").desc(), F.col("nbr").asc())
    return (
        sym.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("src", "nbr", "cos_sim", F.col("rank").cast("int").alias("rank"))
    )


def graph_beam_topk(
    df: DataFrame,
    edges: DataFrame,
    query_vec,
    k: int = 10,
    beam_width: int = 8,
    iters: int = 3,
    n_entry: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
    bucket_col: str | None = None,
    n_buckets: int = 64,
    allowed: DataFrame | None = None,
) -> DataFrame:
    """Graph-ANN search: best-first BEAM traversal over a precomputed kNN
    graph (the NSW/HNSW-family search step — Malkov & Yashunin 2018,
    single-layer form — run over the ``knn_graph_lsh`` edge list instead
    of an in-memory graph). Complements the cell-probe (IVF) and
    hash-bucket (LSH) families with the third major ANN access pattern:
    navigate edges toward the query instead of enumerating a partition
    of space.

    Deterministic contract (oracle-replayable): entry frontier = the
    ``n_entry`` LOWEST ids (no randomness); each of ``iters`` rounds
    expands frontier ∪ out-neighbors(frontier), scores candidates by
    cosine ROUNDED to ``round_to`` (ties → id ascending — the engine
    portability discipline every top-k here uses), keeps the best
    ``beam_width`` as the next frontier, and accumulates every scored
    candidate into the visited set; the result is the visited top-``k``.
    Fixed iteration count (not convergence) keeps the plan replayable by
    a statically unrolled SQL oracle.

    Scale shape: the frontier is ≤ ``beam_width`` rows by construction —
    every hop is a BROADCAST-frontier equi-join against the edge list
    plus one broadcast-candidate join against the vector table to score
    ≤ ``beam_width·(k_graph+1)`` rows. The hop's cost is the EDGE SCAN:
    a raw edge frame is scanned in full each hop (measured 2.08× the
    time at 10× the corpus — cheap but linear,
    tools/stress_graph_beam.py), so at scale pass a SOURCE-BUCKETED
    layout (``save_knn_graph`` — ``partitionBy(src_bucket)``) and set
    ``bucket_col``/``n_buckets``: the hop then filters to the frontier's
    buckets as a literal IN-list, partition pruning cuts the read to
    ≤ ``beam_width`` buckets, and per-hop cost becomes independent of
    corpus size — the property that makes graph ANN attractive at
    100 TB, bought exactly the way the serving tiers buy it
    (``partitionBy(centroid)``). Iteration state (ids only) is pinned
    with an eager ``localCheckpoint`` each round so the lineage stays
    O(1) deep, the same discipline as the pointer-doubling connected
    components.

    ``allowed`` (a one-column id frame) is FILTERED SEARCH, the HNSW
    convention: navigation stays UNfiltered (pruning disallowed hubs
    would disconnect the graph exactly where the filter is selective),
    the filter applies to result COLLECTION — the returned top-``k``
    comes from visited ∩ allowed. Consequence the serving tiers don't
    have: fewer than ``k`` rows can come back when the walk's visited
    set undersamples the allowed region (widen beam/iters, or use the
    cell-probe tiers whose pre-scan filter guarantees k matches).
    """
    qlit = F.array(*[F.lit(float(x)) for x in query_vec])
    vecs = df.select(F.col(id_col), F.col(vec_col))

    def scored(ids: DataFrame) -> DataFrame:
        s = F.round(cosine_similarity(F.col(vec_col), qlit), round_to)
        return (
            vecs.join(F.broadcast(ids), id_col)
            .select(F.col(id_col), s.alias("score"))
            .where(F.col("score").isNotNull())
        )

    bucketed = bucket_col is not None and bucket_col in edges.columns
    if bucketed:
        # DRIVER-STATE traversal — the serving shape. Every set in a
        # beam traversal is bounded BY CONSTRUCTION (frontier ≤
        # beam_width, candidates ≤ beam_width·(degree+1), visited ≤
        # entry + iters·candidates), so the iteration state lives
        # driver-side (the MMR-shortlist discipline) and each hop runs
        # exactly TWO pruned cluster reads: the frontier's edge buckets
        # (literal IN-list → PartitionFilters on the save_knn_graph
        # layout) and the NEW candidate ids' vectors (IN-list pushed to
        # the scan; ids already scored are never re-read). No full
        # edge-list or vector-table scan anywhere — per-hop cost is
        # O(frontier·degree), independent of corpus size.
        score_expr = F.round(
            cosine_similarity(F.col(vec_col), qlit), round_to
        ).alias("score")

        def score_new(ids: list) -> dict:
            if not ids:
                return {}
            rows = (
                vecs.where(F.col(id_col).isin(ids))
                .select(F.col(id_col), score_expr)
                .where(F.col("score").isNotNull())
                .collect()
            )
            return {r[id_col]: r["score"] for r in rows}

        entry_ids = [
            r[id_col]
            for r in df.select(F.col(id_col))
            .orderBy(F.col(id_col).asc())
            .limit(n_entry)
            .collect()
        ]
        scores = score_new(entry_ids)
        queried = set(entry_ids)  # incl. null-score ids — never re-read
        frontier_ids = entry_ids
        visited: set = set(entry_ids)
        for _ in range(iters):
            buckets = sorted({i % n_buckets for i in frontier_ids})
            nbr_rows = (
                edges.where(F.col(bucket_col).isin(buckets))
                .where(F.col("src").isin(frontier_ids))
                .select("nbr")
                .distinct()
                .collect()
            )
            cand = set(frontier_ids) | {r["nbr"] for r in nbr_rows}
            fresh = sorted(cand - queried)
            queried |= cand
            scores.update(score_new(fresh))
            ranked = sorted(
                (i for i in cand if i in scores),
                key=lambda i: (-scores[i], i),
            )
            frontier_ids = ranked[:beam_width]
            visited |= cand
        pool = visited
        if allowed is not None:
            arows = (
                allowed.select(F.col(allowed.columns[0]).alias(id_col))
                .where(F.col(id_col).isin(sorted(visited)))
                .collect()
            )
            pool = {r[id_col] for r in arows}
        top = sorted(
            (i for i in pool if i in scores),
            key=lambda i: (-scores[i], i),
        )[:k]
        spark = df.sparkSession
        out_schema = (
            df.select(F.col(id_col), score_expr).schema
        )
        return local_df(spark, 
            [(i, scores[i]) for i in top], out_schema
        )

    out_edges = edges.select(F.col("src"), F.col("nbr"))
    frontier = (
        df.select(F.col(id_col)).orderBy(F.col(id_col).asc()).limit(n_entry)
    ).localCheckpoint(eager=True)
    visited = frontier
    for _ in range(iters):
        nbrs = out_edges.join(
            F.broadcast(frontier), out_edges["src"] == F.col(id_col)
        ).select(F.col("nbr").alias(id_col))
        cand = frontier.unionByName(nbrs).distinct().localCheckpoint(eager=True)
        frontier = (
            scored(cand)
            .orderBy(F.col("score").desc(), F.col(id_col).asc())
            .limit(beam_width)
            .select(id_col)
            .localCheckpoint(eager=True)
        )
        visited = visited.unionByName(cand).distinct().localCheckpoint(eager=True)
    final = scored(visited)
    if allowed is not None:
        final = final.join(
            F.broadcast(
                allowed.select(F.col(allowed.columns[0]).alias(id_col))
            ),
            id_col,
            "left_semi",
        )
    return final.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)


def graph_beam_topk_batched(
    df: DataFrame,
    edges: DataFrame,
    query_ids,
    k: int = 10,
    beam_width: int = 8,
    iters: int = 3,
    n_entry: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
    bucket_col: str = "src_bucket",
    n_buckets: int = 64,
) -> DataFrame:
    """Batched beam traversal: Q stored query vectors walk the SAME
    bucketed edge layout (``save_knn_graph``) together — the family
    discipline every serving tier keeps (N queries = one pruned read
    per stage, bit-equal to N single calls, asserted in tests). Per
    hop there are exactly TWO cluster jobs regardless of Q: one edge
    read pruned to the UNION of all queries' frontier buckets (each
    query then takes its own adjacency from the collected pairs), and
    one vector read pruned to the union of ids any query sees for the
    first time, scored against the broadcast Q-row query frame in the
    same job. Per-query state (frontier/visited/scores) is driver-side
    and bounded by construction, exactly as the single-query serving
    path. Returns ``(query_id, vec_id, score, rank)``, rank 1..k per
    query by (score DESC, id ASC)."""
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        StructField,
        StructType,
    )

    spark = df.sparkSession
    qids = list(query_ids)
    qrows = (
        df.where(F.col(id_col).isin(qids))
        .select(F.col(id_col), F.col(vec_col))
        .collect()
    )
    qvecs = {r[id_col]: [float(x) for x in r[vec_col]] for r in qrows}
    missing = [q for q in qids if q not in qvecs]
    if missing:
        raise ValueError(f"query ids not in the corpus: {missing}")
    qdf = local_df(spark, 
        [(int(q), qvecs[q]) for q in qids],
        "query_id long, _qv array<double>",
    )
    vecs = df.select(F.col(id_col), F.col(vec_col))
    score_expr = F.round(
        cosine_similarity(F.col(vec_col), F.col("_qv")), round_to
    ).alias("score")

    def score_union(ids: list) -> dict:
        if not ids:
            return {}
        rows = (
            vecs.where(F.col(id_col).isin(ids))
            .crossJoin(F.broadcast(qdf))
            .select(F.col("query_id"), F.col(id_col), score_expr)
            .where(F.col("score").isNotNull())
            .collect()
        )
        return {(r["query_id"], r[id_col]): r["score"] for r in rows}

    entry_ids = [
        r[id_col]
        for r in df.select(F.col(id_col))
        .orderBy(F.col(id_col).asc())
        .limit(n_entry)
        .collect()
    ]
    scores = score_union(entry_ids)
    state = {
        q: {
            "frontier": entry_ids[:],
            "visited": set(entry_ids),
            "queried": set(entry_ids),
        }
        for q in qids
    }
    for _ in range(iters):
        all_frontier = sorted(
            {i for st in state.values() for i in st["frontier"]}
        )
        buckets = sorted({i % n_buckets for i in all_frontier})
        pairs = (
            edges.where(F.col(bucket_col).isin(buckets))
            .where(F.col("src").isin(all_frontier))
            .select("src", "nbr")
            .distinct()
            .collect()
        )
        adj: dict = {}
        for r in pairs:
            adj.setdefault(r["src"], []).append(r["nbr"])
        new_union: set = set()
        for q, st in state.items():
            cand = set(st["frontier"])
            for fid in st["frontier"]:
                cand.update(adj.get(fid, []))
            st["cand"] = cand
            new_union |= cand - st["queried"]
        scores.update(score_union(sorted(new_union)))
        for q, st in state.items():
            st["queried"] |= st["cand"]
            ranked = sorted(
                (i for i in st["cand"] if (q, i) in scores),
                key=lambda i: (-scores[(q, i)], i),
            )
            st["frontier"] = ranked[:beam_width]
            st["visited"] |= st["cand"]
    out = []
    for q in qids:
        st = state[q]
        top = sorted(
            (i for i in st["visited"] if (q, i) in scores),
            key=lambda i: (-scores[(q, i)], i),
        )[:k]
        out.extend(
            (int(q), int(i), float(scores[(q, i)]), rank + 1)
            for rank, i in enumerate(top)
        )
    id_field = df.schema[id_col]
    schema = StructType(
        [
            StructField("query_id", id_field.dataType, False),
            StructField(id_col, id_field.dataType, False),
            StructField("score", DoubleType(), False),
            StructField("rank", IntegerType(), False),
        ]
    )
    return local_df(spark, out, schema)


def save_knn_graph(
    edges: DataFrame, path: str, n_buckets: int = 64
) -> DataFrame:
    """Persist a kNN-graph edge list for beam traversal, PARTITIONED BY
    SOURCE BUCKET (``src % n_buckets`` — integer pmod, engine-portable)
    — the layout that makes ``graph_beam_topk``'s per-hop cost
    O(frontier adjacency) instead of O(|edges|): a hop filters to the
    frontier's buckets as a literal IN-list, which Spark turns into
    PartitionFilters on this layout (measured: a full-edge-list hop
    scans 10× the bytes at 10× the corpus; a bucket-pruned hop reads
    ≤ beam_width buckets regardless of corpus size —
    tools/stress_graph_beam.py). Same move as the serving tiers'
    ``partitionBy(centroid)`` cell layout. Returns the reloaded frame
    (carrying the partition column) ready to pass to ``graph_beam_topk``
    with ``bucket_col="src_bucket", n_buckets=n_buckets``."""
    spark = edges.sparkSession
    (
        edges.select(
            "src", "nbr", (F.col("src") % n_buckets).alias("src_bucket")
        )
        .repartition("src_bucket")
        .write.partitionBy("src_bucket")
        .mode("overwrite")
        .parquet(path)
    )
    return spark.read.parquet(path)


def assign_cells_quantized(
    df: DataFrame,
    centroids_df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "centroid",
    centroid_vec_col: str = "cvec",
    scale: int = 1_000_000,
    pre_quantized: bool = False,
) -> DataFrame:
    """Nearest-centroid assignment with INTEGER-exact arithmetic: vectors
    and centroids are quantized to ``round(x·scale)`` BIGINTs and ranked by
    integer squared-L2 (ties broken by centroid id). Integer sums are
    associative, so the argmin is bit-identical in any engine and under
    any partitioning — the property that lets incremental/streaming index
    maintenance be oracle-checked against a full recompute (float argmin
    can flip near-ties between engines; quantization error at 1e-6 is far
    below any meaningful cell boundary).

    Scale shape: the centroid table is tiny (k rows) and broadcast; the
    per-row work is a k-way integer distance fold inside codegen — a
    map-only operator with no shuffle (the row_number window partitions by
    the unique row id over k candidate rows, which AQE plans as a local
    sort within the broadcast-join output).

    Returns ``df``'s columns plus ``centroid``.
    """
    from pyspark.sql import Window

    q = lambda c: F.transform(c, lambda x: F.round(x.cast("double") * scale).cast("long"))
    left = df.withColumn("_qv", q(F.col(vec_col)))
    qc = (
        F.col(centroid_vec_col)  # already BIGINT quantized units (kmeans_lloyd)
        if pre_quantized
        else q(F.col(centroid_vec_col))
    )
    cents = centroids_df.select(F.col(centroid_id_col).alias("_cid"), qc.alias("_qc"))
    dist = F.aggregate(
        F.zip_with("_qv", "_qc", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy(id_col).orderBy(F.col("_dist").asc(), F.col("_cid").asc())
    return (
        left.join(F.broadcast(cents))
        .withColumn("_dist", dist)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(*df.columns, F.col("_cid").alias("centroid"))
    )


def _kmeans_mapside_partials(qvecs: DataFrame, cents) -> DataFrame:
    """Map-side partial sums for one Lloyd update: ONE Arrow-batched pass
    over the pre-quantized vectors produces per-partition
    ``(centroid, pos, n, qsum)`` rows — no N·d posexplode, no id join.

    Bit-parity with the portable path by construction: the input is the
    SAME Spark-quantized BIGINT component array the portable path
    aggregates (quantization happens in the JVM via ``F.round`` BEFORE
    this pass — no Python float rounding anywhere), and everything here
    is int64 arithmetic. The argmin uses ``||c||² − 2 q·cᵀ`` (dropping
    the per-row-constant ``||q||²``) in int64 matmul — with |q| ≤ scale
    = 1e6 and d ≤ 2048 every term stays ≤ ~4e15, far inside int64, so
    distances are EXACT integers, unlike the float matmul identity in
    ``_argmin_sq``. Ties go to the lowest row index = lowest centroid id
    (``cents`` is sorted ascending). Per-partition output is ≤ k·d rows
    (the classic map-side combine), so the downstream shuffle is
    k·d·num_partitions — independent of N — versus the portable path's
    N·d-row join+shuffle per iteration.
    """
    import pandas as pd

    cids = np.asarray([cid for cid, _ in cents], dtype=np.int64)
    c_mat = np.asarray([qc for _, qc in cents], dtype=np.int64)
    k, d = c_mat.shape
    cnorm = (c_mat * c_mat).sum(axis=1)

    def part(batches):
        counts = np.zeros(k, dtype=np.int64)
        sums = np.zeros((k, d), dtype=np.int64)
        for pdf in batches:
            if pdf.empty:
                continue
            # NULL vectors contribute nothing — exactly what the portable
            # path's posexplode does (explode of NULL yields zero rows),
            # so NULL-row parity holds. Wrong-length vectors are dropped
            # here too: the portable explode would PARTIALLY count a
            # ragged vector's leading positions, which is meaningless —
            # fixed-dim is the operator contract (component-level NULLs
            # are likewise out of contract for both paths).
            vals = [v for v in pdf["_qv"] if v is not None and len(v) == d]
            if not vals:
                continue
            q = np.asarray(vals, dtype=np.int64)
            assign = (cnorm[None, :] - 2 * (q @ c_mat.T)).argmin(axis=1)
            counts += np.bincount(assign, minlength=k)
            for j in np.unique(assign):
                sums[j] += q[assign == j].sum(axis=0)
        nz = np.nonzero(counts)[0]
        if len(nz):
            yield pd.DataFrame(
                {
                    "centroid": np.repeat(cids[nz], d),
                    "pos": np.tile(np.arange(d, dtype=np.int32), len(nz)),
                    "n": np.repeat(counts[nz], d),
                    "qsum": sums[nz].reshape(-1),
                }
            )

    return qvecs.mapInPandas(
        part, schema="centroid bigint, pos int, n bigint, qsum bigint"
    )


def kmeans_lloyd(
    df: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1_000_000,
    history: list | None = None,
    stop_when_stable: bool = False,
    update_mode: str = "mapside",
):
    """Multi-iteration Lloyd k-means with INTEGER-exact quantized
    arithmetic — the convergence loop over the single step that
    ``assign_cells_quantized`` pins (harness ``cluster_kmeans_step``).

    Semantics (engine-portable by construction, so an unrolled-CTE SQL
    oracle can replay it bit-for-bit):

    - seeds = the ``k`` stored vectors with the smallest ids, quantized
      to ``round(x·scale)`` BIGINTs (deterministic, no RNG);
    - assignment = integer squared-L2 argmin, ties to the lower centroid
      id (map-only: broadcast centroids, codegen'd distance fold);
    - update   = per-component ``floor(qsum/n + 0.5)`` in quantized units
      (half-toward-+inf: ``-2.5 → -2``, unlike java.math HALF_UP's
      ties-away-from-zero — the exact FLOOR formula is the contract and
      the DuckDB oracle replays it verbatim; ``qsum`` and ``n`` are
      exactly representable doubles, and IEEE-754 division is exactly
      rounded, so the quotient — hence the floor — is bit-identical in
      the JVM, Python, and DuckDB);
    - empty cells carry their previous centroid forward unchanged;
    - convergence metric = per-centroid L1 movement in quantized units
      (exact integers; ``movement == 0`` for every centroid ⇔ fixpoint).

    Scale shape: each iteration is ONE distributed pass — broadcast k·d
    quantized centroids, map-only argmin, one centroid-keyed aggregate
    producing k·d (count, qsum) rows which are collected to the driver.
    That collect is bounded by k·d (NOT the data) — the same
    driver-resident-centroids contract as Spark MLlib's KMeans — and it
    truncates the iteration's lineage, so 100 iterations at 100 TB cost
    100 scans, not an exponentially deep plan.

    Returns ``(centroids, assigned, movement)``:
    ``centroids`` — list of (cid, [qc…]) after the final update;
    ``assigned`` — DataFrame (id_col, centroid) vs the FINAL centroids;
    ``movement`` — {cid: L1 movement of the LAST update, exact int}.

    ``history`` (optional caller-supplied list) receives one entry per
    executed iteration: ``(iteration, total L1 movement, seconds)`` —
    the iterations-to-stability evidence. ``stop_when_stable`` exits the
    loop early once an update moves no centroid (exact fixpoint; every
    later iteration would be identical).

    ``update_mode`` selects HOW the per-iteration (centroid, pos) →
    (count, qsum) aggregate is computed — the numbers are bit-identical
    either way (pinned by ``tests/test_ann.py`` parity):

    - ``"portable"`` (what the SQL oracle replays literally; oracle
      plumbing, NOT the at-scale plan — at 200k×1536 its N·d exploded
      frame needed ~90 GB of driver-adjacent heap): posexplode the
      quantized components once, then per iteration join the assignment
      back by id and groupBy — an N·d-row shuffle per iteration.
    - ``"mapside"`` (default — the production path at scale): one
      ``mapInPandas`` pass over the Spark-pre-quantized vectors computes
      the exact-integer argmin AND the per-partition partial sums in the
      same pass (``_kmeans_mapside_partials``); the shuffle per iteration
      is k·d·num_partitions rows, independent of N — the map-side
      combine MLlib's own KMeans uses.
    """
    import time as _time

    if update_mode not in ("portable", "mapside"):
        raise ValueError(f"update_mode must be portable|mapside, got {update_mode!r}")
    spark = df.sparkSession
    _quant = F.transform(
        vec_col, lambda x: F.round(x.cast("double") * scale).cast("long")
    )
    if update_mode == "portable":
        qcomp = df.select(
            id_col, F.posexplode(_quant).alias("pos", "qv")
        ).localCheckpoint()
    else:
        qvecs = df.select(_quant.alias("_qv")).localCheckpoint()

    seeds = (
        df.orderBy(F.col(id_col).asc())
        .limit(k)
        .select(
            id_col,
            F.transform(vec_col, lambda x: F.round(x.cast("double") * scale).cast("long")).alias("_qc"),
        )
        .collect()
    )
    cents = [(int(r[id_col]), [int(x) for x in r["_qc"]]) for r in seeds]
    cents.sort()
    movement: dict[int, int] = {cid: 0 for cid, _ in cents}

    def _assign(current) -> DataFrame:
        cents_df = local_df(spark, 
            [(cid, qc) for cid, qc in current], "centroid bigint, cvec array<bigint>"
        )
        return assign_cells_quantized(
            df, cents_df, id_col=id_col, vec_col=vec_col, scale=scale, pre_quantized=True
        ).select(id_col, "centroid")

    for it in range(iters):
        t0 = _time.perf_counter()
        if update_mode == "portable":
            agg = (
                _assign(cents)
                .join(qcomp, id_col)
                .groupBy("centroid", "pos")
                .agg(F.count("*").alias("n"), F.sum("qv").alias("qsum"))
                .collect()
            )
        else:
            agg = (
                _kmeans_mapside_partials(qvecs, cents)
                .groupBy("centroid", "pos")
                .agg(F.sum("n").alias("n"), F.sum("qsum").alias("qsum"))
                .collect()
            )
        upd: dict[int, dict[int, int]] = {}
        for r in agg:
            # floor(qsum/n + 0.5) on exact doubles — see docstring
            upd.setdefault(int(r["centroid"]), {})[int(r["pos"])] = int(
                math.floor(int(r["qsum"]) / int(r["n"]) + 0.5)
            )
        nxt = []
        movement = {}
        for cid, qc in cents:
            new_qc = [upd[cid][j] for j in range(len(qc))] if cid in upd else list(qc)
            movement[cid] = sum(abs(a - b) for a, b in zip(new_qc, qc))
            nxt.append((cid, new_qc))
        cents = nxt
        if history is not None:
            history.append(
                (it + 1, sum(movement.values()), round(_time.perf_counter() - t0, 2))
            )
        if stop_when_stable and all(m == 0 for m in movement.values()):
            break

    return cents, _assign(cents), movement


class OpqIvfPqIndex:
    """OPQ + residual IVF-PQ composed — FAISS's ``OPQm,IVFc,PQm`` recipe:
    a learned orthogonal rotation decorrelates the subspaces FIRST, then
    the rotated space gets the coarse quantizer and residual codebooks.
    Rotation preserves norms and inner products, so cosine/L2 rankings in
    rotated space equal those in the original space — the rotation only
    changes how well the product codebooks fit (Ge et al. CVPR 2013 §5
    train OPQ independently of the coarse quantizer; we do the same).

    Composition, not reimplementation: the inner index IS an
    ``IvfPqResidualIndex`` living entirely in rotated space; build/encode/
    probe rotate at the boundary and delegate, so the probe stays the
    integer-LUT ADC scan the SQL oracle already replays bit-for-bit.
    """

    def __init__(self, rotation: np.ndarray, inner: IvfPqResidualIndex):
        self.rotation = rotation
        self.inner = inner

    def _rotate_df(self, df: DataFrame) -> DataFrame:
        import pandas as pd
        from pyspark.sql.types import ArrayType, DoubleType, StructField, StructType

        rot = self.rotation
        id_col, vec_col = self.inner.id_col, self.inner.vec_col
        out_schema = StructType(
            [df.schema[id_col], StructField(vec_col, ArrayType(DoubleType()), False)]
        )

        def rr(batches):
            for pdf in batches:
                if pdf.empty:
                    continue
                v = PqIndex._normalize(np.asarray(pdf[vec_col].tolist(), dtype=np.float64))
                yield pd.DataFrame({id_col: pdf[id_col], vec_col: list(v @ rot)})

        return df.select(id_col, vec_col).mapInPandas(rr, schema=out_schema)

    @classmethod
    def build(
        cls,
        df: DataFrame,
        n_centroids: int = 8,
        m: int = 8,
        ksub: int = 16,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        sample_rows: int = 2048,
        seed: int = 0,
        iters: int = 10,
        opq_iters: int = 8,
    ) -> "OpqIvfPqIndex":
        x = PqIndex._normalize(_train_sample(df, id_col, vec_col, sample_rows))
        dim = x.shape[1]
        r = np.eye(dim)
        for _ in range(opq_iters):
            xr = x @ r
            books = _lloyd_codebooks(xr, m, ksub, seed, iters)
            recon = OpqIndex._reconstruct(xr, books)
            u, _, vt = np.linalg.svd(x.T @ recon)
            r = u @ vt
        shell = cls(r, IvfPqResidualIndex(np.empty((0, dim)), np.empty((m, ksub, dim // m)), id_col, vec_col))
        inner = IvfPqResidualIndex.build(
            shell._rotate_df(df),
            n_centroids=n_centroids,
            m=m,
            ksub=ksub,
            id_col=id_col,
            vec_col=vec_col,
            sample_rows=sample_rows,
            seed=seed,
            iters=iters,
        )
        return cls(r, inner)

    def _rotate_query(self, query_vec) -> np.ndarray:
        q = PqIndex._normalize(np.asarray(query_vec, dtype=np.float64))
        return q @ self.rotation

    def encode(self, df: DataFrame) -> DataFrame:
        return self.inner.encode(self._rotate_df(df))

    def probe_cells(self, query_vec, nprobe: int) -> list[int]:
        return self.inner.probe_cells(self._rotate_query(query_vec), nprobe)

    def luts_int(self, query_vec, cells: list[int]):
        return self.inner.luts_int(self._rotate_query(query_vec), cells)

    def probe(
        self, encoded: DataFrame, query_vec, k: int = 10, nprobe: int = 2
    ) -> DataFrame:
        return self.inner.probe(encoded, self._rotate_query(query_vec), k=k, nprobe=nprobe)


def binary_signature(vec_col, dim: int):
    """Sign-bit binary quantization (the 1-bit compression modern vector
    stores ship as "BQ"): two 32-bit words ``(sig_lo, sig_hi)`` with bit
    ``i`` set iff coordinate ``i`` > 0. Two words, not one 64-bit value:
    ``2^63`` would overflow BIGINT in the SQL oracle; 32-bit halves stay
    integer-exact in both engines. Codegen'd HOF fold — no UDF, no
    shuffle."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col

    def word(lo: int, hi: int):
        # pow(2, i) is float-exact for i < 53 (shiftleft's PySpark wrapper
        # only takes a literal shift amount, not a per-element column)
        return F.aggregate(
            F.transform(
                F.sequence(F.lit(lo), F.lit(hi - 1)),
                lambda i: F.when(
                    F.element_at(v, i + 1) > 0,
                    F.pow(F.lit(2.0), (i - lo).cast("double")).cast("long"),
                ).otherwise(F.lit(0).cast("long")),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    half = min(32, dim)
    return word(0, half), word(half, dim) if dim > half else F.lit(0).cast("long")


def binary_hamming_topk(
    index_df: DataFrame,
    query_vec,
    k: int = 10,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Hamming top-k over sign-bit signatures: 64 dims collapse to 8
    bytes/vector (32× smaller than float32), distance is two XOR +
    popcount instructions — the cheapest possible first-stage scan. Ties
    break by id ascending. At 100 TB the signature column is what you
    scan; the float vectors page in only for the re-rank shortlist
    (see the recall-gate query)."""
    lo, hi = binary_signature(vec_col, dim)
    qlo = sum((1 << i) for i in range(min(32, dim)) if query_vec[i] > 0)
    qhi = sum((1 << (i - 32)) for i in range(32, dim) if query_vec[i] > 0)
    ham = (
        F.bit_count(lo.bitwiseXOR(F.lit(qlo).cast("long")))
        + F.bit_count(hi.bitwiseXOR(F.lit(qhi).cast("long")))
    ).cast("long")
    return (
        index_df.select(F.col(id_col), ham.alias("hamming"))
        .orderBy(F.col("hamming").asc(), F.col(id_col).asc())
        .limit(k)
    )


def _sq8_spark_min_fold(m: "np.ndarray") -> "np.ndarray":
    """Columnwise min under Spark's ordering: NaN ranks above +inf, so it
    never wins a min unless the whole column is NaN (the F.min-skips-NaN
    parity rule the numpy train paths share — ADVICE r12)."""
    isnan = np.isnan(m)
    out = np.where(isnan, np.inf, m).min(axis=0)
    return np.where(isnan.all(axis=0), np.nan, out)


def _sq8_scaler_from_minmax(mn, mx) -> tuple[list[float], list[float]]:
    """The shared driver-side scaler post-processing: delta=(max-min)/255,
    constant dims delta=1 — identical across the expr, numpy and fused
    train paths (min/max are exact in any association, so all three are
    bit-identical by construction)."""
    mins = [float(v) for v in mn]
    deltas = [
        ((float(b) - float(a)) / 255.0) if b > a else 1.0
        for a, b in zip(mn, mx)
    ]
    return mins, deltas


def _sq8_train_cell_counts(
    assigned: DataFrame, vec_col: str, n_cells: int
) -> tuple[list[float], list[float], list[int]]:
    """FUSED scaler train + layout tripwire input (r18, guide §1.2): ONE
    Arrow pass over the house-assigned frame computes the per-dimension
    (min, max) — bit-identical to ``sq8_train`` in either impl — AND the
    per-centroid occupancy counts the degenerate-layout tripwire
    thresholds. Replaces two separate jobs per build (the MLlib
    ``model.transform`` + aggregate behind ``cell_stats`` and the
    ``sq8_train`` aggregate). Empty input returns ([], [], zeros) —
    matching ``sq8_train``'s ([], []) on empty."""
    def part_stats(batches):
        import pandas as pd

        mn = mx = None
        cnt = np.zeros(n_cells, dtype=np.int64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            pmn, pmx = _sq8_spark_min_fold(m), m.max(axis=0)
            mn = pmn if mn is None else _sq8_spark_min_fold(np.vstack([mn, pmn]))
            mx = pmx if mx is None else np.maximum(mx, pmx)
            cnt += np.bincount(
                pdf["centroid"].to_numpy().astype(np.int64), minlength=n_cells
            )
        if mn is not None:
            yield pd.DataFrame(
                {"mn": [mn.tolist()], "mx": [mx.tolist()], "cnt": [cnt.tolist()]}
            )

    parts = (
        assigned.select(vec_col, "centroid")
        .mapInPandas(
            part_stats, schema="mn array<double>, mx array<double>, cnt array<long>"
        )
        .collect()
    )
    if not parts:
        return [], [], [0] * n_cells
    # collect() surfaces a NaN array element as None — cast back to
    # float64 (None -> NaN) before folding
    mn = _sq8_spark_min_fold(np.array([r["mn"] for r in parts], dtype=np.float64))
    mx = np.max(np.array([r["mx"] for r in parts], dtype=np.float64), axis=0)
    counts = np.sum([r["cnt"] for r in parts], axis=0, dtype=np.int64)
    mins, deltas = _sq8_scaler_from_minmax(mn, mx)
    return mins, deltas, [int(c) for c in counts]


def sq8_train(
    df: DataFrame, vec_col: str = "embedding", impl: str = "expr"
) -> tuple[list[float], list[float]]:
    """Per-dimension (min, delta) for 8-bit scalar quantization (the
    FAISS ``SQ8`` tier): delta = (max-min)/255, constant dims get
    delta=1 so their code is exactly 0. Training is ONE aggregate —
    fully analytic, no RNG, no iteration — which is what lets the whole
    SQ8 tier (train + encode + score) be replayed end-to-end by a SQL
    oracle, unlike the k-means-built tiers whose build is opaque. The
    collect is dim-bounded (one row per dimension).

    ``impl="expr"`` (default, oracle-parity form) aggregates over a
    posexplode — N·dim rows through a dim-keyed partial aggregate; fine
    at gate scale, but at 1M×1536 that is 1.5B exploded rows.
    ``impl="numpy"`` computes per-PARTITION min/max vectors in one Arrow
    pass (``mapInPandas`` emitting one 2×dim row per partition) and
    folds them driver-side — bit-identical output (min/max are exact in
    any association) with the explode and the shuffle gone; the at-scale
    train for the same reason the scoring paths have numpy twins.

    NaN parity (ADVICE r12): Spark orders NaN GREATER than every other
    double, so ``F.min`` skips NaN (returns the smallest real value;
    NaN only if the whole column is NaN) while ``F.max`` returns NaN
    whenever one is present. numpy's plain min/max propagate NaN to
    BOTH sides, which would silently break the expr/numpy parity
    contract on dirty vectors — so the numpy fold reduces min under
    the same NaN-as-greater-than-all ordering (``_spark_min_fold``;
    plain max already matches Spark's propagate-on-max)."""
    if impl == "numpy":
        _spark_min_fold = _sq8_spark_min_fold

        def part_minmax(batches):
            import pandas as pd

            mn = mx = None
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                m = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
                pmn, pmx = _spark_min_fold(m), m.max(axis=0)
                mn = pmn if mn is None else _spark_min_fold(np.vstack([mn, pmn]))
                mx = pmx if mx is None else np.maximum(mx, pmx)
            if mn is not None:
                yield pd.DataFrame({"mn": [mn.tolist()], "mx": [mx.tolist()]})

        parts = (
            df.select(vec_col)
            .mapInPandas(
                part_minmax, schema="mn array<double>, mx array<double>"
            )
            .collect()
        )
        if not parts:
            return [], []  # empty input: match the expr path's ([], [])
        # collect() surfaces a NaN array element as None — cast back to
        # float64 (None -> NaN) before folding
        mn = _spark_min_fold(np.array([r["mn"] for r in parts], dtype=np.float64))
        mx = np.max(np.array([r["mx"] for r in parts], dtype=np.float64), axis=0)
        return _sq8_scaler_from_minmax(mn, mx)
    rows = (
        df.select(F.posexplode(F.col(vec_col)).alias("d", "x"))
        .groupBy("d")
        .agg(
            F.min(F.col("x").cast("double")).alias("mn"),
            F.max(F.col("x").cast("double")).alias("mx"),
        )
        .orderBy("d")
        .collect()
    )
    return _sq8_scaler_from_minmax([r["mn"] for r in rows], [r["mx"] for r in rows])


def sq8_encode(
    df: DataFrame,
    mins: list[float],
    deltas: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """8-bit codes: c_d = clamp(floor((x_d - min_d)/delta_d + 0.5), 0, 255)
    at far higher per-dim fidelity than PQ's 16-byte whole-vector codes
    (sub-1% quantization error per dim vs centroid error). The
    floor(z + 0.5) form (not round()) is the engine-portable half-up
    rule shared with kmeans_lloyd's update. Map-only; pure zip_with.

    Storage: the column is ``array<smallint>`` (Spark has no unsigned
    byte; 0..255 overflows tinyint) — 2 B/dim logical, and parquet's
    bit-packed/RLE encoding of the ≤8-bit values lands at ~1 B/dim on
    disk, the ~4× cut vs float32 that makes the codes table the thing
    you scan."""
    mn = F.array(*[F.lit(float(v)) for v in mins])
    dl = F.array(*[F.lit(float(v)) for v in deltas])
    centered = F.zip_with(
        F.col(vec_col), mn, lambda x, m: x.cast("double") - m
    )
    codes = F.zip_with(
        centered,
        dl,
        lambda d, s: F.least(
            F.lit(255).cast("long"),
            F.greatest(F.lit(0).cast("long"), F.floor(d / s + F.lit(0.5))),
        ),
    )
    return df.select(
        F.col(id_col), codes.cast("array<smallint>").alias("sq8_codes")
    )


def sq8_topk(
    codes_df: DataFrame,
    query_vec,
    deltas: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    scale: int = 1_000_000_000,
    impl: str = "expr",
) -> DataFrame:
    """Integer ADC over SQ8 codes: dot(x̂, q) = Σ min_d·q_d (constant —
    rank-irrelevant, dropped) + Σ c_d·(delta_d·q_d); the per-dim weights
    w_d = floor(delta_d·q_d·scale + 0.5) are int64 literals, so the
    whole scan is Σ c_d·w_d integer arithmetic — exact in any engine,
    no float fold order to diverge. Codes ≤ 255, |w| ≤ ~|q|·Δ·10⁹,
    dim ≤ 4k: comfortably inside int64. Ties break by id.
    ``TakeOrderedAndProject`` keeps the k-heap per task — the codes
    table is the ONLY thing scanned (the float vectors never load).

    ``impl``: ``"expr"`` (default) scores with the zip_with/aggregate HOF
    — SQL-oracle-parity form, fine to a few hundred dims; ``"numpy"``
    does the same integer dot as one Arrow-batched matmul per partition
    plus a per-partition k-heap (``mapInPandas`` emitting ≤k rows each)
    — the at-scale path at ada-002 dimensionality, bit-identical scores
    (both are exact int64 arithmetic, pinned by test)."""
    w = [int(np.floor(float(q) * d * scale + 0.5)) for q, d in zip(query_vec, deltas)]
    if impl == "numpy":
        wv = np.asarray(w, dtype=np.int64)
        kk = k

        def part_topk(batches):
            import pandas as pd

            best: pd.DataFrame | None = None
            for pdf in batches:
                if len(pdf) == 0:
                    # Arrow batch boundaries can emit empty batches;
                    # np.vstack([]) raises (ADVICE r11)
                    continue
                c = np.vstack(pdf["sq8_codes"].to_numpy()).astype(np.int64)
                s = c @ wv
                cur = pd.DataFrame({id_col: pdf[id_col], "score_int": s})
                best = cur if best is None else pd.concat((best, cur))
                best = best.sort_values(
                    ["score_int", id_col], ascending=[False, True]
                ).head(kk)
            if best is not None:
                yield best

        partial = codes_df.select(id_col, "sq8_codes").mapInPandas(
            part_topk, schema=f"{id_col} long, score_int long"
        )
        return partial.orderBy(
            F.col("score_int").desc(), F.col(id_col).asc()
        ).limit(k)
    warr = F.array(*[F.lit(v).cast("long") for v in w])
    score = F.aggregate(
        F.zip_with(F.col("sq8_codes"), warr, lambda c, wv_: c * wv_),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    return (
        codes_df.select(F.col(id_col), score.alias("score_int"))
        .orderBy(F.col("score_int").desc(), F.col(id_col).asc())
        .limit(k)
    )


def ivf_sq8_topk(
    codes_df: DataFrame,
    probe_cells,
    query_vec,
    deltas: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    centroid_col: str = "centroid",
    scale: int = 1_000_000_000,
    impl: str = "expr",
) -> DataFrame:
    """IVF-SQ8 (the FAISS ``IVFx,SQ8`` composite): coarse-quantizer cell
    pruning over a codes table — the two scale levers stacked. The codes
    carry their cell id; the probe filters to ``probe_cells`` and runs
    the exact integer dot ADC of ``sq8_topk`` over ONLY those cells.
    When ``codes_df`` reads a ``partitionBy(centroid)`` layout the
    ``isin`` filter is file-level partition pruning — probed bytes
    scale with nprobe/k of (already 4×-compressed) codes, and the float
    vectors never load at all. Both stages are analytic (Lloyd quantizer
    + per-dim min/delta), so build + train + encode + prune + score all
    replay inside one SQL oracle — the only fully-hash-gated composite
    index tier (the k-means-built IVF-PQ rows carve the build out as
    persisted state)."""
    cells = [int(c) for c in probe_cells]
    if not cells:
        # an empty isin would silently return zero rows — indistinguishable
        # from "no matches"; a probe with no cells is a caller bug
        raise ValueError("ivf_sq8_topk needs at least one probe cell")
    pruned = codes_df.where(F.col(centroid_col).isin(cells))
    return sq8_topk(
        pruned.select(id_col, "sq8_codes"),
        query_vec,
        deltas,
        k=k,
        id_col=id_col,
        scale=scale,
        impl=impl,
    )


def sq8_rerank_topk(
    codes_df: DataFrame,
    vectors_df: DataFrame,
    query_vec,
    deltas: list[float],
    k: int = 10,
    shortlist: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    metric: str = "dotproduct",
    round_to: int | None = 6,
    impl: str = "expr",
) -> DataFrame:
    """Quantized-shortlist → exact re-rank: THE production serving shape
    (FAISS two-stage search; the SQ8 twin of ``pq_topk_rerank``). Stage 1
    scans ONLY the 4×-compressed codes table with the integer ADC and
    keeps a ``shortlist`` of ids; stage 2 pages in just those
    ``shortlist`` float vectors (broadcast semi-join — the big vectors
    table never shuffles) and ranks them exactly. Final scores are the
    EXACT metric — quantization error can only cost recall (a true
    neighbor missing the shortlist), never corrupt a returned score; with
    a covering shortlist the result equals the full exact scan
    bit-for-bit (pinned by test and by the registry oracle, which
    replays shortlist AND re-rank)."""
    short = sq8_topk(
        codes_df, query_vec, deltas, k=shortlist, id_col=id_col, impl=impl
    ).select(id_col)
    cand = vectors_df.join(F.broadcast(short), id_col)
    return topk(
        cand,
        query_vec,
        k=k,
        metric=metric,
        id_col=id_col,
        vec_col=vec_col,
        round_to=round_to,
    )


def ivf_sq8_rerank_topk(
    codes_df: DataFrame,
    vectors_df: DataFrame,
    probe_cells,
    query_vec,
    deltas: list[float],
    k: int = 10,
    shortlist: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_col: str = "centroid",
    metric: str = "dotproduct",
    round_to: int | None = 6,
    impl: str = "expr",
) -> DataFrame:
    """The full FAISS-style production serving stack in one call
    (``IVFx,SQ8`` + refine): (1) PRUNE — file-level partition filtering
    to the ``probe_cells`` of a ``partitionBy(centroid)`` codes layout;
    (2) SHORTLIST — integer-ADC top-``shortlist`` over ONLY those cells'
    4×-compressed codes (``sq8_topk``; the float vectors never scan);
    (3) REFINE — exact re-rank of just the shortlist's float vectors via
    broadcast semi-join (``sq8_rerank_topk``; the big table never
    shuffles). Final scores are the EXACT metric, so the two
    approximations (cell pruning, quantization) can only cost recall —
    never corrupt a returned score. This is what a 100 TB query actually
    runs: probed bytes = (nprobe/k) of the codes table, plus
    ``shortlist`` float point-reads. Every stage is analytic (Lloyd
    cells + per-dim min/delta + exact dot), so the whole pipeline
    replays inside one SQL oracle, like its component tiers."""
    cells = [int(c) for c in probe_cells]
    if not cells:
        # an empty isin would silently return zero rows (see ivf_sq8_topk)
        raise ValueError("ivf_sq8_rerank_topk needs at least one probe cell")
    pruned = codes_df.where(F.col(centroid_col).isin(cells))
    return sq8_rerank_topk(
        pruned.select(id_col, "sq8_codes"),
        vectors_df,
        query_vec,
        deltas,
        k=k,
        shortlist=shortlist,
        id_col=id_col,
        vec_col=vec_col,
        metric=metric,
        round_to=round_to,
        impl=impl,
    )


def ivf_sq8_batched_topk(
    codes_df: DataFrame,
    queries: list,
    probe_map: dict,
    deltas: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    centroid_col: str = "centroid",
    scale: int = 1_000_000_000,
    impl: str = "expr",
) -> DataFrame:
    """Batched IVF-SQ8 probe: top-k for MANY queries in ONE scan over
    the union of their probed cells (the SQ8 twin of
    ``IvfIndex.probe_batched`` — per-query rescans of shared cells are
    what a 1000-query serving batch can't afford). ``queries`` is
    ``[(query_id, vector)]``; ``probe_map`` maps each query_id to its
    probed cell ids (computed driver-side against the in-memory
    centroids, as the single-query path does).

    The per-query integer weight LUTs w_d = ⌊q_d·Δ_d·scale+½⌋ (|Q|·dim
    int64s) broadcast with the (query, cell) probe map; each code row is
    scored only against the queries that probed ITS cell, with the same
    exact int64 zip_with fold as ``sq8_topk`` — so per-query results
    equal |Q| separate ``ivf_sq8_topk`` calls bit-for-bit (pinned by
    test). Ranking is one shuffle keyed by query_id, bounded per query
    by its probed-cell rows. The codes table is scanned ONCE, pruned to
    the union of probed cells (file-level PartitionFilters on a
    ``partitionBy(centroid)`` layout); float vectors never load.

    ``impl``: ``"expr"`` (default, SQL-oracle-parity form) scores every
    (row, probing query) pair with the zip_with HOF; ``"numpy"`` groups
    each Arrow batch by cell and scores ALL of that cell's probing
    queries in ONE int64 matmul (C @ Wᵀ) with a per-(partition, query)
    k-heap emitting ≤ k rows each — the at-scale path at ada-002
    dimensionality (the HOF fold re-parses the weight array per pair;
    the matmul amortizes the batch across queries). Bit-identical
    scores (exact int64 both ways, pinned by test)."""
    from pyspark.sql import Window

    # Per-query cells are DEDUPED here (ADVICE r13): a repeated cell id in
    # probe_map would otherwise score the same (query, row) pair once per
    # repeat — duplicate rows in the expr join and duplicate qid entries in
    # the numpy cell grouping — letting one vec_id fill multiple top-k
    # slots. The single-query path gets this for free from ``isin``.
    probe_rows = [
        (int(qid), c)
        for qid, cells in probe_map.items()
        for c in sorted({int(c) for c in cells})
    ]
    if not probe_rows:
        raise ValueError("ivf_sq8_batched_topk needs at least one probe cell")
    spark = codes_df.sparkSession
    wvecs = {
        int(qid): [
            int(np.floor(float(q) * d * scale + 0.5)) for q, d in zip(vec, deltas)
        ]
        for qid, vec in queries
    }
    cells = sorted({c for _, c in probe_rows})
    subset = codes_df.where(F.col(centroid_col).isin(cells))
    if impl == "numpy":
        cell_qids: dict[int, list[int]] = {}
        for qid, c in probe_rows:  # deduped above — one qid per (cell, query)
            cell_qids.setdefault(c, []).append(qid)
        wmat = {q: np.asarray(w, dtype=np.int64) for q, w in wvecs.items()}
        kk = k

        def part_topk(batches):
            import pandas as pd

            # per-(query) heap across the partition's batches
            best: dict[int, pd.DataFrame] = {}
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                for cell, grp in pdf.groupby(centroid_col):
                    qids = cell_qids.get(int(cell))
                    if not qids:
                        continue
                    c = np.vstack(grp["sq8_codes"].to_numpy()).astype(np.int64)
                    wm = np.stack([wmat[q] for q in qids])  # (Qc, dim)
                    s = c @ wm.T  # (rows, Qc) exact int64
                    ids = grp[id_col].to_numpy()
                    for j, qid in enumerate(qids):
                        cur = pd.DataFrame({id_col: ids, "score_int": s[:, j]})
                        prev = best.get(qid)
                        cur = cur if prev is None else pd.concat((prev, cur))
                        best[qid] = cur.sort_values(
                            ["score_int", id_col], ascending=[False, True]
                        ).head(kk)
            for qid, b in best.items():
                b = b.copy()
                b.insert(0, "query_id", np.int64(qid))
                yield b

        partial = subset.select(id_col, "sq8_codes", centroid_col).mapInPandas(
            part_topk, schema=f"query_id long, {id_col} long, score_int long"
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("score_int").desc(), F.col(id_col).asc()
        )
        return (
            partial.withColumn("_rk", F.row_number().over(w))
            .where(F.col("_rk") <= k)
            .drop("_rk")
        )
    wdf = local_df(spark, 
        [(qid, w) for qid, w in wvecs.items()],
        "query_id long, _w array<bigint>",
    )
    probes = local_df(spark, 
        probe_rows, "query_id long, _pcell bigint"
    ).join(F.broadcast(wdf), "query_id")
    score = F.aggregate(
        F.zip_with(
            F.col("sq8_codes"), F.col("_w"), lambda c, wv: c.cast("long") * wv
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = subset.join(
        F.broadcast(probes), F.col(centroid_col) == F.col("_pcell")
    ).select("query_id", F.col(id_col), score.alias("score_int"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_int").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
        .drop("_rk")
    )


def ivf_sq8_batched_rerank_topk(
    codes_df: DataFrame,
    vectors_df: DataFrame,
    queries: list,
    probe_map: dict,
    deltas: list[float],
    k: int = 10,
    shortlist: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_col: str = "centroid",
    metric: str = "dotproduct",
    round_to: int | None = 6,
    scale: int = 1_000_000_000,
    impl: str = "expr",
) -> DataFrame:
    """The batched production serving shape end-to-end: ONE codes scan
    answers every query's quantized shortlist
    (``ivf_sq8_batched_topk``; ``impl`` selects its expr/numpy scoring
    kernel), then ONE pass over the float table
    re-ranks all shortlists exactly — the |Q|·``shortlist`` (query, id)
    pairs broadcast into the vectors table (it never shuffles), each
    candidate scores against its own query's float vector, and a
    query_id-keyed window keeps the top ``k``. Final scores are the
    EXACT metric, so cell pruning and quantization can only cost recall
    (per query), never corrupt a score. At 100 TB and a 1000-query
    batch: (union-of-probed-cells / k) of the compressed codes scanned
    once + |Q|·``shortlist`` float point-reads — vs |Q| full serving
    round-trips for the one-at-a-time path."""
    short = ivf_sq8_batched_topk(
        codes_df,
        queries,
        probe_map,
        deltas,
        k=shortlist,
        id_col=id_col,
        centroid_col=centroid_col,
        scale=scale,
        impl=impl,
    ).select("query_id", id_col)
    return batched_exact_rerank(
        vectors_df,
        short,
        queries,
        k=k,
        id_col=id_col,
        vec_col=vec_col,
        metric=metric,
        round_to=round_to,
    )


def batched_exact_rerank(
    vectors_df: DataFrame,
    short: DataFrame,
    queries: list,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    metric: str = "dotproduct",
    round_to: int | None = 6,
) -> DataFrame:
    """The batched serving stack's exact tail, shared by the SQ8 and
    IVF-PQ tiers: the |Q|·shortlist ``(query_id, id)`` pairs broadcast
    into the float table (it never shuffles), each candidate scores
    against its own query's float vector, and a query_id-keyed window
    keeps the top ``k``. Final scores are the EXACT metric, so cell
    pruning and quantization can only cost recall (per query), never
    corrupt a score."""
    from pyspark.sql import Window

    from whatsapp_vectordb_spark.functions.vector import (
        metric_ascending,
        similarity_score,
    )

    spark = vectors_df.sparkSession
    qdf = local_df(spark, 
        [(int(qid), [float(x) for x in vec]) for qid, vec in queries],
        "query_id long, _qv array<double>",
    )
    score = similarity_score(F.col(vec_col), F.col("_qv"), metric)
    if round_to is not None:
        score = F.round(score, round_to)
    scored = (
        vectors_df.join(F.broadcast(short), id_col)
        .join(F.broadcast(qdf), "query_id")
        .select("query_id", F.col(id_col), score.alias("score"))
        .where(F.col("score").isNotNull())
    )
    order = (
        F.col("score").asc() if metric_ascending(metric) else F.col("score").desc()
    )
    w = Window.partitionBy("query_id").orderBy(order, F.col(id_col).asc())
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
        .drop("_rk")
    )


def _parse_batch_seq(name: str) -> int:
    """Mutation-order sequence from a committed batch dir name
    (``<seq>_<uuid>``). Legacy uuid-only dirs (layouts written before
    the mutation verbs existed) order as 0 — alongside the base: they
    predate any delete commit, so a later tombstone correctly masks
    them, and a later re-add (higher seq) correctly survives.

    The writer's format is ``f"{seq:08d}_{uuid}"`` (``add_batch``) — a
    zero-padded AT-LEAST-8-digit decimal head followed by an underscore
    (``:08d`` grows past 8 digits without truncating, so seqs beyond
    10^8-1 still parse; an exactly-8 requirement would silently return
    0 for them, freezing ``_next_batch_seq`` and mis-ordering every
    later commit — review finding). A legacy uuid-only dir has NO
    underscore, so even one whose 32 hex chars are coincidentally all
    decimal digits cannot parse as an astronomically large seq (the
    ADVICE r15 hazard)."""
    if "_" not in name:
        return 0
    head = name.split("_", 1)[0]
    return int(head) if head.isdigit() and len(head) >= 8 else 0


def _committed_batches(path: str) -> list[str]:
    """Committed batch-dir names for a saved layout, sorted — with the
    DUPLICATE-SEQ tripwire (r16 verdict #1): two dirs parsing the same
    mutation seq ≥ 1 mean two writers allocated the same sequence
    number (``<seq>_<uuidA>`` and ``<seq>_<uuidB>`` are distinct rename
    targets, so both commits 'succeed') — the strictly-older tombstone
    mask cannot order equal seqs, and a silent union of both would
    serve an arbitrary merge of two writers' states. Every read of the
    commit log goes through here, so a violated single-writer contract
    fails LOUDLY at the next load/stats/fold instead of serving wrong
    rows. Seq 0 is exempt: legacy uuid-only dirs (pre-mutation-verb
    layouts) all parse as 0 by design and are append-only data."""
    return _batch_names_checked(
        os.path.join(path, "batches"), f"layout at {path!r}"
    )


def _next_batch_seq(path: str) -> int:
    """Next mutation sequence number for a saved layout — 1 + the max
    committed batch/delete seq. Callers hold the writer lease
    (``_writer_lease``) across this allocation AND the commit rename —
    the listdir-max+1 is only safe single-writer."""
    return 1 + max(
        (_parse_batch_seq(b) for b in _committed_batches(path)), default=0
    )


class ConcurrentWriterError(RuntimeError):
    """A second writer contended for (or already corrupted) a saved
    layout's single-writer mutation contract."""


# in-process lease registry: realpath -> [thread_ident, depth]. The
# lease FILE gives cross-process mutual exclusion (O_CREAT|O_EXCL);
# this registry gives (a) same-thread REENTRANCY — upsert→add_batch,
# maintenance_tick→save, rebuild→save all nest writer verbs — and
# (b) cross-thread exclusion inside one process, where the pid in the
# lease file cannot distinguish threads.
import threading as _threading

_LEASES: dict[str, list[int]] = {}
_LEASES_GUARD = _threading.Lock()


class _writer_lease:
    """THE single-writer contract, enforced (r16 verdict #1): every
    verb that commits to a saved layout — ``add_batch``/``upsert``/
    ``delete`` with a path, ``save``/fold, ``maintenance_tick``,
    ``rebuild_layout``, ``apply_cdc_events`` — acquires
    ``<path>/_writer.lock`` with ``O_CREAT|O_EXCL`` (atomic on POSIX
    and on the object-store semantics HDFS exposes for create-no-
    overwrite) before allocating a mutation seq, and releases it after
    the commit rename. A contending writer gets a loud
    ``ConcurrentWriterError`` naming the holder instead of silently
    double-allocating a seq (the failure ``_committed_batches`` would
    otherwise only catch after the corruption lands).

    STALE leases (a writer that died holding the lock): broken when
    the recorded pid is dead on this host, or the lease age exceeds
    ``ttl`` seconds (the cross-host backstop — a real cluster would
    carry a fencing token; the ttl mirrors Delta's lease-expiry
    posture). Breaking re-contends through O_EXCL, so two breakers
    still serialize. Reentrant per (process, thread): nested verbs on
    the same layout share the outer hold."""

    def __init__(
        self,
        path: str,
        verb: str,
        ttl: float = 3600.0,
        lock_path: str | None = None,
    ):
        self.path = path
        self.verb = verb
        self.ttl = ttl
        self.key = os.path.realpath(path)
        # lock_path: for artifacts whose data dir is itself REPLACED by a
        # whole-directory swap (VectorIndex's generation rename), the
        # lease must live BESIDE the dir, not inside it — a lock inside
        # would vanish mid-hold with the old generation
        self.lease = lock_path or os.path.join(path, "_writer.lock")

    def __enter__(self):
        import json as _json
        import time as _time

        me = _threading.get_ident()
        with _LEASES_GUARD:
            held = _LEASES.get(self.key)
            if held is not None:
                if held[0] == me:
                    held[1] += 1
                    return self
                raise ConcurrentWriterError(
                    f"{self.verb}: another thread of this process holds "
                    f"the writer lease on {self.path!r}"
                )
        os.makedirs(os.path.dirname(self.lease) or ".", exist_ok=True)
        for attempt in (0, 1):
            try:
                fd = os.open(self.lease, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            except FileExistsError:
                holder = self._read_holder()
                if attempt == 0 and self._is_stale(holder, _time.time()):
                    # break-and-retry re-contends through O_EXCL: of two
                    # concurrent breakers, exactly one wins the re-create
                    try:
                        os.unlink(self.lease)
                    except FileNotFoundError:
                        pass
                    continue
                raise ConcurrentWriterError(
                    f"{self.verb}: layout at {self.path!r} is held by "
                    f"another writer ({holder!r}); concurrent mutation "
                    "would double-allocate a commit seq — retry after the "
                    "holder finishes, or remove a stale _writer.lock"
                ) from None
            with os.fdopen(fd, "w") as f:
                _json.dump(
                    {
                        "pid": os.getpid(),
                        "host": os.uname().nodename,
                        "verb": self.verb,
                        "acquired_at": _time.time(),
                    },
                    f,
                )
            break
        with _LEASES_GUARD:
            _LEASES[self.key] = [me, 1]
        return self

    def _read_holder(self) -> dict:
        import json as _json

        try:
            with open(self.lease) as f:
                return _json.load(f)
        except (OSError, ValueError):
            # mid-write or already-broken lease: treat as anonymous —
            # the ttl (file mtime) still applies via _is_stale
            return {}

    def _is_stale(self, holder: dict, now: float) -> bool:
        if holder.get("host") == os.uname().nodename and isinstance(
            holder.get("pid"), int
        ):
            try:
                os.kill(holder["pid"], 0)
                return False  # holder alive on this host
            except ProcessLookupError:
                return True  # holder died without releasing
            except PermissionError:
                return False  # alive, different uid
        try:
            age = now - float(holder.get("acquired_at", "nan"))
            if age == age:  # not NaN
                return age > self.ttl
            return now - os.path.getmtime(self.lease) > self.ttl
        except OSError:
            return True  # lease vanished under us — re-contend

    def __exit__(self, *exc):
        with _LEASES_GUARD:
            held = _LEASES.get(self.key)
            if held is None or held[0] != _threading.get_ident():
                return False
            held[1] -= 1
            if held[1] > 0:
                return False
            del _LEASES[self.key]
        try:
            os.unlink(self.lease)
        except FileNotFoundError:
            pass
        return False


def _require_writable(idx, verb: str) -> None:
    """Mutation guard for TIME-TRAVEL handles: an index opened with
    ``load(as_of=N)`` is a read-only snapshot. Writing through it would
    be worse than confusing — ``save`` folds ``idx.codes`` (the
    snapshot's masked view) into the base layout and deletes every
    batch dir, silently DESTROYING all commits newer than the snapshot;
    ``upsert``/``delete`` would stamp tombstones computed against a
    stale view. Every mutating entry point calls this first."""
    if getattr(idx, "_as_of", None) is not None:
        raise RuntimeError(
            f"{verb}: this index is a read-only as_of={idx._as_of} "
            "snapshot (time-travel load); re-load the layout tip "
            "(load(path) with no as_of) to mutate it"
        )


def _layout_epoch(path: str) -> int:
    """Current FOLD EPOCH of a saved layout — the monotonically
    increasing counter ``meta.json`` carries (``fold_epoch``), bumped by
    every fold/full-rewrite save. Commit SEQS reset at each fold; the
    epoch never does, so an ``(epoch, seq)`` pair is a STABLE snapshot
    identifier across folds (the Delta/Iceberg monotonic-version rule —
    ADVICE r16). Pre-epoch layouts read as epoch 0."""
    import json as _json

    meta_path = os.path.join(path, "meta.json")
    if not os.path.exists(meta_path):
        raise FileNotFoundError(
            f"no saved layout at {path!r} (missing meta.json)"
        )
    with open(meta_path) as f:
        return int(_json.load(f).get("fold_epoch", 0))


def _retained_root(path: str) -> str:
    return os.path.join(path, "_retained")


def _retained_dir(path: str, epoch: int) -> str:
    return os.path.join(_retained_root(path), f"{epoch:08d}")


def _retained_epochs(path: str) -> list[int]:
    """Fold epochs with a retained pre-fold version on disk, ascending.
    ``_retained/<F>`` holds the state fold F DISPLACED — epoch F-1's
    meta, its commit log (``batches/``), and every base cell dir the
    fold rewrote or a full rewrite replaced (``fold.json`` records
    which shape)."""
    root = _retained_root(path)
    if not os.path.isdir(root):
        return []
    return sorted(
        int(d) for d in os.listdir(root) if d.isdigit() and len(d) == 8
    )


def _fold_info(path: str, epoch: int) -> dict:
    """``fold.json`` of one retained fold: ``{"full": bool, "created":
    [cells the fold introduced with no predecessor]}``. A retained dir
    without it is an interrupted retention move — unreadable, loudly."""
    import json as _json

    fp = os.path.join(_retained_dir(path, epoch), "fold.json")
    try:
        with open(fp) as f:
            return _json.load(f)
    except OSError:
        raise RuntimeError(
            f"retained snapshot {epoch} at {path!r} has no fold.json — "
            "an interrupted fold's partial retention; vacuum it"
        ) from None


def _batch_names_checked(bdir: str, where: str) -> list[str]:
    """Sorted committed batch-dir names under ``bdir`` with the
    duplicate-seq tripwire (see ``_committed_batches``)."""
    names = sorted(os.listdir(bdir)) if os.path.isdir(bdir) else []
    seen: dict[int, str] = {}
    for b in names:
        s = _parse_batch_seq(b)
        if s >= 1 and s in seen:
            raise ConcurrentWriterError(
                f"{where} holds two commits at mutation seq {s} "
                f"({seen[s]!r} and {b!r}) — a second writer violated "
                "the single-writer contract (the _writer.lock lease "
                "prevents this when every writer honors it); the layout "
                "cannot be ordered and must be repaired by removing the "
                "losing commit before any read or fold"
            )
        seen[s] = b
    return names


def _epoch_batch_dir(path: str, epoch: int, current: int) -> str:
    """The ``batches/`` directory holding epoch ``epoch``'s commit log:
    live for the current epoch, else inside the retained dir of the
    fold that CONSUMED it (fold ``epoch+1``)."""
    if epoch == current:
        return os.path.join(path, "batches")
    return os.path.join(_retained_dir(path, epoch + 1), "batches")


def _readable_epochs(path: str) -> list[int]:
    """Epochs ``load(as_of=(epoch, seq))`` can serve, ascending: the
    current epoch, plus every older epoch reachable through a CONTIGUOUS
    retained chain (reconstructing epoch e needs ``_retained/<f>`` for
    every fold f in (e, current] — a vacuumed gap ends the history)."""
    current = _layout_epoch(path)
    retained = set(_retained_epochs(path))
    out = [current]
    f = current
    while f in retained:
        out.append(f - 1)
        f -= 1
    return sorted(out)


def layout_snapshots(path: str) -> list[tuple[int, int]]:
    """Readable snapshot bounds for a saved serving layout, ascending:
    ``(fold_epoch, commit_seq)`` pairs — seq 0 is each epoch's base
    fold, and the pair form survives folds (seqs reset at every fold,
    epochs never do, so a remembered pair can never silently alias a
    different snapshot — ADVICE r16). The current epoch's pairs are
    always present; OLDER epochs appear when their pre-fold state is
    still retained (``_retained/<fold>`` — see ``vacuum_layout``). Any
    listed pair is a valid ``load(as_of=...)`` bound; the max pair is
    the tip. Pure driver-side directory listing — no Spark job. Raises
    on a path holding no layout (a typo would otherwise 'enumerate' a
    phantom base snapshot and only fail much later inside ``load``)."""
    current = _layout_epoch(path)
    pairs: list[tuple[int, int]] = []
    for e in _readable_epochs(path):
        bdir = _epoch_batch_dir(path, e, current)
        seqs = {0} | {
            _parse_batch_seq(b)
            for b in _batch_names_checked(bdir, f"epoch {e} of {path!r}")
        }
        pairs.extend((e, s) for s in sorted(seqs))
    return sorted(pairs)


def _check_as_of(
    path: str, as_of: int | tuple[int, int] | None
) -> tuple[int, int] | None:
    """Normalize + validate a time-travel bound against the commit log
    → ``(epoch, seq)`` (or None for the tip). A bare int is shorthand
    for the CURRENT epoch (the pre-retention API, unchanged); the pair
    form is the stable identifier ``layout_snapshots`` returns — safe
    to remember across folds, because a stale epoch resolves through
    the retained pre-fold versions instead of silently aliasing a
    same-numbered seq of the new epoch (ADVICE r16), and raises loudly
    once vacuum has dropped its chain. Seq bounds BETWEEN committed
    seqs are legal (a logical point in time — the Delta/Iceberg
    timestamp-bound analogue); a seq outside the epoch's [0, tip] is a
    caller error."""
    if as_of is None:
        return None
    current = _layout_epoch(path)
    if isinstance(as_of, int):
        e, s = current, as_of
    else:
        e, s = int(as_of[0]), int(as_of[1])
    if e > current or e < 0:
        raise ValueError(
            f"as_of epoch {e} does not exist: this layout is at fold "
            f"epoch {current}"
        )
    readable = _readable_epochs(path)
    if e not in readable:
        raise ValueError(
            f"as_of epoch {e} is no longer readable: its retained "
            f"pre-fold chain was vacuumed (readable epochs: {readable}; "
            "see vacuum_layout's retention)"
        )
    bdir = _epoch_batch_dir(path, e, current)
    tip = max(
        (
            _parse_batch_seq(b)
            for b in _batch_names_checked(bdir, f"epoch {e} of {path!r}")
        ),
        default=0,
    )
    if not 0 <= s <= tip:
        raise ValueError(
            f"as_of=(epoch {e}, seq {s}) is outside this layout's "
            f"epoch-{e} commit log [0, {tip}] — re-read "
            "layout_snapshots(path) for the readable bounds"
        )
    return (e, s)


def _snapshot_cell_sources(
    path: str, epoch: int
) -> dict[int, tuple[str, int]]:
    """Resolve epoch ``epoch``'s BASE cell set against the retained fold
    chain: for each centroid cell alive at that epoch, where its
    then-content lives NOW — ``("live", 0)`` for cells no later fold
    touched (still physically in the tip base — zero copies were ever
    made), or ``("ret", f)`` for the SMALLEST fold f > epoch that
    displaced it into ``_retained/<f>``. Pure driver-side walk over the
    fold metadata, newest→oldest: each fold's retained cells override
    later sources (they are the older content), a fold's ``created``
    cells drop out (they did not exist before it), and a ``full``
    rewrite resets the set to exactly its retained base. O(folds walked
    × cells) dict ops — no Spark job, no data reads."""
    current = _layout_epoch(path)

    def cells_in(root: str) -> set[int]:
        if not os.path.isdir(root):
            return set()
        return {
            int(d.split("=", 1)[1])
            for d in os.listdir(root)
            if d.startswith("centroid=")
        }

    sources: dict[int, tuple[str, int]] = {
        c: ("live", 0) for c in cells_in(os.path.join(path, "codes"))
    }
    for f in range(current, epoch, -1):
        info = _fold_info(path, f)
        ret_cells = cells_in(os.path.join(_retained_dir(path, f), "codes"))
        if info.get("full"):
            sources = {c: ("ret", f) for c in ret_cells}
            continue
        for c in info.get("created", []):
            sources.pop(int(c), None)
        for c in ret_cells:
            sources[c] = ("ret", f)
    return sources


def _snapshot_table(
    spark: SparkSession,
    path: str,
    sub: str,
    epoch: int,
    seq: int,
    sources: dict[int, tuple[str, int]],
) -> DataFrame | None:
    """One layout table (``codes``/``vectors``/``deletes``) as it stood
    at snapshot ``(epoch, seq)`` of an OLDER epoch — the retention read
    path (current-epoch snapshots use ``_layout_roots``, identical cost
    to a tip read). Base cells group by their resolved source dir (one
    scan of the live base + one per consulted retained fold, each under
    an ``isin`` partition filter — pruning intact, union width is the
    number of folds consulted, not the cell count); epoch-e mutation
    commits read from the retained ``batches/`` the fold at e+1
    consumed, bounded to ``seq`` exactly like a live time-travel read.
    Rows carry ``_seq`` for the caller's strictly-older mask."""
    from functools import reduce

    def has_parquet(root: str) -> bool:
        for _, _, files in os.walk(root):
            if any(f.endswith(".parquet") for f in files):
                return True
        return False

    parts: list[DataFrame] = []
    if sub != "deletes":
        groups: dict[tuple[str, int], list[int]] = {}
        for c, src in sources.items():
            groups.setdefault(src, []).append(c)
        for (kind, f), cells in sorted(groups.items()):
            root = (
                os.path.join(path, sub)
                if kind == "live"
                else os.path.join(_retained_dir(path, f), sub)
            )
            if not (os.path.isdir(root) and has_parquet(root)):
                if sub == "vectors":
                    return None  # this epoch's layout had no float store
                raise RuntimeError(
                    f"snapshot (epoch {epoch}) of {path!r}: resolved "
                    f"{sub} root {root!r} is missing — interrupted "
                    "retention; vacuum the broken fold"
                )
            parts.append(
                spark.read.parquet(root)
                .where(F.col("centroid").isin(sorted(cells)))
                .withColumn("_seq", F.lit(0).cast("long"))
            )
    bdir = _epoch_batch_dir(path, epoch, _layout_epoch(path))
    for b in _batch_names_checked(bdir, f"epoch {epoch} of {path!r}"):
        if _parse_batch_seq(b) > seq:
            continue
        root = os.path.join(bdir, b, sub)
        if os.path.isdir(root) and has_parquet(root):
            df = spark.read.parquet(root)
            if "_seq" not in df.columns:
                df = df.withColumn(
                    "_seq", F.lit(_parse_batch_seq(b)).cast("long")
                )
            parts.append(df)
    if not parts:
        return None
    return reduce(lambda a, b2: a.unionByName(b2), parts)


def vacuum_layout(path: str, keep_epochs: int = 2) -> dict:
    """Expire retained pre-fold versions — the storage-reclaim half of
    snapshot retention (Delta VACUUM / Iceberg expire_snapshots): keep
    the newest ``keep_epochs`` retained folds (i.e. the current epoch
    plus that many pre-fold snapshots stay readable), delete the rest.
    History is a contiguous chain (reconstructing epoch e needs every
    retained fold in (e, current]), so expiry always trims from the
    OLD end; a later ``load(as_of=(expired_epoch, s))`` raises loudly
    (``_check_as_of``) instead of serving a partial snapshot. Runs
    under the writer lease — a vacuum racing a fold could delete the
    version the fold is mid-publishing. Returns the removed and kept
    fold epochs."""
    import shutil

    if keep_epochs < 0:
        raise ValueError("keep_epochs must be >= 0")
    with _writer_lease(path, "vacuum_layout"):
        current = _layout_epoch(path)
        cut = current - keep_epochs
        removed = [f for f in _retained_epochs(path) if f <= cut]
        for f in removed:
            shutil.rmtree(_retained_dir(path, f), ignore_errors=True)
        return {"removed": removed, "kept": _retained_epochs(path)}


def verify_layout(path: str, spark: SparkSession | None = None) -> dict:
    """FSCK for a persisted serving layout — the read-only integrity
    audit an operator runs before trusting (or repairing) an index a
    crashed/raced writer may have left behind. Complements the loud
    in-line tripwires (duplicate-seq on every commit-log read, fold.json
    on every retained-chain resolve) with ONE verb that surfaces every
    violation at once instead of failing on the first:

    errors (layout serves wrong/no data until repaired):
      - missing/unparseable ``meta.json`` (interrupted save publish);
      - duplicate mutation seqs across commit dirs (a second writer —
        the corruption the ``_writer.lock`` lease exists to prevent);
      - a retained dir with no ``fold.json`` (interrupted retention
        move) or a retained epoch newer than the tip's.
    warnings (benign but worth reclaiming/watching):
      - orphaned ``_staging`` entries (crashed pre-commit writer —
        swept by the next mutation verb's ``_gc_staging``);
      - a stale ``_writer.lock`` (holder pid dead on this host, or
        older than the TTL backstop) — broken by the next acquirer;
      - seq gaps in the commit log (a writer that died after lease
        acquisition but before its commit rename; harmless — seqs
        order commits, they need not be dense);
      - a commit dir holding no parquet at all (legacy empty commit).

    Pure driver-side metadata walk — NO Spark job — so it is safe to run
    against a layout another process is actively serving (it takes no
    lease: a fold racing the walk can at worst produce a transient
    false positive, never corruption). Pass ``spark`` to ADD the deep
    data check: per-root codes↔vectors row-count parity (a commit whose
    co-located float store lost rows re-ranks incorrectly).

    Returns ``{"ok": bool, "errors": [...], "warnings": [...],
    "info": {...}}``; ``ok`` means zero errors (warnings allowed).
    """
    import json as _json
    import time as _time

    errors: list[str] = []
    warnings: list[str] = []
    info: dict = {"path": path}

    meta_path = os.path.join(path, "meta.json")
    try:
        with open(meta_path) as f:
            meta = _json.load(f)
        current = int(meta.get("fold_epoch", 0))
        info["fold_epoch"] = current
    except OSError:
        errors.append("missing meta.json — no committed layout (or an "
                      "interrupted save: old meta removed, new not yet "
                      "renamed in)")
        meta, current = {}, 0
    except ValueError:
        errors.append("meta.json is not valid JSON — torn publish")
        meta, current = {}, 0

    # commit log: duplicate seqs are an error; gaps only a warning
    bdir = os.path.join(path, "batches")
    names = sorted(os.listdir(bdir)) if os.path.isdir(bdir) else []
    seen: dict[int, str] = {}
    seqs: list[int] = []
    for b in names:
        s = _parse_batch_seq(b)
        if s >= 1 and s in seen:
            errors.append(
                f"duplicate mutation seq {s}: {seen[s]!r} and {b!r} — "
                "two writers committed at the same sequence; remove the "
                "losing commit before any read or fold"
            )
        seen[s] = b
        if s >= 1:
            seqs.append(s)
        has_parquet = any(
            f.endswith(".parquet")
            for _, _, files in os.walk(os.path.join(bdir, b))
            for f in files
        )
        if not has_parquet:
            warnings.append(f"commit dir {b!r} holds no parquet (legacy "
                            "empty commit) — skipped by reads")
    info["commits"] = len(names)
    missing = sorted(set(range(1, max(seqs, default=0) + 1)) - set(seqs))
    if missing:
        warnings.append(
            f"commit-log seq gaps {missing} — a writer died between "
            "seq allocation and its commit rename (harmless: seqs "
            "order commits, density is not required)"
        )

    # staging orphans
    stag = os.path.join(path, "_staging")
    orphans = sorted(os.listdir(stag)) if os.path.isdir(stag) else []
    info["staging_orphans"] = len(orphans)
    if orphans:
        warnings.append(
            f"{len(orphans)} orphaned _staging entr"
            f"{'y' if len(orphans) == 1 else 'ies'} (crashed pre-commit "
            "writer) — reclaimed by the next mutation verb"
        )

    # writer lease
    lease = os.path.join(path, "_writer.lock")
    if os.path.exists(lease):
        probe = _writer_lease(path, "verify_layout")
        holder = probe._read_holder()
        if probe._is_stale(holder, _time.time()):
            warnings.append(
                f"stale _writer.lock (holder {holder!r} dead or past "
                "TTL) — the next acquirer breaks it"
            )
        else:
            info["active_writer"] = holder

    # retention chain
    retained = _retained_epochs(path)
    info["retained_epochs"] = retained
    for e in retained:
        if e > current:
            errors.append(
                f"retained fold epoch {e} is newer than the tip epoch "
                f"{current} — meta.json regressed (torn publish?)"
            )
        if not os.path.exists(
            os.path.join(_retained_dir(path, e), "fold.json")
        ):
            errors.append(
                f"retained snapshot {e} has no fold.json — an "
                "interrupted fold's partial retention; vacuum it"
            )

    # deep check: per-root codes↔vectors row parity (only when both
    # stores exist for that root — vectors are optional per layout)
    if spark is not None and not errors:

        def count_rows(root: str) -> int | None:
            # a store dir holding zero parquet (every part file torn
            # out) cannot even infer a schema — that IS the finding
            if not any(
                f.endswith(".parquet")
                for _, _, files in os.walk(root)
                for f in files
            ):
                return None
            return spark.read.parquet(root).count()

        for seq, codes_root in IvfSq8Index._layout_roots(path, "codes"):
            vec_root = codes_root[: -len("codes")] + "vectors"
            if not os.path.isdir(vec_root):
                continue
            n_codes = count_rows(codes_root)
            n_vecs = count_rows(vec_root)
            if n_vecs is None:
                errors.append(
                    f"commit seq {seq}: co-located vectors dir holds no "
                    "parquet (torn float store) — re-rank through this "
                    "commit cannot serve"
                )
            elif n_codes != n_vecs:
                errors.append(
                    f"commit seq {seq}: codes has {n_codes} rows but "
                    f"co-located vectors has {n_vecs} — re-rank would "
                    "score a different row set than the code scan"
                )
        info["deep_checked"] = True

    return {"ok": not errors, "errors": errors, "warnings": warnings,
            "info": info}


def _load_layout_frames(spark, path: str, as_of, meta: dict):
    """Shared ``load`` body for both persisted tiers: normalize the
    time-travel bound and produce the (meta, codes, vectors, tombstone
    marks, normalized bound) the class constructor masks and wraps.
    Three read shapes, in cost order: tip (``as_of=None``) and
    CURRENT-epoch snapshots read the live layout through
    ``_layout_roots`` (a snapshot only DROPS union branches — 0.96× a
    tip read, measured r16); an OLDER epoch resolves through the
    retained fold chain (``_snapshot_cell_sources``/``_snapshot_table``
    — r16 verdict #2), including that epoch's OWN ``meta.json`` from
    the retained dir: a rebuild retrains the quantizers, so a pre-
    rebuild snapshot must score with the pre-rebuild scaler/codebooks,
    never the tip's."""
    import json as _json

    norm = _check_as_of(path, as_of)
    current = int(meta.get("fold_epoch", 0))
    if norm is not None and norm[0] < current:
        e, s = norm
        with open(
            os.path.join(_retained_dir(path, e + 1), "meta.json")
        ) as f:
            meta = _json.load(f)
        sources = _snapshot_cell_sources(path, e)
        codes = _snapshot_table(spark, path, "codes", e, s, sources)
        marks_raw = _snapshot_table(spark, path, "deletes", e, s, sources)
        marks = (
            marks_raw.groupBy(F.col(meta["id_col"]).alias("_del_id")).agg(
                F.max("_seq").alias("_del_seq")
            )
            if marks_raw is not None
            else None
        )
        vecs = _snapshot_table(spark, path, "vectors", e, s, sources)
    else:
        seq_bound = None if norm is None else norm[1]
        codes = IvfSq8Index._read_layout(spark, path, "codes", seq_bound)
        marks = IvfSq8Index._read_delete_marks(
            spark, path, meta["id_col"], seq_bound
        )
        vecs = IvfSq8Index._read_layout(spark, path, "vectors", seq_bound)
    return meta, codes, vecs, marks, norm


def maintenance_tick(
    idx_cls,
    spark: SparkSession,
    path: str,
    max_data_commits: int = 8,
    max_tombstone_commits: int = 4,
    keep_epochs: int | None = None,
) -> dict:
    """ONE maintenance-policy decision for a saved serving layout — the
    verb a background compactor loop runs per index per interval. Polls
    ``layout_mutation_stats`` (driver-side listing, no Spark job); if
    the accumulated mutation state crosses either threshold — data
    commits rivaling the base partition count (each is an extra union
    branch in every read plan) or tombstone commits growing the
    broadcast mask — it loads the layout TIP and runs ``save``-as-fold
    (the bounded O(touched-cells) compaction). Under both thresholds it
    does nothing: reads stay cheap and the tick costs one listdir.

    ``keep_epochs`` makes the compactor loop SELF-CONTAINED on storage:
    after a fold, retained pre-fold versions beyond the newest
    ``keep_epochs`` are vacuumed (``vacuum_layout``) in the same tick —
    the fold creates exactly one retained epoch per run, so without a
    budget a per-trigger compactor grows one version per trigger
    forever. ``None`` (default) retains everything: expiry stays a
    separate, explicit decision.

    Returns ``{"folded": bool, "before": stats, "after": stats}`` (plus
    ``"vacuum"`` when a budget was applied) so a scheduler can
    log/alert on it. The whole poll+fold runs under the writer lease
    (``_writer_lease``): this verb is explicitly the one a background
    compactor loop — a SECOND process beside the ingest writer — runs,
    so its single-writer posture must be enforced, not advisory (r16
    verdict #1); holding the lease across the stats poll also closes
    the poll→fold TOCTOU window."""
    with _writer_lease(path, "maintenance_tick"):
        before = layout_mutation_stats(path)
        folded = (
            before["data_commits"] > max_data_commits
            or before["tombstone_commits"] > max_tombstone_commits
        )
        if folded:
            idx_cls.load(spark, path).save(path)
        out = {
            "folded": folded,
            "before": before,
            # distinct dict on the declined path too — a scheduler that
            # annotates one must not silently corrupt the other
            "after": layout_mutation_stats(path) if folded else dict(before),
        }
        if folded and keep_epochs is not None:
            out["vacuum"] = vacuum_layout(path, keep_epochs=keep_epochs)
        return out


def rebuild_layout(idx_cls, spark: SparkSession, path: str, **build_kwargs):
    """DRIFT remediation — the maintenance escalation past folding: a
    fold (``save``/``maintenance_tick``) compacts the commit log but
    keeps the quantizers the index was BUILT with; after enough
    upserts the corpus walks away from them (SQ8 clamp rates rise,
    k-means cells unbalance, PQ residual distortion grows — the drift
    signals every ``add_batch`` docstring says to watch). This verb
    re-trains everything from the CURRENT visible corpus: load the tip,
    pin the visible float store once (one eager checkpoint — the build
    reads it several times: quantizer fit, scaler train, assign,
    encode), run the class's own ``build`` on it, and atomically
    replace the layout via the house staged commit (old meta removed
    first, new meta renames last — an interruption leaves the layout
    loudly unreadable, never new codes under a stale scaler).

    Requires a co-located float store (codes alone cannot re-train —
    same rule as exact re-rank). Cost is a full rebuild by definition —
    O(corpus) train+encode+write, the same bill as the original build —
    so the caller runs it on the drift signal, not on a timer.
    Visibility is untouched: the rebuilt layout holds exactly the rows
    the tip served (tombstones fold away physically in the process).
    Runs under the writer lease end-to-end — the tip it loads must not
    advance under the retrain, or the swap would silently drop the
    concurrent commits (r16 verdict #1)."""
    with _writer_lease(path, "rebuild_layout"):
        tip = idx_cls.load(spark, path)
        if tip.vectors is None:
            raise ValueError(
                "rebuild_layout requires a co-located float store "
                "(save(store_vectors=True)); codes cannot re-train a "
                "quantizer"
            )
        # geometry defaults come from the LAYOUT, not build()'s
        # signature: an index built with 64 cells rebuilt bare must get
        # 64 cells back, not the signature default — a silently shrunken
        # quantizer degrades recall with no error. Caller kwargs still
        # override (intentional re-shaping is the other use of this
        # verb).
        kw = {**tip._rebuild_defaults(), **build_kwargs}
        vecs = tip.vectors.select(tip.id_col, tip.vec_col).localCheckpoint(
            eager=True
        )
        fresh = idx_cls.build(
            vecs, id_col=tip.id_col, vec_col=tip.vec_col, **kw
        )
        return fresh.save(path, store_vectors=True)


def _index_delete(idx, ids, path: str | None) -> None:
    """Shared delete-by-id implementation for the persisted serving
    artifacts (IvfSq8Index / IvfPqIndex — one contract, see
    ``IvfSq8Index.delete``): pin the id set, commit it (with ``path``)
    as an atomic ``batches/<seq>_<uuid>/deletes`` rename, and mask the
    in-memory plans with one broadcast anti-join each."""
    import shutil
    import uuid

    _require_writable(idx, "delete")

    spark = idx.codes.sparkSession
    if not isinstance(ids, DataFrame):
        rows = [(i,) for i in ids]
        if not rows:
            return
        ids = local_df(spark, rows, [idx.id_col])
    # pin: the disk write and the in-memory anti-joins are separate
    # jobs — a nondeterministic ids plan could tombstone one set on
    # disk and mask another in memory
    ids = ids.select(idx.id_col).localCheckpoint(eager=True)
    if ids.isEmpty():
        return
    if path is not None:
        with _writer_lease(path, "delete"):
            IvfSq8Index._gc_staging(path)
            seq = _next_batch_seq(path)
            batch_id = f"{seq:08d}_{uuid.uuid4().hex}"
            stage = os.path.join(path, "_staging", batch_id)
            try:
                ids.withColumn("_seq", F.lit(seq).cast("long")).coalesce(
                    1
                ).write.mode("overwrite").parquet(
                    os.path.join(stage, "deletes")
                )
                bdir = os.path.join(path, "batches")
                os.makedirs(bdir, exist_ok=True)
                os.rename(stage, os.path.join(bdir, batch_id))
            except BaseException:
                shutil.rmtree(stage, ignore_errors=True)
                raise
    idx.codes = idx.codes.join(F.broadcast(ids), idx.id_col, "left_anti")
    if idx.vectors is not None:
        idx.vectors = idx.vectors.join(F.broadcast(ids), idx.id_col, "left_anti")
    # mirror bookkeeping (see _fold_touched): a committed delete on the
    # layout this object mirrors keeps the mirror; an in-memory-only or
    # foreign-path delete breaks it (save() then takes the full rewrite)
    idx._mirror_path = (
        path if getattr(idx, "_mirror_path", None) == path else None
    )


def _fold_touched(idx, path: str, store_vectors: bool, code_col: str) -> None:
    """BOUNDED compaction (``save``-as-fold, round-16): rewrite ONLY the
    centroid partitions touched by the accumulated mutation commits and
    leave every other partition dir of the base layout physically in
    place — O(touched cells), not O(corpus). The r15 fold rewrote the
    entire base layout (measured 74.6 s / ~7.5 GB at 1M×1536) even when
    the batches touched two cells; at 100 TB that is the difference
    between a seconds-scale maintenance tick and an hours-scale rewrite.
    Same pattern as the bounded bucket rewrite in ``VectorIndex.delete``
    (index.py:282-303).

    Touched set = (a) every ``centroid=N`` partition present under any
    committed ``batches/<seq>_<uuid>/codes`` dir (dir listing, no Spark
    job) ∪ (b) every base partition holding a tombstoned id — found with
    ONE column-pruned scan of base ``(id, centroid)`` semi-joined against
    the broadcast tombstone set (a superset of the strictly-older mask is
    fine: it only widens the rewrite, never the visible rows).

    Eligibility is the caller's job: ``idx`` must MIRROR the committed
    layout at ``path`` (``_mirror_path``) — the fold reads committed
    state from disk, so any in-memory-only mutation would be silently
    lost otherwise — and the resolved ``store_vectors`` must match the
    on-disk layout (changing the float-store shape is a full rewrite).

    CRASH CONTRACT: identical to the full ``save`` — the old
    ``meta.json`` is removed FIRST, so an interruption anywhere inside
    the partition swaps leaves the layout loudly unreadable (``load``
    raises, pointing at the builder), never a readable state where some
    cells folded and others still count on masked batch dirs.

    Eligibility (mirror + matching float-store shape) is checked by the
    CALLER before invoking; once called, the fold always completes (the
    no-commit case is a free no-op) — there is deliberately NO
    defer-to-full-rewrite return path, because by the time this function
    is destructive the old meta is gone and a fallback rewrite over a
    half-folded layout would be exactly the silent corruption the loud
    crash order exists to prevent (review finding)."""
    import json as _json
    import shutil
    import uuid

    spark = idx.codes.sparkSession
    bdir = os.path.join(path, "batches")
    commits = _committed_batches(path)
    if not commits:
        # mirror of a fully-folded layout: the committed state IS the
        # object's state — rewriting it would be a pure no-op at full
        # corpus cost
        return

    # (a) partitions carried by data commits — pure dir listing
    touched: set[int] = set()
    for b in commits:
        croot = os.path.join(bdir, b, "codes")
        if os.path.isdir(croot):
            for d in os.listdir(croot):
                if d.startswith("centroid="):
                    touched.add(int(d.split("=", 1)[1]))
    # (b) base partitions holding tombstoned ids — one pruned scan of
    # (id, centroid); codes bytes and floats never load
    marks = IvfSq8Index._read_delete_marks(spark, path, idx.id_col)
    base_codes = os.path.join(path, "codes")
    if marks is not None and os.path.isdir(base_codes):
        hit = (
            spark.read.parquet(base_codes)
            .select(idx.id_col, "centroid")
            .join(
                F.broadcast(marks.select(F.col("_del_id").alias(idx.id_col))),
                idx.id_col,
                "left_semi",
            )
            .select("centroid")
            .distinct()
            .collect()
        )
        touched.update(int(r["centroid"]) for r in hit)

    new_epoch = _layout_epoch(path) + 1
    stage = os.path.join(path, "_staging", uuid.uuid4().hex)
    subs = ["codes"] + (["vectors"] if store_vectors else [])
    try:
        if touched:
            vals = sorted(touched)
            folded = _mask_deleted(
                IvfSq8Index._read_layout(spark, path, "codes").where(
                    F.col("centroid").isin(vals)
                ),
                marks,
                idx.id_col,
            )
            writes = [
                lambda: _cluster_for_write(
                    folded.select(idx.id_col, code_col, "centroid")
                )
                .write.partitionBy("centroid")
                .mode("overwrite")
                .parquet(os.path.join(stage, "codes"))
            ]
            if store_vectors:
                fv = _mask_deleted(
                    IvfSq8Index._read_layout(spark, path, "vectors").where(
                        F.col("centroid").isin(vals)
                    ),
                    marks,
                    idx.id_col,
                )
                writes.append(
                    lambda: _cluster_for_write(
                        fv.select(idx.id_col, idx.vec_col, "centroid")
                    )
                    .write.partitionBy("centroid")
                    .mode("overwrite")
                    .parquet(os.path.join(stage, "vectors"))
                )
            _run_writes(writes)
        meta = idx._meta_dict()
        meta["fold_epoch"] = new_epoch
        with open(os.path.join(stage, "meta.json"), "w") as f:
            _json.dump(meta, f)
    except BaseException:
        shutil.rmtree(stage, ignore_errors=True)
        raise
    # staging materialized — commit: loud window opens here. The fold
    # RETAINS everything it displaces (r16 verdict #2): the pre-fold
    # meta, the consumed commit log, and every base cell it rewrites
    # move (rename — O(touched) metadata ops, no data copy) into
    # `_retained/<new_epoch>/`, so `load(as_of=(old_epoch, seq))`
    # survives the fold. `vacuum_layout` expires retained versions.
    ret = _retained_dir(path, new_epoch)
    os.makedirs(ret, exist_ok=True)
    created: list[int] = []
    meta_path = os.path.join(path, "meta.json")
    os.rename(meta_path, os.path.join(ret, "meta.json"))
    for sub in subs:
        dst_root = os.path.join(path, sub)
        ret_root = os.path.join(ret, sub)
        os.makedirs(dst_root, exist_ok=True)
        os.makedirs(ret_root, exist_ok=True)
        for cell in sorted(touched):
            dst = os.path.join(dst_root, f"centroid={cell}")
            src = os.path.join(stage, sub, f"centroid={cell}")
            if os.path.isdir(dst):
                # old cell out — retained, not destroyed (it may have no
                # successor: a fully-tombstoned cell folds to absent)
                os.rename(dst, os.path.join(ret_root, f"centroid={cell}"))
            elif sub == "codes" and os.path.isdir(src):
                created.append(cell)  # no predecessor: this fold
                # introduced the cell — pre-fold snapshots exclude it
            if os.path.isdir(src):
                os.rename(src, dst)
    os.rename(bdir, os.path.join(ret, "batches"))
    with open(os.path.join(ret, "fold.json"), "w") as f:
        _json.dump({"full": False, "created": sorted(created)}, f)
    os.rename(os.path.join(stage, "meta.json"), meta_path)  # loud window closes
    shutil.rmtree(stage, ignore_errors=True)
    idx.codes = spark.read.parquet(os.path.join(path, "codes"))
    idx.vectors = (
        spark.read.parquet(os.path.join(path, "vectors")) if store_vectors else None
    )
    idx._mirror_path = path
    return


def _save_layout(idx, path: str, store_vectors: bool | None, code_col: str):
    """ONE save/compaction implementation for both persisted serving
    artifacts (IvfSq8Index / IvfPqIndex) — the staged-commit
    choreography was duplicated ~150 lines across the two classes
    (deferred r15 cleanup), so a commit-protocol fix had to land twice.
    Everything class-specific flows through ``code_col`` and
    ``idx._meta_dict()``; the classes keep their own ``save`` docstrings
    (the user-facing contract).

    Protocol (see IvfSq8Index.save): resolve the float-store shape
    (``None`` preserves the on-disk layout), try the BOUNDED fold
    (``_fold_touched``) when ``idx`` mirrors the committed state, else
    stage codes/vectors/meta under ``_staging/<uuid>`` and commit with
    the loud order — old meta removed FIRST, staged dirs rename in, new
    meta renames LAST as the atomic publish. The whole save/fold holds
    the writer lease (save rewrites state every other verb's seq
    allocation depends on)."""
    _require_writable(idx, "save")
    with _writer_lease(path, "save"):
        return _save_layout_locked(idx, path, store_vectors, code_col)


def _save_layout_locked(idx, path, store_vectors, code_col):
    """Body of ``_save_layout`` — runs under the writer lease."""
    import json as _json
    import shutil
    import uuid

    IvfSq8Index._gc_staging(path)
    disk_has_vectors = os.path.isdir(os.path.join(path, "vectors")) or any(
        os.path.isdir(os.path.join(path, "batches", b, "vectors"))
        for b in (
            os.listdir(os.path.join(path, "batches"))
            if os.path.isdir(os.path.join(path, "batches"))
            else []
        )
    )
    if store_vectors is None:
        # preserve the on-disk layout: a vectors store in the base dir
        # or in any committed batch dir means the index is serving
        # co-located re-ranks — keep that working
        store_vectors = disk_has_vectors
    if (
        getattr(idx, "_mirror_path", None) == path
        and store_vectors == disk_has_vectors
    ):
        _fold_touched(idx, path, store_vectors, code_col)
        return idx
    # epoch bookkeeping: a rewrite OVER a consistent prior layout is a
    # fold (epoch bumps, prior state retained — r16 verdict #2 /
    # ADVICE r16); a fresh save starts at epoch 0. A path holding
    # retained history but an interrupted tip (meta gone mid-save)
    # resumes numbering past the retained max so epochs stay monotonic.
    meta_path = os.path.join(path, "meta.json")
    prior = os.path.exists(meta_path)
    retained_max = max(_retained_epochs(path), default=-1)
    if prior:
        new_epoch = max(_layout_epoch(path), retained_max) + 1
    else:
        new_epoch = retained_max + 1 if retained_max >= 0 else 0
    stage = os.path.join(path, "_staging", uuid.uuid4().hex)
    try:
        if store_vectors and idx.vectors is None:
            raise ValueError(
                "store_vectors=True but this index carries no vectors"
            )
        writes = [
            lambda: _cluster_for_write(
                idx.codes.select(idx.id_col, code_col, "centroid")
            )
            .write.partitionBy("centroid")
            .mode("overwrite")
            .parquet(os.path.join(stage, "codes"))
        ]
        if store_vectors:
            writes.append(
                lambda: _cluster_for_write(
                    idx.vectors.select(idx.id_col, idx.vec_col, "centroid")
                )
                .write.partitionBy("centroid")
                .mode("overwrite")
                .parquet(os.path.join(stage, "vectors"))
            )
        _run_writes(writes)
        meta = idx._meta_dict()
        meta["fold_epoch"] = new_epoch
        with open(os.path.join(stage, "meta.json"), "w") as f:
            _json.dump(meta, f)
    except BaseException:
        shutil.rmtree(stage, ignore_errors=True)
        raise
    # staging fully materialized — now the commit sequence. Unreadable
    # (loud) between the meta removal and the final rename; never a
    # readable state whose meta mismatches the codes beside it. A
    # CONSISTENT prior layout is RETAINED whole (meta + codes + vectors
    # + commit log rename into `_retained/<new_epoch>/`, `full: true` —
    # pre-rewrite snapshots stay readable); an interrupted prior (no
    # meta) is garbage and is deleted as before.
    ret = _retained_dir(path, new_epoch) if prior else None
    if ret is not None:
        os.makedirs(ret, exist_ok=True)
        os.rename(meta_path, os.path.join(ret, "meta.json"))
    for sub in ("codes", "vectors", "batches"):
        old = os.path.join(path, sub)
        if os.path.exists(old):
            if ret is not None:
                os.rename(old, os.path.join(ret, sub))
            else:
                shutil.rmtree(old)
    if ret is not None:
        with open(os.path.join(ret, "fold.json"), "w") as f:
            _json.dump({"full": True, "created": []}, f)
    os.rename(os.path.join(stage, "codes"), os.path.join(path, "codes"))
    if store_vectors:
        os.rename(os.path.join(stage, "vectors"), os.path.join(path, "vectors"))
    os.rename(os.path.join(stage, "meta.json"), meta_path)
    shutil.rmtree(stage, ignore_errors=True)
    # re-point the lazy plans at the committed layout: an index loaded
    # from THIS path had plans over the just-replaced dirs (a re-save
    # without store_vectors on such an index drops its float store — any
    # later co-located re-rank fails loudly on the missing dir, never
    # reads stale floats — ADVICE r14)
    spark = idx.codes.sparkSession
    idx.codes = spark.read.parquet(os.path.join(path, "codes"))
    idx.vectors = (
        spark.read.parquet(os.path.join(path, "vectors")) if store_vectors else None
    )
    idx._mirror_path = path
    return idx


def apply_cdc_events(
    idx,
    events: DataFrame,
    path: str,
    seq_col: str = "seq",
    op_col: str = "op",
) -> int:
    """ORDER-PRESERVING CDC application — the reusable verb ADVICE r15
    asked for when the per-trigger pattern graduates from the harness:
    a change feed where ONE microbatch can carry delete+upsert for the
    SAME id resolves by the feed's per-event sequence column, not by a
    fixed deletes-before-upserts convention.

    ``events`` is one CDC microbatch: ``(id, vector?, op in ('u','d'),
    seq)``. Events sort by ``seq`` and split into maximal same-op RUNS;
    each run commits through the index's own atomic verbs in run order
    (``delete`` for a 'd' run, ``upsert`` for a 'u' run). Layout commit
    seqs are assigned monotonically per commit, so the strictly-older
    tombstone mask reproduces exactly the feed's per-id last-writer-wins
    — an upsert after a delete of the same id survives, a delete after
    an upsert removes it, regardless of the input DataFrame's row order.

    Scale shape: the run split is one bounded global window over the
    MICROBATCH (thousands of rows by CDC contract — same documented
    bounded-window class as the positional-id reader), and the plan
    collect is one row per RUN (op alternations are rare in real feeds).
    The runs frame pins once (``localCheckpoint``) because each run
    filters it again — a nondeterministic feed plan could otherwise
    commit different rows than it planned. Returns the number of
    commits made."""
    from pyspark.sql import Window

    cols = [c for c in events.columns]
    if seq_col not in cols or op_col not in cols:
        raise ValueError(f"events must carry {seq_col!r} and {op_col!r}")
    w = Window.orderBy(F.col(seq_col).asc())
    runs = events.withColumn(
        "_chg",
        F.when(
            F.lag(op_col).over(w).isNull()
            | (F.lag(op_col).over(w) != F.col(op_col)),
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn(
        "_run",
        F.sum("_chg").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    # ONE eager pin: the per-run filters, the plan collect, and the
    # within-run dedup below all re-read `runs` — this single checkpoint
    # snapshots a nondeterministic feed once (the previous extra
    # checkpoint of `events` itself materialized every microbatch twice
    # for no added determinism; review finding). Emptiness is decided
    # from the SAME pinned frame below (empty plan → 0 commits): a
    # pre-checkpoint isEmpty() on a nondeterministic feed could read
    # empty while the later pin reads rows, silently dropping the
    # microbatch (ADVICE r16).
    runs = runs.localCheckpoint(eager=True)
    plan = [
        (r["_run"], r[op_col])
        for r in runs.select("_run", op_col).distinct().orderBy("_run").collect()
    ]
    # validate the WHOLE plan before committing anything: a bad op
    # discovered mid-loop would leave the microbatch half-applied, and
    # a streaming retry would then re-commit the early runs at NEWER
    # layout seqs than the later runs of attempt one — feed order lost
    # (review finding). Fail before the first commit instead.
    bad = [op for _, op in plan if op not in ("u", "d")]
    if bad:
        raise ValueError(
            f"unknown CDC op(s) {sorted(set(bad))!r} (expected 'u' or 'd'); "
            "no run of this microbatch was committed"
        )
    # within one same-op run, the feed can carry several events for one
    # id; they share ONE layout commit, so the engine's strictly-older
    # mask cannot order them — the run itself must resolve to the
    # MAX-seq event per id or upsert's dropDuplicates would keep an
    # arbitrary row (review finding)
    rw = Window.partitionBy(idx.id_col).orderBy(F.col(seq_col).desc())
    # ONE lease across the whole microbatch (inner delete/upsert holds
    # re-enter): a concurrent writer interleaving between two runs
    # would break the feed's commit-order guarantee even though each
    # run alone commits atomically
    with _writer_lease(path, "apply_cdc_events"):
        for run_id, op in plan:
            batch = (
                runs.where(F.col("_run") == run_id)
                .withColumn("_rn", F.row_number().over(rw))
                .where(F.col("_rn") == 1)
            )
            if op == "d":
                idx.delete(batch.select(idx.id_col), path=path)
            else:
                idx.upsert(batch.select(idx.id_col, idx.vec_col), path=path)
    return len(plan)


def layout_mutation_stats(path: str) -> dict:
    """Maintenance telemetry for a saved serving layout (IvfSq8Index /
    IvfPqIndex): how much mutation state has accumulated since the last
    fold — the numbers that decide when to run ``save`` (fold). Pure
    driver-side directory listing, no Spark job: a maintenance loop can
    poll it every trigger. Returns ``batch_commits`` (total committed
    mutation dirs), ``data_commits`` (those carrying codes),
    ``tombstone_commits`` (those carrying deletes — each one is a
    broadcast-mask entry on every read until folded), ``max_seq`` (the
    last committed mutation sequence), and ``staging_orphans`` (crashed
    writers' leftovers, swept by the next commit). Rule of thumb: fold
    when tombstone_commits grows past a handful or batch_commits starts
    rivaling the base partition count — both numbers reset to 0 at
    ``save``."""
    bdir = os.path.join(path, "batches")
    commits = _committed_batches(path)
    data = sum(
        1 for b in commits if os.path.isdir(os.path.join(bdir, b, "codes"))
    )
    tomb = sum(
        1 for b in commits if os.path.isdir(os.path.join(bdir, b, "deletes"))
    )
    sdir = os.path.join(path, "_staging")
    return {
        "batch_commits": len(commits),
        "data_commits": data,
        "tombstone_commits": tomb,
        "max_seq": max((_parse_batch_seq(b) for b in commits), default=0),
        "staging_orphans": len(os.listdir(sdir)) if os.path.isdir(sdir) else 0,
    }


def _mask_deleted(df: DataFrame | None, marks: DataFrame | None, id_col: str):
    """Apply delete tombstones to a seq-carrying layout union: a row is
    visible iff NO tombstone for its id was committed strictly AFTER the
    row was written (``row._seq < tombstone max seq`` ⇒ masked). The
    tombstone set is the ids explicitly deleted/replaced since the last
    fold — small by maintenance contract — so the mask is ONE broadcast
    hash anti-join (equi key = id, the seq comparison rides along as the
    join condition): no shuffle, and the centroid partition pruning on
    every union branch below it is untouched. ``save`` folds tombstones
    away physically, so the mask never grows without bound."""
    if df is None:
        return None
    if marks is None:
        return df.drop("_seq")
    cond = (F.col(id_col) == F.col("_del_id")) & (
        F.col("_seq") < F.col("_del_seq")
    )
    return df.join(F.broadcast(marks), cond, "left_anti").drop("_seq")


class IvfSq8Index:
    """The persisted FAISS-style ``IVFx,SQ8`` serving artifact — the
    production form the registry rows (`ann_ivf_sq8_*`) build inline.
    One object owns the three frozen components a serving fleet ships:
    the coarse centroid matrix (probe decisions, driver-side), the
    per-dim SQ8 ``(mins, deltas)`` (encode/ADC weights), and the codes
    table persisted ``partitionBy(centroid)`` (file-level pruning).

    Build once (``build``), ``save``/``load`` the layout, then per query:
    ``probe`` (integer-ADC top-k over pruned codes — quantized scores),
    ``search`` (probe + exact re-rank of the shortlist floats — exact
    scores; the serving default), ``search_batched`` (N queries, one
    codes scan). ``add_batch`` ingests new vectors map-only against the
    frozen quantizer+scaler — the streaming maintenance story
    (``streaming_sq8_index`` is its foreachBatch twin).

    At 100 TB: the codes directory is ~1 B/dim·N (4× under float32 on
    disk, more after parquet byte-packing), a query reads nprobe/k of
    it plus ``shortlist`` float point-reads, and the driver state is
    k·dim centroids + 2·dim scaler floats — kilobytes."""

    def __init__(
        self,
        codes: DataFrame,
        centroids,
        mins: list[float],
        deltas: list[float],
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        vectors: DataFrame | None = None,
    ):
        self.codes = codes  # (id_col, sq8_codes, centroid)
        self.centroids = np.asarray(centroids, dtype=np.float64)
        self.mins = list(mins)
        self.deltas = list(deltas)
        self.id_col = id_col
        self.vec_col = vec_col
        # optional CO-LOCATED float store (id, vec, centroid), persisted
        # partitionBy(centroid) next to the codes: the re-rank shortlist
        # is a subset of the probed cells by construction, so pruning the
        # float side to the same cells is lossless — re-rank reads
        # nprobe/k of the float bytes instead of scanning the whole float
        # table (measured: BASELINE.md r13, flat ~9 s vs colocated
        # sub-second at 1M×1536). FAISS keeps raw vectors inside the IVF
        # lists for exactly this refine step.
        self.vectors = vectors
        # set by load(); kept by mutations committed to the same path;
        # cleared by in-memory-only mutations. When it names `path`,
        # save(path) may fold boundedly from committed state alone.
        self._mirror_path: str | None = None

    def _meta_dict(self) -> dict:
        return {
            "centroids": self.centroids.tolist(),
            "mins": self.mins,
            "deltas": self.deltas,
            "id_col": self.id_col,
            "vec_col": self.vec_col,
        }

    def _rebuild_defaults(self) -> dict:
        """Geometry for ``rebuild_layout`` when the caller passes no
        build kwargs: the LAYOUT'S OWN shape, read off the frozen
        components — never ``build``'s signature defaults (an index
        built with 64 cells rebuilt bare must get 64 cells back)."""
        return {"n_centroids": int(self.centroids.shape[0])}

    @classmethod
    def build(
        cls,
        df: DataFrame,
        n_centroids: int = 16,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        iters: int = 5,
        train_impl: str = "expr",
        sample_rows: int | None = None,
        seed: int = 1,
    ) -> "IvfSq8Index":
        """MLlib quantizer fit with the degenerate-layout tripwire
        (``build_balanced``'s contract — a mega-cell composite would be a
        hidden full scan), optionally fit on a ``sample_rows`` sample
        (the 1M×1536 protocol); SQ8 trained on the FULL corpus;
        encode+assign are each one map pass.

        FUSED measurement pass (r18, guide §1.2/§2.3): the scaler train
        and the tripwire's occupancy counts ride ONE Arrow pass over the
        house nearest-centroid assignment (``_sq8_train_cell_counts``)
        instead of two jobs — the ``sq8_train`` aggregate (whose expr
        form posexplodes N·dim rows through a shuffle) and the MLlib
        ``model.transform`` + aggregate behind ``cell_stats``. The
        scaler is bit-identical to ``sq8_train`` in either impl (min/max
        are exact in any association; ``train_impl`` is kept for API
        compatibility); the tripwire now thresholds ``max_share`` of the
        house assignment over the ENCODED corpus — the layout actually
        being persisted — rather than MLlib's assignment of the fit
        sample (same decision on every gate corpus, asserted by test)."""
        fit_on = df
        if sample_rows is not None:
            n = df.count()
            if n > sample_rows:
                fit_on = df.sample(fraction=sample_rows / n, seed=seed)
        centroids = IvfIndex.build(
            fit_on, n_centroids=n_centroids, id_col=id_col, vec_col=vec_col
        ).centroids  # fit only — the MLlib assignment frame is never acted on
        assigned = assign_nearest_centroid(df, centroids, vec_col)
        mins, deltas, counts = _sq8_train_cell_counts(
            assigned, vec_col, n_centroids
        )
        total = sum(counts)
        if total and max(counts) / total > 0.5:
            proto = IvfIndex.build_portable(
                fit_on, n_centroids=n_centroids, id_col=id_col, vec_col=vec_col,
                iters=iters,
            )
            centroids = proto.centroids
            assigned = assign_nearest_centroid(df, centroids, vec_col)
        codes = sq8_encode(df, mins, deltas, id_col=id_col, vec_col=vec_col).join(
            assigned.select(id_col, "centroid"), id_col
        )
        return cls(
            codes, centroids, mins, deltas, id_col, vec_col,
            vectors=assigned.select(id_col, vec_col, "centroid"),
        )

    @staticmethod
    def _gc_staging(path: str) -> None:
        """Delete orphaned ``_staging`` entries left by a hard crash
        mid-save/mid-add_batch (ADVICE r13). They are invisible to reads
        (only committed ``codes``/``batches/<uuid>`` dirs are ever
        listed) so correctness never depended on this — it just stops
        dead staging bytes accumulating forever. One implementation,
        shared with the dedup indexes (same single-writer posture)."""
        from whatsapp_vectordb_spark.operators.dedup_index import _gc_staging

        _gc_staging(path)

    def save(
        self, path: str, store_vectors: bool | None = None
    ) -> "IvfSq8Index":
        """Codes ``partitionBy(centroid)`` + one meta json (centroids,
        scaler, column names). ``store_vectors=True`` additionally
        persists the CO-LOCATED float store (``vectors/``, same
        partitioning) so a loaded index re-ranks against nprobe/k of the
        float bytes with no external table — the FAISS keep-raw-in-list
        refine layout. Leave it off when the floats live in a source
        table that supports its own pruning (then pass ``vectors_df`` to
        ``search``); a flat external float table costs a full
        float-column scan per re-rank (measured, BASELINE.md r13).
        The default ``None`` PRESERVES the existing layout: re-saving
        (compacting) a path whose layout carries a float store keeps it,
        a fresh save stays codes-only — so the compaction verb can never
        silently destroy the float store (``False`` still drops it
        explicitly).

        CRASH SAFETY (ADVICE r13): everything is staged under
        ``_staging/<uuid>`` first (codes, vectors, meta.json), then
        committed in an order with no silently-wrong window: the OLD
        ``meta.json`` is removed FIRST (an interrupted save leaves the
        index loudly unreadable — ``load`` raises — never new codes
        scored with a stale scaler), the staged layouts rename in, and
        the new meta.json renames into place LAST as the atomic publish.
        Saving also folds any ``batches/<uuid>`` appends into the base
        layout (``self.codes`` already carries them after ``load`` +
        ``add_batch``), so ``save`` doubles as the compaction verb.

        BOUNDED FOLD (round 16): when this object MIRRORS the committed
        layout at ``path`` (loaded from it, every mutation since
        committed back to it — ``_mirror_path``) and the float-store
        shape is unchanged, the fold rewrites ONLY the centroid
        partitions the accumulated commits touched and leaves every
        other partition dir physically in place — O(touched cells)
        maintenance instead of the r15 O(corpus) full rewrite (74.6 s /
        ~7.5 GB at 1M×1536 for a 2-cell mutation). See
        ``_fold_touched``. Any in-memory-only mutation, foreign path, or
        explicit float-store change still takes the full rewrite.

        Implementation shared with ``IvfPqIndex.save`` (``_save_layout``
        — the r15-deferred dedup of the staged-commit choreography)."""
        return _save_layout(self, path, store_vectors, "sq8_codes")

    @staticmethod
    def _layout_roots(
        path: str, sub: str, as_of: int | None = None
    ) -> list[tuple[int, str]]:
        """Committed parquet roots for one layout table: the base
        ``<sub>/`` dir (mutation seq 0) plus every committed
        ``batches/<seq>_<uuid>/<sub>`` dir (its commit seq). A root is
        listed only once its single commit rename succeeded; dirs with
        no part files anywhere (a legacy empty commit: just _SUCCESS)
        are skipped — they hold no rows and would fail schema inference
        and brick the whole load.

        ``as_of`` is TIME TRAVEL: keep only roots committed at or
        before that mutation seq — a snapshot read of the layout as it
        stood after commit ``as_of``. Pure metadata (commit dirs newer
        than the bound are never opened, let alone scanned), the same
        mechanism Delta/Iceberg ``VERSION AS OF`` uses: the commit log
        IS the snapshot structure."""

        def has_parquet(root: str) -> bool:
            for _, _, files in os.walk(root):
                if any(f.endswith(".parquet") for f in files):
                    return True
            return False

        roots: list[tuple[int, str]] = []
        base = os.path.join(path, sub)
        if os.path.isdir(base) and has_parquet(base):
            roots.append((0, base))
        bdir = os.path.join(path, "batches")
        roots.extend(
            (_parse_batch_seq(b), os.path.join(bdir, b, sub))
            for b in _committed_batches(path)
            if (as_of is None or _parse_batch_seq(b) <= as_of)
            and os.path.isdir(os.path.join(bdir, b, sub))
            and has_parquet(os.path.join(bdir, b, sub))
        )
        return roots

    @staticmethod
    def _read_seq_roots(spark: SparkSession, roots) -> DataFrame:
        """One frame per committed root, unioned by name, each row
        carrying its commit ``_seq``. The FIRST root's schema is
        inferred from its footer; every later root that allocated a
        real commit seq (name parsed ``>= 1`` — written by the house
        verbs, which always stamp ``_seq`` and the same columns)
        reuses that schema EXPLICITLY, skipping a per-root driver
        footer-read round trip (r17: a mutation composite's 8 loads ×
        3 tables × N commits each paid one). Base and legacy
        unnumbered roots (seq 0) keep inferring — only they may lack
        the ``_seq`` column."""
        from functools import reduce

        first_seq, first_root = roots[0]
        first = spark.read.parquet(first_root)
        if "_seq" not in first.columns:
            base_fields = list(first.schema.fields)
            first = first.withColumn("_seq", F.lit(first_seq).cast("long"))
        else:
            base_fields = [f for f in first.schema.fields if f.name != "_seq"]
        from pyspark.sql.types import LongType, StructField, StructType

        with_seq = StructType(
            base_fields + [StructField("_seq", LongType(), True)]
        )

        def read_one(seq: int, root: str) -> DataFrame:
            if seq >= 1:
                # explicit-schema read, with the dir-name seq as the
                # fallback: a numbered root whose files physically lack
                # the _seq column (older build, external tooling) reads
                # as all-NULL _seq under the explicit schema, which
                # would silently break last-writer-wins masking and
                # time-travel bounds (ADVICE r17) — coalesce restores
                # the old stamped-from-dir-name behavior at zero cost
                # (house-written roots always carry a non-null _seq).
                df = spark.read.schema(with_seq).parquet(root)
                return df.withColumn(
                    "_seq", F.coalesce(F.col("_seq"), F.lit(seq).cast("long"))
                )
            df = spark.read.parquet(root)
            if "_seq" not in df.columns:
                df = df.withColumn("_seq", F.lit(seq).cast("long"))
            return df

        return reduce(
            lambda a, b: a.unionByName(b),
            [first] + [read_one(seq, r) for seq, r in roots[1:]],
        )

    @staticmethod
    def _read_layout(
        spark: SparkSession, path: str, sub: str, as_of: int | None = None
    ) -> DataFrame | None:
        """Base ``<sub>/`` layout unioned with every committed
        ``batches/<seq>_<uuid>/<sub>`` append, each row carrying its
        commit ``_seq`` (base = 0; rows written before the mutation
        verbs existed fall back to their dir-name seq, i.e. 0). Each
        root is read separately (partition discovery stays per-root, so
        ``centroid=N`` file pruning pushes into every branch of the
        union). Callers apply ``_mask_deleted`` (which drops ``_seq``)
        before serving rows. ``as_of`` bounds the union to commits
        ``<= as_of`` (time travel — see ``_layout_roots``)."""
        roots = IvfSq8Index._layout_roots(path, sub, as_of)
        if not roots:
            return None
        return IvfSq8Index._read_seq_roots(spark, roots)

    @staticmethod
    def _read_delete_marks(
        spark: SparkSession, path: str, id_col: str, as_of: int | None = None
    ) -> DataFrame | None:
        """The layout's tombstone set, folded to one row per id:
        ``(_del_id, _del_seq = max commit seq)``. Tombstones live inside
        the same atomic batch dirs as the data they accompany
        (``batches/<seq>_<uuid>/deletes``) — a pure delete commits a
        dir holding only ``deletes``, an upsert commits codes + vectors
        + its own ids' tombstones under ONE rename. ``as_of`` bounds
        the fold to tombstones committed ``<= as_of`` (time travel)."""
        roots = IvfSq8Index._layout_roots(path, "deletes", as_of)
        if not roots:
            return None
        marks = IvfSq8Index._read_seq_roots(spark, roots)
        return marks.groupBy(F.col(id_col).alias("_del_id")).agg(
            F.max("_seq").alias("_del_seq")
        )

    @classmethod
    def load(
        cls,
        spark: SparkSession,
        path: str,
        as_of: int | tuple[int, int] | None = None,
    ) -> "IvfSq8Index":
        """Open the committed layout — the TIP by default, or (with
        ``as_of``) a READ-ONLY snapshot. The bound is either a bare
        commit seq (CURRENT-epoch shorthand) or the stable
        ``(fold_epoch, seq)`` pair ``layout_snapshots(path)`` returns —
        the pair form survives folds: seqs reset at every fold but
        epochs never do, and an older epoch resolves through the
        retained pre-fold versions (``vacuum_layout`` expires them;
        ADVICE r16 / r16 verdict #2). Snapshot semantics follow the
        epoch's commit log exactly: batch dirs with seq > bound are
        never opened, tombstones fold only over commits <= bound, the
        strictly-older mask applies within it, and the snapshot scores
        with ITS epoch's frozen quantizer/scaler (a rebuild retrains
        them). Snapshot handles refuse every mutating verb
        (``_require_writable``); current-epoch bound cost over a tip
        load is zero (the bound only DROPS union branches and mask
        entries)."""
        import json as _json

        meta_path = os.path.join(path, "meta.json")
        if not os.path.exists(meta_path):
            if os.path.isdir(os.path.join(path, "codes")):
                raise RuntimeError(
                    f"IvfSq8Index at {path!r} has codes but no meta.json — "
                    "an interrupted save; re-save from the builder (codes "
                    "without their scaler must never be scored)"
                )
            raise FileNotFoundError(meta_path)
        with open(meta_path) as f:
            meta = _json.load(f)
        meta, codes, vecs, marks, norm = _load_layout_frames(
            spark, path, as_of, meta
        )
        if codes is None:
            raise RuntimeError(f"IvfSq8Index at {path!r} has meta.json but no codes")
        idx = cls(
            _mask_deleted(codes, marks, meta["id_col"]),
            meta["centroids"],
            meta["mins"],
            meta["deltas"],
            meta["id_col"],
            meta["vec_col"],
            vectors=_mask_deleted(vecs, marks, meta["id_col"]),
        )
        idx._as_of = norm
        # plans == committed state, by construction — but only the TIP
        # may fold (a snapshot's fold would destroy newer commits)
        idx._mirror_path = path if norm is None else None
        return idx

    def cell_stats(self) -> dict:
        """Same balance fingerprint as ``IvfIndex.cell_stats`` (max_share
        near 1.0 = the composite is a full scan in disguise)."""
        counts = [
            r["c"]
            for r in self.codes.groupBy("centroid")
            .agg(F.count("*").alias("c"))
            .collect()
        ]
        counts.sort(reverse=True)
        total = sum(counts)
        return {
            "n_cells": int(self.centroids.shape[0]),
            "nonempty": len(counts),
            "total": total,
            "max_share": round(counts[0] / total, 4) if total else 0.0,
            "top5_shares": [round(c / total, 4) for c in counts[:5]],
        }

    def probe_centroid_ids(self, query_vec, nprobe: int = 2) -> list[int]:
        """Euclidean nearest cells (the quantizer's own metric) —
        driver-side over the kilobyte centroid matrix."""
        q = np.asarray(query_vec, dtype=np.float64)
        d = ((self.centroids - q[None, :]) ** 2).sum(axis=1)
        return [int(i) for i in np.argsort(d, kind="stable")[:nprobe]]

    def _allowed_codes(self, allowed: DataFrame | None) -> DataFrame:
        """Metadata-filtered serving (the reference API's query filter —
        Pinecone restricts a query to ids matching a metadata
        predicate): the caller evaluates the predicate on its metadata
        table (that filter pushes down to the metadata parquet scan) and
        passes the resulting id set; the codes scan takes ONE broadcast
        semi-join on id ABOVE the partition filter — pruning is
        untouched, nothing shuffles, and the ADC shortlist is then
        all-allowed by construction, so ``k`` results are guaranteed to
        satisfy the filter (PRE-filter semantics — no overfetch
        heuristics). This is the selective-filter plan; for a permissive
        filter that keeps most rows, skip ``allowed`` and filter the
        RESULT of a larger-``k`` search instead (post-filter) — the
        broadcast id set is the thing that must stay small."""
        if allowed is None:
            return self.codes
        return self.codes.join(
            F.broadcast(allowed.select(self.id_col)), self.id_col, "left_semi"
        )

    def probe(
        self,
        query_vec,
        k: int = 10,
        nprobe: int = 2,
        impl: str = "expr",
        allowed: DataFrame | None = None,
    ) -> DataFrame:
        """Quantized-domain top-k: prune + integer ADC over codes only
        (``ivf_sq8_topk``). Scores are int64 ADC values — use ``search``
        when exact scores must leave the system. ``allowed`` restricts
        the scan to an id set (``_allowed_codes``)."""
        return ivf_sq8_topk(
            self._allowed_codes(allowed),
            self.probe_centroid_ids(query_vec, nprobe),
            query_vec,
            self.deltas,
            k=k,
            id_col=self.id_col,
            impl=impl,
        )

    def _rerank_side(self, vectors_df: DataFrame | None, cells: list[int]) -> DataFrame:
        """Float frame for the exact re-rank. With a co-located store and
        no explicit ``vectors_df``, prune it to the probed cells — the
        shortlist is a subset of those cells by construction, so this is
        lossless and reads nprobe/k of the float bytes."""
        if vectors_df is not None:
            return vectors_df
        if self.vectors is None:
            raise ValueError(
                "no vectors_df given and the index carries no co-located "
                "float store (save with store_vectors=True, or pass the "
                "source table)"
            )
        return self.vectors.where(F.col("centroid").isin(cells)).select(
            self.id_col, self.vec_col
        )

    def search(
        self,
        vectors_df: DataFrame | None = None,
        query_vec=None,
        k: int = 10,
        nprobe: int = 2,
        shortlist: int = 100,
        metric: str = "dotproduct",
        round_to: int | None = 6,
        impl: str = "expr",
        allowed: DataFrame | None = None,
    ) -> DataFrame:
        """The serving default: prune + ADC shortlist + exact re-rank.
        The floats come from ``vectors_df`` when given (broadcast
        semi-join; that table never shuffles — but a FLAT float table
        costs a full float-column scan per query), else from the
        co-located store pruned to the probed cells (nprobe/k of the
        float bytes; BASELINE.md r13 measures the difference). Exact
        final scores. ``allowed`` restricts serving to an id set
        (``_allowed_codes`` — the filtered-query verb); the shortlist is
        then all-allowed by construction, so the re-rank needs no
        additional mask."""
        if query_vec is None:
            raise ValueError("query_vec is required")
        cells = self.probe_centroid_ids(query_vec, nprobe)
        return ivf_sq8_rerank_topk(
            self._allowed_codes(allowed),
            self._rerank_side(vectors_df, cells),
            cells,
            query_vec,
            self.deltas,
            k=k,
            shortlist=shortlist,
            id_col=self.id_col,
            vec_col=self.vec_col,
            metric=metric,
            round_to=round_to,
            impl=impl,
        )

    def search_batched(
        self,
        vectors_df: DataFrame | None = None,
        queries: list | None = None,
        k: int = 10,
        nprobe: int = 2,
        shortlist: int = 100,
        metric: str = "dotproduct",
        round_to: int | None = 6,
        impl: str = "expr",
        allowed: DataFrame | None = None,
    ) -> DataFrame:
        """N queries, ONE codes scan over the union of probed cells, ONE
        float pass re-ranking every shortlist (``ivf_sq8_batched_rerank_
        topk``; ``impl`` picks the shortlist scoring kernel). ``queries``
        is ``[(query_id, vector)]``. Without ``vectors_df``, the
        co-located store pruned to the UNION of probed cells serves the
        re-rank (every query's shortlist lives inside its own probed
        cells ⊆ the union). ``allowed`` applies ONE id filter to the
        shared codes scan — all queries in the batch serve under the
        same metadata predicate."""
        if not queries:
            raise ValueError("queries is required")
        probe_map = {
            qid: self.probe_centroid_ids(vec, nprobe) for qid, vec in queries
        }
        union_cells = sorted({c for cells in probe_map.values() for c in cells})
        return ivf_sq8_batched_rerank_topk(
            self._allowed_codes(allowed),
            self._rerank_side(vectors_df, union_cells),
            queries,
            probe_map,
            self.deltas,
            k=k,
            shortlist=shortlist,
            id_col=self.id_col,
            vec_col=self.vec_col,
            metric=metric,
            round_to=round_to,
            impl=impl,
        )

    def add_batch(
        self, batch: DataFrame, path: str | None = None, replace: bool = False
    ) -> "IvfSq8Index":
        """Frozen-quantizer, frozen-scaler ingest: assign + encode the
        batch map-only and append (to the in-memory union and — with
        ``path`` — to the saved layout). Out-of-range values clamp to
        0/255 by ``sq8_encode``'s contract; monitor clamp rates and
        scaler drift, rebuild when they degrade — same maintenance
        posture as ``IvfIndex.add_batch``/``drift``.

        ``replace=True`` is the UPSERT verb (the reference's core write,
        upsert.go:16 — Pinecone replace-by-id): the same commit also
        tombstones the batch's ids at this commit's seq, masking any
        OLDER row with the same id while the rows written here (same
        seq, and the mask is strictly-older-only) stay visible.

        CRASH SAFETY (ADVICE r13): the on-disk append stages the batch's
        codes AND (when the saved index carries a float store) its
        co-located vectors AND (replace) its tombstones under ONE
        ``_staging/<uuid>`` dir and commits with a SINGLE ``os.rename``
        into ``batches/<seq>_<uuid>`` — the two previous independent
        ``mode('append')`` writes had a window where new codes landed
        without their floats, and the exact re-rank's inner join would
        then silently DROP those ids from results. One rename = codes,
        floats, and delete marks visible together or not at all (an
        upsert can never be observed as its delete half alone).
        ``save`` folds accumulated batch dirs back into the base
        layout (compaction), applying tombstones physically."""
        import shutil
        import uuid

        # pin the INPUT once: the codes write, the vectors write, and
        # the in-memory unions are separate Spark jobs over `batch` — a
        # nondeterministic batch could otherwise commit codes whose
        # co-located floats row never materialized, inside the same
        # "atomic" dir (r15 review finding; same fix as IvfPqIndex).
        # The replace path also dedupes by id FIRST: two same-id rows in
        # one upsert batch would share a commit seq, both surviving the
        # strictly-older tombstone mask forever (ADVICE r15) — replace
        # semantics admit exactly one winner per id per commit.
        _require_writable(self, "add_batch")
        if replace:
            batch = batch.dropDuplicates([self.id_col])
        batch = batch.select(self.id_col, self.vec_col).localCheckpoint(eager=True)
        if batch.isEmpty():
            # nothing to ingest — and an EMPTY partitioned batch dir on
            # disk would hold no partition subdirs, making every later
            # load()'s per-root parquet read fail schema inference
            # (bricking the index); the SemDedupIndex guards identically.
            # Decided on the PINNED batch (`enc` is an inner join of two
            # map-only 1:1 derivatives of it on the id, so enc is empty
            # iff the batch is) — checking `enc` paid an extra
            # encode+assign+join job per commit for the same answer.
            return self
        assigned = assign_nearest_centroid(batch, self.centroids, self.vec_col)
        enc = sq8_encode(
            batch, self.mins, self.deltas, id_col=self.id_col, vec_col=self.vec_col
        ).join(assigned.select(self.id_col, "centroid"), self.id_col)
        if path is not None:
            with _writer_lease(path, "add_batch"):
                self._gc_staging(path)
                seq = _next_batch_seq(path)
                batch_id = f"{seq:08d}_{uuid.uuid4().hex}"
                stage = os.path.join(path, "_staging", batch_id)
                try:
                    writes = [
                        lambda: _cluster_for_write(
                            enc.select(
                                self.id_col, "sq8_codes", "centroid"
                            ).withColumn("_seq", F.lit(seq).cast("long"))
                        )
                        .write.partitionBy("centroid")
                        .mode("overwrite")
                        .parquet(os.path.join(stage, "codes"))
                    ]
                    if os.path.isdir(os.path.join(path, "vectors")):
                        writes.append(
                            lambda: _cluster_for_write(
                                assigned.select(
                                    self.id_col, self.vec_col, "centroid"
                                ).withColumn("_seq", F.lit(seq).cast("long"))
                            )
                            .write.partitionBy("centroid")
                            .mode("overwrite")
                            .parquet(os.path.join(stage, "vectors"))
                        )
                    if replace:
                        writes.append(
                            lambda: batch.select(self.id_col)
                            .withColumn("_seq", F.lit(seq).cast("long"))
                            .coalesce(1)
                            .write.mode("overwrite")
                            .parquet(os.path.join(stage, "deletes"))
                        )
                    _run_writes(writes)
                    bdir = os.path.join(path, "batches")
                    os.makedirs(bdir, exist_ok=True)
                    os.rename(stage, os.path.join(bdir, batch_id))
                except BaseException:
                    shutil.rmtree(stage, ignore_errors=True)
                    raise
        if replace:
            # in-memory mirror of the seq rule: older rows with these
            # ids vanish, then the batch's own rows union in below
            old_ids = F.broadcast(batch.select(self.id_col))
            self.codes = self.codes.join(old_ids, self.id_col, "left_anti")
            if self.vectors is not None:
                self.vectors = self.vectors.join(
                    old_ids, self.id_col, "left_anti"
                )
        self.codes = self.codes.unionByName(
            enc.select(self.id_col, "sq8_codes", "centroid"),
            allowMissingColumns=True,
        )
        if self.vectors is not None:
            self.vectors = self.vectors.unionByName(
                assigned.select(self.id_col, self.vec_col, "centroid"),
                allowMissingColumns=True,
            )
        # a commit onto the mirrored layout keeps the mirror; an
        # in-memory-only (or foreign-path) ingest breaks it — save()
        # then takes the full rewrite instead of the bounded fold
        self._mirror_path = (
            path if getattr(self, "_mirror_path", None) == path else None
        )
        return self

    def upsert(self, batch: DataFrame, path: str | None = None) -> "IvfSq8Index":
        """Replace-by-id ingest — the reference's write verb
        (upsert.go:16): one atomic commit that tombstones the batch's
        ids against every older row and adds the batch's fresh codes
        (and co-located floats) in their place. See ``add_batch``."""
        return self.add_batch(batch, path=path, replace=True)

    def delete(self, ids, path: str | None = None) -> "IvfSq8Index":
        """Delete-by-id — the remaining Pinecone-surface verb on the
        persisted serving artifact. ``ids`` is a one-column DataFrame
        (or any python iterable of ids). With ``path``, the tombstone
        set commits as an atomic ``batches/<seq>_<uuid>`` dir holding
        only ``deletes`` (ONE rename — readable state either shows the
        delete or doesn't, never half of it); every read path then
        masks rows whose commit seq is strictly older (a later
        ``add_batch``/``upsert`` of the same id is visible again —
        last-writer-wins by commit order). The tombstone set stays
        broadcast-small by contract; ``save`` folds it away physically,
        resetting the mask to empty."""
        _index_delete(self, ids, path)
        return self


class IvfPqIndex:
    """Persisted FAISS-style ``IVFx,PQm`` serving artifact — the
    MEMORY-bound tier of the persisted index family (``IvfSq8Index`` is
    the 4×-compression tier). PQ codes cost ``m`` bytes/vector against
    SQ8's dim bytes: at the reference's dim=1536 (``main.go:27``) that
    is 8-16 bytes vs 1536 — ~100-190× less serving state, which is the
    layout a RAM-resident 100 TB corpus actually deploys (FAISS
    ``IVF<x>,PQ<m>``; Jégou et al. TPAMI'11 §IV, residual encoding).

    Same persistence contract as ``IvfSq8Index``, deliberately: codes
    ``partitionBy(centroid)`` (file-level pruning), one ``meta.json``
    carrying the FROZEN coarse centroids + residual codebooks
    (driver-side kilobytes), an optional co-located float store for the
    refine stage, atomic ``batches/<uuid>`` ingest commits,``save`` as
    the compaction verb (folds batch dirs back into the base layout),
    and the loudly-unreadable-mid-save crash posture (old meta removed
    first, new meta renamed in last). Probe math delegates to
    ``IvfPqResidualIndex`` — per-cell integer LUT ADC, exact int64
    sums, SQL-replayable from persisted codes + LUTs.

    Serving reads per query: (nprobe/C) of an ``m``-byte/row codes
    table + ``shortlist`` float point-reads — the refine stage's exact
    scores mean cell pruning and quantization can only cost recall,
    never corrupt a returned score."""

    def __init__(
        self,
        codes: DataFrame,
        centroids,
        codebooks,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        vectors: DataFrame | None = None,
    ):
        self.codes = codes  # (id_col, codes, centroid)
        self.centroids = np.asarray(centroids, dtype=np.float64)
        self.codebooks = np.asarray(codebooks, dtype=np.float64)
        self.id_col = id_col
        self.vec_col = vec_col
        # optional co-located float store (id, vec, centroid) — the
        # same refine layout as IvfSq8Index.vectors
        self.vectors = vectors
        # bounded-fold eligibility marker — the IvfSq8Index contract
        self._mirror_path: str | None = None

    def _meta_dict(self) -> dict:
        return {
            "centroids": self.centroids.tolist(),
            "codebooks": self.codebooks.tolist(),
            "id_col": self.id_col,
            "vec_col": self.vec_col,
        }

    def _rebuild_defaults(self) -> dict:
        """Layout geometry for a bare ``rebuild_layout`` — see
        ``IvfSq8Index._rebuild_defaults``: cells from the centroid
        matrix, (m, ksub) from the codebook tensor shape."""
        return {
            "n_centroids": int(self.centroids.shape[0]),
            "m": int(self.codebooks.shape[0]),
            "ksub": int(self.codebooks.shape[1]),
        }

    def _proto(self) -> "IvfPqResidualIndex":
        return IvfPqResidualIndex(
            self.centroids, self.codebooks, self.id_col, self.vec_col
        )

    def _assign_vectors(self, df: DataFrame) -> DataFrame:
        """Map-only ``(id, vec, centroid)`` for the co-located float
        store — the SAME normalize + matmul-argmin cell math as
        ``IvfPqResidualIndex.encode`` (bit-identical numpy ops, so the
        float store's partitioning can never diverge from the codes'),
        without joining the float column back to the codes (a join
        would shuffle the full float table at build/ingest time; this
        keeps the floats on a map-only lineage, the IvfSq8Index
        shape)."""
        import pandas as pd
        from pyspark.sql.types import IntegerType, StructField, StructType

        cent = self.centroids
        cent_sq = (cent * cent).sum(axis=1)
        id_col, vec_col = self.id_col, self.vec_col
        out_schema = StructType(
            [
                df.schema[id_col],
                df.schema[vec_col],
                StructField("centroid", IntegerType(), False),
            ]
        )

        def assign(batches):
            for pdf in batches:
                if pdf.empty:
                    continue
                v = PqIndex._normalize(
                    np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
                )
                cell = (cent_sq[None, :] - 2.0 * (v @ cent.T)).argmin(axis=1)
                yield pd.DataFrame(
                    {
                        id_col: pdf[id_col],
                        vec_col: pdf[vec_col],
                        "centroid": cell.astype("int32"),
                    }
                )

        return df.select(id_col, vec_col).mapInPandas(assign, schema=out_schema)

    @classmethod
    def build(
        cls,
        df: DataFrame,
        n_centroids: int = 8,
        m: int = 8,
        ksub: int = 16,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        sample_rows: int = 2048,
        seed: int = 0,
        iters: int = 10,
    ) -> "IvfPqIndex":
        """Coarse quantizer + residual codebooks on a bounded sample
        (``IvfPqResidualIndex.build``), then ONE map-only encode pass
        over the corpus (normalize → assign → residual → code, no
        shuffle). The co-located float frame joins the raw vectors to
        their assigned cell so a saved store serves pruned re-ranks."""
        proto = IvfPqResidualIndex.build(
            df,
            n_centroids=n_centroids,
            m=m,
            ksub=ksub,
            id_col=id_col,
            vec_col=vec_col,
            sample_rows=sample_rows,
            seed=seed,
            iters=iters,
        )
        codes = proto.encode(df)
        idx = cls(codes, proto.centroids, proto.codebooks, id_col, vec_col)
        idx.vectors = idx._assign_vectors(df)
        return idx

    def save(self, path: str, store_vectors: bool | None = None) -> "IvfPqIndex":
        """Mirror of ``IvfSq8Index.save`` (see its docstring for the
        staged-commit order, the store-preserving ``None`` default, and
        the bounded O(touched-cells) fold): codes ``partitionBy
        (centroid)`` + meta.json(centroids, codebooks, column names);
        folds committed ``batches/<seq>_<uuid>`` appends into the base
        layout, so save doubles as compaction. ONE shared implementation
        (``_save_layout``) — commit-protocol fixes land once for both
        persisted tiers (the r15-deferred cleanup)."""
        return _save_layout(self, path, store_vectors, "codes")

    @classmethod
    def load(
        cls, spark, path: str, as_of: int | tuple[int, int] | None = None
    ) -> "IvfPqIndex":
        """Tip load, or (``as_of``) a read-only time-travel snapshot —
        the ``IvfSq8Index.load`` contract (one commit log shape, one
        snapshot rule — bare seq for the current epoch, ``(epoch,
        seq)`` pairs across folds through retention — for both
        persisted tiers)."""
        import json as _json

        meta_path = os.path.join(path, "meta.json")
        if not os.path.exists(meta_path):
            if os.path.isdir(os.path.join(path, "codes")):
                raise RuntimeError(
                    f"IvfPqIndex at {path!r} has codes but no meta.json — "
                    "an interrupted save; re-save from the builder (codes "
                    "without their codebooks must never be scored)"
                )
            raise FileNotFoundError(meta_path)
        with open(meta_path) as f:
            meta = _json.load(f)
        meta, codes, vecs, marks, norm = _load_layout_frames(
            spark, path, as_of, meta
        )
        if codes is None:
            raise RuntimeError(f"IvfPqIndex at {path!r} has meta.json but no codes")
        idx = cls(
            _mask_deleted(codes, marks, meta["id_col"]),
            meta["centroids"],
            meta["codebooks"],
            meta["id_col"],
            meta["vec_col"],
            vectors=_mask_deleted(vecs, marks, meta["id_col"]),
        )
        idx._as_of = norm
        # only the TIP may fold (see IvfSq8Index.load)
        idx._mirror_path = path if norm is None else None
        return idx

    def probe_cells(self, query_vec, nprobe: int = 2) -> list[int]:
        return self._proto().probe_cells(query_vec, nprobe)

    def luts_int(self, query_vec, cells: list[int]):
        return self._proto().luts_int(query_vec, cells)

    def _allowed_codes(self, allowed: DataFrame | None) -> DataFrame:
        """Metadata-filtered serving — the ``IvfSq8Index._allowed_codes``
        contract (one broadcast semi-join on id above the partition
        filter; PRE-filter semantics, k results guaranteed to satisfy
        the caller's predicate)."""
        return IvfSq8Index._allowed_codes(self, allowed)

    def probe(
        self,
        query_vec,
        k: int = 10,
        nprobe: int = 2,
        allowed: DataFrame | None = None,
    ) -> DataFrame:
        """Quantized-domain top-k: partition-pruned codes scan + integer
        LUT ADC (ascending int64 distances). Use ``search`` when exact
        scores must leave the system. ``allowed`` restricts the scan to
        an id set (``_allowed_codes``)."""
        return self._proto().probe(
            self._allowed_codes(allowed), query_vec, k=k, nprobe=nprobe
        )

    def probe_batched(
        self,
        queries: list,
        k: int = 10,
        nprobe: int = 2,
        allowed: DataFrame | None = None,
    ) -> DataFrame:
        """N queries, ONE partition-pruned codes scan
        (``ivfpq_residual_batched_topk`` — per-(query, cell) residual
        LUTs broadcast; bit-identical to N ``probe`` calls). ``queries``
        is ``[(query_id, vector)]``; returns
        ``(query_id, id, score)``. ``allowed`` applies ONE id filter to
        the shared scan — the whole batch serves under the same
        metadata predicate."""
        probe_map = {
            int(qid): self.probe_cells(vec, nprobe) for qid, vec in queries
        }
        return ivfpq_residual_batched_topk(
            self._proto(), self._allowed_codes(allowed), queries, probe_map, k=k
        )

    def _rerank_side(
        self, vectors_df: DataFrame | None, cells: list[int]
    ) -> DataFrame:
        if vectors_df is not None:
            return vectors_df
        if self.vectors is None:
            raise ValueError(
                "no vectors_df given and the index carries no co-located "
                "float store (save with store_vectors=True, or pass the "
                "source table)"
            )
        return self.vectors.where(F.col("centroid").isin(cells)).select(
            self.id_col, self.vec_col
        )

    def search(
        self,
        vectors_df: DataFrame | None = None,
        query_vec=None,
        k: int = 10,
        nprobe: int = 2,
        shortlist: int = 100,
        metric: str = "dotproduct",
        round_to: int | None = 6,
        allowed: DataFrame | None = None,
    ) -> DataFrame:
        """The serving default: prune + LUT-ADC shortlist + exact
        re-rank of the shortlist floats (broadcast semi-join — the float
        table never shuffles). Exact final scores. ``allowed`` restricts
        serving to an id set (``_allowed_codes``); the shortlist is then
        all-allowed by construction."""
        if query_vec is None:
            raise ValueError("query_vec is required")
        cells = self.probe_cells(query_vec, nprobe)
        short = self.probe(
            query_vec, k=shortlist, nprobe=nprobe, allowed=allowed
        ).select(self.id_col)
        cand = self._rerank_side(vectors_df, cells).join(
            F.broadcast(short), self.id_col
        )
        return topk(
            cand,
            query_vec,
            k=k,
            metric=metric,
            id_col=self.id_col,
            vec_col=self.vec_col,
            round_to=round_to,
        )

    def search_batched(
        self,
        vectors_df: DataFrame | None = None,
        queries: list | None = None,
        k: int = 10,
        nprobe: int = 2,
        shortlist: int = 100,
        metric: str = "dotproduct",
        round_to: int | None = 6,
        allowed: DataFrame | None = None,
    ) -> DataFrame:
        """N queries, ONE pruned codes scan, ONE float pass — the
        memory-bound tier's batched serving default, completing the
        symmetry with ``IvfSq8Index.search_batched``: the residual
        LUT-ADC shortlists (``probe_batched`` — bit-identical to N
        ``probe`` calls) feed the shared exact re-rank tail
        (``batched_exact_rerank``), so final scores are the exact
        metric. ``queries`` is ``[(query_id, vector)]``. Without
        ``vectors_df``, the co-located store pruned to the UNION of
        probed cells serves the re-rank."""
        if not queries:
            raise ValueError("queries is required")
        short = self.probe_batched(
            queries, k=shortlist, nprobe=nprobe, allowed=allowed
        ).select("query_id", self.id_col)
        union_cells = sorted(
            {c for _, vec in queries for c in self.probe_cells(vec, nprobe)}
        )
        return batched_exact_rerank(
            self._rerank_side(vectors_df, union_cells),
            short,
            queries,
            k=k,
            id_col=self.id_col,
            vec_col=self.vec_col,
            metric=metric,
            round_to=round_to,
        )

    def add_batch(
        self, batch: DataFrame, path: str | None = None, replace: bool = False
    ) -> "IvfPqIndex":
        """Frozen-quantizer, frozen-codebook ingest: ONE map-only
        normalize→assign→residual→encode pass, committed (with ``path``)
        as an atomic ``batches/<seq>_<uuid>`` rename — codes and (when
        the saved layout carries a float store) co-located vectors stage
        together and become visible together or not at all, exactly the
        ``IvfSq8Index.add_batch`` contract. ``replace=True`` is the
        upsert verb (the same commit tombstones the batch's ids against
        every strictly-older row — see ``IvfSq8Index.add_batch``).
        Codebook drift is the maintenance signal: rebuild when residual
        distortion on new batches degrades (same posture as SQ8's
        clamp-rate watch)."""
        import shutil
        import uuid

        # pin the INPUT once: codes (encode) and co-located vectors
        # (assign) are derived in SEPARATE Spark jobs, so a
        # nondeterministic batch (df.sample, a limit, a source dir
        # changing between jobs) could otherwise commit codes for a row
        # whose vectors write never saw it — inside the same "atomic"
        # batch dir. One eager checkpoint makes every derivation read
        # the same materialized rows (r15 review finding). The replace
        # path dedupes by id first: same-id rows sharing one commit seq
        # would BOTH outlive the strictly-older tombstone mask (ADVICE
        # r15) — replace semantics admit one winner per id per commit.
        _require_writable(self, "add_batch")
        if replace:
            batch = batch.dropDuplicates([self.id_col])
        batch = batch.select(self.id_col, self.vec_col).localCheckpoint(eager=True)
        if batch.isEmpty():
            # an EMPTY partitioned batch dir would brick later loads on
            # schema inference — commit nothing (house guard). Decided
            # on the PINNED batch: encode is a map-only 1:1 derivation,
            # so enc is empty iff the batch is, and checking enc paid an
            # extra encode job per commit.
            return self
        enc = self._proto().encode(batch)
        if path is not None:
            with _writer_lease(path, "add_batch"):
                IvfSq8Index._gc_staging(path)
                seq = _next_batch_seq(path)
                batch_id = f"{seq:08d}_{uuid.uuid4().hex}"
                stage = os.path.join(path, "_staging", batch_id)
                try:
                    writes = [
                        lambda: _cluster_for_write(
                            enc.select(
                                self.id_col, "codes", "centroid"
                            ).withColumn("_seq", F.lit(seq).cast("long"))
                        )
                        .write.partitionBy("centroid")
                        .mode("overwrite")
                        .parquet(os.path.join(stage, "codes"))
                    ]
                    if os.path.isdir(os.path.join(path, "vectors")):
                        writes.append(
                            lambda: _cluster_for_write(
                                self._assign_vectors(batch).withColumn(
                                    "_seq", F.lit(seq).cast("long")
                                )
                            )
                            .write.partitionBy("centroid")
                            .mode("overwrite")
                            .parquet(os.path.join(stage, "vectors"))
                        )
                    if replace:
                        writes.append(
                            lambda: batch.select(self.id_col)
                            .withColumn("_seq", F.lit(seq).cast("long"))
                            .coalesce(1)
                            .write.mode("overwrite")
                            .parquet(os.path.join(stage, "deletes"))
                        )
                    _run_writes(writes)
                    bdir = os.path.join(path, "batches")
                    os.makedirs(bdir, exist_ok=True)
                    os.rename(stage, os.path.join(bdir, batch_id))
                except BaseException:
                    shutil.rmtree(stage, ignore_errors=True)
                    raise
        if replace:
            old_ids = F.broadcast(batch.select(self.id_col))
            self.codes = self.codes.join(old_ids, self.id_col, "left_anti")
            if self.vectors is not None:
                self.vectors = self.vectors.join(
                    old_ids, self.id_col, "left_anti"
                )
        self.codes = self.codes.unionByName(
            enc.select(self.id_col, "codes", "centroid"), allowMissingColumns=True
        )
        if self.vectors is not None:
            self.vectors = self.vectors.unionByName(
                self._assign_vectors(batch), allowMissingColumns=True
            )
        # mirror bookkeeping — the IvfSq8Index.add_batch contract
        self._mirror_path = (
            path if getattr(self, "_mirror_path", None) == path else None
        )
        return self

    def upsert(self, batch: DataFrame, path: str | None = None) -> "IvfPqIndex":
        """Replace-by-id ingest (upsert.go:16) — one atomic commit of
        fresh codes + tombstones for the same ids. See
        ``IvfSq8Index.upsert``."""
        return self.add_batch(batch, path=path, replace=True)

    def delete(self, ids, path: str | None = None) -> "IvfPqIndex":
        """Delete-by-id tombstone commit — the ``IvfSq8Index.delete``
        contract (atomic ``batches/<seq>_<uuid>/deletes`` rename,
        broadcast mask on every read path, folded physically by
        ``save``)."""
        _index_delete(self, ids, path)
        return self


def sq8_topk_cosine(
    codes_df: DataFrame,
    query_vec,
    deltas: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    scale: int = 1_000_000_000,
    impl: str = "expr",
) -> DataFrame:
    """Cosine over SQ8 — the reference's ACTIVE metric (main.go:28),
    completing the quantized metric triple (dot, euclidean, cosine).

    Normalize-at-encode: the codes table must hold vectors quantized
    AFTER L2 normalization (``l2_normalize`` at encode time — the
    store-once, score-many form the float index uses too). Then
    cos(x, q) = dot(x/‖x‖, q/‖q‖), so cosine ranking IS the integer dot
    ADC of ``sq8_topk`` with weights built from the NORMALIZED query —
    same codes-only scan, same exact-in-any-engine int64 arithmetic, no
    per-row float division anywhere. This function normalizes q with the
    same left-to-right fold ``l2_normalize`` uses (element square
    products, then sequential adds from 0.0) so the SQL oracle's
    ``list_reduce`` replay is bit-identical, and delegates to
    ``sq8_topk``. Zero-norm queries are rejected (no direction = no
    cosine); zero-norm CORPUS vectors normalize to NULL and never
    surface in the top-k (NULL scores sort last under DESC)."""
    acc = 0.0
    for v in query_vec:
        acc += float(v) * float(v)
    if acc <= 0.0:
        raise ValueError("cosine top-k needs a non-zero query vector")
    nrm = math.sqrt(acc)
    qn = [float(v) / nrm for v in query_vec]
    return sq8_topk(
        codes_df, qn, deltas, k=k, id_col=id_col, scale=scale, impl=impl
    )


def sq8_topk_euclidean(
    codes_df: DataFrame,
    query_vec,
    mins: list[float],
    deltas: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    scale: int = 1_000_000_000,
    impl: str = "expr",
) -> DataFrame:
    """Euclidean twin of ``sq8_topk`` — the SQ8 tier speaks all three of
    the reference's metrics (upsert.go:27 lists cosine/euclidean/
    dotproduct; cosine over SQ8 = this dot form on pre-normalized
    vectors). Rank by the expanded square with the query-only constant
    dropped: ‖x̂-q‖² ∝ Σ a_d·c_d² + b_d·c_d with a_d = ⌊Δ_d²·S+½⌋ and
    b_d = ⌊2Δ_d(min_d - q_d)·S+½⌋ — per-dim int64 weights, ASCENDING
    integer scores, same exact-in-any-engine property as the dot form.
    c² ≤ 65025 with dim·a_d ≪ 2⁶³ keeps the fold inside int64.

    ``impl="numpy"``: the same integer arithmetic as two matmuls per
    Arrow batch ((C∘C)·a + C·b) with a per-partition k-heap — the
    at-scale path at ada-002 dimensionality, bit-identical scores
    (pinned by test), mirroring ``sq8_topk``'s two implementations."""
    a = [int(np.floor(d * d * scale + 0.5)) for d in deltas]
    b = [
        int(np.floor(2 * d * (m - float(q)) * scale + 0.5))
        for q, m, d in zip(query_vec, mins, deltas)
    ]
    if impl == "numpy":
        av = np.asarray(a, dtype=np.int64)
        bv = np.asarray(b, dtype=np.int64)
        kk = k

        def part_topk(batches):
            import pandas as pd

            best: pd.DataFrame | None = None
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                c = np.vstack(pdf["sq8_codes"].to_numpy()).astype(np.int64)
                s = (c * c) @ av + c @ bv
                cur = pd.DataFrame({id_col: pdf[id_col], "score_int": s})
                best = cur if best is None else pd.concat((best, cur))
                best = best.sort_values(
                    ["score_int", id_col], ascending=[True, True]
                ).head(kk)
            if best is not None:
                yield best

        partial = codes_df.select(id_col, "sq8_codes").mapInPandas(
            part_topk, schema=f"{id_col} long, score_int long"
        )
        return partial.orderBy(
            F.col("score_int").asc(), F.col(id_col).asc()
        ).limit(k)
    aarr = F.array(*[F.lit(v).cast("long") for v in a])
    barr = F.array(*[F.lit(v).cast("long") for v in b])
    s_sq = F.aggregate(
        F.zip_with(
            F.col("sq8_codes"), aarr, lambda c, av: c.cast("long") * c * av
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    s_lin = F.aggregate(
        F.zip_with(F.col("sq8_codes"), barr, lambda c, bv: c.cast("long") * bv),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return (
        codes_df.select(F.col(id_col), (s_sq + s_lin).alias("score_int"))
        .orderBy(F.col("score_int").asc(), F.col(id_col).asc())
        .limit(k)
    )


def semdedup(
    df: DataFrame,
    n_clusters: int = 8,
    threshold: float = 0.97,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
    iters: int = 5,
    impl: str = "expr",
    sample_rows: int | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): SEMANTIC
    deduplication of an embedding corpus by clustering + within-cluster
    cosine pruning — the cluster scope is what makes embedding dedup
    tractable at LLM-pretraining scale. Where ``portable_lsh_join``
    finds near-IDENTICAL vectors (random-hyperplane buckets, high-τ),
    SemDeDup removes semantically REDUNDANT ones: k-means partitions
    the space, and pairwise cosine is computed only WITHIN a cluster —
    the candidate join is an equi-join on the centroid id, so shuffle
    and compare volume are Σ|cluster|², bounded by growing n_clusters
    with the corpus (the paper runs 50k clusters on LAION; cluster size,
    not corpus size, is the unit of quadratic work).

    Keeper rule (deterministic, paper §3: keep LOW-centroid-similarity
    points — "edge" examples carry more information): a row is removed
    iff some other row in its cluster has rounded cosine ≥ ``threshold``
    to it AND ranks before it by (centroid_similarity ASC, id ASC).
    The rule is a non-recursive EXISTS over the pair set, so the whole
    query phase replays in ANSI SQL against the persisted assignment
    (the k-means build itself stays unchecked, like every IVF oracle).

    Returns every input row with its cluster, rounded centroid
    similarity, and ``kept`` flag — downstream curation filters
    ``kept`` and writes the surviving corpus.

    Scale: assignment is the frozen-quantizer map (no shuffle); the
    pair join shuffles ids+vectors once on the centroid key; the
    EXISTS is a semi-join on the same key. Nothing is O(n²) globally
    and no collect exceeds k·dim centroid floats.

    ``impl``: ``"expr"`` (default, SQL-oracle-parity form) materializes
    the within-cluster pair set through a join; ``"numpy"`` is the
    at-scale kernel — ONE shuffle groups each cluster, then a blocked
    dense matmul (the paper's per-cluster similarity matrix) finds
    dominated rows WITHOUT materializing pairs: |cluster|·block cosine
    values live at a time, pair rows never shuffle. Same rounded-at-6
    scores and the same election; kept flags equal the expr path on the
    gate fixture (pinned by test). Zero-norm vectors: the expr path's
    NULL cosine never pairs; the numpy path scores them 0 — identical
    kept flags for any τ > 0. ``sample_rows`` fits the quantizer on a
    deterministic sample (the paper's regime — at 1M+ rows a full-corpus
    Lloyd fit costs more than the dedup)."""
    spark = df.sparkSession
    fit_on = df
    if sample_rows is not None:
        n = df.count()
        if n > sample_rows:
            fit_on = df.sample(fraction=sample_rows / n, seed=1)
    proto = IvfIndex.build_balanced(
        fit_on, n_centroids=n_clusters, id_col=id_col, vec_col=vec_col, iters=iters
    )
    assigned = assign_nearest_centroid(df, proto.centroids, vec_col)
    if impl == "numpy":
        cents = np.asarray(proto.centroids, dtype=np.float64)
        tau, rt = float(threshold), int(round_to)
        icol, vcol = id_col, vec_col
        id_type = df.schema[id_col].dataType.simpleString()

        def score_cell(pdf):
            import pandas as pd

            from whatsapp_vectordb_spark.operators.search import _round_half_up

            ids = pdf[icol].to_numpy()
            M = np.vstack(pdf[vcol].to_numpy()).astype(np.float64)
            cid = int(pdf["centroid"].iloc[0])
            norms = np.linalg.norm(M, axis=1)
            mn = M / np.where(norms == 0.0, 1.0, norms)[:, None]
            c = cents[cid]
            cn = c / (np.linalg.norm(c) or 1.0)
            # HALF_UP like F.round / DuckDB ROUND — numpy's default
            # half-to-even could flip a kept flag on a grid-exact tie
            cs = _round_half_up(mn @ cn, rt)
            # election order = (cent_sim ASC, id ASC); a row is dominated
            # iff any EARLIER row's similarity clears τ — computed in
            # row blocks against the earlier prefix so only
            # |block|·|prefix| cosines are ever resident (the paper's
            # per-cluster dense matrix, without the |cluster|² buffer)
            order = np.lexsort((ids, cs))
            mo = mn[order]
            nrows = len(ids)
            dom = np.zeros(nrows, dtype=bool)
            B = 4096
            for s in range(0, nrows, B):
                e = min(s + B, nrows)
                sim = _round_half_up(mo[s:e] @ mo[:e].T, rt)
                earlier = np.arange(e)[None, :] < np.arange(s, e)[:, None]
                dom[s:e] = ((sim >= tau) & earlier).any(axis=1)
            kept = np.empty(nrows, dtype=bool)
            kept[order] = ~dom
            return pd.DataFrame(
                {icol: ids, "centroid": np.int32(cid), "cent_sim": cs, "kept": kept}
            )

        return (
            assigned.select(id_col, vec_col, F.col("centroid").cast("int").alias("centroid"))
            .groupBy("centroid")
            .applyInPandas(
                score_cell,
                schema=f"{icol} {id_type}, centroid int, cent_sim double, kept boolean",
            )
        )
    cent_df = local_df(spark, 
        [(int(i), [float(x) for x in c]) for i, c in enumerate(proto.centroids)],
        "centroid int, _cv array<double>",
    )
    scored = assigned.join(F.broadcast(cent_df), "centroid").select(
        F.col(id_col),
        F.col(vec_col),
        F.col("centroid").cast("int").alias("centroid"),
        F.round(cosine_similarity(F.col(vec_col), F.col("_cv")), round_to).alias(
            "cent_sim"
        ),
    )
    a = scored.alias("a")
    b = scored.alias("b")
    # rows dominated by an earlier-ranked near-duplicate in their cluster
    removed = (
        a.join(
            b,
            on=[
                F.col("a.centroid") == F.col("b.centroid"),
                F.col(f"a.{id_col}") != F.col(f"b.{id_col}"),
                F.round(
                    cosine_similarity(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")),
                    round_to,
                )
                >= threshold,
                (F.col("b.cent_sim") < F.col("a.cent_sim"))
                | (
                    (F.col("b.cent_sim") == F.col("a.cent_sim"))
                    & (F.col(f"b.{id_col}") < F.col(f"a.{id_col}"))
                ),
            ],
        )
        .select(F.col(f"a.{id_col}").alias(id_col))
        .dropDuplicates([id_col])
    )
    return (
        scored.join(removed.withColumn("_rm", F.lit(True)), id_col, "left")
        .select(
            id_col,
            "centroid",
            "cent_sim",
            F.coalesce(~F.col("_rm"), F.lit(True)).alias("kept"),
        )
    )
