"""Deterministic text embedder — the engine's one scalar UDF (SURVEY.md §2.3).

The reference embeds one string per HTTPS call to OpenAI ada-002
(reference embed/embed.go:29-59, called per-row at embed.go:113 — a network
boundary on *every record*). Here the operator surface is identical
(text → dense float vector) but execution is an Arrow-batched pandas UDF:
one Python hop per ~10k-row batch, numpy-vectorized inside, linearly
scalable across executors. A real API-backed embedder would slot into the
same signature (batch in, batch out) with in-batch micro-batching + retries.

The default implementation is pure and seeded (FIXTURES.md §7): word
3-grams → per-gram PRNG (blake2b-seeded) ±1 sparse projection into ``dim``
buckets → sum → L2 normalize. Properties the tests rely on:
determinism across processes, ``cos(e(t), e(t)) == 1``, near-duplicate
texts score higher than unrelated texts, empty text → NULL (zero-norm
cosine is undefined; FIXTURES.md §3).
"""

from __future__ import annotations

import hashlib
import re
from functools import lru_cache

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType

_TOKEN_RE = re.compile(r"[^a-z0-9]+")
_NNZ_PER_GRAM = 8  # sparse projection fan-out per shingle


def _grams(text: str, max_n: int = 3) -> list[str]:
    """1..max_n word grams: unigrams give bag-of-words overlap (order-free
    similarity), higher grams add order sensitivity for near-dup ranking."""
    toks = [t for t in _TOKEN_RE.split(text.lower()) if t]
    if not toks:
        return []
    out = list(toks)
    for n in range(2, max_n + 1):
        out.extend(" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1))
    return out


@lru_cache(maxsize=1 << 16)
def _gram_projection(gram: str, dim: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """(indices, signs) of the ±1 sparse projection for one gram."""
    digest = hashlib.blake2b(f"{seed}:{gram}".encode(), digest_size=8).digest()
    rng = np.random.default_rng(int.from_bytes(digest, "big"))
    idx = rng.integers(0, dim, size=_NNZ_PER_GRAM)
    signs = rng.integers(0, 2, size=_NNZ_PER_GRAM) * 2.0 - 1.0
    return idx, signs


def embed_text(text: str | None, dim: int = 64, seed: int = 42) -> list[float] | None:
    """Pure scalar embedder; None/empty/tokenless text → None."""
    if text is None:
        return None
    grams = _grams(text)
    if not grams:
        return None
    vec = np.zeros(dim, dtype=np.float64)
    for g in grams:
        idx, signs = _gram_projection(g, dim, seed)
        np.add.at(vec, idx, signs)
    norm = float(np.linalg.norm(vec))
    if norm == 0.0:
        return None
    return (vec / norm).astype(np.float32).tolist()


def embed_udf(dim: int = 64, seed: int = 42):
    """Arrow-batched pandas UDF: STRING -> ARRAY<FLOAT> (the U1 operator)."""

    @F.pandas_udf(ArrayType(FloatType()))
    def _embed(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: embed_text(t, dim=dim, seed=seed))

    return _embed


def with_embedding(
    df,
    text_col: str = "text",
    out_col: str = "embedding",
    dim: int = 64,
    seed: int = 42,
    min_partitions: int | None = None,
):
    """Attach an embedding column — the Spark restatement of the reference's
    embed pipeline stage (embed/embed.go:92-129) minus the per-row network
    boundary.

    Embedding is CPU-bound Python: a single-file input (1-2 scan splits)
    would serialize it, so inputs narrower than ``min_partitions`` (default:
    the cluster's parallelism) are repartitioned first — the shuffle moves
    only the text the UDF must read anyway (measured 3.4× at sf0.1). Pass
    ``min_partitions=0`` to keep the input layout.
    """
    if min_partitions is None:
        min_partitions = df.sparkSession.sparkContext.defaultParallelism
    if min_partitions and df.rdd.getNumPartitions() < min_partitions:
        df = df.repartition(min_partitions)
    return df.withColumn(out_col, embed_udf(dim=dim, seed=seed)(F.col(text_col)))
