"""Shared localCheckpoint lifecycle helper for iterative/multi-pass operators."""

from __future__ import annotations

from pyspark.sql import DataFrame


def free_local_checkpoint(df: DataFrame) -> None:
    """Deterministically release a SUPERSEDED localCheckpoint's storage
    blocks. ContextCleaner only frees checkpoint blocks on driver GC of
    the RDD handle, which for an iterative loop means O(rounds·|V|) rows
    piling up in executor storage (and for repeated multi-pass text
    queries, one tokenized-corpus copy per call). The frame is unusable
    afterwards (the blocks ARE its only lineage) — call exclusively on
    frames that are never read again. Best-effort: the internal accessor
    is version-sensitive, so failures fall back to GC cleanup.

    Blocking (``unpersist(True)``): callers free superseded frames off the
    hot path, and synchronous removal makes storage-level assertions (and
    the memory reclaim itself) deterministic rather than racing the block
    manager (ADVICE r9).

    PRIVATE-API CANARY: this reaches through ``_jdf.queryExecution()``,
    which is not public API. On ANY Spark version bump, run
    ``tests/test_textops.py::test_rm3_releases_tokenized_checkpoint``
    first — it asserts the superseded blocks actually drop to zero, so it
    fails loudly if this accessor path goes stale (the fallback would
    silently reintroduce the per-call corpus-copy leak)."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(True)
    except Exception:
        pass
