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
    is version-sensitive, so failures fall back to GC cleanup."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass
