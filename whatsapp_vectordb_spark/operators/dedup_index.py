"""Persistent MinHash dedup index — incremental near-dup detection.

Batch dedup (``minhash_near_duplicates``) recomputes the whole corpus
per run; a 100 TB ingest pipeline instead keeps the corpus's dedup state
on disk and checks each NEW batch against it:

- ``signatures`` parquet: per-doc band keys (docs × bands rows, two
  8-byte-ish columns) — the LSH candidate index;
- ``shingles`` parquet: per-doc 60-bit hashed shingle ids — the exact
  Jaccard verify input (the only per-token state, ~8 bytes/shingle).

On disk both tables live under ``batches/<uuid>/{signatures,shingles}``
— one dir per committed batch, committed with a single atomic dir
rename so the two tables can never be observed half-appended.

``add_batch`` computes the batch's keys/shingles once, finds candidate
pairs batch↔corpus AND batch↔batch by band-key equi-join, verifies
exact Jaccard on the stored shingle ids, then appends the batch's state
— so the index grows by O(batch), never rescanning the corpus, and the
scan side of the candidate join is the narrow band-key table, not
documents. Exactly the same hash pipeline as the batch operator, so
results match it bit-for-bit (asserted in tests/test_dedup_index.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from whatsapp_vectordb_spark.session import local_df
from pyspark.sql import functions as F

from whatsapp_vectordb_spark.operators.dedup import (
    _hashed_shingles,
    _signatures_from_hashed,
    _verify_jaccard,
)


def _gc_staging(path: str) -> None:
    """Delete orphaned ``_staging/<uuid>`` dirs left by a HARD crash
    before the commit rename (ADVICE r13): the in-process exception path
    already cleans up, but a killed process leaves its staging dir
    behind forever. Orphans are invisible to reads (only committed
    ``batches/``/``fingerprints/`` state is listed) so correctness never
    depended on this sweep — it just stops dead bytes accumulating.
    Called at the top of every ``add_batch`` under the single-writer
    posture these indexes assume (a concurrent writer's in-flight stage
    would be swept — don't run two writers against one index)."""
    import shutil

    stag = os.path.join(path, "_staging")
    if os.path.isdir(stag):
        for d in os.listdir(stag):
            full = os.path.join(stag, d)
            if os.path.isdir(full):
                shutil.rmtree(full, ignore_errors=True)
            else:  # e.g. an orphaned _meta_*.tmp from a crashed publish
                try:
                    os.remove(full)
                except OSError:
                    pass


def _parse_seq(name: str) -> int:
    """Commit sequence from a state entry name — ``<seq>_<uuid>`` batch
    dirs, ``<seq>_<uuid>.parquet`` fingerprint files, or
    ``compact_<seq>_<uuid>`` compaction entries (the serving layouts'
    ``_parse_batch_seq`` contract: zero-padded at-least-8-digit decimal
    head). Legacy unnumbered entries order as 0 — they predate the
    time-travel verbs and are append-only data, so any bound includes
    them (round 17)."""
    if name.startswith("compact_"):
        name = name[len("compact_") :]
    if "_" not in name:
        return 0
    head = name.split("_", 1)[0]
    return int(head) if head.isdigit() and len(head) >= 8 else 0


def _lease(path: str, verb: str):
    """The house writer lease (``ann._writer_lease`` — O_EXCL lock file,
    stale-breaking, same-thread reentrant), shared by the dedup indexes:
    they carry the identical single-writer posture, so the r17
    enforcement applies here too. Lazy import: ``operators.ann`` only
    imports this module inside function bodies, so no cycle."""
    from whatsapp_vectordb_spark.operators.ann import _writer_lease

    return _writer_lease(path, verb)


class _BatchDirIndex:
    """Shared machinery for indexes whose state accretes as ATOMIC
    ``batches/<seq>_<uuid>`` directory commits: live-dir listing with
    ``replaces.json`` manifest supersession, the count+xxhash64-XOR
    content fingerprint, the checksum-gated single-rename ``compact()``,
    commit-seq TIME TRAVEL (``as_of`` bounds on every state read — a
    compaction RETAINS the dirs it supersedes, invisible to tip reads
    by manifest, until ``vacuum()`` reclaims them; r16 verdict #4), and
    the ``maintenance_tick`` compaction policy. Subclasses set
    ``_TABLES`` (the table subdirs committed together in each batch
    dir) and implement their own ``add_batch``."""

    _TABLES: tuple[str, ...] = ()

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    @property
    def _batches_path(self) -> str:
        return os.path.join(self.path, "batches")

    def _all_batch_dirs(self) -> list[str]:
        root = self._batches_path
        if not os.path.exists(root):
            return []
        return [
            b
            for b in sorted(os.listdir(root))
            if os.path.isdir(os.path.join(root, b))
        ]

    def _next_seq(self) -> int:
        """1 + max committed seq over ALL dirs (dead included — a
        compaction's retained victims must never be re-numbered over).
        Callers hold the writer lease across allocation + rename."""
        return 1 + max(
            (_parse_seq(b) for b in self._all_batch_dirs()), default=0
        )

    def snapshots(self) -> list[int]:
        """Readable time-travel bounds: every commit seq still on disk
        (retained-dead dirs count — that is what retention is for),
        ascending, 0 prepended (the empty pre-ingest state). A bound
        older than what ``vacuum`` kept raises at read time."""
        return sorted(
            {0} | {_parse_seq(b) for b in self._all_batch_dirs()}
        )

    def _live_batch_dirs(self, as_of: int | None = None) -> list[str]:
        """Batch dir names LIVE at the tip (default) or at commit bound
        ``as_of``: dirs with seq <= the bound, minus every dir a
        manifest visible AT THAT BOUND declares dead. A compacted dir
        carries the manifest of the dirs it merged; the moment its
        single commit rename lands, the replaced dirs are dead to TIP
        readers even while still on disk — but a bound BEFORE the
        compaction ignores its manifest and reads the retained dirs
        (time travel through compaction). Manifests from dead dirs
        still apply — a chain of compactions must keep every
        transitively-replaced dir dead.

        VACUUM TRIPWIRE: if a manifest names a dir that is gone from
        disk yet would be LIVE at this bound (named only by manifests
        NEWER than the bound), the bound's history was vacuumed —
        raise instead of silently serving a partial state."""
        dirs = self._all_batch_dirs()
        on_disk = set(dirs)
        if as_of is not None:
            dirs = [b for b in dirs if _parse_seq(b) <= as_of]
        dead = self._dead_names(as_of)
        if as_of is not None:
            vanished = self._dead_names(None) - on_disk
            lost = [
                v
                for v in vanished
                if _parse_seq(v) <= as_of and v not in dead
            ]
            if lost:
                raise ValueError(
                    f"as_of={as_of} is no longer readable at {self.path!r}: "
                    f"vacuum reclaimed commits this bound needs ({sorted(lost)}); "
                    "re-read snapshots() for the retained bounds"
                )
        return [b for b in dirs if b not in dead]

    def _dead_names(self, as_of: int | None = None) -> set[str]:
        """Every name declared dead by a manifest visible at the bound
        (manifests in dirs with seq > ``as_of`` do not apply — their
        compaction had not happened yet)."""
        import json as _json

        root = self._batches_path
        dead: set[str] = set()
        if not os.path.exists(root):
            return dead
        for b in os.listdir(root):
            if as_of is not None and _parse_seq(b) > as_of:
                continue
            man = os.path.join(root, b, "replaces.json")
            if os.path.exists(man):
                try:
                    with open(man) as f:
                        dead.update(_json.load(f))
                except (OSError, ValueError):
                    pass  # unreadable manifest: treat as a plain batch dir
        return dead

    def _gc_dead_batches(self) -> None:
        """Delete batch dirs superseded by a committed compaction (they
        are invisible to ``_live_batch_dirs`` already — this only
        reclaims bytes; crash-safe at any point)."""
        import shutil

        root = self._batches_path
        if not os.path.exists(root):
            return
        live = set(self._live_batch_dirs())
        for b in os.listdir(root):
            full = os.path.join(root, b)
            if os.path.isdir(full) and b not in live:
                shutil.rmtree(full, ignore_errors=True)

    @staticmethod
    def _content_fingerprint(df: DataFrame) -> tuple[int, int]:
        """(row count, order-insensitive XOR of per-row xxhash64) — the
        compaction invariant check. Count catches cardinality drift
        (XOR alone would cancel an exact duplication); XOR catches
        content swaps at equal cardinality."""
        row = df.select(
            F.count(F.lit(1)).alias("n"),
            F.expr(
                "coalesce(bit_xor(xxhash64(" + ", ".join(df.columns) + ")), 0)"
            ).alias("x"),
        ).collect()[0]
        return int(row["n"]), int(row["x"])

    def _stored(self, which: str, as_of: int | None = None) -> DataFrame | None:
        """Union of table ``which`` across batch dirs LIVE at the tip
        (default) or at time-travel bound ``as_of`` (see
        ``_live_batch_dirs``). A batch dir only exists once its single
        commit rename succeeded, so everything listed here is complete —
        all tables, all files."""
        root = self._batches_path
        paths = [
            os.path.join(root, b, which)
            for b in self._live_batch_dirs(as_of)
            if os.path.isdir(os.path.join(root, b, which))
            and any(
                f.endswith(".parquet")
                for f in os.listdir(os.path.join(root, b, which))
            )
        ]
        if not paths:
            return None
        return self.spark.read.parquet(*paths)

    def _commit_batch(self, frames: dict[str, DataFrame]) -> None:
        """Stage every table of one batch under a single ``_staging``
        dir, then commit with ONE atomic directory rename into
        ``batches/<seq>_<uuid>`` — the tables become visible together or
        not at all (the MinHash index's ADVICE-r12 contract,
        generalized). Seq allocation + rename run under the writer
        lease (r17 — the serving layouts' enforced single-writer
        contract)."""
        import shutil
        import uuid

        from whatsapp_vectordb_spark.operators.ann import _run_writes

        with _lease(self.path, "add_batch"):
            batch_id = f"{self._next_seq():08d}_{uuid.uuid4().hex}"
            stage = os.path.join(self.path, "_staging", batch_id)
            try:
                # one commit's tables are independent jobs over pinned
                # inputs — run them concurrently (guide §2.6), and let
                # REBALANCE coalesce each to advisory-size files instead
                # of one tiny file per upstream task (guide §6)
                _run_writes(
                    [
                        (
                            lambda w=which, d=df: d.hint("rebalance")
                            .write.mode("overwrite")
                            .parquet(os.path.join(stage, w))
                        )
                        for which, df in frames.items()
                    ]
                )
                os.makedirs(self._batches_path, exist_ok=True)
                os.rename(stage, os.path.join(self._batches_path, batch_id))
            except BaseException:
                shutil.rmtree(stage, ignore_errors=True)
                raise

    def compact(self) -> int:
        """Merge every live ``batches/<uuid>`` dir into ONE — the
        maintenance verb the per-micro-batch atomic commit needs (at
        streaming cadence one dir lands per trigger; file/dir LISTING is
        what degrades first, the data itself is fine). Returns the
        number of dirs merged (0 = nothing to do).

        Same atomicity as ``add_batch``: the merged tables stage under
        ``_staging/<uuid>`` together with a ``replaces.json`` manifest
        naming the dirs they supersede, then ONE ``os.rename`` publishes
        the compacted dir — readers switch from N dirs to 1 atomically,
        and a crash at ANY point leaves a readable, correct index (old
        dirs until the rename; merged dir after, with replaced dirs dead
        by manifest even if their deletion never ran). Before the
        rename, a content-checksum invariant (count + xxhash64 XOR per
        table) verifies the staged data equals the live union —
        mismatch aborts with the old state intact. Mirrors
        ``VectorIndex.compact`` (index.py) for the vector table.

        RETENTION (r17): the superseded dirs are NOT deleted — dead by
        manifest for tip readers, they are exactly the snapshots a
        time-travel bound before this compaction reads; ``vacuum()`` is
        the explicit reclaim verb (the serving layouts' fold/vacuum
        split). Runs under the writer lease."""
        import json as _json
        import shutil
        import uuid

        with _lease(self.path, "compact"):
            _gc_staging(self.path)
            live = self._live_batch_dirs()
            if len(live) <= 1:
                return 0
            before = {
                which: self._content_fingerprint(df)
                for which in self._TABLES
                if (df := self._stored(which)) is not None
            }
            batch_id = f"{self._next_seq():08d}_{uuid.uuid4().hex}"
            stage = os.path.join(self.path, "_staging", batch_id)
            try:
                for which in before:
                    self._stored(which).write.mode("overwrite").parquet(
                        os.path.join(stage, which)
                    )
                os.makedirs(stage, exist_ok=True)  # both tables may be empty
                # TRANSITIVE manifest: carry forward every already-dead
                # name too — otherwise GC deleting an older compact dir
                # (whose manifest was keeping a failed-rmtree survivor
                # dead) before that survivor would resurrect it as live
                # state
                with open(os.path.join(stage, "replaces.json"), "w") as f:
                    _json.dump(sorted(set(live) | self._dead_names()), f)
                for which, fp in before.items():
                    staged = self.spark.read.parquet(os.path.join(stage, which))
                    if self._content_fingerprint(staged) != fp:
                        raise RuntimeError(
                            f"compaction checksum mismatch on {which!r}: "
                            "staged content differs from the live union — "
                            "aborting with the old state intact"
                        )
                os.rename(stage, os.path.join(self._batches_path, batch_id))
            except BaseException:
                shutil.rmtree(stage, ignore_errors=True)
                raise
            return len(live)

    def vacuum(self) -> None:
        """Reclaim compaction-superseded batch dirs and orphaned staging
        — the explicit retention-expiry verb (r17): until it runs,
        every pre-compaction commit stays readable via
        ``_stored(..., as_of)``; after it, those bounds raise loudly at
        read time (the ``_live_batch_dirs`` vacuum tripwire). Under the
        writer lease — racing a compaction could delete the dir it is
        mid-publishing against."""
        with _lease(self.path, "vacuum"):
            _gc_staging(self.path)
            self._gc_dead_batches()

    def maintenance_tick(self, max_live_dirs: int = 8) -> dict:
        """ONE compaction-policy decision — the verb a background
        maintenance loop runs per index per interval (the serving
        layouts' ``maintenance_tick`` contract): poll the live dir
        count (one listdir + manifest reads, no Spark job); compact
        when it exceeds ``max_live_dirs`` (dir LISTING is what degrades
        at streaming cadence, one dir lands per trigger). Retention
        untouched — ``vacuum`` stays a separate decision. Runs under
        the writer lease end-to-end (poll→compact TOCTOU)."""
        with _lease(self.path, "maintenance_tick"):
            before = len(self._live_batch_dirs())
            merged = self.compact() if before > max_live_dirs else 0
            return {
                "compacted": merged > 0,
                "live_dirs_before": before,
                "live_dirs_after": len(self._live_batch_dirs()),
            }


    def verify(self, deep: bool = False) -> dict:
        """FSCK for a batch-dir dedup index — the dedup twin of the
        serving layouts' ``verify_layout`` (one read-only verb, every
        violation at once; same error/warning split):

        errors: duplicate commit seqs across state dirs (a raced
        writer — the ``_writer.lock`` lease exists to prevent it; reads
        cannot order equal seqs). warnings: orphaned ``_staging``
        entries, a stale writer lease, unreadable ``replaces.json``
        manifests (reads degrade them to plain batch dirs — flagged
        because a half-written manifest usually means an interrupted
        compaction publish).

        ``deep=True`` adds the RETENTION-CONSISTENCY replay, phrased
        entirely in public time-travel semantics: a compaction commit
        adds no data, so for every live dir carrying a manifest the
        per-table content fingerprint at bound ``seq`` must equal the
        bound ``seq - 1`` just before it — i.e. the retained victims
        still reproduce exactly what their compaction published. A
        bound already vacuumed skips with a note (nothing left to
        compare), never a false error. Metadata walk takes no lease —
        safe against a live writer (worst case a transient flag)."""
        import json as _json
        import time as _time

        errors: list[str] = []
        warnings: list[str] = []
        info: dict = {"path": self.path}

        dirs = self._all_batch_dirs()
        info["state_dirs"] = len(dirs)
        seen: dict[int, str] = {}
        for b in dirs:
            s = _parse_seq(b)
            if s >= 1 and s in seen:
                errors.append(
                    f"duplicate commit seq {s}: {seen[s]!r} and {b!r} — "
                    "a second writer violated the single-writer "
                    "contract; remove the losing commit"
                )
            seen[s] = b
            man = os.path.join(self._batches_path, b, "replaces.json")
            if os.path.exists(man):
                try:
                    with open(man) as f:
                        _json.load(f)
                except (OSError, ValueError):
                    warnings.append(
                        f"unreadable replaces.json in {b!r} — reads "
                        "treat it as a plain batch dir (interrupted "
                        "compaction publish?)"
                    )

        stag = os.path.join(self.path, "_staging")
        orphans = sorted(os.listdir(stag)) if os.path.isdir(stag) else []
        info["staging_orphans"] = len(orphans)
        if orphans:
            warnings.append(
                f"{len(orphans)} orphaned _staging entr"
                f"{'y' if len(orphans) == 1 else 'ies'} — reclaimed by "
                "the next mutation verb"
            )

        lease = os.path.join(self.path, "_writer.lock")
        if os.path.exists(lease):
            probe = _lease(self.path, "verify")
            holder = probe._read_holder()
            if probe._is_stale(holder, _time.time()):
                warnings.append(
                    f"stale _writer.lock (holder {holder!r} dead or "
                    "past TTL) — the next acquirer breaks it"
                )
            else:
                info["active_writer"] = holder

        if deep and not errors:
            checked = []
            for b in self._live_batch_dirs():
                if not os.path.exists(
                    os.path.join(self._batches_path, b, "replaces.json")
                ):
                    continue
                s = _parse_seq(b)
                for which in self._TABLES:
                    try:
                        at = self._stored(which, as_of=s)
                        before = self._stored(which, as_of=s - 1)
                    except ValueError:
                        checked.append((s, which, "vacuumed — skipped"))
                        continue
                    fp_at = (
                        self._content_fingerprint(at)
                        if at is not None
                        else (0, 0)
                    )
                    fp_before = (
                        self._content_fingerprint(before)
                        if before is not None
                        else (0, 0)
                    )
                    if fp_at != fp_before:
                        errors.append(
                            f"compaction commit seq {s} table {which!r}: "
                            f"content fingerprint {fp_at} differs from "
                            f"the pre-compaction bound {fp_before} — the "
                            "retained victims no longer reproduce what "
                            "the compaction published"
                        )
                    else:
                        checked.append((s, which, "ok"))
            info["deep_checked"] = checked

        return {"ok": not errors, "errors": errors,
                "warnings": warnings, "info": info}


class MinHashDedupIndex(_BatchDirIndex):
    _TABLES = ("signatures", "shingles")

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        num_hashes: int = 16,
        bands: int = 4,
        shingle_n: int = 3,
        threshold: float = 0.5,
    ):
        super().__init__(spark, path)
        self.num_hashes = num_hashes
        self.bands = bands
        self.shingle_n = shingle_n
        self.threshold = threshold

    def _banded_from_hashed(self, sh: DataFrame) -> DataFrame:
        """Banded keys derived from a ``(doc_id, _x1, _x2, _h)`` hashed-
        shingle frame (signature mins + band-key md5 — pure derivation,
        no new source reads)."""
        sig = _signatures_from_hashed(sh, "doc_id", self.num_hashes)
        r = self.num_hashes // self.bands
        band_structs = [
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws(
                        ",",
                        *[
                            F.col(f"s{i}").cast("string")
                            for i in range(b * r, (b + 1) * r)
                        ],
                    )
                ).alias("band_key"),
            )
            for b in range(self.bands)
        ]
        return sig.select(
            "doc_id", F.explode(F.array(*band_structs)).alias("bk")
        ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.band_key").alias("band_key"))

    def add_batch(
        self,
        batch: DataFrame,
        id_col: str = "doc_id",
        pairs_path: str | None = None,
        batch_key=None,
    ) -> DataFrame:
        """Dedup-check ``batch`` against the stored corpus AND itself, then
        fold it into the index. Returns verified near-dup pairs
        ``(id_a, id_b, jaccard)`` where at least one side is a batch doc;
        pairs order (id_a < id_b) regardless of which side is new.

        ``pairs_path`` + ``batch_key``: same durability contract as
        ``WinnowDedupIndex.add_batch`` — pairs land durably in
        ``pairs_path/batch_id=<batch_key>`` BEFORE the state appends
        commit, and a post-commit retry (whose anti-join recomputes an
        empty pair set) never clobbers the committed batch's pair file.
        Without it, callers must persist the returned pairs before
        acknowledging the batch, or a crash-after-commit retry silently
        loses them.

        Re-ingest-safe: doc_ids already in the index are anti-joined out of
        the batch before anything is computed — without this, re-running a
        failed/duplicate ingest would double-count the doc's shingles in
        the Jaccard COUNT(*) sizes and silently corrupt every future pair
        involving it. Crash-safe (ADVICE r12): both tables are staged
        under ONE batch directory and committed with a SINGLE atomic
        ``os.rename`` of that directory — signatures and shingles become
        visible together or not at all, so there is no window where a doc
        has band rows without its shingles (anti-joined out forever with
        a broken verify side) or shingles without its signatures
        (re-ingested and double-counted).

        The returned pairs are LAZY but PINNED (r18): every input of the
        pair plan is immutable — the batch's hashed shingles are eagerly
        localCheckpointed (which also pins the re-ingest anti-join
        against the pre-commit state), and the stored side reads the
        pre-commit batch dirs by explicit path; the append below only
        ADDS a sibling dir, so consuming the result at any later point
        (after further ingests, after a compaction — compaction RETAINS
        its victims) computes exactly this batch's verified pair set.
        The candidate join + Jaccard verify therefore run only when the
        pairs are actually consumed — an ingest whose caller never reads
        them (or reads them from ``pairs_path``) never pays for them.
        Only ``vacuum()`` can invalidate an unconsumed result, loudly
        (the referenced dirs disappear): consume or persist returned
        pairs before vacuuming, as the durability contract already
        requires."""
        _gc_staging(self.path)
        # ONE read of the stored signatures serves both the re-ingest
        # anti-join and the candidate join's stored side (r18 — the
        # second _stored("signatures") paid a second listing + schema
        # inference per ingest for an identical frame)
        stored_banded = self._stored("signatures")
        if stored_banded is not None:
            batch = batch.join(
                stored_banded.select(F.col("doc_id").alias(id_col)).dropDuplicates(),
                id_col,
                "left_anti",
            )
        # ONE eager pin of the expensive map work (tokenize + shingle +
        # md5); signatures, band keys, commit writes and the pair verify
        # all derive from these blocks without touching live state again
        sh_new = (
            _hashed_shingles(batch, "text", id_col, self.shingle_n)
            .select(F.col(id_col).alias("doc_id"), "_x1", "_x2", "_h")
            .localCheckpoint(eager=True)
        )
        banded_new = self._banded_from_hashed(sh_new)

        stored_sh = self._stored("shingles")
        all_banded = (
            banded_new
            if stored_banded is None
            else stored_banded.unionByName(banded_new)
        )
        all_sh = sh_new if stored_sh is None else stored_sh.unionByName(sh_new)

        a = banded_new.alias("a")  # new side drives the probe
        b = all_banded.alias("b")
        cand = (
            a.join(
                b,
                on=[
                    F.col("a.band") == F.col("b.band"),
                    F.col("a.band_key") == F.col("b.band_key"),
                    F.col("a.doc_id") != F.col("b.doc_id"),
                ],
            )
            .select(
                F.least(F.col("a.doc_id"), F.col("b.doc_id")).alias("id_a"),
                F.greatest(F.col("a.doc_id"), F.col("b.doc_id")).alias("id_b"),
            )
            .dropDuplicates(["id_a", "id_b"])
        )
        pairs = _verify_jaccard(
            cand, all_sh.select(F.col("doc_id"), "_h"), "doc_id", self.threshold, 6
        )
        if pairs_path is not None:
            if batch_key is None:
                raise ValueError("pairs_path requires a stable batch_key")
            dest = os.path.join(pairs_path, f"batch_id={batch_key}")
            if not sh_new.isEmpty() or not os.path.exists(dest):
                pairs.hint("rebalance").write.mode("overwrite").parquet(dest)
        self._commit_appends(banded_new, sh_new)
        return pairs

    def pairs_at(self, as_of: int | None = None) -> DataFrame:
        """The index's FULL verdict set — every verified near-dup pair
        ``(id_a, id_b, jaccard)`` derivable from the state committed at
        bound ``as_of`` (tip when None): band-key candidates within the
        bounded signatures, exact Jaccard on the bounded shingles. This
        is the time-travel read (r16 verdict #4): "which docs did
        yesterday's corpus consider duplicates, and why" replayed from
        retained commits — equal to the union of the per-batch
        ``add_batch`` pair sets through that commit (documents are
        immutable, so a pair exists iff both members' state is in the
        bound — the same argument as the union-of-batches ≡ one-shot
        invariant)."""
        banded = self._stored("signatures", as_of)
        if banded is None:
            return local_df(self.spark, 
                [], "id_a long, id_b long, jaccard double"
            )
        sh = self._stored("shingles", as_of)
        a, b = banded.alias("a"), banded.alias("b")
        cand = (
            a.join(
                b,
                on=[
                    F.col("a.band") == F.col("b.band"),
                    F.col("a.band_key") == F.col("b.band_key"),
                    F.col("a.doc_id") < F.col("b.doc_id"),
                ],
            )
            .select(
                F.col("a.doc_id").alias("id_a"),
                F.col("b.doc_id").alias("id_b"),
            )
            .dropDuplicates(["id_a", "id_b"])
        )
        return _verify_jaccard(
            cand, sh.select("doc_id", "_h"), "doc_id", self.threshold, 6
        )

    def _commit_appends(self, banded_new: DataFrame, sh_new: DataFrame) -> None:
        """Stage BOTH tables under one batch directory, then commit with a
        SINGLE atomic directory rename into ``batches/<seq>_<uuid>/``
        (``_BatchDirIndex._commit_batch``).

        The pre-r13 scheme renamed part-files into two live dirs in a
        loop; a crash mid-loop could leave a doc with signatures but no
        shingles — the re-ingest anti-join (keyed on stored signature
        doc_ids) would then skip the doc forever while its Jaccard verify
        side stayed broken. One dir-level rename has no such window: a
        batch is either fully in (both tables, all files) or fully out.
        Cost: ``_stored`` unions per-batch dirs (micro-batch counts;
        ``compact()`` merges them when listing matters)."""
        self._commit_batch({"signatures": banded_new, "shingles": sh_new})


class WinnowDedupIndex:
    """Persistent winnowing-fingerprint index — incremental SUBSTRING-level
    dedup, the ingest-time twin of ``winnow_duplicate_pairs`` exactly as
    ``MinHashDedupIndex`` is the twin of ``minhash_near_duplicates``.

    State is ONE parquet table ``fingerprints``: the selected
    ``(doc_id, fp_pos, fp_hash)`` rows — ~10-20 rows/doc at the default
    k=5/w=4 (the winnowing density is ~2/(w+1) of shingles), so the
    stored index is orders of magnitude smaller than the shingle state
    the MinHash index must keep for Jaccard verification; winnowing
    needs no verify table because each shared hash IS the evidence (a
    shared ≥k-token run).

    ``add_batch`` computes the batch's fingerprints once, probes
    batch↔corpus and batch↔batch via the fp_hash equi-join (inverted
    index, never O(n²)), and appends only the batch's rows — O(batch)
    growth, the corpus is never rescanned. Documents are immutable, so a
    pair is discovered exactly when its LATER member is ingested, with
    the earlier member's fingerprints already stored — hence the union
    of per-batch pair sets equals the one-shot batch operator
    bit-for-bit (asserted in tests). ``max_df`` is deliberately not
    offered here: an incremental df changes as the corpus grows, which
    would break that batch-equality contract; apply hot-fingerprint
    filtering downstream if needed.
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        k: int = 5,
        w: int = 4,
        min_shared: int = 2,
    ):
        self.spark = spark
        self.path = path
        self.k = k
        self.w = w
        self.min_shared = min_shared

    @property
    def _fp_path(self) -> str:
        return os.path.join(self.path, "fingerprints")

    def _all_entries(self) -> list[str]:
        p = self._fp_path
        if not os.path.exists(p):
            return []
        return [
            e
            for e in sorted(os.listdir(p))
            if e.endswith(".parquet")
            or (e.startswith("compact_") and os.path.isdir(os.path.join(p, e)))
        ]

    def _next_seq(self) -> int:
        """1 + max committed seq over ALL entries (dead included).
        Callers hold the writer lease across allocation + rename."""
        return 1 + max((_parse_seq(e) for e in self._all_entries()), default=0)

    def snapshots(self) -> list[int]:
        """Readable time-travel bounds — the ``_BatchDirIndex`` contract
        (every commit seq still on disk, 0 = pre-ingest)."""
        return sorted({0} | {_parse_seq(e) for e in self._all_entries()})

    def _live_entries(self, as_of: int | None = None) -> list[str]:
        """State entry names under ``fingerprints/`` LIVE at the tip
        (default) or at commit bound ``as_of``: loose
        ``<seq>_<uuid>.parquet`` files (one per committed batch) plus
        ``compact_<seq>_<uuid>`` dirs, minus every name in a manifest
        visible AT THE BOUND — same supersession + retention +
        vacuum-tripwire rules as ``_BatchDirIndex._live_batch_dirs``
        (a committed compaction makes the merged entries dead to tip
        readers even before deletion; a bound BEFORE it reads them)."""
        entries = self._all_entries()
        on_disk = set(entries)
        if as_of is not None:
            entries = [e for e in entries if _parse_seq(e) <= as_of]
        dead = self._dead_entry_names(as_of)
        if as_of is not None:
            vanished = self._dead_entry_names(None) - on_disk
            lost = [
                v
                for v in vanished
                if _parse_seq(v) <= as_of and v not in dead
            ]
            if lost:
                raise ValueError(
                    f"as_of={as_of} is no longer readable at {self.path!r}: "
                    f"vacuum reclaimed commits this bound needs ({sorted(lost)}); "
                    "re-read snapshots() for the retained bounds"
                )
        return [e for e in entries if e not in dead]

    def _dead_entry_names(self, as_of: int | None = None) -> set[str]:
        """Every entry name declared dead by a compact manifest visible
        at the bound (newer compactions' manifests do not apply)."""
        import json as _json

        p = self._fp_path
        dead: set[str] = set()
        if not os.path.exists(p):
            return dead
        for e in os.listdir(p):
            if as_of is not None and _parse_seq(e) > as_of:
                continue
            man = os.path.join(p, e, "replaces.json")
            if e.startswith("compact_") and os.path.exists(man):
                try:
                    with open(man) as f:
                        dead.update(_json.load(f))
                except (OSError, ValueError):
                    pass
        return dead

    def _stored(self, as_of: int | None = None) -> DataFrame | None:
        paths = []
        for e in self._live_entries(as_of):
            full = os.path.join(self._fp_path, e)
            if e.endswith(".parquet"):
                paths.append(full)
            else:
                data = os.path.join(full, "data")
                if os.path.isdir(data) and any(
                    f.endswith(".parquet") for f in os.listdir(data)
                ):
                    paths.append(data)
        if not paths:
            return None
        return self.spark.read.parquet(*paths)

    def pairs_at(self, as_of: int | None = None) -> DataFrame:
        """The index's FULL verdict set at commit bound ``as_of`` (tip
        when None): every pair sharing >= ``min_shared`` winnowing
        fingerprints within the bounded state — the substring tier's
        time-travel read (r16 verdict #4), equal to the union of the
        per-batch ``add_batch`` pair sets through that commit (documents
        immutable — the union-of-batches ≡ one-shot argument)."""
        fp = self._stored(as_of)
        if fp is None:
            return local_df(self.spark, 
                [], "id_a long, id_b long, n_shared long"
            )
        d = fp.select("doc_id", "fp_hash").distinct()
        a, b = d.alias("a"), d.alias("b")
        return (
            a.join(
                b,
                on=[
                    F.col("a.fp_hash") == F.col("b.fp_hash"),
                    F.col("a.doc_id") < F.col("b.doc_id"),
                ],
            )
            .select(
                F.col("a.doc_id").alias("id_a"),
                F.col("b.doc_id").alias("id_b"),
            )
            .groupBy("id_a", "id_b")
            .agg(F.count("*").alias("n_shared"))
            .where(F.col("n_shared") >= self.min_shared)
        )

    def _gc_dead_entries(self) -> None:
        """Reclaim entries superseded by a committed compaction (already
        invisible to reads; crash-safe at any point)."""
        import shutil

        p = self._fp_path
        if not os.path.exists(p):
            return
        live = set(self._live_entries())
        for e in os.listdir(p):
            if e in live:
                continue
            full = os.path.join(p, e)
            if e.endswith(".parquet") and os.path.isfile(full):
                os.remove(full)
            elif e.startswith("compact_") and os.path.isdir(full):
                shutil.rmtree(full, ignore_errors=True)

    def compact(self) -> int:
        """Merge every live state entry into ONE ``compact_<uuid>`` dir —
        the per-batch single-file commits (the right durability call)
        accumulate one file per micro-batch and file LISTING degrades at
        streaming cadence. Returns the number of entries merged.

        Atomicity mirrors ``MinHashDedupIndex.compact``: merged data +
        a ``replaces.json`` manifest stage under ``_staging/<uuid>`` and
        publish with ONE ``os.rename``; a count + xxhash64-XOR checksum
        against the live union gates the rename; a crash at any point
        leaves a readable, correct index. RETENTION (r17): superseded
        entries stay on disk — dead by manifest for tip readers, they
        are the pre-compaction time-travel bounds until ``vacuum()``
        reclaims them. Under the writer lease."""
        import json as _json
        import shutil
        import uuid

        with _lease(self.path, "compact"):
            _gc_staging(self.path)
            live = self._live_entries()
            if len(live) <= 1:
                return 0
            stored = self._stored()
            if stored is None:
                # >1 live entries but none yields parquet data (e.g.
                # compact dirs whose data subdir was lost): nothing to
                # merge — the fingerprint of None would raise
                # AttributeError (ADVICE r14)
                return 0
            before = _BatchDirIndex._content_fingerprint(stored)
            cid = f"compact_{self._next_seq():08d}_{uuid.uuid4().hex}"
            stage = os.path.join(self.path, "_staging", cid)
            try:
                stored.write.mode("overwrite").parquet(
                    os.path.join(stage, "data")
                )
                with open(os.path.join(stage, "replaces.json"), "w") as f:
                    # transitive manifest (same resurrection hazard as the
                    # batch-dir compact): keep already-dead names dead
                    _json.dump(
                        sorted(set(live) | self._dead_entry_names()), f
                    )
                staged = self.spark.read.parquet(os.path.join(stage, "data"))
                if _BatchDirIndex._content_fingerprint(staged) != before:
                    raise RuntimeError(
                        "compaction checksum mismatch on fingerprints: "
                        "staged content differs from the live union — "
                        "aborting with the old state intact"
                    )
                os.rename(stage, os.path.join(self._fp_path, cid))
            except BaseException:
                shutil.rmtree(stage, ignore_errors=True)
                raise
            return len(live)

    def vacuum(self) -> None:
        """Reclaim compaction-superseded entries + orphaned staging —
        the explicit retention-expiry verb (the ``_BatchDirIndex.vacuum``
        contract); expired bounds raise loudly at read time."""
        with _lease(self.path, "vacuum"):
            _gc_staging(self.path)
            self._gc_dead_entries()

    def maintenance_tick(self, max_live_entries: int = 8) -> dict:
        """ONE compaction-policy decision per interval — the
        ``_BatchDirIndex.maintenance_tick`` contract (poll the live
        entry count, compact past the threshold, retention untouched),
        under the writer lease end-to-end."""
        with _lease(self.path, "maintenance_tick"):
            before = len(self._live_entries())
            merged = self.compact() if before > max_live_entries else 0
            return {
                "compacted": merged > 0,
                "live_dirs_before": before,
                "live_dirs_after": len(self._live_entries()),
            }

    def add_batch(
        self,
        batch: DataFrame,
        id_col: str = "doc_id",
        pairs_path: str | None = None,
        batch_key=None,
    ) -> DataFrame:
        """Returns the verified pairs ``(id_a, id_b, n_shared)`` with at
        least one batch-side member, then folds the batch in. Re-ingest
        safe (already-stored ids are anti-joined out) and crash safe
        (staged write + single-file rename).

        DURABILITY CONTRACT (ADVICE r11): the fingerprint append commits
        at the END of this call, and once it commits a retry anti-joins
        the batch's docs out — so pairs returned lazily to a caller that
        crashes AFTER this call but BEFORE persisting them are gone (the
        retry sees an already-ingested batch and returns an empty set).
        Two ways to hold the union-of-batches ≡ one-shot guarantee across
        retries:

        * pass ``pairs_path`` (+ a stable ``batch_key``, e.g. the
          foreachBatch batch_id): pairs are then written durably to
          ``pairs_path/batch_id=<batch_key>`` BEFORE the append commits,
          and a post-commit retry (which recomputes an empty pair set)
          will NOT clobber the committed batch's pair file. Consumers
          read ``pairs_path``; the return value is best-effort on retry.
        * or treat the returned pairs as part of the batch's output
          transaction: persist them durably before acknowledging the
          batch anywhere.

        The returned pairs are LAZY but PINNED (r18, same contract as
        the MinHash index): the batch's fingerprints are eagerly
        localCheckpointed (pinning the re-ingest anti-join too) and the
        stored side reads the pre-commit fingerprint files by explicit
        path — the append only ADDS a file, so a later consumption
        (after further ingests or a compaction) computes exactly this
        batch's pair set; the fingerprint join + n_shared count run only
        when the pairs are consumed. Only ``vacuum()`` can invalidate an
        unconsumed result, loudly.
        """
        from whatsapp_vectordb_spark.operators.dedup import winnow_fingerprints

        _gc_staging(self.path)
        stored = self._stored()
        if stored is not None:
            batch = batch.join(
                stored.select(F.col("doc_id").alias(id_col)).dropDuplicates(),
                id_col,
                "left_anti",
            )
        fp_new = (
            winnow_fingerprints(batch, id_col=id_col, k=self.k, w=self.w)
            .select(F.col(id_col).alias("doc_id"), "fp_pos", "fp_hash")
            .localCheckpoint(eager=True)
        )
        all_fp = fp_new if stored is None else stored.unionByName(fp_new)

        a = fp_new.select("doc_id", "fp_hash").distinct().alias("a")
        b = all_fp.select("doc_id", "fp_hash").distinct().alias("b")
        pairs = (
            a.join(
                b,
                on=[
                    F.col("a.fp_hash") == F.col("b.fp_hash"),
                    F.col("a.doc_id") != F.col("b.doc_id"),
                ],
            )
            .select(
                F.least(F.col("a.doc_id"), F.col("b.doc_id")).alias("id_a"),
                F.greatest(F.col("a.doc_id"), F.col("b.doc_id")).alias("id_b"),
                F.col("a.fp_hash").alias("fp_hash"),
            )
            .dropDuplicates(["id_a", "id_b", "fp_hash"])
            .groupBy("id_a", "id_b")
            .agg(F.count("*").alias("n_shared"))
            .where(F.col("n_shared") >= self.min_shared)
        )
        if pairs_path is not None:
            if batch_key is None:
                raise ValueError("pairs_path requires a stable batch_key")
            dest = os.path.join(pairs_path, f"batch_id={batch_key}")
            # post-commit retry guard: if the whole batch was already
            # ingested (crash after both commits), fp_new is empty and
            # pairs with it — keep the committed attempt's pair file
            # rather than clobbering it with the empty recompute
            if not fp_new.isEmpty() or not os.path.exists(dest):
                pairs.hint("rebalance").write.mode("overwrite").parquet(dest)
        self._commit_append(fp_new)
        return pairs

    def _commit_append(self, fp_new: DataFrame) -> None:
        """Stage the batch's fingerprints, then commit with ONE rename.

        Single-file on purpose: a multi-file rename loop has a crash
        window where only SOME of a doc's fingerprint rows land — the
        re-ingest anti-join (which keys on stored doc ids) would then
        skip the doc with an incomplete posting list and silently miss
        pairs forever. One file = one atomic rename = a batch is either
        fully in or fully out. Cost: the staged write is one task — fine
        for an incremental micro-batch append (~10-20 fp rows/doc reading
        cached blocks); the bulk path is the one-shot batch operator."""
        import shutil
        import uuid

        with _lease(self.path, "add_batch"):
            stage = os.path.join(self.path, "_staging", uuid.uuid4().hex)
            stage_fp = os.path.join(stage, "fingerprints")
            try:
                fp_new.coalesce(1).write.mode("overwrite").parquet(stage_fp)
                parts = [
                    f for f in os.listdir(stage_fp) if f.endswith(".parquet")
                ]
                if len(parts) != 1:
                    # Explicit raise, not assert: under ``python -O`` an
                    # assert vanishes, and renaming only parts[0] while the
                    # finally rmtree deletes the rest would be permanent
                    # fingerprint loss. coalesce(1) guarantees one file;
                    # anything else means the invariant broke and the
                    # commit must abort.
                    raise RuntimeError(
                        f"single-file commit invariant broken: staged {parts}"
                    )
                os.makedirs(self._fp_path, exist_ok=True)
                os.rename(
                    os.path.join(stage_fp, parts[0]),
                    os.path.join(
                        self._fp_path,
                        f"{self._next_seq():08d}_{uuid.uuid4().hex}.parquet",
                    ),
                )
            finally:
                shutil.rmtree(stage, ignore_errors=True)


class SemDedupIndex(_BatchDirIndex):
    """Persistent SEMANTIC dedup index — the embedding tier of the
    incremental index family (MinHash = document, Winnow = substring,
    SemDedup = semantic), the ingest-time twin of ``ann.semdedup``
    exactly as ``MinHashDedupIndex`` twins ``minhash_near_duplicates``.

    State per committed batch dir (atomic single-rename, inherited):

    - ``kept``: the surviving representatives ``(vec_id, embedding,
      centroid, cent_sim)`` — the ε-net cover new rows must clear;
    - ``ids``: every ingested id (kept or not) — the re-ingest
      anti-join key (without it a replayed batch would re-elect
      against a corpus that already judged it).

    ELECTION (first-decision-wins greedy, an explicit divergence from
    the batch operator): history is totally ordered by
    ``(batch_no, cent_sim ASC, vec_id ASC)`` — all stored rows precede
    all batch rows — and a row is KEPT iff no EARLIER **KEPT** row in
    its cluster has rounded cosine ≥ τ to it. The batch operator's
    election instead lets ANY earlier row (kept or removed) dominate.
    Greedy is the right ingest-time semantics: decisions are final
    (a stored representative is never retroactively removed by a later
    arrival, so the stored state is append-only), and the kept set is
    an ε-net — every removed row is within τ of a LIVE representative,
    which the batch rule does not guarantee. Both are SemDeDup-paper
    variants (Abbas et al. 2023 §3 discusses keeper choice freedom).

    UNIQUENESS (the oracle's lever): the greedy outcome is the unique
    kept-assignment where (a) every removed row has an earlier-ranked
    kept row within τ, and (b) no kept row does — by induction over the
    rank order, each row's flag is forced by the earlier flags. So a
    NON-recursive checker (one pair join against the persisted flags)
    that re-derives ``kept = NOT EXISTS earlier kept row within τ``
    reproduces the flags exactly iff the index elected correctly — any
    wrong flag breaks the equality at the first divergent rank. The
    registry oracle (``dedup_semdedup_index``) is exactly that checker.

    Scale shape: the coarse quantizer freezes after the FIRST batch
    (persisted in ``meta.json``, temp+rename atomic); each batch is one
    map-only assign, ONE cogroup shuffle on the centroid key (batch
    rows meet their cluster's stored representatives — never the whole
    corpus), and a per-cluster numpy greedy bounded by
    |cluster batch| + |cluster kept|. Grow ``n_clusters`` with the
    corpus as the batch operator does."""

    _TABLES = ("kept", "ids")

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        threshold: float = 0.95,
        n_clusters: int = 8,
        round_to: int = 6,
        iters: int = 5,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ):
        super().__init__(spark, path)
        self.threshold = threshold
        self.n_clusters = n_clusters
        self.round_to = round_to
        self.iters = iters
        self.id_col = id_col
        self.vec_col = vec_col

    @property
    def _meta_path(self) -> str:
        return os.path.join(self.path, "meta.json")

    def _load_centroids(self):
        import json as _json

        import numpy as np

        if not os.path.exists(self._meta_path):
            return None
        with open(self._meta_path) as f:
            return np.asarray(_json.load(f)["centroids"], dtype=np.float64)

    def _save_centroids(self, centroids) -> None:
        """Atomic temp+rename publish (the IvfSq8Index meta contract):
        the quantizer is frozen the moment the first batch commits, and
        a crash can never leave a readable index with a half-written
        centroid matrix."""
        import json as _json
        import uuid

        # tmp lives under _staging so a crash-orphaned file is swept by
        # the same GC that cleans orphaned batch stages
        stag = os.path.join(self.path, "_staging")
        os.makedirs(stag, exist_ok=True)
        tmp = os.path.join(stag, f"_meta_{uuid.uuid4().hex}.tmp")
        with open(tmp, "w") as f:
            _json.dump({"centroids": [list(map(float, c)) for c in centroids]}, f)
        os.rename(tmp, self._meta_path)

    def add_batch(
        self,
        batch: DataFrame,
        results_path: str | None = None,
        batch_key=None,
    ) -> DataFrame:
        """Elect ``batch`` against the stored representatives AND itself,
        then fold the survivors in. Returns every batch row as
        ``(vec_id, centroid, cent_sim, kept)``; re-ingest-safe
        (already-seen ids anti-joined out) and crash-safe (both state
        tables commit with one rename; the returned frame is pinned
        before the commit so a lazily-consumed result can never read
        the post-append state).

        ``results_path`` + ``batch_key``: same durability contract as
        the MinHash/Winnow indexes' ``pairs_path`` — the batch's flags
        land durably in ``results_path/batch_id=<batch_key>`` BEFORE
        the state commit, and a post-commit retry (whose anti-join
        yields an empty result) never clobbers the committed batch's
        flag file. Without it, persist the returned flags before
        acknowledging the batch."""
        import numpy as np

        from whatsapp_vectordb_spark.operators.ann import (
            IvfIndex,
            assign_nearest_centroid,
        )

        _gc_staging(self.path)
        cents = self._load_centroids()
        if cents is None:
            proto = IvfIndex.build_balanced(
                batch,
                n_centroids=self.n_clusters,
                id_col=self.id_col,
                vec_col=self.vec_col,
                iters=self.iters,
            )
            cents = np.asarray(proto.centroids, dtype=np.float64)
            self._save_centroids(cents)
        seen = self._stored("ids")
        if seen is not None:
            batch = batch.join(
                seen.select(F.col("vec_id").alias(self.id_col)).dropDuplicates(),
                self.id_col,
                "left_anti",
            )
        assigned = assign_nearest_centroid(batch, cents, self.vec_col).select(
            self.id_col, self.vec_col, F.col("centroid").cast("int").alias("centroid")
        )
        stored_kept = self._stored("kept")
        if stored_kept is None:
            stored_kept = local_df(self.spark, 
                [], f"vec_id long, embedding array<double>, centroid int, cent_sim double"
            )
        tau, rt = float(self.threshold), int(self.round_to)
        icol, vcol = self.id_col, self.vec_col
        id_type = batch.schema[icol].dataType.simpleString()
        cmat = cents

        def greedy(batch_pdf, kept_pdf):
            import pandas as pd

            from whatsapp_vectordb_spark.operators.search import _round_half_up

            if len(batch_pdf) == 0:
                return pd.DataFrame(
                    {icol: [], "centroid": [], "cent_sim": [], "kept": []}
                )
            ids = batch_pdf[icol].to_numpy()
            m = np.vstack(batch_pdf[vcol].to_numpy()).astype(np.float64)
            cid = int(batch_pdf["centroid"].iloc[0])
            norms = np.linalg.norm(m, axis=1)
            mn = m / np.where(norms == 0.0, 1.0, norms)[:, None]
            c = cmat[cid]
            cn = c / (np.linalg.norm(c) or 1.0)
            # HALF_UP like F.round / the DuckDB certificate oracle —
            # numpy's half-to-even could flip a flag on a grid-exact tie
            cs = _round_half_up(mn @ cn, rt)
            dim = mn.shape[1]
            n_stored = len(kept_pdf)
            # representatives live in ONE preallocated growing matrix —
            # rebuilding an array from a python list per candidate row
            # would copy the whole rep matrix O(|batch|) times
            cap = max(16, n_stored + len(ids))
            reps = np.empty((cap, dim), dtype=np.float64)
            if n_stored:
                sm = np.vstack(kept_pdf["embedding"].to_numpy()).astype(np.float64)
                reps[:n_stored] = sm / np.maximum(
                    np.linalg.norm(sm, axis=1), 1e-300
                )[:, None]
            n_reps = n_stored
            kept = np.zeros(len(ids), dtype=bool)
            for g in np.lexsort((ids, cs)):  # (cent_sim ASC, id ASC)
                v = mn[g]
                if n_reps and (
                    _round_half_up(reps[:n_reps] @ v, rt) >= tau
                ).any():
                    continue  # dominated by a LIVE representative
                kept[g] = True
                reps[n_reps] = v
                n_reps += 1
            return pd.DataFrame(
                {icol: ids, "centroid": np.int32(cid), "cent_sim": cs, "kept": kept}
            )

        res = (
            assigned.groupBy("centroid")
            .cogroup(stored_kept.groupBy("centroid"))
            .applyInPandas(
                greedy,
                schema=f"{icol} {id_type}, centroid int, cent_sim double, kept boolean",
            )
        )
        # pin BEFORE the append mutates the stored dirs (the MinHash
        # index's documented lazily-read-state hazard)
        res = res.localCheckpoint(eager=True)
        empty = res.isEmpty()
        if results_path is not None:
            if batch_key is None:
                raise ValueError("results_path requires a stable batch_key")
            dest = os.path.join(results_path, f"batch_id={batch_key}")
            # post-commit retry guard: keep the committed attempt's flag
            # file rather than clobbering it with the empty recompute
            if not empty or not os.path.exists(dest):
                res.hint("rebalance").write.mode("overwrite").parquet(dest)
        if empty:
            return res  # fully anti-joined replay: no state to commit
        kept_rows = (
            res.where("kept")
            .select(icol, "centroid", "cent_sim")
            .join(batch.select(icol, vcol), icol)
            .select(
                F.col(icol).alias("vec_id"),
                F.col(vcol).cast("array<double>").alias("embedding"),
                "centroid",
                "cent_sim",
            )
        )
        ids_df = assigned.select(F.col(icol).alias("vec_id"))
        self._commit_batch({"kept": kept_rows, "ids": ids_df})
        return res

    def verdicts_at(self, as_of: int | None = None) -> DataFrame:
        """The index's VERDICT SET at commit bound ``as_of`` (tip when
        None): every id the index had judged by that commit with its
        final kept/removed flag — the semantic tier's time-travel read
        (r16 verdict #4): "which docs did yesterday's corpus keep, which
        did it fold into a representative". Greedy decisions are FINAL
        (stored state is append-only — the class contract), so the
        bounded union of the ``ids``/``kept`` tables IS the state after
        that commit: kept = membership in the bounded ``kept`` table."""
        ids = self._stored("ids", as_of)
        if ids is None:
            return local_df(self.spark, [], "vec_id long, kept boolean")
        kept = self._stored("kept", as_of)
        if kept is None:
            return ids.select("vec_id", F.lit(False).alias("kept"))
        return ids.select("vec_id").join(
            kept.select("vec_id", F.lit(True).alias("kept")), "vec_id", "left"
        ).select("vec_id", F.coalesce("kept", F.lit(False)).alias("kept"))
