"""Spark 4 Python custom data source for the reference's chat-export
format: ``spark.read.format(register(spark)).load(path)`` returns TYPED rows
``(line_no, ts_raw, sender, message, parse_ok)`` directly from the text
file — the connector form of S1+P1 (reference `main.go:32`,
`embed/embed.go:98-111`): the format knowledge lives in the source, not
in every downstream query.

Scale shape: one input partition per file (the natural split for
line-numbered text — a parallel byte-range split could not assign stable
line numbers without a second pass); the driver only LISTS files, every
byte is read executor-side. Registration is per-session, ALWAYS through
``register`` and the name it returns (a fresh per-call alias — see its
docstring for the two Spark 4.1 lookup quirks that make the literal
"whatsapp" name unreliable)::

    fmt = register(spark)
    df = spark.read.format(fmt).load("/path/to/exports")

The line regex is byte-for-byte the one in ``parse.py`` (and the SQL
oracles), so rows agree with ``parse_chat_lines`` exactly.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

# mirror of parse.py's CHAT_LINE_RE / the oracles' regexp_extract pattern
CHAT_LINE_PATTERN = r"^\[(\d{2}\.\d{2}\.\d{2}, \d{2}:\d{2}:\d{2})\] ~?\s*([^:]+): (.*)$"


class WhatsAppChatDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "whatsapp"

    def schema(self) -> str:
        return (
            "line_no bigint, ts_raw string, sender string, "
            "message string, parse_ok boolean"
        )

    def reader(self, schema) -> "WhatsAppChatReader":
        return WhatsAppChatReader(self.options)

    def simpleStreamReader(self, schema) -> "WhatsAppChatStreamReader":
        return WhatsAppChatStreamReader(self.options)

    def writer(self, schema, overwrite: bool) -> "WhatsAppChatWriter":
        return WhatsAppChatWriter(self.options, overwrite)


class WhatsAppChatReader(DataSourceReader):
    def __init__(self, options) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("whatsapp source requires a path: .load('<file-or-dir>')")
        self.path = path

    def partitions(self):
        import glob
        import os

        p = self.path
        if os.path.isdir(p):
            files = sorted(
                f
                for f in glob.glob(os.path.join(p, "*"))
                if os.path.isfile(f) and not os.path.basename(f).startswith(("_", "."))
            )
        elif any(c in p for c in "*?["):
            files = sorted(f for f in glob.glob(p) if os.path.isfile(f))
        else:
            files = [p]
        if not files:
            raise FileNotFoundError(f"whatsapp source found no files at {p!r}")
        return [InputPartition(f) for f in files]

    def read(self, partition):
        import re

        pat = re.compile(CHAT_LINE_PATTERN)
        ws = re.compile(r"\s+")
        with open(partition.value, encoding="utf-8") as f:
            for line_no, raw in enumerate(f):
                line = raw.rstrip("\n")
                m = pat.match(line)
                if m:
                    yield (
                        line_no,
                        m.group(1),
                        m.group(2).strip(),
                        ws.sub(" ", m.group(3)),
                        True,
                    )
                else:
                    yield (line_no, None, None, None, False)


def register(spark) -> str:
    """Register the source on THIS session under a FRESH unique alias and
    return that alias — callers must use the RETURNED name, never the
    literal "whatsapp". Two empirically-pinned Spark 4.1 quirks make the
    literal name unreliable (tests/test_sources.py):

    (a) a session created by ``newSession()`` AFTER any Python data-source
        registration inherits a PHANTOM entry — re-``register`` raises
        DATA_SOURCE_ALREADY_EXISTS yet ``.format(...).load`` fails with
        DATA_SOURCE_NOT_FOUND (the cloned entry loses its Python builder);
    (b) running a STREAMING query through the source can drop the same
        session's earlier registration from batch-WRITE resolution —
        ``.format("whatsapp").save`` then fails DATA_SOURCE_NOT_FOUND
        even though the batch read still works (hit by the round-6
        driver-parity suite: source → streaming → sink in one session).

    A per-call alias always registers fresh in the calling session and
    resolves for read, stream, and write alike.
    """
    import uuid

    alias = f"whatsapp_{uuid.uuid4().hex[:8]}"

    class _Aliased(WhatsAppChatDataSource):
        @classmethod
        def name(cls) -> str:
            return alias

    spark.dataSource.register(_Aliased)
    return alias


def ensure_write_resolution(spark, fmt: str) -> None:
    """Warm up Python-data-source WRITE resolution for ``fmt``.

    Spark 4.1 quirk, empirically bisected (round 6): after a STREAMING
    query has run through this source in a session, the first
    ``.write.format(<alias>).save`` whose input plan reads files fails
    ``lookupDataSource`` with DATA_SOURCE_NOT_FOUND — even for an alias
    registered AFTER the stream — while writing a local-relation frame
    resolves fine and permanently repairs write resolution for the whole
    session (the driver-parity suite hits the exact sequence: source read
    → streaming tail → sink write). One 1-row local write to a throwaway
    directory; cost ~100 ms."""
    import os
    import shutil
    import tempfile

    from whatsapp_vectordb_spark.session import local_df, local_scratch_root

    d = tempfile.mkdtemp(prefix="ws_warmup_", dir=local_scratch_root())
    try:
        local_df(spark, 
            [("00.00.00, 00:00:00", "warmup", "warmup")],
            "ts_raw string, sender string, message string",
        ).write.format(fmt).mode("overwrite").save(os.path.join(d, "w"))
    finally:
        shutil.rmtree(d, ignore_errors=True)


def _list_files(path: str) -> list[str]:
    import glob
    import os

    if os.path.isdir(path):
        return sorted(
            f
            for f in glob.glob(os.path.join(path, "*"))
            if os.path.isfile(f) and not os.path.basename(f).startswith(("_", "."))
        )
    if any(c in path for c in "*?["):
        return sorted(f for f in glob.glob(path) if os.path.isfile(f))
    import os as _os

    return [path] if _os.path.isfile(path) else []


def _parse_file(path: str):
    import re

    pat = re.compile(CHAT_LINE_PATTERN)
    ws = re.compile(r"\s+")
    with open(path, encoding="utf-8") as f:
        for line_no, raw in enumerate(f):
            line = raw.rstrip("\n")
            m = pat.match(line)
            if m:
                yield (line_no, m.group(1), m.group(2).strip(), ws.sub(" ", m.group(3)), True)
            else:
                yield (line_no, None, None, None, False)


class WhatsAppChatStreamReader(SimpleDataSourceStreamReader):
    """Streaming tail of a chat-export directory: the offset is the count
    of files consumed (sorted listing), each micro-batch delivers the
    newly appeared files' parsed rows — the ingest-connector form of the
    source (an export drop-folder streams straight into the engine).
    File granularity keeps offsets exact and replayable:
    ``readBetweenOffsets`` re-reads exactly the same slice on recovery,
    so the stream is deterministic under retries. Files must be
    append-only-immutable once dropped (the standard drop-folder
    contract)."""

    def __init__(self, options) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("whatsapp stream requires a path")
        self.path = path

    def initialOffset(self) -> dict:
        return {"files": 0}

    def read(self, start: dict):
        files = _list_files(self.path)
        n0 = int(start["files"])
        # a LIST, not a generator: Spark's prefetch cache copy.copy()s the
        # returned iterator (generators aren't copyable → planPartitions
        # dies with "cannot pickle 'generator' object")
        rows = [r for f in files[n0:] for r in _parse_file(f)]
        return iter(rows), {"files": len(files)}

    def readBetweenOffsets(self, start: dict, end: dict):
        files = _list_files(self.path)
        for f in files[int(start["files"]) : int(end["files"])]:
            yield from _parse_file(f)

    def commit(self, end: dict) -> None:
        pass


class WhatsAppChatWriter(DataSourceWriter):
    """Sink side of the connector: ``df.write.format("whatsapp")`` emits
    chat-export text — rows ``(ts_raw, sender, message)`` become
    ``[ts] ~ sender: message`` lines, one part file per partition
    (executor-side writes, two-phase: parts land under a staging name and
    the job-level ``commit`` renames them in, ``abort`` removes them —
    the usual task-retry safety). The reader parses what this writes,
    so write → read round-trips exactly."""

    def __init__(self, options, overwrite: bool) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("whatsapp sink requires a path: .save('<dir>')")
        self.path = path
        self.overwrite = overwrite

    def write(self, iterator) -> "WriterCommitMessage":
        import os
        import uuid

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId() if TaskContext.get() else 0
        os.makedirs(self.path, exist_ok=True)
        staged = os.path.join(self.path, f"_staging_{uuid.uuid4().hex[:12]}.txt")
        n = 0
        with open(staged, "w", encoding="utf-8") as f:
            for row in iterator:
                ts = row["ts_raw"] if row["ts_raw"] is not None else "09.09.23, 00:00:00"
                f.write(f"[{ts}] ~ {row['sender']}: {row['message']}\n")
                n += 1
        return _ChatCommit(staged=staged, part=pid, rows=n)

    def commit(self, messages) -> None:
        import os

        if self.overwrite:
            for f in os.listdir(self.path):
                if f.startswith("chat_part_"):
                    os.remove(os.path.join(self.path, f))
        for m in messages:
            os.replace(
                m.staged, os.path.join(self.path, f"chat_part_{m.part:05d}.txt")
            )

    def abort(self, messages) -> None:
        import os

        for m in messages:
            if m is not None and os.path.exists(m.staged):
                os.remove(m.staged)


class _ChatCommit(WriterCommitMessage):
    def __init__(self, staged: str, part: int, rows: int) -> None:
        self.staged = staged
        self.part = part
        self.rows = rows
