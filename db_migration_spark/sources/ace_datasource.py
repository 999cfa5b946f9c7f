"""``.ace`` as a first-class Spark format via the Python DataSource API.

Spark 4's ``pyspark.sql.datasource`` lets a pure-Python reader plug into
the planner like a built-in format: ``spark.read.format("ace").load(dir)``
returns the same records the mapInPandas path (sources/ace.py) produces,
but through the engine's source plugin seam — partition planning on the
driver (one input partition per dump file; ACeDB dumps are per-class
files, so this is the natural split unit), per-partition generators on
executors, schema projected by Catalyst.

Reference anchor: the reference consumes tace ``Dump -s -T -C`` output
files (SURVEY §2.1 S4); this makes those files a *format*, not a
preprocessing step.  Gzip is transparent (S5).  The parser is the SAME
``parse_block`` the block-source path uses — one grammar, two engine
entry points, both under the oracle gate (ace_e2e_datoms /
ace_datasource_scan).

Scale: file-granular partitions are what a 100 TB dump directory needs —
no driver-side content reads (listing only), streaming decompression per
executor, no shuffle until the caller aggregates.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

from .ace import ACE_RECORD_SCHEMA


class AceFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class AceDataSourceReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("ace source requires a path")

    def partitions(self):
        files = _list_dump_files(self.path)
        if not files:
            raise FileNotFoundError(f"no ace dump files under {self.path}")
        return [AceFilePartition(f) for f in files]

    def read(self, partition: AceFilePartition):
        yield from _read_dump_file(partition.path)


def _list_dump_files(path: str) -> list:
    import glob
    import os

    if os.path.isdir(path):
        files = sorted(
            f
            for f in glob.glob(os.path.join(path, "*"))
            if os.path.basename(f)[0] not in "._" and os.path.isfile(f)
        )
    else:
        files = sorted(glob.glob(path))
    return files


def _read_dump_file(path: str):
    import gzip
    import os

    from .ace import parse_block

    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt", encoding="utf-8", errors="replace") as fh:
        text = fh.read()
    src = os.path.basename(path)
    for block in text.split("\n\n"):
        if block.strip():
            yield from parse_block(block, src)


class AceSimpleStreamReader(SimpleDataSourceStreamReader):
    """Streaming read of a growing dump directory: the offset is the
    count of (sorted) files already consumed, so each micro-batch picks
    up exactly the files that arrived since the last one — the ACeDB
    per-class dump drop-folder as a structured stream.

    CONTRACT: filenames must sort lexicographically in arrival order
    (dump emitters and the sibling stream sink's zero-padded batch ids
    both satisfy it); a file sorting BEFORE the consumed prefix would
    be skipped and the prefix re-read.  Replayability:
    readBetweenOffsets re-parses the recorded file range verbatim."""

    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("ace stream source requires a path")
        # Bound each micro-batch: the Simple API prefetches the batch on
        # the DRIVER, so an unbounded read() over a pre-populated dump
        # directory would materialize the whole backlog in driver memory
        # at once.  Capping the files consumed per read() drains the
        # backlog incrementally (the engine immediately schedules the
        # next batch until the offset catches up).
        self.max_files = int(options.get("maxFilesPerBatch", 64))
        if self.max_files < 1:
            raise ValueError("maxFilesPerBatch must be >= 1")

    def initialOffset(self) -> dict:
        return {"n_files": 0}

    def read(self, start: dict):
        files = _list_dump_files(self.path)
        done = int(start.get("n_files", 0))
        take = files[done : done + self.max_files]
        # the Simple API prefetches this batch on the driver (and
        # pickles the carrier), so the rows must be a materialized
        # list, not a live generator — the documented trade of
        # SimpleDataSourceStreamReader for low-throughput sources;
        # per-class dump drops are KB-MB each
        rows = [r for path in take for r in _read_dump_file(path)]
        return iter(rows), {"n_files": done + len(take)}

    def readBetweenOffsets(self, start: dict, end: dict):
        files = _list_dump_files(self.path)
        for path in files[int(start.get("n_files", 0)) : int(end["n_files"])]:
            yield from _read_dump_file(path)

    def commit(self, end: dict) -> None:
        pass


class AceDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "ace"

    def schema(self):
        return ACE_RECORD_SCHEMA

    def reader(self, schema) -> AceDataSourceReader:
        return AceDataSourceReader(self.options)

    def simpleStreamReader(self, schema) -> AceSimpleStreamReader:
        return AceSimpleStreamReader(self.options)

    def writer(self, schema, overwrite: bool) -> "AceDataSourceWriter":
        return AceDataSourceWriter(self.options, overwrite)

    def streamWriter(self, schema, overwrite: bool) -> "AceDataSourceStreamWriter":
        return AceDataSourceStreamWriter(self.options, overwrite)


def register(spark) -> None:
    """Idempotent format registration."""
    spark.dataSource.register(AceDataSource)


def _quote(s: str) -> str:
    return '"' + s.replace("\\", "\\\\").replace('"', '\\"') + '"'


class AceCommitMessage(WriterCommitMessage):
    def __init__(self, path: str, tmp_path: str | None = None):
        self.path = path
        self.tmp_path = tmp_path


def _serialize_partition(tmp_path: str, rows) -> None:
    """Group a partition's records by (class, obj_id) and emit dump
    paragraphs — header line, one tag line per record with ``-O``/``-C``
    annotations — as one gzip file."""
    import gzip

    groups: dict = {}
    order: list = []
    for r in rows:
        key = (r["class"], r["obj_id"])
        if key not in groups:
            groups[key] = []
            order.append(key)
        groups[key].append(r)
    with gzip.open(tmp_path, "wt", encoding="utf-8") as fh:
        for key in order:
            cls, obj = key
            fh.write(f"{cls} : {_quote(obj)}\n")
            for r in groups[key]:
                line = " ".join(list(r["tag_path"] or []))
                line += f" {_quote(r['value'])}" if r["value"] is not None else ""
                if r["ts"] is not None:
                    line += f" -O {_quote(r['ts'])}"
                if r["comment"] is not None:
                    line += f" -C {_quote(r['comment'])}"
                fh.write(line + "\n")
            fh.write("\n")


def _tmp_name(final_path: str) -> str:
    """Dot-prefixed attempt-unique temp name in the same directory (the
    reader's listing skips dot/underscore files, and same-dir keeps the
    final ``os.replace`` an atomic rename)."""
    import os
    import uuid

    d, base = os.path.split(final_path)
    return os.path.join(d, f".tmp-{uuid.uuid4().hex}-{base}")


class AceDataSourceWriter(DataSourceWriter):
    """Executor-side ``.ace`` serializer with a task-commit protocol:
    each write task serializes its partition to an attempt-unique
    DOT-PREFIXED temp file (invisible to the reader's listing) and
    commit() atomically renames exactly the committed attempts to their
    final ``part-<pid>.ace.gz`` names — so concurrent attempts of the
    same task (speculation/retry) can never interleave-write a readable
    path, and a failed job leaves no readable files.  Callers
    co-partition by object id when object atomicity per file matters,
    exactly like any file sink.  commit() also drops ``_SUCCESS`` for
    the idempotent-fixture contract used across the repo."""

    def __init__(self, options: dict, overwrite: bool):
        import glob
        import os

        self.path = options.get("path")
        if not self.path:
            raise ValueError("ace sink requires a path")
        os.makedirs(self.path, exist_ok=True)
        if overwrite:
            for f in glob.glob(os.path.join(self.path, "*")):
                os.remove(f)

    def write(self, rows):
        import os

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        out = os.path.join(self.path, f"part-{pid:05d}.ace.gz")
        tmp = _tmp_name(out)
        _serialize_partition(tmp, rows)
        return AceCommitMessage(out, tmp)

    def commit(self, messages):
        import os

        committed = [m for m in messages if m]
        for m in committed:
            os.replace(m.tmp_path, m.path)
        with open(os.path.join(self.path, "_SUCCESS"), "w") as fh:
            fh.write("\n".join(m.path for m in committed))

    def abort(self, messages):
        import os

        for m in messages or []:
            if m and m.tmp_path and os.path.exists(m.tmp_path):
                os.remove(m.tmp_path)


class AceDataSourceStreamWriter(DataSourceStreamWriter):
    """Streaming ``.ace`` sink with a task-commit protocol: each write
    task serializes its partition to an attempt-unique DOT-PREFIXED temp
    file, and commit() — which runs exactly once per successful batch —
    atomically renames the committed attempts to their final
    ``batch-<id>-part-<pid>.ace.gz`` names and drops the per-batch
    ``_SUCCESS-<id>`` marker.  Uncommitted attempts are never visible
    under a readable name (the reader's listing skips dot-files), a
    REPLAYED batch first clears every final file of its own batch id —
    so a replay with a different partition count leaves no orphan part
    files to double-read — and abort() removes the temp files.  The
    zero-padded batch id keeps the directory lexicographically
    append-only (the stream READER's offset contract)."""

    def __init__(self, options: dict, overwrite: bool):
        import os

        self.path = options.get("path")
        if not self.path:
            raise ValueError("ace stream sink requires a path")
        os.makedirs(self.path, exist_ok=True)

    def write(self, rows):
        import os

        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId()
        # the micro-batch id rides a task-local property in streaming
        # tasks; a missing property must raise — defaulting would make
        # every batch clobber the same filename.
        prop = ctx.getLocalProperty("streaming.sql.batchId")
        if prop is None:
            raise RuntimeError(
                "streaming.sql.batchId task property missing — the ace "
                "stream sink requires a micro-batch context"
            )
        batch_marker = f"{int(prop):09d}"
        out = os.path.join(
            self.path, f"batch-{batch_marker}-part-{pid:05d}.ace.gz"
        )
        tmp = _tmp_name(out)
        _serialize_partition(tmp, rows)
        return AceCommitMessage(out, tmp)

    def commit(self, messages, batchId: int) -> None:
        import glob
        import os

        committed = [m for m in messages if m]
        # replay safety: clear every final file this batch id wrote in a
        # previous attempt BEFORE renaming, so a replay with a different
        # partition count cannot leave orphan part files
        for stale in glob.glob(
            os.path.join(self.path, f"batch-{batchId:09d}-part-*.ace.gz")
        ):
            os.remove(stale)
        for m in committed:
            os.replace(m.tmp_path, m.path)
        with open(
            os.path.join(self.path, f"_SUCCESS-{batchId}"), "w"
        ) as fh:
            fh.write("\n".join(m.path for m in committed))

    def abort(self, messages, batchId: int) -> None:
        import os

        for m in messages or []:
            if m and m.tmp_path and os.path.exists(m.tmp_path):
                os.remove(m.tmp_path)

