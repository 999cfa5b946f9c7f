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

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

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
        import glob
        import os

        p = self.path
        if os.path.isdir(p):
            files = sorted(
                f
                for f in glob.glob(os.path.join(p, "*"))
                if os.path.basename(f)[0] not in "._"
                and os.path.isfile(f)
            )
        else:
            files = sorted(glob.glob(p))
        if not files:
            raise FileNotFoundError(f"no ace dump files under {p}")
        return [AceFilePartition(f) for f in files]

    def read(self, partition: AceFilePartition):
        import gzip
        import os

        from .ace import parse_block

        path = partition.path
        opener = gzip.open if path.endswith(".gz") else open
        with opener(path, "rt", encoding="utf-8", errors="replace") as fh:
            text = fh.read()
        src = os.path.basename(path)
        for block in text.split("\n\n"):
            if block.strip():
                yield from parse_block(block, src)


class AceDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "ace"

    def schema(self):
        return ACE_RECORD_SCHEMA

    def reader(self, schema) -> AceDataSourceReader:
        return AceDataSourceReader(self.options)


def register(spark) -> None:
    """Idempotent format registration."""
    spark.dataSource.register(AceDataSource)
