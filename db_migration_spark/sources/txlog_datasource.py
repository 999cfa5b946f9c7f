"""The transaction-log table as a STREAMING SOURCE — the Delta/Iceberg
streaming-source analog over plans/txlog.py, via Spark 4's Python
DataSource API (the partition-planned variant, not the driver-side
Simple reader: planning touches only the LOG; data files are read on
EXECUTORS, one input partition per parquet file — the shape that holds
at 100 TB).

Offsets are commit versions: a micro-batch covers versions
``(start, end]``, exactly the commits that appeared since the last
batch.  Append commits stream their rows as inserts, tagged with
``_commit_version``.  Rewrite commits (overwrite / merge / optimize)
are NOT row-level inserts; by default the source REFUSES them
(option ``ignoreChanges=true`` skips them instead) — the same contract
as Delta's streaming source, which errors on non-append commits unless
told otherwise.  Replayability: a (start, end] range always resolves to
the same commit files, so a restarted query re-reads identical batches.
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

_PA_TO_DDL = {
    "int8": "tinyint",
    "int16": "smallint",
    "int32": "int",
    "int64": "long",
    "float": "float",
    "double": "double",
    "string": "string",
    "large_string": "string",
    "bool": "boolean",
    "date32[day]": "date",
}


def _data_schema_ddl(root: str) -> str:
    """Infer the table schema from the FIRST live group's parquet footer
    (metadata only) — commits all share the table schema."""
    import glob

    import pyarrow.parquet as pq

    from ..plans.txlog import TxTable

    t = TxTable(root)
    groups = t.active_groups()
    if not groups:
        raise ValueError(f"cannot infer schema of empty table {root}")
    files = sorted(
        glob.glob(os.path.join(root, "data", groups[0], "*.parquet"))
    )
    schema = pq.ParquetFile(files[0]).schema_arrow
    cols = []
    for field in schema:
        s = str(field.type)
        if s.startswith("timestamp"):
            ddl = "timestamp"
        elif s.startswith("decimal"):
            ddl = s
        else:
            ddl = _PA_TO_DDL.get(s)
        if ddl is None:
            raise TypeError(f"unsupported column type {s} in txlog stream")
        cols.append(f"`{field.name}` {ddl}")
    cols.append("`_commit_version` long")
    return ", ".join(cols)


class TxlogFilePartition(InputPartition):
    def __init__(self, path: str, version: int):
        self.path = path
        self.version = version


class TxlogStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        self.root = options.get("path")
        if not self.root:
            raise ValueError("txlog stream source requires a path")
        self.ignore_changes = (
            str(options.get("ignoreChanges", "false")).lower() == "true"
        )

    def _table(self):
        from ..plans.txlog import TxTable

        return TxTable(self.root)

    def initialOffset(self) -> dict:
        return {"version": -1}

    def latestOffset(self) -> dict:
        # a large backlog means MANY file partitions in one micro-batch,
        # which is fine — partitions are executor-side and planning cost
        # is one log replay (unlike the Simple reader, nothing
        # materializes on the driver), so no per-batch version cap is
        # needed
        return {"version": self._table().latest_version()}

    def partitions(self, start: dict, end: dict):
        import glob

        t = self._table()
        parts = []
        for v in range(int(start["version"]) + 1, int(end["version"]) + 1):
            c = t._read_commit(v)
            if c.get("op", "append") != "append":
                if self.ignore_changes:
                    continue
                raise ValueError(
                    f"txlog stream hit non-append commit v{v} "
                    f"({c.get('op')}); set ignoreChanges=true to skip "
                    "rewrite commits (the Delta streaming-source contract)"
                )
            for g in c.get("add", []):
                for f in sorted(
                    glob.glob(os.path.join(self.root, "data", g, "*.parquet"))
                ):
                    parts.append(TxlogFilePartition(f, v))
        if not parts:  # engine requires ≥1 partition; emit an empty file list
            return [TxlogFilePartition("", int(end["version"]))]
        return parts

    def read(self, partition: TxlogFilePartition):
        if not partition.path:
            return
        import pyarrow as pa
        import pyarrow.parquet as pq

        # yield Arrow RecordBatches, not Python rows: the Python data
        # source API transfers them columnar end-to-end (measured 35s →
        # ~4s at ×10 vs the row-at-a-time tuple path)
        table = pq.read_table(partition.path)
        for batch in table.to_batches():
            ver = pa.array([partition.version] * batch.num_rows, pa.int64())
            yield pa.RecordBatch.from_arrays(
                [*batch.columns, ver],
                names=[*batch.schema.names, "_commit_version"],
            )

    def commit(self, end: dict) -> None:
        pass


class TxlogStreamDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "txlog"

    def schema(self):
        return _data_schema_ddl(self.options.get("path"))

    def streamReader(self, schema) -> TxlogStreamReader:
        return TxlogStreamReader(self.options)


def register(spark) -> None:
    try:
        spark.dataSource.register(TxlogStreamDataSource)
    except Exception as exc:  # pragma: no cover - double registration
        if "already" not in str(exc).lower():
            raise
