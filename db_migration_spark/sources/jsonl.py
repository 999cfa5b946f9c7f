"""JSONL source/sink — the dominant interchange format for LLM training
corpora (one JSON document per line, usually gzipped in shards).

Spark's native json reader/writer is already shard-parallel (one task per
file split); the layer here pins the scale-safe usage:

* **explicit schema, never inference** — ``spark.read.json`` without a
  schema runs a full extra pass over 100 TB just to guess types (and
  guesses unstably across shards);
* **gzip shards** sized by upstream ``repartition`` — .gz is not
  splittable, so shard size = task granularity on read;
* **columnNameOfCorruptRecord side-channel** — malformed lines land in a
  quarantine column instead of failing the job (PERMISSIVE), mirroring
  the .ace parser's reject side-channel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOCUMENTS_SCHEMA = (
    "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"
)


def write_jsonl(
    df: DataFrame, path: str, shards: int | None = None, compress: bool = True
) -> None:
    """Write a corpus as JSONL shards (gzip by default).  ``shards``
    controls read-side parallelism for non-splittable .gz files."""
    w = df.repartition(shards) if shards else df
    writer = w.write.mode("overwrite")
    if compress:
        writer = writer.option("compression", "gzip")
    writer.json(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str,
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """Read JSONL with an explicit schema; malformed lines are preserved
    in ``corrupt_col`` (PERMISSIVE mode) for a quarantine sink rather
    than failing the scan."""
    return (
        spark.read.schema(f"{schema}, {corrupt_col} STRING")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
    )


def quarantine_split(
    spark: SparkSession,
    path: str,
    schema: str,
    corrupt_col: str = "_corrupt_record",
):
    """(good, bad) split of a JSONL path.  The good side is the
    PERMISSIVE read with malformed rows filtered out; the bad side
    re-scans the raw lines and keeps those ``from_json`` cannot parse —
    Spark forbids plans referencing ONLY the internal corrupt-record
    column (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN), and a
    text re-scan of the (rare) quarantine side avoids caching the whole
    corpus to work around it."""
    parsed = read_jsonl(spark, path, schema, corrupt_col)
    good = parsed.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)
    lines = spark.read.text(path)
    # from_json returns an all-null struct (not NULL) for malformed input;
    # its own corrupt-record option marks bad lines unambiguously, and the
    # file-source-only "query only corrupt column" restriction does not
    # apply to the expression form
    reparsed = F.from_json(
        F.col("value"),
        f"{schema}, {corrupt_col} STRING",
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": corrupt_col},
    )
    bad = lines.filter(
        reparsed[corrupt_col].isNotNull()
    ).select(F.col("value").alias(corrupt_col))
    return good, bad
