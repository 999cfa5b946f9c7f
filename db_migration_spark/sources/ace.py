"""ACeDB ``.ace`` dump source — the X1 boundary (SURVEY §2.9).

The reference exports every object of every class to ``.ace`` text via
``tace 'Dump -s -T -C'`` (``/root/reference/src/azanium/runcommand.py:134-150``)
and converts them to EDN datom logs with pseudoace
(``pseudoace.py:69-76``).  Here the dump text itself is the source and the
conversion is native:

* **block reassembly at scale** (SURVEY §7 hard part (a)): ``.ace`` objects
  are blank-line-separated paragraphs.  ``spark.read.text`` with
  ``lineSep="\\n\\n"`` makes each *block* one row — splits happen at file
  offsets, every partition parses independently, and 100 TB of dumps is
  just more input splits.  No driver-side reassembly, no window over line
  numbers.
* **block parsing**: the grammar is bespoke, so this is the one genuinely
  custom parse — an Arrow-batched ``mapInPandas`` (never per-row Python).

Dump grammar handled (from the public ACeDB dump format):

    ClassName : "object-id"
    Tag subtag ... "value" -O "timestamp" ...
    <blank line between objects>

``-T`` timestamps arrive as ``-O "ts"`` annotations; the *last* ``-O`` on a
line stamps the value (matching tace's trailing-annotation emission).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    StringType,
    StructField,
    StructType,
)

ACE_RECORD_SCHEMA = StructType(
    [
        StructField("class", StringType()),
        StructField("obj_id", StringType()),
        StructField("tag_path", ArrayType(StringType())),
        StructField("value", StringType()),
        StructField("ts", StringType()),
        StructField("comment", StringType()),
        StructField("src_file", StringType()),
    ]
)

# header object id: quoted (escapes allowed) or bare
_HEADER_RE = re.compile(
    r'^\s*(\S+)\s*:\s*(?:"((?:[^"\\]|\\.)*)"|(\S*))\s*$'
)
_ESCAPE_RE = re.compile(r"\\(.)")


def _unescape(s: str | None) -> str | None:
    """Undo dump-file escaping inside quoted tokens (\" and \\) —
    the inverse of the ace sink's ``_quote`` (ace_datasource.py)."""
    return None if s is None else _ESCAPE_RE.sub(r"\1", s)
# a line token: quoted string, -O/-C annotation (standalone token only —
# a tag named "-C0" must not be split), or bare word
_TOKEN_RE = re.compile(r'"((?:[^"\\]|\\.)*)"|(-[OC])(?=\s|$)|(\S+)')


def parse_block(block: str, src_file: str = "") -> list[tuple]:
    """Parse one ``.ace`` paragraph into (class, obj_id, tag_path, value,
    ts, src_file) rows.  Pure Python — unit-testable, and the kernel the
    Arrow batches run.

    Semantics: the first line names the object; each following line is a
    tag path whose *last* token is the value (earlier tokens are the tag
    tree path, flattened — pseudoace does the same flattening when emitting
    datoms).  ``-O "ts"`` / ``-C "comment"`` annotations attach to the
    token they follow; the value's timestamp is the last ``-O`` seen.
    """
    lines = [ln for ln in block.splitlines() if ln.strip()]
    if not lines:
        return []
    m = _HEADER_RE.match(lines[0])
    if not m:
        return []
    cls = m.group(1)
    obj_id = _unescape(m.group(2)) if m.group(2) is not None else m.group(3)
    out = []
    for ln in lines[1:]:
        tokens: list[str] = []
        ts = None
        comment = None
        pending_annot = None
        for qm in _TOKEN_RE.finditer(ln):
            quoted, annot, bare = qm.group(1), qm.group(2), qm.group(3)
            if annot:
                pending_annot = annot
            elif pending_annot == "-O":
                ts = _unescape(quoted) if quoted is not None else bare
                pending_annot = None
            elif pending_annot == "-C":
                # tace dumps with -C precisely so curator comments become
                # transaction metadata downstream (runcommand.py:134-150);
                # the last -C on the line stamps the value, like -O
                comment = _unescape(quoted) if quoted is not None else bare
                pending_annot = None
            else:
                tokens.append(
                    _unescape(quoted) if quoted is not None else bare
                )
        if not tokens:
            continue
        *path, value = tokens
        out.append((cls, obj_id, path, value, ts, comment, src_file))
    return out


def read_ace_blocks(spark: SparkSession, path: str) -> DataFrame:
    """Blank-line-delimited block source: one row per object paragraph.
    ``.gz`` inputs decompress transparently (S5)."""
    return (
        spark.read.option("lineSep", "\n\n")
        .text(path)
        .withColumn("src_file", F.input_file_name())
        .filter(F.trim(F.col("value")) != "")
    )


def read_ace_blocks_stream(spark: SparkSession, path: str) -> DataFrame:
    """Streaming twin of :func:`read_ace_blocks`: the same blank-line
    block source as a Structured Streaming file source — the datom log
    doubles as a stream (SURVEY §2.10), so the X1 melt itself can run
    under ``availableNow`` with checkpointed resume instead of the
    reference's shelve step counter."""
    return (
        spark.readStream.option("lineSep", "\n\n")
        .text(path)
        .withColumn("src_file", F.input_file_name())
        .filter(F.trim(F.col("value")) != "")
    )


def parse_ace_blocks_df(blocks: DataFrame) -> DataFrame:
    """Block rows (``value``, ``src_file``) → parsed record rows.  Works
    identically on batch and streaming DataFrames: the melt is a
    stateless mapInPandas, so under streaming it needs no watermark and
    emits in append mode.

    mapInPandas: Arrow batches in, Arrow batches out; per-partition Python
    cost is one pass over the block strings.  At 100 TB the parse
    parallelism equals input splits, same as the reference's per-file
    ``xargs -P`` fan-out but elastic.
    """

    def parse_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for block, src in zip(pdf["value"], pdf["src_file"]):
                rows.extend(parse_block(block, src))
            yield pd.DataFrame(
                rows,
                columns=[
                    "class",
                    "obj_id",
                    "tag_path",
                    "value",
                    "ts",
                    "comment",
                    "src_file",
                ],
            )

    return blocks.mapInPandas(parse_batches, ACE_RECORD_SCHEMA)


def parse_ace_dump(spark: SparkSession, path: str) -> DataFrame:
    """Full batch .ace source → record DataFrame (FIXTURES.md §1 shape)."""
    return parse_ace_blocks_df(read_ace_blocks(spark, path))


REJECT_SCHEMA = StructType(
    [
        StructField("block", StringType()),
        StructField("reason", StringType()),
        StructField("src_file", StringType()),
    ]
)


def parse_ace_rejects(spark: SparkSession, path: str) -> DataFrame:
    """Reject side-channel: blocks the parser drops (no parsable header)
    or whose lines yield no records — the engine-side analog of the
    reference's import error log (pseudoace reports rejected objects
    rather than failing the run).  Run over the same dump dir as
    :func:`parse_ace_dump`; a healthy dump returns 0 rows.

    Same scale shape as the parse itself: mapInPandas over the block
    source, no shuffle."""
    blocks = read_ace_blocks(spark, path)

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for block, src in zip(pdf["value"], pdf["src_file"]):
                lines = [ln for ln in block.splitlines() if ln.strip()]
                if not lines:
                    continue
                if not _HEADER_RE.match(lines[0]):
                    rows.append((block, "unparsable header", src))
                elif len(lines) > 1 and not parse_block(block, src):
                    rows.append((block, "no records extracted", src))
            yield pd.DataFrame(
                rows, columns=["block", "reason", "src_file"]
            )

    return blocks.mapInPandas(scan, REJECT_SCHEMA)


def ace_records_to_datoms(records: DataFrame) -> DataFrame:
    """X1 second half: parsed .ace records → datom stream (e,a,v,tx,op,class).

    Entity id = xxhash64(class, obj_id) — deterministic surrogate keys with
    no driver-side id assignment (the Spark analog of pseudoace's id
    allocation in ``prepare-import``, X3).  Attribute = class/tag-path
    joined with '.' (the ':class/attr' ident shape).  ``-C`` curator
    comments ride along as the ``comment`` datom-metadata column (the
    reference dumps with ``-C`` so they become transaction metadata,
    runcommand.py:134-150).
    """
    return records.select(
        F.xxhash64("class", "obj_id").alias("e"),
        F.concat_ws(
            "/", F.col("class"), F.array_join(F.col("tag_path"), ".")
        ).alias("a"),
        F.col("value").alias("v"),
        F.to_timestamp(F.regexp_replace(F.col("ts"), "_", " ")).alias("tx"),
        F.lit(True).alias("op"),
        F.col("class").alias("class"),
        F.col("comment").alias("comment"),
    )
