"""Text-encoding detection + decode for raw byte payloads.

A real corpus arrives as bytes in a zoo of encodings; the ingest tier
must normalize to UTF-8 text before any text operator runs.  This is the
standard detection ladder, all stdlib: BOM sniff (UTF-32 before UTF-16 —
the UTF-32-LE BOM *starts with* the UTF-16-LE BOM), strict-UTF-8
validation scan, Latin-1 fallback (total — every byte string decodes, so
the pipeline never drops a document for encoding alone; the ``encoding``
column lets quality gates filter instead).

Reference anchor: the reference ingests gzipped ACeDB dumps assumed
ASCII (sources/ace.py handles those); this widens the same boundary to
arbitrary text payloads, as a web/LLM corpus needs (SURVEY §2.12's
opaque-payload model).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_BOMS = (
    (b"\x00\x00\xfe\xff", "utf-32-be"),
    (b"\xff\xfe\x00\x00", "utf-32-le"),
    (b"\xef\xbb\xbf", "utf-8-sig"),
    (b"\xfe\xff", "utf-16-be"),
    (b"\xff\xfe", "utf-16-le"),
)


def detect_encoding(b: bytes) -> str:
    """BOM ladder → strict UTF-8 scan → Latin-1 fallback."""
    for bom, name in _BOMS:
        if b.startswith(bom):
            return name
    try:
        b.decode("utf-8", "strict")
        return "utf-8"
    except UnicodeDecodeError:
        return "latin-1"


def decode_payload(b: bytes) -> tuple[str, str]:
    """(encoding, text); the BOM (if any) is not part of the text — the
    endianless utf-16/utf-32 codecs and utf-8-sig all consume it."""
    enc = detect_encoding(b)
    if enc.startswith("utf-16"):
        return enc, b.decode("utf-16")
    if enc.startswith("utf-32"):
        return enc, b.decode("utf-32")
    return enc, b.decode(enc)


TEXT_DECODE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("encoding", StringType()),
        StructField("text", StringType()),
        StructField("n_chars", IntegerType()),
    ]
)


def decode_text_payloads(media: DataFrame) -> DataFrame:
    """Arrow-batched detect+decode seam over (media_id, payload) —
    the normalize-to-UTF-8 front door of a byte-payload corpus."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                enc, text = decode_payload(bytes(p))
                rows.append((int(mid), enc, text, len(text)))
            yield pd.DataFrame(
                rows, columns=["media_id", "encoding", "text", "n_chars"]
            )

    return media.select("media_id", "payload").mapInPandas(
        run, TEXT_DECODE_SCHEMA
    )


ZIP_MEMBER_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("member", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("payload", StringType()),
    ]
)


def scan_zip_members(media: DataFrame) -> DataFrame:
    """Data-plane archive scan (SURVEY §2.1 S14, promoted from the
    driver-plane extract utility): each (media_id, payload) row holding
    a ZIP archive explodes into one row per member with the member's
    decompressed text — stdlib ``zipfile`` over an in-memory buffer,
    Arrow-batched.  CRC verification is implicit: ``ZipFile.read``
    raises BadZipFile on checksum mismatch, so corrupt members fail
    loudly rather than yielding garbage rows.

    The 100 TB shape: archives parallelize by file (binaryFile source →
    this seam), members never shuffle compressed — decompression happens
    where the bytes already sit."""
    import io
    import zipfile

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                with zipfile.ZipFile(io.BytesIO(bytes(p))) as zf:
                    for name in zf.namelist():
                        data = zf.read(name)
                        rows.append(
                            (int(mid), name, len(data), data.decode("utf-8"))
                        )
            yield pd.DataFrame(
                rows, columns=["media_id", "member", "n_bytes", "payload"]
            )

    return media.select("media_id", "payload").mapInPandas(
        run, ZIP_MEMBER_SCHEMA
    )
