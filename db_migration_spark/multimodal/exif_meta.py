"""EXIF metadata extraction from JPEG APP1 segments (pure stdlib).

EXIF (the public JEITA CP-3451 spec) embeds a whole TIFF structure —
byte-order mark, IFD walk, SHORT-in-4-byte-slot values — inside a JPEG
``APP1`` marker whose payload starts with ``Exif\\x00\\x00``.  This module
walks the JPEG marker stream to the APP1 segment and hands the embedded
buffer to the REAL TIFF walker (multimodal/tiff_meta.py decode_tiff_meta)
— the same dual-endian IFD code path the standalone TIFF kernel is
oracled on.

The encoder builds a minimal valid JPEG wrapper (SOI + APP1(Exif·TIFF)
+ EOI) around a formula-driven TIFF header, which is what a metadata
fixture needs; pixel payloads belong to jpeg_codec.  Reference anchor
SURVEY §2.12 (opaque media bytes + typed metadata).
"""

from __future__ import annotations

import struct

from .tiff_meta import decode_tiff_meta, encode_tiff_header

_EXIF_HEADER = b"Exif\x00\x00"


def encode_jpeg_with_exif(
    width: int,
    height: int,
    compression: int = 1,
    big_endian: bool = False,
) -> bytes:
    """Minimal JPEG wrapping an EXIF APP1 segment: SOI, APP1 with the
    embedded TIFF header, EOI."""
    tiff = encode_tiff_header(
        width=width,
        height=height,
        compression=compression,
        big_endian=big_endian,
    )
    payload = _EXIF_HEADER + tiff
    app1 = b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload
    return b"\xff\xd8" + app1 + b"\xff\xd9"


def decode_exif_meta(data: bytes) -> dict:
    """Walk the JPEG marker stream, find APP1/Exif, decode the embedded
    TIFF IFD → the same dict shape as decode_tiff_meta."""
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at {pos}")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        body = data[pos + 4 : pos + 2 + seglen]
        if marker == 0xE1 and body[:6] == _EXIF_HEADER:
            return decode_tiff_meta(body[6:])
        pos += 2 + seglen
    raise ValueError("no EXIF APP1 segment found")
