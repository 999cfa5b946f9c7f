"""Real TIFF (6.0 baseline) metadata codec — pure struct.

Writes and reads the classic container: byte-order mark (``II``
little / ``MM`` big endian), magic 42, first-IFD offset, then an IFD of
12-byte entries (tag, type, count, inline value).  The parser honors
BOTH byte orders and walks the entry table — the two traps (endianness
and SHORT-vs-LONG value types) are exactly what the integer oracle
(queries.py multimodal_tiff_meta) pins.

Tags handled: 256 ImageWidth, 257 ImageLength, 258 BitsPerSample,
259 Compression, 277 SamplesPerPixel.
"""

from __future__ import annotations

import struct

_TAGS = {
    "width": 256,
    "height": 257,
    "bits_per_sample": 258,
    "compression": 259,
    "samples_per_pixel": 277,
}


def encode_tiff_header(
    width: int,
    height: int,
    bits_per_sample: int = 8,
    samples_per_pixel: int = 3,
    compression: int = 1,
    big_endian: bool = False,
) -> bytes:
    """Minimal valid TIFF: header + one IFD (no strip data — the
    metadata tier's fixture, like image_meta's JPEG/GIF headers)."""
    e = ">" if big_endian else "<"
    entries = [
        (256, 3, width),
        (257, 3, height),
        (258, 3, bits_per_sample),
        (259, 3, compression),
        (277, 3, samples_per_pixel),
    ]
    ifd = struct.pack(e + "H", len(entries))
    for tag, typ, val in entries:
        # SHORT values sit left-justified in the 4-byte slot
        if big_endian:
            slot = struct.pack(">HH", val, 0)
        else:
            slot = struct.pack("<HH", val, 0)
        ifd += struct.pack(e + "HHI", tag, typ, 1) + slot
    ifd += struct.pack(e + "I", 0)  # no next IFD
    bom = b"MM" if big_endian else b"II"
    return bom + struct.pack(e + "HI", 42, 8) + ifd


def is_tiff(payload: bytes | None) -> bool:
    return payload is not None and payload[:2] in (b"II", b"MM")


def decode_tiff_meta(payload: bytes) -> dict:
    """Parse byte order + IFD entries → tag dict (the five baseline
    tags), honoring SHORT (3) and LONG (4) entry types."""
    if not is_tiff(payload):
        raise ValueError("not a TIFF payload")
    e = ">" if payload[:2] == b"MM" else "<"
    magic, ifd_off = struct.unpack_from(e + "HI", payload, 2)
    if magic != 42:
        raise ValueError(f"bad TIFF magic {magic}")
    (n_entries,) = struct.unpack_from(e + "H", payload, ifd_off)
    out = {"big_endian": e == ">"}
    rev = {v: k for k, v in _TAGS.items()}
    pos = ifd_off + 2
    for _ in range(n_entries):
        tag, typ, count = struct.unpack_from(e + "HHI", payload, pos)
        if typ == 3:  # SHORT, left-justified in the slot
            (val,) = struct.unpack_from(e + "H", payload, pos + 8)
        elif typ == 4:  # LONG
            (val,) = struct.unpack_from(e + "I", payload, pos + 8)
        else:
            val = None
        if tag in rev and val is not None:
            out[rev[tag]] = val
        pos += 12
    return out
