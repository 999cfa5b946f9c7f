"""Pure-stdlib WebP container metadata (RIFF per the public WebP spec).

Covers all three bitstream variants:

* ``VP8 `` (lossy): 3-byte frame tag, the 0x9D 0x01 0x2A start code,
  then 14-bit width/height with 2-bit scale fields (little-endian u16).
* ``VP8L`` (lossless): 0x2F signature byte, then width−1 / height−1 as
  two 14-bit fields packed LSB-first into the next 28 bits.
* ``VP8X`` (extended): 4-byte feature flags, then 24-bit little-endian
  canvas width−1 / height−1.

The encoder builds the minimal spec-valid header for each variant (what
a fixture needs for metadata parity — pixel payloads are the VP8 codec
itself, out of scope like JPEG-progressive); the decoder resolves the
variant from the chunk FourCC and reads dimensions back.  Sibling of
tiff_meta/mp3_meta; reference anchor SURVEY §2.12 (opaque media bytes +
typed metadata).  Only ``struct``-level byte handling.
"""

from __future__ import annotations

import struct


def is_webp(b: bytes) -> bool:
    return len(b) >= 12 and b[:4] == b"RIFF" and b[8:12] == b"WEBP"


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    out = fourcc + struct.pack("<I", len(payload)) + payload
    if len(payload) % 2:
        out += b"\x00"  # RIFF word alignment
    return out


def encode_webp_header(width: int, height: int, variant: str) -> bytes:
    """Minimal spec-valid WebP of the given variant with the requested
    canvas dimensions (1..16383 for VP8/VP8L, 1..2^24 for VP8X)."""
    limit = (1 << 24) if variant == "vp8x" else 16383
    if not (1 <= width <= limit and 1 <= height <= limit):
        raise ValueError(
            f"{variant} dimensions out of range (1..{limit})"
        )
    if variant == "vp8":
        # frame tag: key frame (bit0 = 0), version 0, show_frame 1,
        # first-partition size 0 -> 3 bytes little-endian
        tag = 0 | (0 << 1) | (1 << 4) | (0 << 5)
        body = (
            struct.pack("<I", tag)[:3]
            + b"\x9d\x01\x2a"
            + struct.pack("<H", width)
            + struct.pack("<H", height)
        )
        payload = _chunk(b"VP8 ", body)
    elif variant == "vp8l":
        bits = (width - 1) | ((height - 1) << 14)  # 28 bits, LSB-first
        body = b"\x2f" + struct.pack("<I", bits)
        payload = _chunk(b"VP8L", body)
    elif variant == "vp8x":
        body = (
            b"\x00\x00\x00\x00"
            + struct.pack("<I", width - 1)[:3]
            + struct.pack("<I", height - 1)[:3]
        )
        payload = _chunk(b"VP8X", body)
    else:
        raise ValueError(f"unknown variant {variant!r}")
    return b"RIFF" + struct.pack("<I", 4 + len(payload)) + b"WEBP" + payload


def decode_webp_meta(data: bytes) -> dict:
    """Parse the first bitstream chunk → {variant, width, height,
    lossless, extended}."""
    if not is_webp(data):
        raise ValueError("not a WebP payload")
    pos = 12
    while pos + 8 <= len(data):
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        if fourcc == b"VP8 ":
            if body[3:6] != b"\x9d\x01\x2a":
                raise ValueError("bad VP8 start code")
            (w,) = struct.unpack("<H", body[6:8])
            (h,) = struct.unpack("<H", body[8:10])
            return {
                "variant": "vp8",
                "width": w & 0x3FFF,
                "height": h & 0x3FFF,
                "lossless": False,
                "extended": False,
            }
        if fourcc == b"VP8L":
            if body[0] != 0x2F:
                raise ValueError("bad VP8L signature")
            (bits,) = struct.unpack("<I", body[1:5])
            return {
                "variant": "vp8l",
                "width": (bits & 0x3FFF) + 1,
                "height": ((bits >> 14) & 0x3FFF) + 1,
                "lossless": True,
                "extended": False,
            }
        if fourcc == b"VP8X":
            w = int.from_bytes(body[4:7], "little") + 1
            h = int.from_bytes(body[7:10], "little") + 1
            return {
                "variant": "vp8x",
                "width": w,
                "height": h,
                "lossless": False,
                "extended": True,
            }
        pos += 8 + size + (size % 2)
    raise ValueError("no bitstream chunk found")
