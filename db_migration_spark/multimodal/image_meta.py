"""Header-only image metadata — REAL parsing, zero codec libraries.

A 100 TB corpus pipeline's metadata pass (dimensions, format routing)
does not need pixel decoding: every mainstream raster format carries its
dimensions in a fixed header.  This module sniffs and parses PNG, JPEG,
GIF and BMP headers with pure byte arithmetic (struct only):

* PNG  — IHDR chunk (delegates to png_codec),
* JPEG — SOF0..SOF15 frame segment scan (the dimensions live in the
  frame header; entropy-coded data is never touched),
* GIF  — logical screen descriptor (LE u16 at offsets 6/8),
* BMP  — BITMAPINFOHEADER (LE i32 at offsets 18/22).

Unknown formats return ``("unknown", 0, 0)`` instead of raising, so the
metadata pass never fails a batch on one odd payload.
"""

from __future__ import annotations

import struct

from . import png_codec

# SOFn markers: C0-CF minus C4 (DHT), C8 (JPG extension), CC (DAC)
_JPEG_SOF = {
    m for m in range(0xC0, 0xD0) if m not in (0xC4, 0xC8, 0xCC)
}


def _jpeg_dims(payload: bytes) -> tuple[int, int] | None:
    """Scan JPEG segments for the first SOFn frame header."""
    if payload[:2] != b"\xff\xd8":
        return None
    pos = 2
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            return None  # corrupt segment stream
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            return None
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:  # RSTn/TEM: bare
            pos += 2
            continue
        (seg_len,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        if marker in _JPEG_SOF:
            if pos + 9 > n:
                return None
            height, width = struct.unpack(">HH", payload[pos + 5 : pos + 9])
            return width, height
        pos += 2 + seg_len
    return None


def image_meta(payload: bytes | None) -> tuple[str, int, int]:
    """(format, width, height) from the header bytes alone."""
    if not payload or len(payload) < 10:
        return ("unknown", 0, 0)
    if png_codec.is_png(payload):
        w, h, _, _ = png_codec.decode_png_meta(payload)
        return ("png", w, h)
    if payload[:2] == b"\xff\xd8":
        dims = _jpeg_dims(payload)
        return ("jpeg", dims[0], dims[1]) if dims else ("unknown", 0, 0)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", payload[6:10])
        return ("gif", w, h)
    if payload[:2] == b"BM" and len(payload) >= 26:
        w, h = struct.unpack("<ii", payload[18:26])
        return ("bmp", w, abs(h))  # negative height = top-down DIB
    return ("unknown", 0, 0)


# --- minimal header builders (fixture/test generators) ----------------------


def make_jpeg_header(width: int, height: int) -> bytes:
    """Smallest metadata-parseable JPEG: SOI + SOF0 + EOI.  (Not a
    renderable image — there is no entropy-coded data — but dimension
    extraction only reads the frame header, which is the point.)"""
    sof = struct.pack(
        ">HBHHB", 0x0011, 8, height, width, 3
    ) + bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1])
    return b"\xff\xd8" + b"\xff\xc0" + sof + b"\xff\xd9"


def make_gif_header(width: int, height: int) -> bytes:
    return b"GIF89a" + struct.pack("<HH", width, height) + b"\x00\x00\x00"


def make_bmp_header(width: int, height: int) -> bytes:
    return (
        b"BM"
        + struct.pack("<IHHI", 26, 0, 0, 26)
        + struct.pack("<Iii", 40, width, height)
    )
