"""Minimal ISO BMFF (MP4) container metadata — pure ``struct``.

Real box-structure parsing (ISO/IEC 14496-12): walk the top-level box
tree, locate ``moov``, parse ``mvhd`` (version 0 and 1) for
timescale/duration, count ``trak`` children.  This is the container
triage a video corpus needs before any frame decode — duration/track
routing without touching sample data.  Codec-level frame decode (avc1
NAL parsing, etc.) remains the native-lib seam.

The fixture encoder builds a syntactically valid ``ftyp`` + ``moov``
(``mvhd`` + N empty ``trak`` stubs) so the parser is exercised on real
box layout, including 64-bit (version 1) mvhd fields.
"""

from __future__ import annotations

import struct


def is_mp4(data: bytes | None) -> bool:
    return (
        data is not None
        and len(data) >= 12
        and data[4:8] == b"ftyp"
    )


def _box(kind: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + kind + payload


def encode_minimal_mp4(
    timescale: int, duration: int, n_tracks: int, version: int = 0
) -> bytes:
    """ftyp + moov(mvhd + n_tracks empty trak stubs).  ``version`` picks
    32-bit (0) or 64-bit (1) mvhd time fields."""
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    if version == 0:
        mvhd_payload = (
            struct.pack(">B3x", 0)
            + struct.pack(">IIII", 0, 0, timescale, duration)
            + b"\x00" * 80  # rate/volume/matrix/predefined/next_track_id
        )
    else:
        mvhd_payload = (
            struct.pack(">B3x", 1)
            + struct.pack(">QQIQ", 0, 0, timescale, duration)
            + b"\x00" * 80
        )
    mvhd = _box(b"mvhd", mvhd_payload)
    traks = b"".join(_box(b"trak", _box(b"tkhd", b"\x00" * 84))
                     for _ in range(n_tracks))
    return ftyp + _box(b"moov", mvhd + traks)


def _walk(data: bytes, start: int, end: int):
    """Yield (kind, payload_start, payload_end) for each box in a range,
    handling 64-bit largesize boxes."""
    pos = start
    while pos + 8 <= end:
        size = struct.unpack(">I", data[pos : pos + 4])[0]
        kind = data[pos + 4 : pos + 8]
        header = 8
        if size == 1:  # 64-bit largesize
            if pos + 16 > end:
                break
            size = struct.unpack(">Q", data[pos + 8 : pos + 16])[0]
            header = 16
        elif size == 0:  # box extends to end of file
            size = end - pos
        if size < header or pos + size > end:
            break
        yield kind, pos + header, pos + size
        pos += size


def parse_mp4_meta(data: bytes):
    """→ (major_brand, timescale, duration_ms, n_tracks).  Raises
    ValueError on non-MP4 payloads or a missing moov/mvhd."""
    if not is_mp4(data):
        raise ValueError("not an ISO BMFF payload")
    major_brand = None
    timescale = duration = None
    n_tracks = 0
    for kind, p0, p1 in _walk(data, 0, len(data)):
        if kind == b"ftyp":
            major_brand = data[p0 : p0 + 4].decode("ascii", "replace")
        elif kind == b"moov":
            for ck, c0, c1 in _walk(data, p0, p1):
                if ck == b"mvhd":
                    version = data[c0]
                    if version == 1:
                        _, _, timescale, duration = struct.unpack(
                            ">QQIQ", data[c0 + 4 : c0 + 32]
                        )
                    else:
                        _, _, timescale, duration = struct.unpack(
                            ">IIII", data[c0 + 4 : c0 + 20]
                        )
                elif ck == b"trak":
                    n_tracks += 1
    if timescale is None:
        raise ValueError("missing moov/mvhd")
    duration_ms = duration * 1000.0 / timescale if timescale else 0.0
    return major_brand, timescale, duration_ms, n_tracks
