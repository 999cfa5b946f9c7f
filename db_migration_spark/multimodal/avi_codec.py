"""Pure-stdlib AVI (RIFF) container codec for MJPEG streams.

With mp4_meta.py covering ISO-BMFF triage and jpeg_codec.py providing a
real baseline-JPEG pixel kernel, this closes the video seam end-to-end:
an MJPEG AVI is a RIFF tree whose ``movi`` chunks are whole JPEG images,
so container walk (here) + per-frame JPEG decode (jpeg_codec) is a REAL
video frame-sampling path with no native library.

Format per the public AVI RIFF spec (Microsoft Video for Windows):
``RIFF('AVI ' LIST('hdrl' avih LIST('strl' strh strf)) LIST('movi'
00dc...) idx1)``; chunks are word-aligned (odd sizes pad one byte).

Parity anchor: the reference treats media as opaque payloads (SURVEY
§2.12); this is the decode seam its downstream consumers would run.
"""

from __future__ import annotations

import struct


def is_avi(b: bytes) -> bool:
    return len(b) >= 12 and b[:4] == b"RIFF" and b[8:12] == b"AVI "


def encode_avi_mjpeg(
    width: int, height: int, fps: int, frames: list[bytes]
) -> bytes:
    """Minimal spec-valid MJPEG AVI: one video stream, an index, and one
    ``00dc`` chunk per JPEG frame (word-aligned)."""

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) % 2 else b""
        return fourcc + struct.pack("<I", len(payload)) + payload + pad

    def lst(fourcc: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", fourcc + payload)

    us_per_frame = 1_000_000 // fps
    avih = struct.pack(
        "<14I",
        us_per_frame, 0, 0, 0x10, len(frames), 0, 1, 0,
        width, height, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIi4H",
        b"vids", b"MJPG", 0, 0, 0, 0, 1, fps, 0, len(frames),
        0, 0xFFFFFFFF, 0, 0, 0, width & 0xFFFF, height & 0xFFFF,
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG", width * height * 3, 0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_payload = b"".join(chunk(b"00dc", f) for f in frames)
    movi = lst(b"movi", movi_payload)
    # idx1 offsets are relative to the start of the movi LIST data
    idx, off = bytearray(), 4
    for f in frames:
        idx += struct.pack("<4sIII", b"00dc", 0x10, off, len(f))
        off += 8 + len(f) + (len(f) % 2)
    body = b"AVI " + hdrl + movi + chunk(b"idx1", bytes(idx))
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_avi(b: bytes):
    """Walk the RIFF tree → (width, height, fps, total_frames,
    frame_payloads).  Accepts ``00dc``/``00db`` video chunks; skips
    everything else (audio streams, junk, index)."""
    if not is_avi(b):
        raise ValueError("not an AVI payload")
    width = height = fps = total = 0
    frames: list[bytes] = []

    def walk(pos: int, end: int) -> None:
        nonlocal width, height, fps, total
        while pos + 8 <= end:
            fourcc = b[pos : pos + 4]
            (size,) = struct.unpack_from("<I", b, pos + 4)
            data_start = pos + 8
            data_end = data_start + size
            if data_end > len(b):
                raise ValueError("truncated AVI chunk")
            if fourcc == b"LIST":
                walk(data_start + 4, data_end)
            elif fourcc == b"avih":
                (uspf, _, _, _, tf, _, _, _, w, h) = struct.unpack_from(
                    "<10I", b, data_start
                )
                width, height, total = w, h, tf
                fps = round(1_000_000 / uspf) if uspf else 0
            elif fourcc in (b"00dc", b"00db"):
                frames.append(b[data_start:data_end])
            pos = data_end + (size % 2)

    walk(12, len(b))
    if not width:
        raise ValueError("AVI has no avih header")
    return width, height, fps, total, frames


def sample_frame_stats(b: bytes, every_n: int = 1):
    """Decode every ``every_n``-th MJPEG frame through the REAL baseline
    JPEG kernel → [(frame_idx, width, height, mean_of_first_channel)].
    The container declares dims; each frame's JPEG header re-declares
    them — both are returned by the pixel kernel, so disagreement
    surfaces in the stats rather than being papered over."""
    from . import jpeg_codec

    _, _, _, _, frames = parse_avi(b)
    out = []
    for i in range(0, len(frames), every_n):
        w, h, _ch, means = jpeg_codec.channel_means(frames[i])
        out.append((i, w, h, means[0]))
    return out
