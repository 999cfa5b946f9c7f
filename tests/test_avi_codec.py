"""MJPEG-AVI container codec tests (avi_codec.py) — the real video
frame-sampling path: RIFF walk + per-frame baseline-JPEG decode."""

from __future__ import annotations

import struct

import pytest

from db_migration_spark.multimodal.avi_codec import (
    encode_avi_mjpeg,
    is_avi,
    parse_avi,
    sample_frame_stats,
)
from db_migration_spark.multimodal.jpeg_codec import encode_jpeg_gray_blocks


def _frames(n: int, base: int = 0) -> list[bytes]:
    return [
        encode_jpeg_gray_blocks(2, 2, [(base + 37 * j + 11 * b) % 256 for b in range(4)])
        for j in range(n)
    ]


def test_roundtrip_frames_bit_exact():
    frames = _frames(7)
    avi = encode_avi_mjpeg(16, 16, 25, frames)
    assert is_avi(avi)
    w, h, fps, total, got = parse_avi(avi)
    assert (w, h, fps, total) == (16, 16, 25, 7)
    assert got == frames


def test_odd_size_frame_word_alignment():
    # force an odd-length chunk so the pad byte path is exercised
    frames = _frames(3)
    assert any(len(f) % 2 for f in frames) or True
    odd = frames[0] + b"\xff\xd9"[:1]  # make one payload odd-length
    avi = encode_avi_mjpeg(16, 16, 10, [odd, frames[1]])
    _, _, _, _, got = parse_avi(avi)
    assert got[0] == odd and got[1] == frames[1]


def test_sample_stride_and_means():
    frames = _frames(6)
    avi = encode_avi_mjpeg(16, 16, 10, frames)
    stats = sample_frame_stats(avi, every_n=3)
    assert [s[0] for s in stats] == [0, 3]
    # DC-block mean: base + 37j + 11*(0+1+2+3)/4 = 37j + 16.5
    assert stats[0][3] == pytest.approx(16.5)
    assert stats[1][3] == pytest.approx(37 * 3 + 16.5)


def test_not_avi_raises():
    with pytest.raises(ValueError, match="not an AVI"):
        parse_avi(b"RIFF\x04\x00\x00\x00WAVE")


def test_truncated_chunk_raises():
    avi = encode_avi_mjpeg(16, 16, 10, _frames(2))
    # cut INSIDE the movi list (mid-frame): the chunk header declares
    # more bytes than remain -> must raise, never return partial frames
    cut = avi.index(b"00dc") + 12
    with pytest.raises((ValueError, struct.error)):
        parse_avi(avi[:cut])


def test_missing_header_raises():
    body = b"AVI " + b"JUNK" + struct.pack("<I", 0)
    blob = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(ValueError, match="no avih"):
        parse_avi(blob)
