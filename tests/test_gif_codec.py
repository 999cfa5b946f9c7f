"""Exact-pixel tests for the pure-stdlib GIF codec (gif_codec.py).

The oracled query (multimodal_gif_decode) pins channel means, which are
pixel-ORDER-invariant; these tests pin the order-sensitive paths: the
4-pass interlace reorder, LZW code-width transitions across the 2^w-1
boundary, the KwKwK self-referencing code, dictionary reset at 4096,
and malformed-payload errors.  No Spark needed — the codec is the
Arrow-seam kernel."""

from __future__ import annotations

import random

import pytest

from db_migration_spark.multimodal.gif_codec import (
    _lzw_decode,
    _lzw_encode,
    channel_means,
    decode_gif,
    encode_gif,
    is_gif,
)


def _expected_rgb(palette: bytes, idx: bytes) -> bytes:
    return b"".join(palette[3 * i : 3 * i + 3] for i in idx)


def test_roundtrip_property_sweep():
    rnd = random.Random(7)
    for trial in range(40):
        w, h = rnd.randint(1, 40), rnd.randint(1, 40)
        bits = rnd.randint(1, 8)
        n = 2 << (bits - 1)
        palette = bytes(rnd.randrange(256) for _ in range(3 * n))
        if trial % 3 == 0:
            idx = bytes(rnd.randrange(n) for _ in range(w * h))
        elif trial % 3 == 1:
            idx = bytes((x // 3) % n for x in range(w * h))
        else:
            idx = bytes(((x % w) + (x // w)) % n for x in range(w * h))
        gif = encode_gif(w, h, palette, idx, interlaced=trial % 2 == 1)
        assert is_gif(gif)
        dw, dh, rgb = decode_gif(gif)
        assert (dw, dh) == (w, h)
        assert rgb == _expected_rgb(palette, idx)


def test_interlace_is_position_exact():
    # a gradient unique per position: ANY interlace reorder error moves
    # a wrong byte to a wrong row
    w, h = 8, 13  # odd height exercises uneven pass lengths
    palette = bytes(i % 256 for i in range(3 * 256))
    idx = bytes((7 * i) % 256 for i in range(w * h))
    plain = decode_gif(encode_gif(w, h, palette, idx, interlaced=False))
    inter = decode_gif(encode_gif(w, h, palette, idx, interlaced=True))
    assert plain == inter  # same logical image either layout


def test_lzw_width_growth_and_reset():
    # force the 12-bit ceiling and a dictionary reset
    data = bytes((x * 7 + (x >> 5)) % 256 for x in range(60000))
    enc = _lzw_encode(data, 8)
    assert bytes(_lzw_decode(enc, 8, len(data))) == data
    assert len(enc) < len(data)  # actually compresses


def test_lzw_kwkwk_case():
    # 'aaaa...' immediately emits codes that reference the entry being
    # defined (the KwKwK corner)
    data = b"\x00" * 500 + b"\x01" + b"\x00" * 500
    enc = _lzw_encode(data, 2)
    assert bytes(_lzw_decode(enc, 2, len(data))) == data


def test_single_pixel_and_two_color():
    gif = encode_gif(1, 1, bytes([9, 8, 7, 1, 2, 3]), b"\x01")
    assert decode_gif(gif) == (1, 1, bytes([1, 2, 3]))


def test_extension_blocks_are_skipped():
    # splice a graphic-control extension before the image descriptor
    palette = bytes([0, 0, 0, 255, 255, 255])
    gif = bytearray(encode_gif(2, 2, palette, b"\x00\x01\x01\x00"))
    ext = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    pos = gif.index(b"\x2c")
    spliced = bytes(gif[:pos]) + ext + bytes(gif[pos:])
    assert decode_gif(spliced)[:2] == (2, 2)


def test_truncated_stream_raises():
    import struct

    palette = bytes([0, 0, 0, 255, 255, 255])
    gif = encode_gif(10, 10, palette, bytes(100))
    # cut mid-LZW-data and mid-header: both must raise, never return
    # partial pixels
    with pytest.raises((ValueError, struct.error, IndexError)):
        decode_gif(gif[: len(gif) // 2])
    with pytest.raises((ValueError, struct.error, IndexError)):
        decode_gif(gif[:10])


def test_not_gif_raises():
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"\x89PNG\r\n\x1a\n")


def test_channel_means_closed_form():
    palette = bytes([10, 20, 30, 50, 60, 70])
    idx = bytes([0, 1, 0, 1])
    w, h, ch, means = channel_means(encode_gif(2, 2, palette, idx))
    assert (w, h, ch) == (2, 2, 3)
    assert means == [30.0, 40.0, 50.0]
