"""Pixel-space kernels over decoded images — pure stdlib.

The decode side (png_codec / bmp_codec / jpeg_codec / gif_codec) yields
row-major channel-interleaved bytes; these kernels transform that buffer.
All arithmetic is integer (index maps use floor division), so the
results are bit-deterministic and SQL-replayable — the resize oracle
(queries.py multimodal_image_resize) recomputes the same sums from the
generation formulas evaluated at the mapped coordinates.
"""

from __future__ import annotations


def nn_resize(
    pixels: bytes | bytearray,
    width: int,
    height: int,
    channels: int,
    out_w: int,
    out_h: int,
) -> bytearray:
    """Nearest-neighbor resize: target (x2, y2) samples source
    (x2·w // out_w, y2·h // out_h) — the standard floor map, exact in
    integers."""
    out = bytearray(out_w * out_h * channels)
    for y2 in range(out_h):
        ys = y2 * height // out_h
        src_row = ys * width * channels
        dst_row = y2 * out_w * channels
        for x2 in range(out_w):
            xs = x2 * width // out_w
            s = src_row + xs * channels
            d = dst_row + x2 * channels
            out[d : d + channels] = pixels[s : s + channels]
    return out


def channel_sums_of(
    pixels: bytes | bytearray, channels: int
) -> list[int]:
    sums = [0] * channels
    for i, v in enumerate(pixels):
        sums[i % channels] += v
    return sums
