"""FLAC STREAMINFO metadata (pure stdlib, public FLAC format spec).

``fLaC`` magic, then metadata blocks: 1-byte header (last-block flag +
7-bit type; STREAMINFO is type 0 and MUST be first) + 24-bit big-endian
length, then the 34-byte STREAMINFO body with bit-packed fields:

  u16 min_blocksize, u16 max_blocksize, u24 min_framesize,
  u24 max_framesize, then a 64-bit group holding sample_rate (20 bits),
  channels−1 (3 bits), bits_per_sample−1 (5 bits), total_samples
  (36 bits), then 16 bytes of MD5.

The bit-packed group is the parse trap this kernel exists for (sample
rate straddles byte boundaries).  Completes the audio metadata family
next to wav/mp3/g711.  Only ``struct``-level byte handling.
"""

from __future__ import annotations

import struct


def is_flac(b: bytes) -> bool:
    return len(b) >= 4 and b[:4] == b"fLaC"


def encode_flac_streaminfo(
    sample_rate: int,
    channels: int,
    bits_per_sample: int,
    total_samples: int,
    min_blocksize: int = 4096,
    max_blocksize: int = 4096,
) -> bytes:
    """Minimal valid FLAC: magic + one (last) STREAMINFO block."""
    if not (1 <= channels <= 8 and 4 <= bits_per_sample <= 32):
        raise ValueError("bad channels/bits")
    if sample_rate >= 1 << 20 or total_samples >= 1 << 36:
        raise ValueError("field overflow")
    group = (
        (sample_rate << 44)
        | ((channels - 1) << 41)
        | ((bits_per_sample - 1) << 36)
        | total_samples
    )
    body = (
        struct.pack(">HH", min_blocksize, max_blocksize)
        + b"\x00\x00\x00"  # min_framesize (unknown)
        + b"\x00\x00\x00"  # max_framesize (unknown)
        + group.to_bytes(8, "big")
        + b"\x00" * 16  # md5 of raw samples (none)
    )
    header = bytes([0x80 | 0x00]) + len(body).to_bytes(3, "big")
    return b"fLaC" + header + body


def decode_flac_meta(data: bytes) -> dict:
    if not is_flac(data):
        raise ValueError("not a FLAC payload")
    pos = 4
    first = True
    while pos + 4 <= len(data):
        hdr = data[pos]
        last = bool(hdr & 0x80)
        btype = hdr & 0x7F
        length = int.from_bytes(data[pos + 1 : pos + 4], "big")
        body = data[pos + 4 : pos + 4 + length]
        if first and btype != 0:
            raise ValueError("STREAMINFO must be the first block")
        if btype == 0:
            min_bs, max_bs = struct.unpack(">HH", body[0:4])
            group = int.from_bytes(body[10:18], "big")
            return {
                "min_blocksize": min_bs,
                "max_blocksize": max_bs,
                "sample_rate": group >> 44,
                "channels": ((group >> 41) & 0x7) + 1,
                "bits_per_sample": ((group >> 36) & 0x1F) + 1,
                "total_samples": group & ((1 << 36) - 1),
            }
        first = False
        if last:
            break
        pos += 4 + length
    raise ValueError("no STREAMINFO block")
