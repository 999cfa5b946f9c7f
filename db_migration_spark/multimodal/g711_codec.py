"""G.711 µ-law / A-law audio codec — REAL companded-PCM kernel.

The stdlib ``wave`` module reads only linear PCM; telephony/broadcast
corpora carry G.711-companded WAVs (format code 7 = µ-law, 6 = A-law,
one byte per sample).  This implements the ITU-T G.711 expansion and
compression in pure integer arithmetic (the same tables classic
implementations generate), plus a minimal RIFF reader/writer for the
companded format codes.

Expansion is exact integer math, so downstream statistics oracles can
replicate it bit-for-bit in SQL (see multimodal_g711_stats).

Parity anchor: reference treats media as opaque payloads (SURVEY
§2.12); this is the decode seam its consumers would run.
"""

from __future__ import annotations

import struct

WAVE_FORMAT_ALAW = 6
WAVE_FORMAT_MULAW = 7


def ulaw_to_linear(u: int) -> int:
    """One µ-law byte → 16-bit linear sample (ITU-T G.711 expansion)."""
    u = ~u & 0xFF
    sign = u & 0x80
    e = (u >> 4) & 0x07
    m = u & 0x0F
    x = (((m << 3) + 0x84) << e) - 0x84
    return -x if sign else x


def linear_to_ulaw(x: int) -> int:
    """16-bit linear sample → µ-law byte (segment search + complement)."""
    sign = 0x80 if x < 0 else 0
    if x < 0:
        x = -x
    x = min(x + 0x84, 0x7FFF)
    e = 7
    mask = 0x4000
    while e > 0 and not (x & mask):
        e -= 1
        mask >>= 1
    m = (x >> (e + 3)) & 0x0F
    return ~(sign | (e << 4) | m) & 0xFF


def alaw_to_linear(a: int) -> int:
    """One A-law byte → 16-bit linear sample (G.711, 0x55 toggle).
    Note A-law's sign convention is the inverse of µ-law's: the sign
    bit SET (after the 0x55 toggle) means POSITIVE."""
    a ^= 0x55
    sign = a & 0x80
    e = (a >> 4) & 0x07
    m = a & 0x0F
    if e == 0:
        x = (m << 4) + 8
    else:
        x = ((m << 4) + 0x108) << (e - 1)
    return x if sign else -x


_ALAW_SEG_END = (0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF, 0x1FFF, 0x3FFF, 0x7FFF)


def linear_to_alaw(x: int) -> int:
    """16-bit linear sample → A-law byte (classic segment search; the
    negative branch biases by -8 per the reference implementation's
    rounding convention)."""
    if x >= 0:
        mask = 0xD5  # sign bit set (positive) + 0x55 toggle
    else:
        mask = 0x55
        x = max(-x - 8, 0)
    for seg, end in enumerate(_ALAW_SEG_END):
        if x <= end:
            break
    else:
        return 0x7F ^ mask
    aval = seg << 4
    if seg < 2:
        aval |= (x >> 4) & 0x0F
    else:
        aval |= (x >> (seg + 3)) & 0x0F
    return aval ^ mask


def encode_wav_g711(
    sample_rate: int, companded: bytes, law: str = "ulaw"
) -> bytes:
    """Minimal RIFF/WAVE with a G.711 fmt chunk (1 byte/sample mono)."""
    fmt_code = WAVE_FORMAT_MULAW if law == "ulaw" else WAVE_FORMAT_ALAW
    fmt = struct.pack(
        "<HHIIHH", fmt_code, 1, sample_rate, sample_rate, 1, 8
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(companded)) + companded
        + (b"\x00" if len(companded) % 2 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav_g711(b: bytes):
    """Parse a G.711 WAV → (law, sample_rate, [16-bit linear samples])."""
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a WAVE payload")
    pos = 12
    fmt_code = rate = None
    data = None
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        (size,) = struct.unpack_from("<I", b, pos + 4)
        start = pos + 8
        if start + size > len(b):
            raise ValueError("truncated WAVE chunk")
        if cid == b"fmt ":
            fmt_code, channels, rate = struct.unpack_from("<HHI", b, start)
            if channels != 1:
                raise NotImplementedError("G.711 decode supports mono")
        elif cid == b"data":
            data = b[start : start + size]
        pos = start + size + (size % 2)
    if fmt_code not in (WAVE_FORMAT_MULAW, WAVE_FORMAT_ALAW) or data is None:
        raise ValueError("not a G.711 WAVE (fmt 6/7 + data required)")
    expand = ulaw_to_linear if fmt_code == WAVE_FORMAT_MULAW else alaw_to_linear
    law = "ulaw" if fmt_code == WAVE_FORMAT_MULAW else "alaw"
    return law, rate, [expand(byte) for byte in data]
