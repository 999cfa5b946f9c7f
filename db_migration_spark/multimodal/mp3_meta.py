"""Real MP3 / ID3v2 metadata parsing — pure struct, public tables.

Audio corpora arrive as MP3 with an ID3v2 tag prefix; triage needs the
tag size (skip it), then the first MPEG audio frame header's bitrate /
sample-rate / channel mode.  Both structures are fully public:

* ID3v2 header: ``ID3`` + version(2) + flags(1) + 4-byte SYNCSAFE size
  (7 bits per byte — the classic off-by-8th-bit trap this oracle pins).
* MPEG frame header: 11-bit sync, version id, layer, bitrate index and
  sample-rate index resolved through the standard tables (MPEG-1
  Layer III here).

Decode only — MP3 *pixel* (PCM) decoding needs a DCT synthesis
filterbank and stays behind the documented native-lib seam.
"""

from __future__ import annotations

# MPEG-1 Layer III bitrates (kbps), index 1..14
_BITRATES_V1L3 = [
    0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320,
]
_SAMPLE_RATES_V1 = [44100, 48000, 32000]


def encode_mp3_fixture(
    id3_size: int, bitrate_idx: int, samplerate_idx: int, mono: bool
) -> bytes:
    """ID3v2.3 tag (syncsafe size, zero-padded body) + one MPEG-1
    Layer III frame header."""
    if not 0 <= id3_size < (1 << 28):
        raise ValueError("id3 size out of syncsafe range")
    ss = bytes(
        [
            (id3_size >> 21) & 0x7F,
            (id3_size >> 14) & 0x7F,
            (id3_size >> 7) & 0x7F,
            id3_size & 0x7F,
        ]
    )
    tag = b"ID3" + bytes([3, 0, 0]) + ss + b"\x00" * id3_size
    b1 = 0xFF
    b2 = 0xFB  # sync + MPEG-1 + Layer III + no CRC
    b3 = (bitrate_idx << 4) | (samplerate_idx << 2)
    b4 = (0b11 << 6) if mono else 0  # channel mode: mono vs stereo
    return tag + bytes([b1, b2, b3, b4])


def decode_mp3_meta(payload: bytes) -> dict:
    """Skip the ID3v2 tag (syncsafe size), find the frame sync, resolve
    the header through the public tables."""
    pos = 0
    id3_size = 0
    if payload[:3] == b"ID3":
        id3_size = (
            (payload[6] << 21)
            | (payload[7] << 14)
            | (payload[8] << 7)
            | payload[9]
        )
        pos = 10 + id3_size
    if pos + 4 > len(payload) or payload[pos] != 0xFF or (
        payload[pos + 1] & 0xE0
    ) != 0xE0:
        raise ValueError("no MPEG frame sync after ID3 tag")
    b2, b3, b4 = payload[pos + 1], payload[pos + 2], payload[pos + 3]
    version = (b2 >> 3) & 0b11  # 3 = MPEG-1
    layer = (b2 >> 1) & 0b11  # 1 = Layer III
    if version != 3 or layer != 1:
        raise ValueError("only MPEG-1 Layer III supported")
    bitrate_idx = (b3 >> 4) & 0xF
    sr_idx = (b3 >> 2) & 0b11
    if not 1 <= bitrate_idx <= 14 or sr_idx > 2:
        raise ValueError("bad bitrate/samplerate index")
    mode = (b4 >> 6) & 0b11
    return {
        "id3_size": id3_size,
        "bitrate_kbps": _BITRATES_V1L3[bitrate_idx],
        "sample_rate": _SAMPLE_RATES_V1[sr_idx],
        "mono": mode == 0b11,
    }
