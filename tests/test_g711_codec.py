"""G.711 µ-law / A-law codec tests (g711_codec.py)."""

from __future__ import annotations

import pytest

from db_migration_spark.multimodal.g711_codec import (
    alaw_to_linear,
    decode_wav_g711,
    encode_wav_g711,
    linear_to_alaw,
    linear_to_ulaw,
    ulaw_to_linear,
)


def test_ulaw_byte_roundtrip():
    # every code survives decode->encode except 0x7F: µ-law has two
    # zero codes (+0=0xFF, -0=0x7F) and the encoder canonicalizes to 0xFF
    for b in range(256):
        back = linear_to_ulaw(ulaw_to_linear(b))
        assert back == (0xFF if b == 0x7F else b)


def test_alaw_byte_roundtrip_exact():
    assert all(linear_to_alaw(alaw_to_linear(b)) == b for b in range(256))


def test_itu_anchor_values():
    # extremes and zeros from the G.711 tables
    assert ulaw_to_linear(0xFF) == 0
    assert ulaw_to_linear(0x80) == 32124  # max positive
    assert ulaw_to_linear(0x00) == -8031 - 24093  # max negative = -32124
    assert max(abs(alaw_to_linear(b)) for b in range(256)) == 32256
    # A-law sign convention: toggled sign bit SET = positive
    assert alaw_to_linear(0xD5) == 8  # +smallest
    assert alaw_to_linear(0x55) == -8  # -smallest


def test_decode_is_monotonic_per_sign():
    # within each sign, increasing code magnitude = increasing magnitude
    pos = sorted(ulaw_to_linear(b) for b in range(0x80, 0x100))
    assert pos == [ulaw_to_linear(b) for b in range(0xFF, 0x7F, -1)]


def test_encoder_quantizes_to_segment():
    # any 16-bit value encodes then decodes to within its segment width
    for x in [0, 1, 7, 8, 100, 1000, 10000, 32124, -5, -500, -32124]:
        y = ulaw_to_linear(linear_to_ulaw(x))
        assert abs(y - x) <= max(4, abs(x) / 16)


def test_wav_container_both_laws():
    comp = bytes((i * 11 + 3) % 256 for i in range(321))  # odd length: pad path
    for law in ("ulaw", "alaw"):
        got_law, rate, samples = decode_wav_g711(
            encode_wav_g711(16000, comp, law)
        )
        expand = ulaw_to_linear if law == "ulaw" else alaw_to_linear
        assert got_law == law and rate == 16000
        assert samples == [expand(b) for b in comp]


def test_linear_pcm_wav_rejected():
    from db_migration_spark.multimodal.binary_ops import encode_wav_pcm16

    pcm = encode_wav_pcm16(8000, bytes(200))
    with pytest.raises(ValueError, match="not a G.711"):
        decode_wav_g711(pcm)
