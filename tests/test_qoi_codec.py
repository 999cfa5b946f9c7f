"""QOI codec unit tests: spec-level byte checks plus roundtrip
properties engineered to force every chunk op (RUN, INDEX, DIFF, LUMA,
RGB, RGBA) through both directions."""

from __future__ import annotations

import random
import struct

import pytest

from db_migration_spark.multimodal.qoi_codec import (
    channel_sums,
    decode_qoi,
    encode_qoi,
    is_qoi,
)


def test_header_and_end_marker():
    data = encode_qoi(3, 2, bytes(range(18)))
    assert is_qoi(data)
    assert data[:4] == b"qoif"
    assert struct.unpack(">II", data[4:12]) == (3, 2)
    assert data[12] == 3 and data[13] == 0
    assert data[-8:] == b"\x00" * 7 + b"\x01"


def test_run_op_compresses_constant_image():
    # 100 identical pixels -> first pixel chunk + RUN chunks; far
    # smaller than raw
    px = bytes([7, 8, 9]) * 100
    data = encode_qoi(10, 10, px)
    assert len(data) < 14 + 8 + 10  # header+end+a few chunks
    w, h, ch, out = decode_qoi(data)
    assert (w, h, ch) == (10, 10, 3)
    assert out == px


def test_roundtrip_random_rgb_and_rgba():
    rng = random.Random(42)
    for channels in (3, 4):
        for w, h in ((1, 1), (5, 3), (16, 16)):
            px = bytes(
                rng.randrange(256) for _ in range(w * h * channels)
            )
            w2, h2, ch2, out = decode_qoi(
                encode_qoi(w, h, px, channels)
            )
            assert (w2, h2, ch2) == (w, h, channels)
            assert out == px


def test_roundtrip_gradient_exercises_diff_luma_index():
    # small deltas -> DIFF; medium row deltas -> LUMA; repeated colors
    # across rows -> INDEX
    w, h = 16, 12
    px = bytearray()
    for y in range(h):
        for x in range(w):
            px += bytes([(10 + x % 7) % 256, (20 + y % 5) % 256, 33])
    data = encode_qoi(w, h, bytes(px))
    assert decode_qoi(data)[3] == bytes(px)
    # gradient must compress vs raw RGB chunks
    assert len(data) < 14 + 8 + 4 * w * h


def test_alpha_change_forces_rgba_chunk():
    px = bytes([1, 2, 3, 255, 1, 2, 3, 128])
    data = encode_qoi(2, 1, px, channels=4)
    assert 0xFF in data[14:-8]  # QOI_OP_RGBA tag present
    assert decode_qoi(data)[3] == px


def test_channel_sums_match_python_sum():
    rng = random.Random(7)
    px = bytes(rng.randrange(256) for _ in range(6 * 4 * 3))
    w, h, sums = channel_sums(encode_qoi(6, 4, px))
    assert (w, h) == (6, 4)
    for c in range(3):
        assert sums[c] == sum(px[i * 3 + c] for i in range(24))


def test_rejects_garbage():
    with pytest.raises(ValueError):
        decode_qoi(b"not a qoi payload")
    with pytest.raises(ValueError):
        encode_qoi(2, 2, b"short")


def test_webp_all_variants_roundtrip():
    from db_migration_spark.multimodal.webp_meta import (
        decode_webp_meta,
        encode_webp_header,
        is_webp,
    )

    for variant, w, h in (
        ("vp8", 320, 240),
        ("vp8l", 16383, 1),
        ("vp8x", 70000, 40000),  # beyond the 14-bit variants' range
    ):
        b = encode_webp_header(w, h, variant)
        assert is_webp(b)
        m = decode_webp_meta(b)
        assert (m["variant"], m["width"], m["height"]) == (variant, w, h)
        assert m["lossless"] == (variant == "vp8l")
        assert m["extended"] == (variant == "vp8x")


def test_webp_rejects_garbage():
    import pytest as _pytest

    from db_migration_spark.multimodal.webp_meta import decode_webp_meta

    with _pytest.raises(ValueError):
        decode_webp_meta(b"RIFF\x00\x00\x00\x00WAVE")


def test_exif_roundtrip_and_rejects():
    import pytest as _pytest

    from db_migration_spark.multimodal.exif_meta import (
        decode_exif_meta,
        encode_jpeg_with_exif,
    )

    for be in (False, True):
        m = decode_exif_meta(
            encode_jpeg_with_exif(640, 480, compression=6, big_endian=be)
        )
        assert (m["width"], m["height"], m["compression"]) == (640, 480, 6)
        assert m["big_endian"] == be
    with _pytest.raises(ValueError):
        decode_exif_meta(b"\xff\xd8\xff\xd9")  # JPEG but no APP1
    with _pytest.raises(ValueError):
        decode_exif_meta(b"not jpeg")


def test_ico_roundtrip_and_256_sentinel():
    import pytest as _pytest

    from db_migration_spark.multimodal.ico_meta import (
        decode_ico_meta,
        encode_ico_header,
        is_ico,
    )

    b = encode_ico_header([(16, 9, 8), (256, 256, 32), (1, 1, 24)])
    assert is_ico(b)
    ms = decode_ico_meta(b)
    assert [(m["width"], m["height"], m["bpp"]) for m in ms] == [
        (16, 9, 8), (256, 256, 32), (1, 1, 24)
    ]
    # contiguous offsets
    assert ms[0]["offset"] == 6 + 16 * 3
    assert ms[1]["offset"] == ms[0]["offset"] + ms[0]["size"]
    with _pytest.raises(ValueError):
        encode_ico_header([(300, 10, 8)])
    with _pytest.raises(ValueError):
        decode_ico_meta(b"\x01\x00\x01\x00")


def test_flac_bitpack_roundtrip():
    import pytest as _pytest

    from db_migration_spark.multimodal.flac_meta import (
        decode_flac_meta,
        encode_flac_streaminfo,
        is_flac,
    )

    # boundary-straddling values: max 20-bit rate, 36-bit samples
    b = encode_flac_streaminfo(
        sample_rate=(1 << 20) - 1,
        channels=8,
        bits_per_sample=32,
        total_samples=(1 << 36) - 1,
    )
    assert is_flac(b)
    m = decode_flac_meta(b)
    assert m["sample_rate"] == (1 << 20) - 1
    assert m["channels"] == 8 and m["bits_per_sample"] == 32
    assert m["total_samples"] == (1 << 36) - 1
    with _pytest.raises(ValueError):
        encode_flac_streaminfo(1 << 20, 2, 16, 0)
    with _pytest.raises(ValueError):
        decode_flac_meta(b"RIFF....")


def test_pdf_xref_walk_roundtrip():
    import pytest as _pytest

    from db_migration_spark.multimodal.pdf_meta import (
        decode_pdf_meta,
        encode_pdf_minimal,
        is_pdf,
    )

    for n in (1, 7, 100):
        b = encode_pdf_minimal(n, minor=6)
        assert is_pdf(b)
        m = decode_pdf_meta(b)
        assert m["version_minor"] == 6
        assert m["n_pages"] == n
        assert m["n_objects"] == n + 2
    # corrupt the startxref pointer -> the walk must fail loudly
    b = bytearray(encode_pdf_minimal(2))
    at = b.rfind(b"startxref")
    num_start = at + len(b"startxref\n")
    b[num_start : num_start + 1] = b"1"
    with _pytest.raises(ValueError):
        decode_pdf_meta(bytes(b))
    with _pytest.raises(ValueError):
        decode_pdf_meta(b"%NOT-A-PDF")


def test_tar_checksum_detects_corruption():
    import io
    import tarfile

    import pytest as _pytest

    from db_migration_spark.multimodal.tar_meta import (
        is_tar,
        scan_tar_members,
    )

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        info = tarfile.TarInfo(name="a.txt")
        info.size = 5
        tf.addfile(info, io.BytesIO(b"hello"))
    raw = bytearray(buf.getvalue())
    assert is_tar(bytes(raw))
    assert [m["name"] for m in scan_tar_members(bytes(raw))] == ["a.txt"]
    raw[0] ^= 0xFF  # flip a name byte -> stored checksum now wrong
    with _pytest.raises(ValueError):
        scan_tar_members(bytes(raw))


def test_qoi_run_overrun_raises():
    import pytest as _pytest

    from db_migration_spark.multimodal.qoi_codec import decode_qoi, encode_qoi

    # valid 2x1 image, then graft a RUN-62 chunk before the end marker
    good = bytearray(encode_qoi(2, 1, bytes([1, 2, 3, 1, 2, 3])))
    corrupt = good[:-8] + bytes([0xC0 | 61]) + good[-8:]
    with _pytest.raises(ValueError):
        decode_qoi(bytes(corrupt))


def test_webp_rejects_out_of_range_dims():
    import pytest as _pytest

    from db_migration_spark.multimodal.webp_meta import encode_webp_header

    with _pytest.raises(ValueError):
        encode_webp_header(20000, 5, "vp8l")  # > 14-bit
    with _pytest.raises(ValueError):
        encode_webp_header(0, 5, "vp8")
    with _pytest.raises(ValueError):
        encode_webp_header((1 << 24) + 1, 5, "vp8x")
