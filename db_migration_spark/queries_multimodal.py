"""Multimodal codec queries (SURVEY §2.12): real stdlib codecs behind
the Arrow seam — decode / meta / resize / resample / frame-sample /
perceptual + audio fingerprint dedup.  Split out of queries.py (round-8
verdict task 5); bodies unchanged, same oracles."""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import load_table
from .functions import text as TXT
from .operators import dedup, eav, relational, similarity

QUERIES: dict = {}
ORACLES: dict = {}

def q_multimodal_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode, oracled: one constant-color PNG per nation is
    encoded distributed (pure-stdlib codec: struct + zlib + row filters),
    then decoded back — header parse, inflate, unfilter, per-channel
    pixel means — in the Arrow-batched codec seam.  The oracle recomputes
    width/height/means from the generation formulas, so a wrong filter or
    inflate path shifts the means and fails the gate.  (PIL/ffmpeg are
    not in this container; PNG needs neither.)"""
    from collections.abc import Iterator as _It

    import pandas as _pd

    from .multimodal.binary_ops import decode_pixel_stats
    from .multimodal.png_codec import encode_png_rgb

    nat = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("long").alias("media_id")
    )

    def gen(batches: _It[_pd.DataFrame]) -> _It[_pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf["media_id"]:
                k = int(mid)
                w, h = 8 + k % 16, 8 + (3 * k) % 16
                color = bytes([(k * 9) % 256, (k * 5) % 256, (k * 3) % 256])
                rows.append((k, encode_png_rgb(w, h, color * (w * h))))
            yield _pd.DataFrame(rows, columns=["media_id", "payload"])

    media = nat.mapInPandas(gen, "media_id LONG, payload BINARY")
    stats = decode_pixel_stats(media)
    return stats.select(
        "media_id",
        "width",
        "height",
        "channels",
        F.element_at("means", 1).alias("mean_r"),
        F.element_at("means", 2).alias("mean_g"),
        F.element_at("means", 3).alias("mean_b"),
    )


ORACLE_MULTIMODAL_PNG = """
SELECT CAST(n_nationkey AS BIGINT) AS media_id,
       CAST(8 + n_nationkey % 16 AS INTEGER) AS width,
       CAST(8 + (3 * n_nationkey) % 16 AS INTEGER) AS height,
       CAST(3 AS INTEGER) AS channels,
       CAST((n_nationkey * 9) % 256 AS DOUBLE) AS mean_r,
       CAST((n_nationkey * 5) % 256 AS DOUBLE) AS mean_g,
       CAST((n_nationkey * 3) % 256 AS DOUBLE) AS mean_b
FROM nation
"""

QUERIES["multimodal_png_decode"] = q_multimodal_png_decode
ORACLES["multimodal_png_decode"] = ORACLE_MULTIMODAL_PNG


def q_multimodal_jpeg_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL baseline-JPEG decode, oracled: per nation a grayscale JPEG of
    flat 8×8 blocks (pure-stdlib encoder: Annex-K Huffman tables, uniform
    quant of 8s — block value ``(k·37 + 11·i) % 256`` decodes bit-exactly,
    see jpeg_codec.py) is encoded distributed, then decoded back through
    the real marker-parse → Huffman → dequant → IDCT path in the Arrow
    codec seam.  The oracle recomputes width/height/mean from the
    generation formulas, so a wrong Huffman table, predictor, or IDCT
    shifts the mean and fails the gate.  (libjpeg is not in this
    container; baseline JPEG needs only stdlib.)"""
    from collections.abc import Iterator as _It

    import pandas as _pd

    from .multimodal.binary_ops import decode_pixel_stats
    from .multimodal.jpeg_codec import encode_jpeg_gray_blocks

    nat = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("long").alias("media_id")
    )

    def gen(batches: _It[_pd.DataFrame]) -> _It[_pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf["media_id"]:
                k = int(mid)
                wb, hb = 1 + k % 4, 1 + (k // 4) % 3
                vals = [(k * 37 + 11 * i) % 256 for i in range(wb * hb)]
                rows.append((k, encode_jpeg_gray_blocks(wb, hb, vals)))
            yield _pd.DataFrame(rows, columns=["media_id", "payload"])

    media = nat.mapInPandas(gen, "media_id LONG, payload BINARY")
    stats = decode_pixel_stats(media)
    return stats.select(
        "media_id",
        "width",
        "height",
        "channels",
        F.element_at("means", 1).alias("mean_gray"),
    )


ORACLE_MULTIMODAL_JPEG = """
SELECT CAST(n.n_nationkey AS BIGINT) AS media_id,
       CAST(8 * (1 + n.n_nationkey % 4) AS INTEGER) AS width,
       CAST(8 * (1 + (n.n_nationkey // 4) % 3) AS INTEGER) AS height,
       CAST(1 AS INTEGER) AS channels,
       avg(CAST((n.n_nationkey * 37 + 11 * r.range) % 256 AS DOUBLE))
           AS mean_gray
FROM nation n CROSS JOIN range(12) r
WHERE r.range < (1 + n.n_nationkey % 4) * (1 + (n.n_nationkey // 4) % 3)
GROUP BY 1, 2, 3, 4
"""

QUERIES["multimodal_jpeg_decode"] = q_multimodal_jpeg_decode
ORACLES["multimodal_jpeg_decode"] = ORACLE_MULTIMODAL_JPEG


def q_multimodal_gif_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL GIF decode, oracled: per nation a palettized GIF (pure-stdlib
    codec — real variable-width LZW with dictionary growth, 4-pass
    interlace on odd keys, palette sizes 2/4/8) is encoded distributed,
    then decoded back — LZW, palette mapping, de-interlace — in the
    Arrow codec seam.  Pixel index (x + 2y + k) mod ncolors and the
    palette formulas give closed-form channel means, so a wrong LZW
    width transition or palette offset fails the gate.  (Means are
    pixel-order-invariant; the interlace reorder itself is pinned by the
    exact-pixel roundtrip tests in test_gif_codec.py.)"""
    from collections.abc import Iterator as _It

    import pandas as _pd

    from .multimodal.binary_ops import decode_pixel_stats
    from .multimodal.gif_codec import encode_gif

    nat = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("long").alias("media_id")
    )

    def gen(batches: _It[_pd.DataFrame]) -> _It[_pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf["media_id"]:
                k = int(mid)
                w, h = 6 + k % 10, 4 + (3 * k) % 10
                n = 2 << (k % 3)
                palette = b"".join(
                    bytes(
                        (
                            (i * 41 + k * 7) % 256,
                            (i * 29 + k * 11) % 256,
                            (i * 17 + k * 13) % 256,
                        )
                    )
                    for i in range(n)
                )
                idx = bytes(
                    (x + 2 * y + k) % n for y in range(h) for x in range(w)
                )
                rows.append(
                    (k, encode_gif(w, h, palette, idx, interlaced=k % 2 == 1))
                )
            yield _pd.DataFrame(rows, columns=["media_id", "payload"])

    media = nat.mapInPandas(gen, "media_id LONG, payload BINARY")
    stats = decode_pixel_stats(media)
    return stats.select(
        "media_id",
        "width",
        "height",
        "channels",
        F.element_at("means", 1).alias("mean_r"),
        F.element_at("means", 2).alias("mean_g"),
        F.element_at("means", 3).alias("mean_b"),
    )


ORACLE_MULTIMODAL_GIF = """
WITH px AS (
  SELECT n.n_nationkey AS k,
         6 + n.n_nationkey % 10 AS w,
         4 + (3 * n.n_nationkey) % 10 AS h,
         2 * power(2, n.n_nationkey % 3) AS nc,
         x.range AS x, y.range AS y
  FROM nation n CROSS JOIN range(16) x CROSS JOIN range(14) y
  WHERE x.range < 6 + n.n_nationkey % 10
    AND y.range < 4 + (3 * n.n_nationkey) % 10
),
idx AS (
  SELECT k, w, h,
         CAST((x + 2 * y + k) % CAST(nc AS BIGINT) AS BIGINT) AS i
  FROM px
)
SELECT CAST(k AS BIGINT) AS media_id,
       CAST(w AS INTEGER) AS width,
       CAST(h AS INTEGER) AS height,
       CAST(3 AS INTEGER) AS channels,
       avg(CAST((i * 41 + k * 7) % 256 AS DOUBLE)) AS mean_r,
       avg(CAST((i * 29 + k * 11) % 256 AS DOUBLE)) AS mean_g,
       avg(CAST((i * 17 + k * 13) % 256 AS DOUBLE)) AS mean_b
FROM idx
GROUP BY k, w, h
"""

QUERIES["multimodal_gif_decode"] = q_multimodal_gif_decode
ORACLES["multimodal_gif_decode"] = ORACLE_MULTIMODAL_GIF


def q_multimodal_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video frame sampling, oracled: per region an MJPEG AVI
    (pure-stdlib RIFF writer, avi_codec.py) holding 4+k DC-block JPEG
    frames; every 2nd frame is container-walked out and decoded through
    the REAL baseline-JPEG kernel.  The oracle recomputes each sampled
    frame's mean from the block-value formula — a wrong RIFF walk,
    chunk alignment, or frame-sample stride changes which frames (and
    which means) appear."""
    from collections.abc import Iterator as _It

    import pandas as _pd

    from .multimodal.avi_codec import encode_avi_mjpeg
    from .multimodal.binary_ops import decode_video_frame_stats
    from .multimodal.jpeg_codec import encode_jpeg_gray_blocks

    reg = load_table(spark, sf_dir, "region").select(
        F.col("r_regionkey").cast("long").alias("media_id")
    )

    def gen(batches: _It[_pd.DataFrame]) -> _It[_pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf["media_id"]:
                k = int(mid)
                frames = [
                    encode_jpeg_gray_blocks(
                        2,
                        2,
                        [(k * 23 + j * 37 + 11 * b) % 256 for b in range(4)],
                    )
                    for j in range(4 + k)
                ]
                rows.append((k, encode_avi_mjpeg(16, 16, 10, frames)))
            yield _pd.DataFrame(rows, columns=["media_id", "payload"])

    media = reg.mapInPandas(gen, "media_id LONG, payload BINARY")
    return decode_video_frame_stats(media, every_n=2)


ORACLE_MULTIMODAL_VIDEO = """
WITH f AS (
  SELECT r.r_regionkey AS k, j.range AS j
  FROM region r CROSS JOIN range(9) j
  WHERE j.range < 4 + r.r_regionkey AND j.range % 2 = 0
)
SELECT CAST(k AS BIGINT) AS media_id,
       CAST(j AS INTEGER) AS frame_idx,
       CAST(16 AS INTEGER) AS width,
       CAST(16 AS INTEGER) AS height,
       avg(CAST((k * 23 + j * 37 + 11 * b.range) % 256 AS DOUBLE))
           AS mean_gray
FROM f CROSS JOIN range(4) b
GROUP BY k, j
"""

QUERIES["multimodal_video_frames"] = q_multimodal_video_frames
ORACLES["multimodal_video_frames"] = ORACLE_MULTIMODAL_VIDEO


def q_multimodal_g711_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL G.711 companded-audio decode, oracled: per region a
    telephony WAV (format code 7 µ-law on even keys, 6 A-law on odd —
    formats stdlib ``wave`` cannot read) with companded bytes
    ``(i·7 + k·13) mod 256``, expanded through the exact ITU integer
    math and profiled (RMS/peak/zero-crossings).  The oracle replays
    the SAME G.711 expansion in SQL bit arithmetic — a wrong segment
    shift, sign convention (A-law's is inverted!), or bias constant
    shifts every statistic."""
    from collections.abc import Iterator as _It

    import pandas as _pd

    from .multimodal.binary_ops import decode_g711_stats
    from .multimodal.g711_codec import encode_wav_g711

    reg = load_table(spark, sf_dir, "region").select(
        F.col("r_regionkey").cast("long").alias("media_id")
    )

    def gen(batches: _It[_pd.DataFrame]) -> _It[_pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf["media_id"]:
                k = int(mid)
                n = 400 + 100 * k
                comp = bytes((i * 7 + k * 13) % 256 for i in range(n))
                law = "ulaw" if k % 2 == 0 else "alaw"
                rows.append((k, encode_wav_g711(8000, comp, law)))
            yield _pd.DataFrame(rows, columns=["media_id", "payload"])

    media = reg.mapInPandas(gen, "media_id LONG, payload BINARY")
    return decode_g711_stats(media)


ORACLE_MULTIMODAL_G711 = """
WITH bytes_ AS (
  SELECT r.r_regionkey AS k, i.range AS i,
         (i.range * 7 + r.r_regionkey * 13) % 256 AS b
  FROM region r CROSS JOIN range(900) i
  WHERE i.range < 400 + 100 * r.r_regionkey
),
expanded AS (
  SELECT k, i,
    CASE WHEN k % 2 = 0 THEN
      -- mu-law: complement, 3-bit exponent, 4-bit mantissa, bias 0x84
      CASE WHEN (255 - b) >= 128
           THEN -((((((255 - b) % 16) * 8 + 132) << (((255 - b) // 16) % 8)) - 132))
           ELSE (((((255 - b) % 16) * 8 + 132) << (((255 - b) // 16) % 8)) - 132)
      END
    ELSE
      -- A-law: 0x55 toggle; sign bit SET means POSITIVE
      CASE WHEN xor(b, 85) >= 128
           THEN CASE WHEN ((xor(b, 85) // 16) % 8) = 0
                     THEN (xor(b, 85) % 16) * 16 + 8
                     ELSE ((xor(b, 85) % 16) * 16 + 264)
                          << (((xor(b, 85) // 16) % 8) - 1) END
           ELSE -(CASE WHEN ((xor(b, 85) // 16) % 8) = 0
                       THEN (xor(b, 85) % 16) * 16 + 8
                       ELSE ((xor(b, 85) % 16) * 16 + 264)
                            << (((xor(b, 85) // 16) % 8) - 1) END)
      END
    END AS x
  FROM bytes_
),
with_prev AS (
  SELECT k, x, lag(x) OVER (PARTITION BY k ORDER BY i) AS px
  FROM expanded
)
SELECT CAST(k AS BIGINT) AS media_id,
       CASE WHEN k % 2 = 0 THEN 'ulaw' ELSE 'alaw' END AS law,
       CAST(count(*) AS INTEGER) AS n_samples,
       sqrt(CAST(sum(CAST(x AS BIGINT) * CAST(x AS BIGINT)) AS DOUBLE)
            / count(*)) AS rms,
       CAST(max(abs(x)) AS INTEGER) AS peak,
       CAST(sum(CASE WHEN px IS NOT NULL
                      AND (x >= 0) <> (px >= 0) THEN 1 ELSE 0 END)
            AS INTEGER) AS zero_crossings
FROM with_prev
GROUP BY k
"""

QUERIES["multimodal_g711_stats"] = q_multimodal_g711_stats
ORACLES["multimodal_g711_stats"] = ORACLE_MULTIMODAL_G711


def q_multimodal_wav_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio metadata decode, oracled: one 16-bit PCM WAV per region
    (stdlib ``wave`` encode — rate and length derived from the region
    key), RIFF header parsed back in the Arrow codec seam.  Oracle
    recomputes channels/rate/frames/duration from the formulas."""
    from collections.abc import Iterator as _It

    import pandas as _pd

    from .multimodal.binary_ops import decode_wav_meta, encode_wav_pcm16

    reg = load_table(spark, sf_dir, "region").select(
        F.col("r_regionkey").cast("long").alias("media_id")
    )

    def gen(batches: _It[_pd.DataFrame]) -> _It[_pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf["media_id"]:
                k = int(mid)
                rate = 8000 + 1000 * k
                n_frames = 1600 + 100 * k
                frames = bytes(2 * n_frames)  # silence, 16-bit mono
                rows.append((k, encode_wav_pcm16(rate, frames)))
            yield _pd.DataFrame(rows, columns=["media_id", "payload"])

    media = reg.mapInPandas(gen, "media_id LONG, payload BINARY")
    return decode_wav_meta(media)


ORACLE_MULTIMODAL_WAV = """
SELECT CAST(r_regionkey AS BIGINT) AS media_id,
       CAST(1 AS INTEGER) AS n_channels,
       CAST(8000 + 1000 * r_regionkey AS INTEGER) AS sample_rate,
       CAST(1600 + 100 * r_regionkey AS BIGINT) AS n_frames,
       CAST(1600 + 100 * r_regionkey AS DOUBLE) * 1000.0
         / (8000 + 1000 * r_regionkey) AS duration_ms
FROM region
"""

QUERIES["multimodal_wav_meta"] = q_multimodal_wav_meta
ORACLES["multimodal_wav_meta"] = ORACLE_MULTIMODAL_WAV


def q_multimodal_image_sniff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Format sniffing + header-only dimension extraction across four
    raster formats (PNG real encode; JPEG/GIF/BMP minimal real headers)
    — the first pass over a raw media corpus, no codec libs involved.
    One payload per (nation, format); oracle recomputes format and the
    formula dimensions."""
    from collections.abc import Iterator as _It

    import pandas as _pd

    from .multimodal.binary_ops import sniff_image_meta
    from .multimodal.image_meta import (
        make_bmp_header,
        make_gif_header,
        make_jpeg_header,
    )
    from .multimodal.png_codec import encode_png_rgb

    nat = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("long").alias("k")
    )

    def gen(batches: _It[_pd.DataFrame]) -> _It[_pd.DataFrame]:
        for pdf in batches:
            rows = []
            for kk in pdf["k"]:
                k = int(kk)
                w, h = 4 + k % 8, 4 + (k * 7) % 8
                rows.append((k * 4 + 0, encode_png_rgb(w, h, b"\x10" * (w * h * 3))))
                rows.append((k * 4 + 1, make_jpeg_header(w + 100, h + 100)))
                rows.append((k * 4 + 2, make_gif_header(w + 200, h + 200)))
                rows.append((k * 4 + 3, make_bmp_header(w + 300, h + 300)))
            yield _pd.DataFrame(rows, columns=["media_id", "payload"])

    media = nat.mapInPandas(gen, "media_id LONG, payload BINARY")
    return sniff_image_meta(media)


ORACLE_IMAGE_SNIFF = """
WITH base AS (
  SELECT n_nationkey AS k,
         4 + n_nationkey % 8 AS w,
         4 + (n_nationkey * 7) % 8 AS h
  FROM nation
)
SELECT CAST(k * 4 + f.i AS BIGINT) AS media_id, f.fmt AS format,
       CAST(w + f.off AS INTEGER) AS width,
       CAST(h + f.off AS INTEGER) AS height
FROM base
CROSS JOIN (VALUES (0, 'png', 0), (1, 'jpeg', 100),
                   (2, 'gif', 200), (3, 'bmp', 300)) AS f(i, fmt, off)
"""

QUERIES["multimodal_image_sniff"] = q_multimodal_image_sniff
ORACLES["multimodal_image_sniff"] = ORACLE_IMAGE_SNIFF


def q_multimodal_wav_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL sample-level audio decode, oracled: per region a 16-bit mono
    PCM WAV whose samples follow ``s_i = ((i·(k+3)) % 201) − 100``
    (full-scale ±100, deterministic), then RMS / peak / zero-crossing
    analysis through the stdlib wave+struct kernel
    (binary_ops.decode_wav_sample_stats).  The oracle recomputes all
    three statistics from the sample formula in SQL — integer-exact
    sums, so RMS is bit-identical across engines."""
    from collections.abc import Iterator as _It
    import struct as _struct

    import pandas as _pd

    from .multimodal.binary_ops import (
        decode_wav_sample_stats,
        encode_wav_pcm16,
    )

    reg = load_table(spark, sf_dir, "region").select(
        F.col("r_regionkey").cast("long").alias("media_id")
    )

    def gen(batches: _It[_pd.DataFrame]) -> _It[_pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf["media_id"]:
                k = int(mid)
                n = 1600 + 100 * k
                samples = [((i * (k + 3)) % 201) - 100 for i in range(n)]
                frames = _struct.pack(f"<{n}h", *samples)
                rows.append((k, encode_wav_pcm16(8000, frames)))
            yield _pd.DataFrame(rows, columns=["media_id", "payload"])

    media = reg.mapInPandas(gen, "media_id LONG, payload BINARY")
    return decode_wav_sample_stats(media)


ORACLE_MULTIMODAL_WAV_STATS = """
WITH samples AS (
  SELECT g.r_regionkey AS k, 1600 + 100 * g.r_regionkey AS n,
         r.range AS i,
         ((r.range * (g.r_regionkey + 3)) % 201) - 100 AS s
  FROM region g CROSS JOIN range(2100) r
  WHERE r.range < 1600 + 100 * g.r_regionkey
), lagged AS (
  SELECT k, n, s,
         lag(s) OVER (PARTITION BY k ORDER BY i) AS prev
  FROM samples
)
SELECT CAST(k AS BIGINT) AS media_id,
       CAST(n AS BIGINT) AS n_samples,
       sqrt(avg(CAST(s * s AS DOUBLE))) AS rms,
       CAST(max(abs(s)) AS INTEGER) AS peak,
       count(CASE WHEN prev IS NOT NULL AND ((s >= 0) <> (prev >= 0))
                  THEN 1 END) AS zero_crossings
FROM lagged
GROUP BY k, n
"""

QUERIES["multimodal_wav_stats"] = q_multimodal_wav_stats
ORACLES["multimodal_wav_stats"] = ORACLE_MULTIMODAL_WAV_STATS


def q_multimodal_mp4_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video-container metadata, oracled: per nation a minimal ISO
    BMFF file (ftyp + moov/mvhd + trak stubs; mvhd alternates 32-bit and
    64-bit versions by key) parsed back through the stdlib box walker
    (multimodal/mp4_meta.py).  Oracle recomputes
    brand/timescale/duration/tracks from the generation formulas."""
    from collections.abc import Iterator as _It

    import pandas as _pd

    from .multimodal.binary_ops import decode_mp4_meta
    from .multimodal.mp4_meta import encode_minimal_mp4

    nat = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("long").alias("media_id")
    )

    def gen(batches: _It[_pd.DataFrame]) -> _It[_pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf["media_id"]:
                k = int(mid)
                rows.append(
                    (
                        k,
                        encode_minimal_mp4(
                            timescale=600,
                            duration=600 * (k + 7),
                            n_tracks=1 + k % 3,
                            version=k % 2,
                        ),
                    )
                )
            yield _pd.DataFrame(rows, columns=["media_id", "payload"])

    media = nat.mapInPandas(gen, "media_id LONG, payload BINARY")
    return decode_mp4_meta(media)


ORACLE_MULTIMODAL_MP4 = """
SELECT CAST(n_nationkey AS BIGINT) AS media_id,
       'isom' AS major_brand,
       CAST(600 AS INTEGER) AS timescale,
       CAST((n_nationkey + 7) * 1000.0 AS DOUBLE) AS duration_ms,
       CAST(1 + n_nationkey % 3 AS INTEGER) AS n_tracks
FROM nation
"""

QUERIES["multimodal_mp4_meta"] = q_multimodal_mp4_meta
ORACLES["multimodal_mp4_meta"] = ORACLE_MULTIMODAL_MP4




# ---------------------------------------------------------------------------
# §2.12 multimodal — REAL BMP pixel decode + nearest-neighbor resize
# ---------------------------------------------------------------------------


def _gradient_media(
    spark: SparkSession, sf_dir: str, fmt: str
) -> DataFrame:
    """One 16×12 gradient image per nation, encoded distributed by the
    pure-stdlib codecs.  The per-pixel formulas depend on (x, y), so any
    row-order / channel-order / padding bug in a codec shifts the sums."""
    from collections.abc import Iterator as _It

    import pandas as _pd

    from .multimodal.bmp_codec import encode_bmp_rgb
    from .multimodal.png_codec import encode_png_rgb

    nat = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("long").alias("media_id")
    )
    enc = encode_bmp_rgb if fmt == "bmp" else encode_png_rgb

    def gen(batches: _It[_pd.DataFrame]) -> _It[_pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf["media_id"]:
                k = int(mid)
                pix = bytearray()
                for y in range(12):
                    for x in range(16):
                        pix += bytes(
                            (
                                (9 * k + 7 * x + 13 * y) % 256,
                                (5 * k + 11 * x + 3 * y) % 256,
                                (3 * k + x + 17 * y) % 256,
                            )
                        )
                rows.append((k, enc(16, 12, bytes(pix))))
            yield _pd.DataFrame(rows, columns=["media_id", "payload"])

    return nat.mapInPandas(gen, "media_id LONG, payload BINARY")


def q_multimodal_bmp_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL BMP decode, integer-oracled: per-nation gradient BMPs are
    encoded distributed (bmp_codec: bottom-up rows, BGR order, 4-byte
    row padding) and decoded back in the Arrow seam; the oracle
    recomputes the per-channel INTEGER pixel sums from the generation
    formulas over a generated (x, y) grid — exact equality, no float
    tolerance.  A decoder that forgets the bottom-up flip or the BGR
    swap produces different sums and fails the gate."""
    from .multimodal.binary_ops import decode_pixel_sums

    media = _gradient_media(spark, sf_dir, "bmp")
    stats = decode_pixel_sums(media)
    return stats.select(
        "media_id",
        "width",
        "height",
        F.element_at("sums", 1).alias("sum_r"),
        F.element_at("sums", 2).alias("sum_g"),
        F.element_at("sums", 3).alias("sum_b"),
    )


ORACLE_MULTIMODAL_BMP = """
WITH grid AS (
  SELECT gx.x AS x, gy.y AS y
  FROM generate_series(0, 15) gx(x), generate_series(0, 11) gy(y)
)
SELECT CAST(n_nationkey AS BIGINT) AS media_id,
       CAST(16 AS INTEGER) AS width,
       CAST(12 AS INTEGER) AS height,
       CAST(sum((9 * n_nationkey + 7 * x + 13 * y) % 256) AS BIGINT) AS sum_r,
       CAST(sum((5 * n_nationkey + 11 * x + 3 * y) % 256) AS BIGINT) AS sum_g,
       CAST(sum((3 * n_nationkey + x + 17 * y) % 256) AS BIGINT) AS sum_b
FROM nation, grid
GROUP BY n_nationkey
"""

QUERIES["multimodal_bmp_decode"] = q_multimodal_bmp_decode
ORACLES["multimodal_bmp_decode"] = ORACLE_MULTIMODAL_BMP


def q_multimodal_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image resize under the exact gate: gradient PNGs are decoded
    (inflate + unfilter) and nearest-neighbor-resized 16×12 → 6×5 in the
    Arrow seam (image_ops.nn_resize — pure floor-index arithmetic), then
    the RESIZED image's integer channel sums are compared against the
    oracle's coordinate-by-coordinate replay: target (x2, y2) samples
    source (x2·16//6, y2·12//5), and the SQL evaluates the generation
    formula at exactly those source coordinates.  Non-divisible target
    dims are chosen on purpose — a round-instead-of-floor index map
    fails the gate."""
    from .multimodal.binary_ops import resize_pixel_sums

    media = _gradient_media(spark, sf_dir, "png")
    stats = resize_pixel_sums(media, 6, 5)
    return stats.select(
        "media_id",
        "width",
        "height",
        F.element_at("sums", 1).alias("sum_r"),
        F.element_at("sums", 2).alias("sum_g"),
        F.element_at("sums", 3).alias("sum_b"),
    )


ORACLE_MULTIMODAL_RESIZE = """
WITH grid AS (
  SELECT CAST(floor(gx.x2 * 16 / 6) AS BIGINT) AS x,
         CAST(floor(gy.y2 * 12 / 5) AS BIGINT) AS y
  FROM generate_series(0, 5) gx(x2), generate_series(0, 4) gy(y2)
)
SELECT CAST(n_nationkey AS BIGINT) AS media_id,
       CAST(6 AS INTEGER) AS width,
       CAST(5 AS INTEGER) AS height,
       CAST(sum((9 * n_nationkey + 7 * x + 13 * y) % 256) AS BIGINT) AS sum_r,
       CAST(sum((5 * n_nationkey + 11 * x + 3 * y) % 256) AS BIGINT) AS sum_g,
       CAST(sum((3 * n_nationkey + x + 17 * y) % 256) AS BIGINT) AS sum_b
FROM nation, grid
GROUP BY n_nationkey
"""

QUERIES["multimodal_image_resize"] = q_multimodal_image_resize
ORACLES["multimodal_image_resize"] = ORACLE_MULTIMODAL_RESIZE


def q_multimodal_audio_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio resampling under the exact gate: per-nation 16-bit mono
    PCM WAVs (deterministic sample formula, 400 samples @ 8 kHz) are
    decoded with stdlib wave/struct and linear-resampled to 11 025 Hz by
    the integer phase accumulator (audio_ops.resample_linear_scaled:
    position j ↦ divmod(j·8000, 11025), outputs scaled by 11 025 so the
    whole kernel stays in ℤ).  The oracle replays the interpolation
    sample-by-sample in SQL from the generation formula — exact integer
    equality, so an off-by-one in the phase map, a truncation-vs-floor
    slip, or a wrong endpoint clamp all fail the gate."""
    from collections.abc import Iterator as _It
    import struct as _struct

    import pandas as _pd

    from .multimodal.binary_ops import encode_wav_pcm16, resample_wav_stats

    nat = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("long").alias("media_id")
    )

    def gen(batches: _It[_pd.DataFrame]) -> _It[_pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf["media_id"]:
                k = int(mid)
                samples = [
                    ((n * (37 + k)) % 2001) - 1000 for n in range(400)
                ]
                frames = _struct.pack(f"<{len(samples)}h", *samples)
                rows.append((k, encode_wav_pcm16(8000, frames)))
            yield _pd.DataFrame(rows, columns=["media_id", "payload"])

    media = nat.mapInPandas(gen, "media_id LONG, payload BINARY")
    return resample_wav_stats(media, 11025)


ORACLE_MULTIMODAL_RESAMPLE_AUDIO = """
WITH pos AS (
  SELECT n_nationkey AS k, j,
         CAST(floor(j * 8000 / 11025) AS BIGINT) AS idx,
         (j * 8000) % 11025 AS r
  FROM nation, generate_series(0, 549) g(j)
), vals AS (
  SELECT k, j, r,
         ((idx * (37 + k)) % 2001) - 1000 AS s0,
         ((LEAST(idx + 1, 399) * (37 + k)) % 2001) - 1000 AS s1
  FROM pos
), src AS (
  SELECT n_nationkey AS k,
         sum((((n * (37 + n_nationkey)) % 2001) - 1000)
             * (((n * (37 + n_nationkey)) % 2001) - 1000)) AS sumsq
  FROM nation, generate_series(0, 399) g(n)
  GROUP BY n_nationkey
)
SELECT CAST(v.k AS BIGINT) AS media_id,
       CAST(400 AS INTEGER) AS n_src,
       CAST(550 AS INTEGER) AS n_out,
       CAST(sum(11025 * s0 + (s1 - s0) * r) AS BIGINT) AS sum_scaled,
       CAST(any_value(src.sumsq) AS BIGINT) AS sumsq_src
FROM vals v JOIN src ON v.k = src.k
GROUP BY v.k
"""

QUERIES["multimodal_audio_resample"] = q_multimodal_audio_resample
ORACLES["multimodal_audio_resample"] = ORACLE_MULTIMODAL_RESAMPLE_AUDIO


def q_dedup_image_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal near-dup detection, fully oracled: per-nation gradient
    PNGs plus a planted perturbed variant of each (+60 on three source
    pixels) flow through the REAL pipeline — decode → 9×8 NN resize →
    gray → 64-bit dHash (binary_ops.image_dhash) — then the standard
    banded LSH join finds pairs with hamming ≤ 3: four 16-bit bands,
    pigeonhole guarantees ≤ 3 differing bits leave at least one band
    identical, so the banding is EXACT (not approximate) at this
    threshold and the all-pairs SQL oracle matches it.  The oracle
    recomputes every hash bit from the generation formulas (resize index
    map and gradient comparisons replayed coordinate-by-coordinate) and
    takes the brute-force pair set.  dHash's brightness invariance shows
    up honestly: distinct nations whose gradients differ by a constant
    offset collapse to the same hash — exactly what a perceptual hash is
    for.  Scale: hashes are 8 bytes/image, candidates come from 4
    equi-join buckets — payloads never join anything."""
    from collections.abc import Iterator as _It

    import pandas as _pd

    from .multimodal.binary_ops import image_dhash
    from .multimodal.png_codec import encode_png_rgb

    nat = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("long").alias("k")
    )

    def gen(batches: _It[_pd.DataFrame]) -> _It[_pd.DataFrame]:
        for pdf in batches:
            rows = []
            for kk in pdf["k"]:
                k = int(kk)
                for variant in (0, 1):
                    pix = bytearray()
                    for y in range(12):
                        for x in range(16):
                            bump = (
                                60
                                if variant and x == 7 and y in (4, 5, 6)
                                else 0
                            )
                            pix += bytes(
                                (
                                    (9 * k + 7 * x + 13 * y + bump) % 256,
                                    (5 * k + 11 * x + 3 * y + bump) % 256,
                                    (3 * k + x + 17 * y + bump) % 256,
                                )
                            )
                    rows.append(
                        (k + 1000 * variant, encode_png_rgb(16, 12, bytes(pix)))
                    )
            yield _pd.DataFrame(rows, columns=["media_id", "payload"])

    media = nat.mapInPandas(gen, "media_id LONG, payload BINARY")
    hashes = image_dhash(media)
    banded = hashes.select(
        "media_id",
        "dhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band"),
                        (
                            F.shiftright(F.col("dhash"), 16 * j)
                            .bitwiseAND(F.lit(0xFFFF))
                        ).alias("key"),
                    )
                    for j in range(4)
                ]
            )
        ).alias("bk"),
    ).select("media_id", "dhash", F.col("bk.band"), F.col("bk.key"))
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .select(
            F.col("a.media_id").alias("id_a"),
            F.col("b.media_id").alias("id_b"),
            F.bit_count(
                F.col("a.dhash").bitwiseXOR(F.col("b.dhash"))
            ).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= 3)
    )
    return pairs


ORACLE_DEDUP_IMAGE_PHASH = """
WITH imgs AS (
  SELECT n_nationkey AS k, v.variant,
         n_nationkey + 1000 * v.variant AS media_id
  FROM nation, (VALUES (0), (1)) v(variant)
), bits AS (
  SELECT i.media_id,
         g.y2 * 8 + g.x2 AS idx,
         -- source coords after the 9x8 NN resize index map
         CAST(floor(g.x2 * 16 / 9) AS BIGINT) AS xa,
         CAST(floor((g.x2 + 1) * 16 / 9) AS BIGINT) AS xb,
         CAST(floor(g.y2 * 12 / 8) AS BIGINT) AS ys,
         i.k, i.variant
  FROM imgs i,
       (SELECT gy.y2, gx.x2
        FROM generate_series(0, 7) gy(y2), generate_series(0, 7) gx(x2)) g
), gray AS (
  SELECT media_id, idx,
         ((9*k + 7*xa + 13*ys + CASE WHEN variant=1 AND xa=7
              AND ys IN (4,5,6) THEN 60 ELSE 0 END) % 256)
       + ((5*k + 11*xa + 3*ys + CASE WHEN variant=1 AND xa=7
              AND ys IN (4,5,6) THEN 60 ELSE 0 END) % 256)
       + ((3*k + xa + 17*ys + CASE WHEN variant=1 AND xa=7
              AND ys IN (4,5,6) THEN 60 ELSE 0 END) % 256) AS ga,
         ((9*k + 7*xb + 13*ys + CASE WHEN variant=1 AND xb=7
              AND ys IN (4,5,6) THEN 60 ELSE 0 END) % 256)
       + ((5*k + 11*xb + 3*ys + CASE WHEN variant=1 AND xb=7
              AND ys IN (4,5,6) THEN 60 ELSE 0 END) % 256)
       + ((3*k + xb + 17*ys + CASE WHEN variant=1 AND xb=7
              AND ys IN (4,5,6) THEN 60 ELSE 0 END) % 256) AS gb
  FROM bits
), hashes AS (
  SELECT media_id,
         CAST(sum(CASE WHEN ga > gb
                       THEN (CAST(1 AS HUGEINT) << idx) ELSE 0 END)
              AS HUGEINT) AS uh
  FROM gray GROUP BY media_id
), signed AS (
  SELECT media_id,
         CAST(CASE WHEN uh >= CAST(1 AS HUGEINT) << 63
              THEN uh - (CAST(1 AS HUGEINT) << 64) ELSE uh END
              AS BIGINT) AS dhash
  FROM hashes
)
SELECT a.media_id AS id_a, b.media_id AS id_b,
       bit_count(xor(a.dhash, b.dhash)) AS hamming
FROM signed a JOIN signed b ON a.media_id < b.media_id
WHERE bit_count(xor(a.dhash, b.dhash)) <= 3
"""

QUERIES["dedup_image_phash"] = q_dedup_image_phash
ORACLES["dedup_image_phash"] = ORACLE_DEDUP_IMAGE_PHASH




def q_dedup_audio_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio dedup under the exact gate: per nation, a base clip (400
    deterministic samples @ 8 kHz) and a 2×-amplified re-encode of the
    same clip flow through decode → windowed-energy fingerprint
    (binary_ops.audio_fingerprint — 15 adjacent-energy-comparison bits,
    amplitude-invariant by construction), then exact-match grouping on
    the print: each amplified copy collapses onto its original.  The
    oracle recomputes every energy comparison from the sample formula in
    SQL (the ×2 variant scales all energies by 4, so its bits are the
    SAME rows — planted-duplicate semantics proven, not assumed).
    Scale: prints are 8 bytes; grouping shuffles (fingerprint, id) only."""
    from collections.abc import Iterator as _It
    import struct as _struct

    import pandas as _pd

    from .multimodal.binary_ops import audio_fingerprint, encode_wav_pcm16

    nat = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("long").alias("k")
    )

    def gen(batches: _It[_pd.DataFrame]) -> _It[_pd.DataFrame]:
        for pdf in batches:
            rows = []
            for kk in pdf["k"]:
                k = int(kk)
                base = [((n * (37 + k)) % 2001) - 1000 for n in range(400)]
                for variant, gain in ((0, 1), (1, 2)):
                    frames = _struct.pack(
                        "<400h", *[gain * s for s in base]
                    )
                    rows.append(
                        (k + 1000 * variant, encode_wav_pcm16(8000, frames))
                    )
            yield _pd.DataFrame(rows, columns=["media_id", "payload"])

    media = nat.mapInPandas(gen, "media_id LONG, payload BINARY")
    prints = audio_fingerprint(media, window=25)
    return prints.groupBy("fingerprint").agg(
        F.count(F.lit(1)).alias("n_clips"),
        F.min("media_id").alias("min_id"),
        F.max("media_id").alias("max_id"),
        F.sum("media_id").alias("id_sum"),
    )


ORACLE_DEDUP_AUDIO_FP = """
WITH samples AS (
  SELECT n_nationkey AS k, n,
         ((n * (37 + n_nationkey)) % 2001) - 1000 AS s
  FROM nation, generate_series(0, 399) g(n)
), energies AS (
  SELECT k, CAST(floor(n / 25) AS BIGINT) AS w, sum(s * s) AS e
  FROM samples GROUP BY 1, 2
), bits AS (
  SELECT a.k, a.w,
         CASE WHEN b.e > a.e THEN CAST(1 AS BIGINT) << CAST(a.w AS INT)
              ELSE 0 END AS bit
  FROM energies a JOIN energies b ON a.k = b.k AND b.w = a.w + 1
), fp AS (
  SELECT k, CAST(sum(bit) AS BIGINT) AS fingerprint FROM bits GROUP BY k
), clips AS (
  SELECT k + 1000 * v.variant AS media_id, fingerprint
  FROM fp, (VALUES (0), (1)) v(variant)
)
SELECT fingerprint, count(*) AS n_clips,
       min(media_id) AS min_id, max(media_id) AS max_id,
       CAST(sum(media_id) AS BIGINT) AS id_sum
FROM clips GROUP BY fingerprint
"""

QUERIES["dedup_audio_fingerprint"] = q_dedup_audio_fingerprint
ORACLES["dedup_audio_fingerprint"] = ORACLE_DEDUP_AUDIO_FP




def q_multimodal_tiff_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL TIFF container parsing under the exact gate: per-nation
    TIFF headers alternate LITTLE and BIG endian (``II``/``MM``) with
    formula-driven dimensions; the parser (multimodal/tiff_meta.py)
    resolves the byte-order mark, walks the IFD, and reads
    SHORT-in-4-byte-slot values — both classic traps.  The oracle
    recomputes every field from the generation formulas."""
    from collections.abc import Iterator as _It

    import pandas as _pd

    from .multimodal.tiff_meta import decode_tiff_meta, encode_tiff_header

    nat = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("long").alias("media_id")
    )

    def run(batches: _It[_pd.DataFrame]) -> _It[_pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf["media_id"]:
                k = int(mid)
                payload = encode_tiff_header(
                    width=100 + 3 * k,
                    height=50 + 2 * k,
                    bits_per_sample=8,
                    samples_per_pixel=3,
                    compression=1 + 4 * (k % 2),
                    big_endian=(k % 2 == 1),
                )
                m = decode_tiff_meta(payload)
                rows.append(
                    (
                        k,
                        m["width"],
                        m["height"],
                        m["bits_per_sample"],
                        m["samples_per_pixel"],
                        m["compression"],
                        m["big_endian"],
                    )
                )
            yield _pd.DataFrame(
                rows,
                columns=[
                    "media_id", "width", "height", "bits", "spp",
                    "compression", "big_endian",
                ],
            )

    return nat.mapInPandas(
        run,
        "media_id LONG, width INT, height INT, bits INT, spp INT, "
        "compression INT, big_endian BOOLEAN",
    )


ORACLE_MULTIMODAL_TIFF = """
SELECT CAST(n_nationkey AS BIGINT) AS media_id,
       CAST(100 + 3 * n_nationkey AS INTEGER) AS width,
       CAST(50 + 2 * n_nationkey AS INTEGER) AS height,
       CAST(8 AS INTEGER) AS bits,
       CAST(3 AS INTEGER) AS spp,
       CAST(1 + 4 * (n_nationkey % 2) AS INTEGER) AS compression,
       n_nationkey % 2 = 1 AS big_endian
FROM nation
"""

QUERIES["multimodal_tiff_meta"] = q_multimodal_tiff_meta
ORACLES["multimodal_tiff_meta"] = ORACLE_MULTIMODAL_TIFF


def q_multimodal_mp3_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL MP3/ID3v2 triage under the exact gate: per-nation fixtures
    carry an ID3v2 tag whose SYNCSAFE 4×7-bit size must be decoded to
    find the first MPEG-1 Layer III frame header, whose bitrate and
    sample-rate indexes resolve through the public tables
    (multimodal/mp3_meta.py).  The oracle replays the syncsafe
    arithmetic and the table lookups in SQL."""
    from collections.abc import Iterator as _It

    import pandas as _pd

    from .multimodal.mp3_meta import decode_mp3_meta, encode_mp3_fixture

    nat = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("long").alias("media_id")
    )

    def run(batches: _It[_pd.DataFrame]) -> _It[_pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf["media_id"]:
                k = int(mid)
                payload = encode_mp3_fixture(
                    id3_size=200 + (k * 37) % 20000,
                    bitrate_idx=1 + k % 14,
                    samplerate_idx=k % 3,
                    mono=(k % 2 == 0),
                )
                m = decode_mp3_meta(payload)
                rows.append(
                    (
                        k,
                        m["id3_size"],
                        m["bitrate_kbps"],
                        m["sample_rate"],
                        m["mono"],
                    )
                )
            yield _pd.DataFrame(
                rows,
                columns=[
                    "media_id", "id3_size", "bitrate_kbps", "sample_rate",
                    "mono",
                ],
            )

    return nat.mapInPandas(
        run,
        "media_id LONG, id3_size INT, bitrate_kbps INT, "
        "sample_rate INT, mono BOOLEAN",
    )


ORACLE_MULTIMODAL_MP3 = """
WITH br(idx, kbps) AS (VALUES
  (1,32),(2,40),(3,48),(4,56),(5,64),(6,80),(7,96),(8,112),(9,128),
  (10,160),(11,192),(12,224),(13,256),(14,320)
), sr(idx, hz) AS (VALUES (0,44100),(1,48000),(2,32000))
SELECT CAST(n_nationkey AS BIGINT) AS media_id,
       CAST(200 + (n_nationkey * 37) % 20000 AS INTEGER) AS id3_size,
       CAST(br.kbps AS INTEGER) AS bitrate_kbps,
       CAST(sr.hz AS INTEGER) AS sample_rate,
       n_nationkey % 2 = 0 AS mono
FROM nation
JOIN br ON br.idx = 1 + n_nationkey % 14
JOIN sr ON sr.idx = n_nationkey % 3
"""

QUERIES["multimodal_mp3_meta"] = q_multimodal_mp3_meta
ORACLES["multimodal_mp3_meta"] = ORACLE_MULTIMODAL_MP3




def register(queries: dict, oracles: dict) -> None:
    queries.update(QUERIES)
    oracles.update(ORACLES)
