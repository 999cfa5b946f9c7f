"""Multimodal column operators (SURVEY §2.12, BASELINE.json north star).

Design: media are opaque ``binary`` payload columns (or object-store
pointers) plus a typed metadata struct.  Everything Spark-side — schema,
partitioning, Arrow batch shape, UDF signatures — is real and tested; only
the codec kernels are stubbed (image/audio libs are not in this container)
behind ``DeterministicFakeCodec`` / ``NotImplementedError`` with the exact
seams a real libjpeg/ffmpeg binding would fill.

Scale notes: payloads never shuffle unless the operator needs them —
metadata extraction projects the struct only; decode/resize run in
``mapInPandas`` so each Arrow batch holds a bounded number of payloads
(``spark.sql.execution.arrow.maxRecordsPerBatch`` controls peak memory).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
        StructField("uri", StringType()),  # object-store pointer alternative
    ]
)

# PNG decodes for real via the pure-stdlib codec (png_codec.py: struct +
# zlib, full filter support); baseline JPEG decodes for real via
# jpeg_codec.py (Huffman + IDCT, grayscale/4:4:4/4:2:0, restart markers);
# GIF decodes for real via gif_codec.py (variable-width LZW, palettes,
# interlace); WAV decodes for real down to SAMPLE level (stdlib wave +
# struct: RMS/peak/zero-crossings); MP4 container metadata parses for
# real (mp4_meta.py ISO BMFF box walk); MJPEG-AVI decodes for real down
# to FRAME PIXELS (avi_codec.py RIFF walk + the JPEG kernel per frame).
# BMP decodes for real (bmp_codec.py: bottom-up/BGR/padding); audio
# RESAMPLE is real (audio_ops.py integer-exact linear interpolation).
# Progressive JPEG, spectrogram DSP, and inter-coded video (H.26x)
# still need native libs absent from this container and keep the
# deterministic fake seam.
REAL_CODECS_AVAILABLE = {
    "image/png": True,
    "image/jpeg": True,
    "image/gif": True,
    "audio/wav": True,
    "video/mp4": "container-metadata",
    "video/x-msvideo": "mjpeg-frames",
}


class DeterministicFakeCodec:
    """Decode kernel: REAL for PNG payloads (signature-sniffed, header +
    zlib-inflate + unfilter via png_codec) and baseline JPEG payloads
    (marker parse + Huffman + IDCT via jpeg_codec), deterministic
    pseudo-decode for everything else so the distributed pipeline stays
    testable.  A native deployment fills the remaining branch with the
    ffmpeg call — the signature (bytes in, (w, h, channels,
    pixel_digest) out) is the seam."""

    @staticmethod
    def decode(payload: bytes) -> tuple[int, int, int, str]:
        if payload is None:
            return (0, 0, 0, "")
        from . import jpeg_codec, png_codec

        if png_codec.is_png(payload):
            w, h, ch, pix = png_codec.decode_png_pixels(payload)
            return (w, h, ch, hashlib.sha256(bytes(pix)).hexdigest()[:16])
        if jpeg_codec.is_jpeg(payload):
            w, h, ch, pix = jpeg_codec.decode_jpeg_pixels(payload)
            return (w, h, ch, hashlib.sha256(bytes(pix)).hexdigest()[:16])
        digest = hashlib.sha256(payload).hexdigest()
        w = 16 + int(digest[:4], 16) % 1024
        h = 16 + int(digest[4:8], 16) % 1024
        return (w, h, 3, digest[:16])

    @staticmethod
    def transcode_to_png(payload: bytes) -> bytes:
        """REAL format conversion between the two real codecs: baseline
        JPEG (or PNG passthrough) → RGB PNG, pixels preserved exactly
        (grayscale replicates to RGB).  The canonical normalize-the-
        corpus-to-one-format step before a training pipeline."""
        from . import jpeg_codec, png_codec

        if png_codec.is_png(payload):
            return payload
        if not jpeg_codec.is_jpeg(payload):
            raise NotImplementedError("transcode supports PNG/JPEG")
        w, h, ch, pix = jpeg_codec.decode_jpeg_pixels(payload)
        if ch == 1:
            pix = bytes(b for p in pix for b in (p, p, p))
        return png_codec.encode_png_rgb(w, h, pix)

    @staticmethod
    def resize(payload: bytes, w: int, h: int) -> bytes:
        from . import jpeg_codec, png_codec

        if jpeg_codec.is_jpeg(payload):
            # real JPEG path: decode + transcode, then resize as PNG
            payload = DeterministicFakeCodec.transcode_to_png(payload)
        if png_codec.is_png(payload):
            # real nearest-neighbor resize through the stdlib codec
            sw, sh, ch, pix = png_codec.decode_png_pixels(payload)
            if ch != 3:
                raise NotImplementedError("resize supports RGB PNGs only")
            out = bytearray(w * h * 3)
            for y in range(h):
                sy = min(sh - 1, y * sh // h)
                for x in range(w):
                    sx = min(sw - 1, x * sw // w)
                    src = (sy * sw + sx) * 3
                    dst = (y * w + x) * 3
                    out[dst : dst + 3] = pix[src : src + 3]
            return png_codec.encode_png_rgb(w, h, bytes(out))
        # deterministic fake for formats without a bundled kernel
        return hashlib.sha256(payload + f"{w}x{h}".encode()).digest()


DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("pixel_digest", StringType()),
    ]
)


def decode_metadata(media: DataFrame) -> DataFrame:
    """Decode payloads → (media_id, width, height, channels, pixel_digest).

    mapInPandas: payloads stay in Arrow batches; Python touches each batch
    once.  At 100 TB this is the canonical decode stage — parallelism =
    input splits, no shuffle, no driver involvement."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [DeterministicFakeCodec.decode(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "channels": [d[2] for d in decoded],
                    "pixel_digest": [d[3] for d in decoded],
                }
            )

    return media.select("media_id", "payload").mapInPandas(run, DECODED_SCHEMA)


PIXEL_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("means", ArrayType(DoubleType())),
    ]
)


def decode_pixel_stats(media: DataFrame) -> DataFrame:
    """REAL pixel-level decode for PNG (inflate + unfilter), baseline
    JPEG (Huffman + IDCT), and GIF (LZW + palette + de-interlace)
    payloads, then per-channel means — the verification statistic (a
    wrong filter/inflate/IDCT/LZW path shifts the means).  Arrow-batched
    mapInPandas like decode_metadata; other payloads raise (route them
    to the metadata-only path)."""
    from . import gif_codec, jpeg_codec, png_codec, qoi_codec

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(p)
                if jpeg_codec.is_jpeg(b):
                    w, h, ch, means = jpeg_codec.channel_means(b)
                elif gif_codec.is_gif(b):
                    w, h, ch, means = gif_codec.channel_means(b)
                elif qoi_codec.is_qoi(b):
                    w, h, ch, means = qoi_codec.channel_means(b)
                else:
                    w, h, ch, means = png_codec.channel_means(b)
                rows.append((int(mid), w, h, ch, means))
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "channels", "means"]
            )

    return media.select("media_id", "payload").mapInPandas(
        run, PIXEL_STATS_SCHEMA
    )


def sample_frames(
    media: DataFrame, every_ms: int = 1000, max_frames: int = 16
) -> DataFrame:
    """Frame-sampling plumbing: one row per sampled frame offset.  The
    offsets come from metadata (duration), JVM-side via sequence+explode —
    the (stubbed) per-frame decode then runs batch-wise like
    :func:`decode_metadata`."""
    n_frames = F.least(
        F.greatest((F.col("duration_ms") / every_ms).cast("int"), F.lit(1)),
        F.lit(max_frames),
    )
    return media.select(
        "media_id",
        "payload",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), n_frames - 1), lambda i: i * every_ms
            )
        ).alias("frame_offset_ms"),
    )


def payload_stats(media: DataFrame) -> DataFrame:
    """Pure-JVM metadata pass: byte sizes and digests without decoding —
    the cheap scan that should never need Python."""
    return media.select(
        "media_id",
        "mime",
        F.length("payload").alias("n_bytes"),
        F.sha2("payload", 256).alias("sha256"),
    )


SNIFF_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def sniff_image_meta(media: DataFrame) -> DataFrame:
    """Header-only image metadata (REAL parsing, no codec libs): sniff
    PNG/JPEG/GIF/BMP and extract dimensions from the fixed headers
    (multimodal/image_meta.py).  The canonical first pass over a raw
    media corpus — routes payloads by format and dimension band without
    ever touching pixel data."""
    from .image_meta import image_meta

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                fmt, w, h = image_meta(bytes(p) if p is not None else None)
                rows.append((int(mid), fmt, w, h))
            yield pd.DataFrame(
                rows, columns=["media_id", "format", "width", "height"]
            )

    return media.select("media_id", "payload").mapInPandas(run, SNIFF_SCHEMA)


WAV_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_channels", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_frames", LongType()),
        StructField("duration_ms", DoubleType()),
    ]
)


def encode_wav_pcm16(sample_rate: int, frames: bytes, n_channels: int = 1) -> bytes:
    """Real WAV encode via the stdlib ``wave`` module (16-bit PCM)."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(frames)
    return buf.getvalue()


def decode_wav_meta(media: DataFrame) -> DataFrame:
    """REAL audio metadata decode: RIFF/WAVE header parse via the stdlib
    ``wave`` module (no native audio libs needed) — channels, sample
    rate, frame count, duration.  Arrow-batched like decode_metadata;
    the sample-level DSP (resample, spectrogram) remains the native-lib
    seam."""
    import io
    import wave

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                with wave.open(io.BytesIO(bytes(p)), "rb") as w:
                    ch, rate, n = (
                        w.getnchannels(),
                        w.getframerate(),
                        w.getnframes(),
                    )
                rows.append((int(mid), ch, rate, n, n * 1000.0 / rate))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "n_channels",
                    "sample_rate",
                    "n_frames",
                    "duration_ms",
                ],
            )

    return media.select("media_id", "payload").mapInPandas(
        run, WAV_META_SCHEMA
    )


def load_media_dir(spark, path: str, mime: str = "application/octet-stream"):
    """Pointer-to-object-store ingestion: read a directory of opaque files
    into the MEDIA_SCHEMA shape via Spark's binaryFile source.

    At 100 TB the `uri` column IS the payload for cold media — downstream
    stages decode from the store lazily; here binaryFile materializes
    payload + uri + length in one scan, split-parallel.
    """
    raw = spark.read.format("binaryFile").load(path)
    return raw.select(
        F.xxhash64(F.col("path")).alias("media_id"),
        F.col("content").alias("payload"),
        F.lit(mime).alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
        F.col("path").alias("uri"),
    )


WAV_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_samples", LongType()),
        StructField("rms", DoubleType()),
        StructField("peak", IntegerType()),
        StructField("zero_crossings", LongType()),
    ]
)


def decode_wav_sample_stats(media: DataFrame) -> DataFrame:
    """REAL sample-level audio analysis, no DSP libs: 16-bit mono PCM
    decoded with stdlib ``wave`` + ``struct``, then per-file RMS, peak
    amplitude, and zero-crossing count — the first-pass audio quality
    triage (silence/clipping/noise detection) a media corpus needs
    before any expensive model runs.  Arrow-batched like
    decode_metadata; resample/spectrogram stay the native-lib seam."""
    import math
    import io
    import struct
    import wave

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                with wave.open(io.BytesIO(bytes(p)), "rb") as w:
                    if w.getsampwidth() != 2 or w.getnchannels() != 1:
                        raise NotImplementedError(
                            "sample stats support 16-bit mono PCM"
                        )
                    n = w.getnframes()
                    raw = w.readframes(n)
                samples = struct.unpack(f"<{n}h", raw)
                sq = sum(s * s for s in samples)  # exact int arithmetic
                rms = math.sqrt(sq / n) if n else 0.0
                peak = max((abs(s) for s in samples), default=0)
                zc = sum(
                    1
                    for i in range(1, n)
                    if (samples[i] >= 0) != (samples[i - 1] >= 0)
                )
                rows.append((int(mid), n, rms, peak, zc))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "n_samples", "rms", "peak", "zero_crossings",
                ],
            )

    return media.select("media_id", "payload").mapInPandas(
        run, WAV_STATS_SCHEMA
    )


MP4_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("major_brand", StringType()),
        StructField("timescale", IntegerType()),
        StructField("duration_ms", DoubleType()),
        StructField("n_tracks", IntegerType()),
    ]
)


def decode_mp4_meta(media: DataFrame) -> DataFrame:
    """REAL video-container metadata: ISO BMFF box walk via stdlib struct
    (multimodal/mp4_meta.py) — major brand, movie timescale, duration,
    track count.  The container triage pass of a video corpus; frame
    decode stays the native-lib seam."""
    from .mp4_meta import parse_mp4_meta

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                brand, ts, dur_ms, n_trk = parse_mp4_meta(bytes(p))
                rows.append((int(mid), brand, ts, dur_ms, n_trk))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "major_brand", "timescale",
                    "duration_ms", "n_tracks",
                ],
            )

    return media.select("media_id", "payload").mapInPandas(
        run, MP4_META_SCHEMA
    )


VIDEO_FRAME_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mean_gray", DoubleType()),
    ]
)


def decode_video_frame_stats(media: DataFrame, every_n: int = 1) -> DataFrame:
    """REAL video frame sampling: MJPEG-AVI container walk (avi_codec)
    + per-frame baseline-JPEG decode (jpeg_codec) → one row per sampled
    frame with its decoded first-channel mean.  No native libs — the
    whole path is stdlib struct; Arrow-batched like the other codec
    seams, one task per payload batch (a 100 TB video corpus
    parallelizes by file, the natural unit)."""
    from .avi_codec import sample_frame_stats

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                for idx, w, h, mean in sample_frame_stats(bytes(p), every_n):
                    rows.append((int(mid), idx, w, h, mean))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "frame_idx", "width", "height", "mean_gray",
                ],
            )

    return media.select("media_id", "payload").mapInPandas(
        run, VIDEO_FRAME_STATS_SCHEMA
    )


G711_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("law", StringType()),
        StructField("n_samples", IntegerType()),
        StructField("rms", DoubleType()),
        StructField("peak", IntegerType()),
        StructField("zero_crossings", IntegerType()),
    ]
)


def decode_g711_stats(media: DataFrame) -> DataFrame:
    """REAL G.711 companded-audio analysis: µ-law/A-law WAVs (format
    codes 7/6 — the telephony corpus formats stdlib ``wave`` cannot
    read) expanded to 16-bit linear via the exact ITU integer math
    (g711_codec), then the same RMS/peak/zero-crossing triage as
    decode_wav_sample_stats.  Integer-exact sums, so the statistics are
    bit-reproducible in SQL oracles."""
    import math

    from .g711_codec import decode_wav_g711

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                law, _rate, samples = decode_wav_g711(bytes(p))
                n = len(samples)
                sq = sum(s * s for s in samples)
                rms = math.sqrt(sq / n) if n else 0.0
                peak = max((abs(s) for s in samples), default=0)
                zc = sum(
                    1
                    for i in range(1, n)
                    if (samples[i] >= 0) != (samples[i - 1] >= 0)
                )
                rows.append((int(mid), law, n, rms, peak, zc))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "law", "n_samples", "rms", "peak",
                    "zero_crossings",
                ],
            )

    return media.select("media_id", "payload").mapInPandas(
        run, G711_STATS_SCHEMA
    )


PIXEL_SUMS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("sums", ArrayType(LongType())),
    ]
)


def _decode_any_pixels(b: bytes):
    """Route a payload to the right REAL pixel decoder by magic bytes."""
    from . import bmp_codec, gif_codec, jpeg_codec, png_codec

    if bmp_codec.is_bmp(b):
        return bmp_codec.decode_bmp_pixels(b)
    if jpeg_codec.is_jpeg(b):
        return jpeg_codec.decode_jpeg_pixels(b)
    if gif_codec.is_gif(b):
        w, h, rgb = gif_codec.decode_gif(b)
        return w, h, 3, rgb
    return png_codec.decode_png_pixels(b)


def decode_pixel_sums(media: DataFrame) -> DataFrame:
    """REAL pixel decode (BMP/JPEG/GIF/PNG by magic) → per-channel
    INTEGER pixel sums.  The integer statistic makes the oracle
    comparison exact — no float tolerance — so a row-order (bottom-up),
    channel-order (BGR), or padding bug in the decoder cannot hide."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .image_ops import channel_sums_of

        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                w, h, ch, pix = _decode_any_pixels(bytes(p))
                rows.append((int(mid), w, h, ch, channel_sums_of(pix, ch)))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "width", "height", "channels", "sums"],
            )

    return media.select("media_id", "payload").mapInPandas(
        run, PIXEL_SUMS_SCHEMA
    )


def resize_pixel_sums(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """REAL decode → nearest-neighbor resize → integer channel sums of
    the RESIZED image.  The index map is pure floor arithmetic
    (image_ops.nn_resize), so an oracle can replay it coordinate-by-
    coordinate in SQL; the reported width/height are the target dims."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .image_ops import channel_sums_of, nn_resize

        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                w, h, ch, pix = _decode_any_pixels(bytes(p))
                small = nn_resize(pix, w, h, ch, out_w, out_h)
                rows.append(
                    (int(mid), out_w, out_h, ch, channel_sums_of(small, ch))
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "width", "height", "channels", "sums"],
            )

    return media.select("media_id", "payload").mapInPandas(
        run, PIXEL_SUMS_SCHEMA
    )


RESAMPLE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_src", IntegerType()),
        StructField("n_out", IntegerType()),
        StructField("sum_scaled", LongType()),
        StructField("sumsq_src", LongType()),
    ]
)


def resample_wav_stats(
    media: DataFrame, dst_rate: int
) -> DataFrame:
    """REAL audio resample under an exact gate: 16-bit mono PCM WAVs are
    decoded (stdlib wave/struct), linear-resampled to ``dst_rate`` with
    the integer phase accumulator (audio_ops.resample_linear_scaled —
    outputs scaled by dst so everything stays in ℤ), and summarized as
    integer sums an oracle can replay sample-by-sample in SQL."""
    import io
    import struct
    import wave

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .audio_ops import resample_linear_scaled

        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                with wave.open(io.BytesIO(bytes(p)), "rb") as w:
                    if w.getsampwidth() != 2 or w.getnchannels() != 1:
                        raise NotImplementedError(
                            "resample supports 16-bit mono PCM"
                        )
                    src_rate = w.getframerate()
                    n = w.getnframes()
                    raw = w.readframes(n)
                samples = struct.unpack(f"<{n}h", raw)
                out = resample_linear_scaled(samples, src_rate, dst_rate)
                rows.append(
                    (
                        int(mid),
                        n,
                        len(out),
                        sum(out),
                        sum(s * s for s in samples),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "n_src", "n_out", "sum_scaled", "sumsq_src",
                ],
            )

    return media.select("media_id", "payload").mapInPandas(
        run, RESAMPLE_SCHEMA
    )


DHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("dhash", LongType()),
    ]
)


def image_dhash(media: DataFrame) -> DataFrame:
    """Perceptual difference-hash over the REAL decode path: pixels →
    nearest-neighbor resize to 9×8 (image_ops.nn_resize) → channel-sum
    gray → 64 horizontal-gradient bits.  Gradient comparisons make the
    hash invariant to global brightness shifts — the property that makes
    dHash the standard first-pass image near-dup key.  The u64 is folded
    into a SIGNED i64 (two's complement) so Arrow/Spark longs carry it;
    band extraction and XOR/bit_count downstream are mask-safe on the
    signed value."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .image_ops import nn_resize

        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                w, h, ch, pix = _decode_any_pixels(bytes(p))
                small = nn_resize(pix, w, h, ch, 9, 8)
                gray = [
                    sum(small[(y * 9 + x) * ch + c] for c in range(ch))
                    for y in range(8)
                    for x in range(9)
                ]
                hsh = 0
                for y in range(8):
                    for x in range(8):
                        if gray[y * 9 + x] > gray[y * 9 + x + 1]:
                            hsh |= 1 << (y * 8 + x)
                if hsh >= 1 << 63:
                    hsh -= 1 << 64
                rows.append((int(mid), hsh))
            yield pd.DataFrame(rows, columns=["media_id", "dhash"])

    return media.select("media_id", "payload").mapInPandas(run, DHASH_SCHEMA)


AUDIO_FP_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_samples", IntegerType()),
        StructField("fingerprint", LongType()),
    ]
)


def audio_fingerprint(media: DataFrame, window: int = 25) -> DataFrame:
    """Acoustic fingerprint over the REAL decode path (chromaprint's
    core idea in one dimension): 16-bit mono PCM → fixed windows →
    integer energy per window → one bit per adjacent-window energy
    comparison.  Comparing energies instead of storing them makes the
    print invariant to uniform amplitude scaling (E scales by g²
    everywhere), which is exactly the re-encoded/volume-normalized
    duplicate case audio dedup needs.  All integer arithmetic —
    SQL-replayable bit by bit (dedup_audio_fingerprint's oracle)."""
    import io
    import struct
    import wave

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                with wave.open(io.BytesIO(bytes(p)), "rb") as w:
                    if w.getsampwidth() != 2 or w.getnchannels() != 1:
                        raise NotImplementedError(
                            "fingerprint supports 16-bit mono PCM"
                        )
                    n = w.getnframes()
                    raw = w.readframes(n)
                samples = struct.unpack(f"<{n}h", raw)
                n_win = n // window
                energies = [
                    sum(
                        s * s
                        for s in samples[wi * window : (wi + 1) * window]
                    )
                    for wi in range(n_win)
                ]
                fp = 0
                for wi in range(n_win - 1):
                    if energies[wi + 1] > energies[wi]:
                        fp |= 1 << wi
                rows.append((int(mid), n, fp))
            yield pd.DataFrame(
                rows, columns=["media_id", "n_samples", "fingerprint"]
            )

    return media.select("media_id", "payload").mapInPandas(
        run, AUDIO_FP_SCHEMA
    )
