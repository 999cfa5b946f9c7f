"""Vector math over ``array<float>`` embedding columns (SURVEY §2.12).

All built-in higher-order functions (``zip_with`` + ``aggregate``) — the dot
product runs inside codegen on the JVM, no Python, no UDF.  At 100 TB the
cost model is: brute-force top-k = one broadcast of the (small) query set +
a map stage + a per-query top-k aggregate; LSH/IVF variants (operators/
similarity.py) cut the candidate set when the corpus side is huge.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def dot(a: Column | str, b: Column | str) -> Column:
    """Elementwise product summed left-to-right (deterministic fp order).

    Operands are promoted to double BEFORE the multiply: float32×float32
    in float precision loses ~1e-8 relative accuracy per product, which is
    both worse numerically and unreproducible against engines that promote
    first (the DuckDB oracles do)."""
    return F.aggregate(
        F.zip_with(
            _col(a), _col(b), lambda x, y: x.cast("double") * y.cast("double")
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(
            _col(a),
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; 0.0 for zero-norm inputs."""
    d = dot(a, b)
    denom = norm(a) * norm(b)
    return F.when(denom > 0, d / denom).otherwise(F.lit(0.0))


def l2_distance(a: Column | str, b: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(
            F.zip_with(
                _col(a),
                _col(b),
                lambda x, y: (x.cast("double") - y.cast("double"))
                * (x.cast("double") - y.cast("double")),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def quantize_int8(v: Column | str) -> Column:
    """Symmetric int8 scalar quantization of a float vector: scale =
    max|v|/127, q_i = round-half-up(v_i / scale).  The rounding is spelled
    ``floor(x + 0.5)`` so both engines (and any engine with IEEE doubles)
    produce bit-identical codes — ``round()`` half-to-even vs half-up
    varies across engines.  Returns ``struct(scale, qvec)``; an all-zero
    vector quantizes to scale 0 and zero codes.

    4x storage reduction for ANN serving; combined with ``dequant_err``
    below the engine can report the reconstruction error distribution of
    a corpus in one scan (pure expressions, codegen'd, no UDF)."""
    vd = F.transform(_col(v), lambda x: x.cast("double"))
    amax = F.array_max(F.transform(vd, lambda x: F.abs(x)))
    scale = amax / F.lit(127.0)
    # codes are provably in [-127, 127] (|x| <= amax = 127*scale), so store
    # them as real int8 — the 4x storage claim only holds at 1 byte/code
    qvec = F.when(
        scale > 0,
        F.transform(
            vd, lambda x: F.floor(x / scale + F.lit(0.5)).cast("tinyint")
        ),
    ).otherwise(F.transform(vd, lambda x: F.lit(0).cast("tinyint")))
    return F.struct(scale.alias("scale"), qvec.alias("qvec"))


def dequant_err(q: Column, scale: Column, v: Column | str) -> Column:
    """Max absolute reconstruction error of an int8-quantized vector
    (index-aligned zip, order-independent max — deterministic across
    engines)."""
    vd = F.transform(_col(v), lambda x: x.cast("double"))
    return F.array_max(
        F.zip_with(q, vd, lambda qi, xi: F.abs(qi.cast("double") * scale - xi))
    )
