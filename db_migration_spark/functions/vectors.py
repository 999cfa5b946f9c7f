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
    """Elementwise product summed left-to-right (deterministic fp order)."""
    return F.aggregate(
        F.zip_with(_col(a), _col(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(_col(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; 0.0 for zero-norm inputs."""
    d = dot(a, b)
    denom = norm(a) * norm(b)
    return F.when(denom > 0, d / denom).otherwise(F.lit(0.0))


def l2_distance(a: Column | str, b: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(
            F.zip_with(_col(a), _col(b), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
