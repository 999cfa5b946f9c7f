"""Sample-space audio kernels — pure stdlib, integer-exact.

Linear-interpolation resampling with a rational phase accumulator: output
position ``j`` maps to source position ``j·src/dst`` held as the exact
pair ``(k, r) = divmod(j·src, dst)`` — no floats anywhere, so the kernel
is bit-deterministic and SQL-replayable.  Values are returned SCALED by
``dst`` (``out_j = dst·s[k] + (s[k+1]−s[k])·r``); keeping the common
denominator avoids the truncation-vs-floor divergence that signed
integer division would introduce between engines (C-style truncation in
Spark/DuckDB vs mathematical floor).  Divide by ``dst`` only at the very
edge if a PCM payload is actually re-emitted.
"""

from __future__ import annotations


def resample_linear_scaled(
    samples: list[int] | tuple[int, ...], src_rate: int, dst_rate: int
) -> list[int]:
    """Resample to ``dst_rate``, each output scaled by ``dst_rate``.

    Output length = floor((n−1)·dst/src) + 1 — every output position
    that lands inside the source span, endpoint included."""
    n = len(samples)
    if n == 0:
        return []
    n_out = (n - 1) * dst_rate // src_rate + 1
    out = []
    for j in range(n_out):
        k, r = divmod(j * src_rate, dst_rate)
        s0 = samples[k]
        s1 = samples[min(k + 1, n - 1)]
        out.append(dst_rate * s0 + (s1 - s0) * r)
    return out
