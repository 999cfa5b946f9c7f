"""Portable HyperLogLog register rollups — the mergeable-sketch tier a
100 TB pipeline pre-aggregates with.

Spark's ``approx_count_distinct`` is an HLL++ whose binary sketch is
engine-private: it answers one query, but the registers can't be
stored, re-merged along other dimensions, or verified by another
engine.  This module builds the registers themselves out of portable
SQL expressions (md5 → register index + rank), so the rollup table is

* **mergeable** — ``MAX`` per register re-aggregates day→month→total
  or along any dimension subset (the Druid/ClickHouse pre-aggregation
  pattern: store (dims…, j, r), answer any distinct-count over any
  dim combination without touching raw data);
* **algebraic** — union = register-wise MAX, intersection via
  inclusion–exclusion;
* **exactly oracle-checkable** — every register value is a
  deterministic function of md5, identical in Spark and DuckDB
  (verified bit-for-bit), so correctness gates hash the *registers*,
  not just an error bound.

Scheme (p bits → m = 2^p registers, default p=9 / m=512, standard
error 1.04/√m ≈ 4.6%):

* ``h = md5(cast(key as string))`` — 32 hex chars, engine-portable.
* register index ``j`` = first 16 bits ``% m`` (65536 % m == 0 for
  p ≤ 16, so the fold stays exactly uniform).
* rank ``rho`` = position of the first 1-bit in the NEXT 52 bits
  (13 hex chars — 52 bits keeps every value exact in a BIGINT *and*
  an IEEE double, so no engine disagrees): ``53 - length(bin(v))``,
  with ``v = 0 → 53``.
* estimator: ``alpha_m · m² / Σ 2^-r`` with the small-range
  linear-counting correction (E ≤ 2.5m and empty registers present →
  ``m·ln(m/V)``).  The register sum is carried scaled by 2^53 —
  ``Σ 2^(53-r)`` is an exact BIGINT (≤ m·2^53 < 2^63) — so the
  hash-gated columns are integers and only the final estimate touches
  floating point.

At 100 TB: the register build is one map-side-combinable aggregate
(groupBy dims+j, MAX) — m rows per dimension tuple regardless of raw
volume; every downstream question is answered from that rollup.

No counterpart in the reference (its distinct counts are exact
Datomic/sort-based passes — azanium core.clj:1-80 delegates counting
to subprocesses); parity anchor is SURVEY §2.4's aggregate tier, which
this extends with the pre-aggregation shape the reference cannot
express.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_P = 9
_W = 52  # rank-domain bits: exact in BIGINT and in an IEEE double


def hll_shred(key: Column | str, p: int = DEFAULT_P) -> tuple[Column, Column]:
    """(register index j, rank rho) for one key — portable md5 scheme."""
    if p < 4 or p > 16:
        raise ValueError("hll_shred: p must be in [4, 16]")
    k = F.col(key) if isinstance(key, str) else key
    h = F.md5(k.cast("string"))
    j = F.conv(F.substring(h, 1, 4), 16, 10).cast("int") % (1 << p)
    v = F.conv(F.substring(h, 5, 13), 16, 10).cast("bigint")
    rho = F.when(v == 0, F.lit(_W + 1)).otherwise(
        F.lit(_W + 1) - F.length(F.bin(v))
    )
    return j, rho


def hll_registers(
    df: DataFrame, dims: list[str], key: str, p: int = DEFAULT_P
) -> DataFrame:
    """Register rollup (dims…, j, r): one map-side-combinable MAX
    aggregate; ≤ 2^p rows per dimension tuple at any raw volume."""
    j, rho = hll_shred(key, p)
    return (
        df.select(*dims, j.alias("j"), rho.alias("rho"))
        .groupBy(*dims, "j")
        .agg(F.max("rho").alias("r"))
    )


def hll_merge(regs: DataFrame, dims: list[str]) -> DataFrame:
    """Re-aggregate a register rollup to coarser dimensions (or a union
    over a relabeled dimension): register-wise MAX — associative, so
    day→month→total rollups compose exactly."""
    return regs.groupBy(*dims, "j").agg(F.max("r").alias("r"))


def hll_estimate(
    regs: DataFrame, dims: list[str], p: int = DEFAULT_P
) -> DataFrame:
    """Per-dims cardinality estimate from a register rollup.

    Returns (dims…, n_regs, total_scaled, est): ``total_scaled`` =
    Σ_all_m 2^(53-r) as an exact BIGINT (empty registers contribute
    2^53 each) — the hash-gateable sketch digest — and ``est`` the
    HLL/linear-counting estimate rounded to a BIGINT."""
    m = 1 << p
    scaled = F.pow(F.lit(2.0), F.lit(_W + 1) - F.col("r")).cast("bigint")
    agg = regs.groupBy(*dims).agg(
        F.count(F.lit(1)).alias("n_regs"),
        F.sum(scaled).alias("present_scaled"),
    )
    total_scaled = (
        F.col("present_scaled")
        + (F.lit(m) - F.col("n_regs")) * F.lit(1 << (_W + 1))
    ).alias("total_scaled")
    return (
        agg.select(*dims, "n_regs", total_scaled)
        .withColumn(
            "est", F.floor(_est_expr(p) + F.lit(0.5)).cast("bigint")
        )
    )


def _est_expr(p: int = DEFAULT_P) -> Column:
    """HLL estimate (double) from (n_regs, total_scaled) columns.

    ``alpha`` is spelled as the same double-op chain the oracle SQL
    uses (0.7213 / (1 + 1.079/m)) so IEEE evaluation is bit-identical
    across engines; ``ln`` in the linear-counting branch is the one
    sub-ulp-risk term, which the BIGINT rounding in callers absorbs."""
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / float(m))
    empty = F.lit(m) - F.col("n_regs")
    e_raw = (
        F.lit(alpha * m * m)
        * F.lit(float(1 << (_W + 1)))
        / F.col("total_scaled").cast("double")
    )
    return F.when(
        (e_raw <= F.lit(2.5 * m)) & (empty > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / empty.cast("double")),
    ).otherwise(e_raw)
