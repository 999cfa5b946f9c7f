"""Portable mergeable QUANTILE sketch — exact-integer log-spaced bins.

Completes the mergeable-summary algebra next to the HLL registers
(functions/hll.py, distinct counts), theta/KMV sketches (functions/
theta.py, set operations) and the CMS heavy-hitter path: a (dims…,
bin, cnt) rollup answers any quantile question over any dimension
subset by SUMMING counts — the trivially associative merge — with a
bounded RELATIVE rank-value error set by the bin geometry.

Binning is **pure integer arithmetic** so the sketch is bit-identical
in any engine (the property every oracle here hash-gates): for a
positive integer value v,

    e    = length(bin(v)) - 1          # floor(log2 v), via the binary
                                       # string — no libm anywhere
    p    = 1 << e                      # 2^e, exact BIGINT
    sub  = ((v - p) * SUBS) div p      # which of SUBS linear sub-bins
    bin  = e * SUBS + sub

SUBS = 8 sub-bins per octave → each bin spans ≤ 2^(1/8)·…·≈ 1/8 of an
octave, a ≤ 12.5% relative value width: any quantile estimated at a
bin midpoint is within ~6.25% of the true order statistic, at ANY data
volume, from a table bounded by dims × (8·52) rows.  The midpoint
reconstruction (2·sub+1)·(2^e/16) is exact IEEE double arithmetic
(power-of-two division, small-int multiply), so even the ESTIMATES
hash-compare exactly across engines.

No counterpart in the reference (exact GNU-sort percentiles only);
extends SURVEY §2.4's approximate tier.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

SUBS = 8  # linear sub-bins per octave


def logbin(v: str) -> Column:
    """Exact-integer log-bin id of a positive integer column (by
    NAME — built as one SQL expression; `div` keeps every step in
    BIGINT arithmetic, mirroring the oracle's `//` to the bit)."""
    p = f"shiftleft(1L, cast(length(bin({v})) - 1 as int))"
    return F.expr(
        f"cast((length(bin({v})) - 1) * {SUBS} "
        f"+ (({v} - {p}) * {SUBS}) div {p} as bigint)"
    ).alias("bin")


def logbin_table(df: DataFrame, dims: list[str], v: str) -> DataFrame:
    """Build the (dims…, bin, cnt) rollup — ONE map-side-combinable
    aggregate; output bounded by |dims| x 8·52 rows at any volume."""
    return (
        df.select(*dims, logbin(v))
        .groupBy(*dims, "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def logbin_merge(tbl: DataFrame, dims: list[str]) -> DataFrame:
    """Merge a rollup to a coarser dimension subset: SUM of counts."""
    return tbl.groupBy(*dims, "bin").agg(F.sum("cnt").alias("cnt"))


def bin_midpoint(bin_col: str) -> Column:
    """Exact-double midpoint of bin [p·(1+s/8), p·(1+(s+1)/8)):
    p + (2s+1)·p/16 = (2s+17) · (p/16).  shiftleft is BIGINT-exact for
    e <= 52 and /16.0 is a power-of-two division (exact), so the
    midpoint is bit-identical across engines."""
    b = F.col(bin_col)
    sub = b % SUBS
    p = F.expr(
        f"cast(shiftleft(1L, cast(({bin_col} div {SUBS}) as int)) as double)"
    )
    return (2 * sub + 17).cast("double") * (p / F.lit(16.0))


def logbin_quantiles(
    tbl: DataFrame, dims: list[str], qs: list[tuple[str, float]]
) -> DataFrame:
    """Quantile estimates from the rollup: per dims group and each
    named q, the midpoint of the first bin whose cumulative count
    reaches ceil(q·n).  One window cumsum over the (tiny) bin table —
    never the raw data."""
    w = (
        Window.partitionBy(*dims)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    n = Window.partitionBy(*dims)
    cum = tbl.withColumn("cum", F.sum("cnt").over(w)).withColumn(
        "n", F.sum("cnt").over(n)
    )
    out = None
    for name, q in qs:
        hit = (
            cum.filter(
                F.col("cum") >= F.ceil(F.lit(q) * F.col("n"))
            )
            .groupBy(*dims)
            .agg(F.min("bin").alias("qbin"))
            .select(*dims, bin_midpoint("qbin").alias(name))
        )
        if out is None:
            out = hit
        elif dims:
            out = out.join(hit, dims)
        else:  # global (no dims): both sides are 1-row frames
            out = out.crossJoin(F.broadcast(hit))
    return out


# the same binning, as a DuckDB SQL expression template (mirrors
# logbin exactly — keep the two in lockstep)
def oracle_bin_sql(v: str) -> str:
    return (
        f"(length(bin({v})) - 1) * {SUBS} "
        f"+ (({v} - (1::BIGINT << (length(bin({v})) - 1))) * {SUBS}) "
        f"// (1::BIGINT << (length(bin({v})) - 1))"
    )


def oracle_midpoint_sql(bin_expr: str) -> str:
    return (
        f"(2 * (({bin_expr}) % {SUBS}) + 17) "
        f"* (CAST(1::BIGINT << (({bin_expr}) // {SUBS}) AS DOUBLE) / 16.0)"
    )
