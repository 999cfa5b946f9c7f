"""Log-bin quantile sketch (functions/qsketch.py): bin exactness at
boundaries, merge associativity, midpoint containment, and the
relative-error contract — including adversarial values AT bin edges
(the oracle sweep certifies cross-engine equality; these pin the
mathematical contract locally)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from db_migration_spark.functions.qsketch import (
    SUBS,
    bin_midpoint,
    logbin,
    logbin_merge,
    logbin_quantiles,
    logbin_table,
)


def _py_bin(v: int) -> int:
    e = v.bit_length() - 1
    p = 1 << e
    return e * SUBS + ((v - p) * SUBS) // p


def test_bin_matches_pure_python_at_boundaries(spark):
    # powers of two, edges of every sub-bin, and near-misses
    vals = []
    for e in (0, 1, 5, 23, 40, 52):
        p = 1 << e
        vals += [p, p + 1, 2 * p - 1]
        for s in range(SUBS):
            edge = p + (s * p) // SUBS
            vals += [edge, max(1, edge - 1), edge + 1]
    vals = sorted(set(v for v in vals if v >= 1))
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = {
        r.v: r.bin for r in df.select("v", logbin("v")).collect()
    }
    for v in vals:
        assert got[v] == _py_bin(v), v


def test_midpoint_contained_in_bin_and_within_error(spark):
    # midpoint must lie inside [lo, hi) and within 6.25% of ANY value
    # in the bin — the bound the *_ok gates rely on
    vals = [1, 3, 7, 100, 12345, 9999999, (1 << 40) + 12345]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    rows = df.select(
        "v", logbin("v")
    ).select("v", "bin", bin_midpoint("bin").alias("mid")).collect()
    for r in rows:
        e, s = divmod(r.bin, SUBS)
        p = 1 << e
        lo = p + s * p / SUBS
        hi = p + (s + 1) * p / SUBS
        assert lo <= r.mid < hi
        assert abs(r.mid - r.v) <= (hi - lo) / 2 + 1e-9
        assert abs(r.mid / r.v - 1.0) <= 1.0 / (2 * SUBS) + 1e-9


def test_merge_associativity_exact(spark):
    # bins built at (k, sub) then merged to (k) must equal bins built
    # directly at (k): counts are integers, so equality is exact
    df = spark.range(20000).select(
        (F.col("id") % 4).alias("k"),
        (F.col("id") % 16).alias("sub"),
        (F.col("id") * 37 % 100000 + 1).alias("v"),
    )
    fine = logbin_table(df, ["k", "sub"], "v")
    merged = logbin_merge(fine, ["k"])
    direct = logbin_table(df, ["k"], "v")
    m = {(r.k, r.bin): r.cnt for r in merged.collect()}
    d = {(r.k, r.bin): r.cnt for r in direct.collect()}
    assert m == d


def test_quantile_estimates_respect_error_bound(spark):
    # heavy-tailed values: estimates at p50/p90/p99 within 6.25% of the
    # true order statistic under the same ceil(q*n) rank rule
    n = 50000
    df = spark.range(1, n + 1).select(
        F.lit(0).alias("g"),
        (F.col("id") * F.col("id") % 999983 + 1).alias("v"),
    )
    tbl = logbin_table(df, ["g"], "v")
    est = logbin_quantiles(
        tbl, ["g"], [("p50", 0.5), ("p90", 0.9), ("p99", 0.99)]
    ).collect()[0]
    vals = sorted(
        r.v for r in df.select("v").collect()
    )
    for name, q in (("p50", 0.5), ("p90", 0.9), ("p99", 0.99)):
        exact = vals[math.ceil(q * n) - 1]
        assert abs(est[name] / exact - 1.0) <= 1.0 / (2 * SUBS) + 1e-9, (
            name,
            est[name],
            exact,
        )


def test_rollup_is_bounded_and_plan_is_jvm_only(spark):
    import contextlib
    import io

    df = spark.range(1, 1000001).select(
        (F.col("id") % 3).alias("g"), F.col("id").alias("v")
    )
    tbl = logbin_table(df, ["g"], "v")
    # 1M distinct values collapse into <= 3 * 8*52 bins
    assert tbl.count() <= 3 * SUBS * 52
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        tbl.explain("formatted")
    plan = buf.getvalue()
    assert "partial_count" in plan or "partial count" in plan.lower()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
