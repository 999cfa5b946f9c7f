"""Portable HLL register rollups (functions/hll.py).

Covers: estimator accuracy across cardinality regimes (linear-counting
and raw-HLL branches), merge associativity (day→type→total == direct),
union algebra, and — adversarially — that the declared queries' gates
go RED when the sketch is crippled, so a silently broken register
build cannot pass vacuously.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from db_migration_spark.functions.hll import (
    hll_estimate,
    hll_merge,
    hll_registers,
    hll_shred,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def spark():
    from db_migration_spark.session import get_spark

    s = get_spark("test-hll")
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _domain(spark, n, label="u"):
    return spark.range(n).select(
        F.concat(F.lit(label), F.col("id").cast("string")).alias("k"),
        (F.col("id") % 4).alias("g"),
    )


@pytest.mark.parametrize("n", [100, 2_000, 20_000])
def test_estimate_within_3_sigma(spark, n):
    """1.04/sqrt(512) ≈ 4.6% standard error; 3σ ≈ 14%.  The 100-key
    case exercises the linear-counting branch, 20k the raw-HLL one."""
    regs = hll_registers(_domain(spark, n), [], "k")
    est = hll_estimate(regs, []).collect()[0]
    assert abs(est.est / n - 1.0) <= 0.14, (n, est.est)


def test_duplicates_do_not_move_registers(spark):
    """Distinct-ness is structural: re-observing keys is a no-op on the
    register MAX, so 10× duplicated input gives identical registers."""
    d = _domain(spark, 500)
    dup = d.union(d).union(d)
    a = sorted(map(tuple, hll_registers(d, [], "k").collect()))
    b = sorted(map(tuple, hll_registers(dup, [], "k").collect()))
    assert a == b


def test_merge_associativity_exact(spark):
    """raw→(g, j)→(j) must equal raw→(j) register-for-register — the
    property that makes incremental daily rollups safe."""
    d = _domain(spark, 3_000)
    via_g = hll_merge(hll_registers(d, ["g"], "k"), [])
    direct = hll_registers(d, [], "k")
    assert sorted(map(tuple, via_g.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_union_register_max_bounds(spark):
    """Union registers are the element-wise max; estimate of A∪B for
    disjoint halves ≈ |A|+|B|."""
    a = _domain(spark, 1_000, "a")
    b = _domain(spark, 1_000, "b")
    ra = hll_registers(a, [], "k").withColumn("side", F.lit("a"))
    rb = hll_registers(b, [], "k").withColumn("side", F.lit("b"))
    u = hll_merge(ra.unionByName(rb), [])
    est = hll_estimate(u, []).collect()[0].est
    assert abs(est / 2_000 - 1.0) <= 0.14, est


def test_shred_rank_distribution_sane(spark):
    """rho is geometric: P(rho ≥ k) = 2^-(k-1); with 20k keys the mean
    of rho is ~2 and the max comfortably above 10."""
    j, rho = hll_shred("k")
    d = _domain(spark, 20_000).select(j.alias("j"), rho.alias("rho"))
    row = d.agg(
        F.avg("rho").alias("mean"), F.max("rho").alias("mx")
    ).collect()[0]
    assert 1.8 <= row.mean <= 2.2, row.mean
    assert row.mx >= 10


def test_crippled_sketch_goes_red(spark):
    """Adversarial gate check: dropping half the registers (a silently
    broken build) must flip the declared rollup query's est_ok gate —
    the acceptance row is not vacuous."""
    from db_migration_spark.queries_sketches import q_sketch_hll_rollup

    healthy = q_sketch_hll_rollup(spark, SF)
    assert all(r.est_ok for r in healthy.collect())

    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        "event_type", "user_id"
    )
    regs = hll_registers(ev, ["event_type"], "user_id").filter(
        F.col("j") % 2 == 0
    )
    est = hll_estimate(regs, ["event_type"])
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_users")
    )
    gates = (
        est.join(exact, "event_type")
        .select(
            (
                F.abs(F.col("est") / F.col("exact_users") - 1.0)
                <= F.lit(0.15)
            ).alias("est_ok")
        )
        .collect()
    )
    assert not any(r.est_ok for r in gates), "crippled sketch passed"


def test_register_count_bounded_by_m(spark):
    regs = hll_registers(_domain(spark, 50_000), [], "k")
    n = regs.count()
    assert n <= 512
    assert regs.agg(F.max("j")).collect()[0][0] <= 511
    assert regs.agg(F.min("r")).collect()[0][0] >= 1
