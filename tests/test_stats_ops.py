"""Unit tests for the statistics/graph-metric batch (session 8):
Spearman bounds, OLS sufficient-statistic identities, Mann-Whitney
rank-sum invariants, clustering-coefficient range, Jaccard bounds,
EWMA weight algebra, rolling-correlation Cauchy-Schwarz."""

from __future__ import annotations

from db_migration_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def test_spearman_rho_in_range(spark):
    rows = QUERIES["stats_spearman"](spark, SF).collect()
    assert rows
    for r in rows:
        # rho = rho_num/rho_den must lie in [-1, 1]:
        # |rho_num| <= rho_den, with rho_den = n(n^2-1) > 0 for n >= 2
        if r.n >= 2:
            assert r.rho_den == r.n * (r.n * r.n - 1)
            assert -r.rho_den <= r.rho_num <= r.rho_den


def test_linreg_denominator_nonneg(spark):
    rows = QUERIES["stats_linreg"](spark, SF).collect()
    assert rows
    for r in rows:
        # n*Sx2 - Sx^2 = n^2 * variance(x) >= 0 (Cauchy-Schwarz)
        assert r.slope_den >= 0
        # sums are consistent: Sx <= n * max_cents(50.00 * 100) and the
        # slope is a finite ratio (synthetic price is independent of
        # quantity, so no sign assumption)
        assert r.sx <= r.n * 5_000_00


def test_mann_whitney_u_bounds(spark):
    rows = QUERIES["stats_mann_whitney"](spark, SF).collect()
    assert rows
    for r in rows:
        # 0 <= U1 <= n1*n2  (doubled invariant)
        assert 0 <= r.u1_x2 <= 2 * r.n1 * r.n2
        # rank sum of ALL doubled = n(n+1); group A's portion bounded
        n = r.n1 + r.n2
        assert r.r1_x2 <= n * (n + 1)


def test_clustering_coeff_range_and_order(spark):
    rows = QUERIES["graph_clustering_coeff"](spark, SF).collect()
    assert rows
    ppms = [r.cc_ppm for r in rows]
    assert ppms == sorted(ppms, reverse=True)
    for r in rows:
        assert 0 <= r.cc_ppm <= 1_000_000
        # tri_v <= C(d, 2)
        assert 2 * r.tri <= r.d * (r.d - 1)


def test_jaccard_linkpred_bounds(spark):
    rows = QUERIES["graph_jaccard_linkpred"](spark, SF).collect()
    for r in rows:
        assert 0 < r.cn <= r.union_d
        assert 0 <= r.jac_ppm <= 1_000_000


def test_ewma_weight_algebra(spark):
    rows = QUERIES["ts_ewma"](spark, SF).limit(500).collect()
    assert rows
    for r in rows:
        # denominator is a suffix sum of 2^k: full history -> 255
        assert 1 <= r.ewma_den <= 255
        # a constant series would give num == v * den; bound the average
        # by the min/max possible weight reallocation instead: the EWMA
        # numerator is a weighted sum, so |num| <= den * max|lag|; with
        # only this row's value visible assert the full-history case is
        # internally consistent (num/den between global min and max is
        # checked by the oracle; here: den=255 implies 8 lags present)
        if r.ewma_den == 255:
            assert r.ewma_num is not None


def test_rolling_corr_cauchy_schwarz(spark):
    rows = QUERIES["ts_rolling_corr"](spark, SF).collect()
    assert rows
    for r in rows:
        # (n*Sxy - SxSy)^2 <= (n*Sx2 - Sx^2)(n*Sy2 - Sy^2)
        assert r.corr_num * r.corr_num <= r.varx_num * r.vary_num
        assert r.varx_num >= 0 and r.vary_num >= 0
        assert 1 <= r.n <= 24


def test_attr_stats_consistency(spark):
    rows = {r.a: r for r in QUERIES["eav_attr_stats"](spark, SF).collect()}
    assert set(rows) == {
        "l_quantity", "l_returnflag", "l_linestatus", "l_shipdate"
    }
    for r in rows.values():
        assert r.n_values <= r.n_datoms
        assert r.n_entities <= r.n_datoms
        assert r.min_v <= r.max_v
    # card-one flags have tiny value domains
    assert rows["l_returnflag"].n_values <= 3
    assert rows["l_linestatus"].n_values <= 2


def test_percentile_cont_monotone_and_bounded(spark):
    rows = QUERIES["a10_percentile_cont"](spark, SF).collect()
    by_group = {}
    for r in rows:
        by_group.setdefault(r.l_returnflag, {})[r.k] = r.p4_cents
    for g, qs in by_group.items():
        assert set(qs) == {1, 2, 3}
        # quartiles are monotone non-decreasing
        assert qs[1] <= qs[2] <= qs[3]
