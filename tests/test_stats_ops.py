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
        # n*Sx2 - Sx^2 = n^2 * variance(x) >= 0 (Cauchy-Schwarz);
        # second-order stats cross the boundary as exact decimal strings
        assert int(r.slope_den) >= 0
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


# -- pure-Python cross-checks on seeded random data ------------------------
# (the DuckDB oracle proves cross-engine equality; these prove the MATH —
# an independent textbook implementation of each statistic, the k-core /
# BPE test precedent)


def _spearman_reference(pairs):
    """Textbook Spearman with unique-total-order ranks: pairs is a list
    of (key, x, y); ranks by (x, key) and (y, key)."""
    n = len(pairs)
    rx = {
        k: i + 1
        for i, (k, _, _) in enumerate(
            sorted(pairs, key=lambda p: (p[1], p[0]))
        )
    }
    ry = {
        k: i + 1
        for i, (k, _, _) in enumerate(
            sorted(pairs, key=lambda p: (p[2], p[0]))
        )
    }
    sum_d2 = sum((rx[k] - ry[k]) ** 2 for k, _, _ in pairs)
    return n, sum_d2, n * (n * n - 1) - 6 * sum_d2, n * (n * n - 1)


def test_spearman_matches_pure_python(spark):
    import random

    rng = random.Random(77)
    rows = [
        (i, i % 4, rng.randrange(100), rng.randrange(10_000))
        for i in range(200)
    ]
    df = spark.createDataFrame(
        rows, "key long, grp int, x long, y long"
    )
    from pyspark.sql import Window, functions as F

    wx = Window.partitionBy("grp").orderBy("x", "key")
    wy = Window.partitionBy("grp").orderBy("y", "key")
    ranked = df.select(
        "grp",
        F.row_number().over(wx).alias("rx"),
        F.row_number().over(wy).alias("ry"),
    )
    got = {
        r.grp: (r.n, r.sum_d2)
        for r in ranked.groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                (F.col("rx") - F.col("ry")) * (F.col("rx") - F.col("ry"))
            ).alias("sum_d2"),
        )
        .collect()
    }
    for g in range(4):
        pairs = [(k, x, y) for k, gg, x, y in rows if gg == g]
        n, sum_d2, _, _ = _spearman_reference(pairs)
        assert got[g] == (n, sum_d2)


def _mann_whitney_reference(values):
    """Textbook average-rank U: values is a list of (v, is_a)."""
    sv = sorted(v for v, _ in values)
    # average rank per value (1-based)
    from collections import Counter

    cnt = Counter(sv)
    first = {}
    run = 1
    for v in sorted(cnt):
        first[v] = run
        run += cnt[v]
    r1_x2 = sum(
        2 * first[v] + cnt[v] - 1 for v, is_a in values if is_a
    )
    n1 = sum(1 for _, is_a in values if is_a)
    n2 = len(values) - n1
    return n1, n2, r1_x2, r1_x2 - n1 * (n1 + 1)


def test_mann_whitney_matches_pure_python(spark):
    import random

    rng = random.Random(13)
    # heavy ties: values drawn from a small domain
    vals = [(rng.randrange(12), rng.random() < 0.4) for _ in range(300)]
    df = spark.createDataFrame(
        [(v, a) for v, a in vals], "v long, is_a boolean"
    )
    from pyspark.sql import Window, functions as F

    per_v = df.groupBy("v").agg(
        F.count(F.lit(1)).alias("c_all"),
        F.sum(F.col("is_a").cast("long")).alias("c_a"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    ranked = per_v.withColumn(
        "cum_below", F.coalesce(F.sum("c_all").over(w), F.lit(0))
    )
    row = ranked.agg(
        F.sum("c_a").alias("n1"),
        (F.sum("c_all") - F.sum("c_a")).alias("n2"),
        F.sum(
            F.col("c_a") * (2 * F.col("cum_below") + F.col("c_all") + 1)
        ).alias("r1_x2"),
    ).head()
    n1, n2, r1_x2, u1_x2 = _mann_whitney_reference(vals)
    assert (row.n1, row.n2, row.r1_x2) == (n1, n2, r1_x2)
    assert row.r1_x2 - row.n1 * (row.n1 + 1) == u1_x2


def test_approx_quantiles_rank_error_bound(spark):
    # the query is now self-certifying: each approximate quartile is
    # compared in-query against the exact percentile and the acceptance
    # booleans must all come out TRUE (the oracle pins the same)
    rows = QUERIES["a11_approx_quantiles"](spark, SF).collect()
    assert rows, "a11 returned no groups"
    for r in rows:
        assert r.q25_ok and r.q50_ok and r.q75_ok, (
            r.l_returnflag, r.q25_ok, r.q50_ok, r.q75_ok
        )
        assert r.n > 0


def test_modularity_bounds(spark):
    rows = QUERIES["graph_modularity"](spark, SF).collect()
    assert rows
    q_den = rows[0].q_den
    total_q_num = sum(r.q_num_c for r in rows)
    # Q in [-1/2, 1)
    assert -q_den // 2 <= total_q_num < q_den
    m2 = 0
    for r in rows:
        assert 0 <= 2 * r.l_c <= r.d_c  # intra-edges bounded by degrees
        m2 += r.d_c
    # sum of community degree sums = 2m
    import math

    assert m2 * m2 <= 4 * rows[0].q_den  # (2m)^2 == q_den * ... sanity


def test_cusum_zero_at_endpoints(spark):
    rows = QUERIES["ts_cusum_changepoint"](spark, SF).collect()
    assert rows
    for r in rows:
        # deviation at t=n is exactly 0, so max >= 0 and the statistic
        # is bounded by n * sum|v| (loose sanity)
        assert r.max_dev_xn >= 0
        assert r.max_dev_xn <= r.n * abs(r.total_micro) + r.n * 10**12


def test_ktruss_matches_pure_python(spark):
    """4-truss peel vs an independent pure-Python implementation on the
    same sf0.001 co-purchase graph (the k-core precedent)."""
    from collections import defaultdict

    from pyspark.sql import functions as F

    li = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .collect()
    )
    by_order = defaultdict(list)
    for r in li:
        by_order[r.l_orderkey].append(r.l_partkey)
    weights = defaultdict(int)
    for parts in by_order.values():
        ps = sorted(set(parts))
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                weights[(ps[i], ps[j])] += 1
    edges = {e for e, w in weights.items() if w >= 2}

    def peel(edges):
        while True:
            adj = defaultdict(set)
            for u, v in edges:
                adj[u].add(v)
                adj[v].add(u)
            support = {}
            for u, v in edges:
                support[(u, v)] = len(adj[u] & adj[v])
            keep = {e for e in edges if support[e] >= 2}
            if keep == edges:
                return edges, support
            edges = keep

    want_edges, want_support = peel(edges)
    row = QUERIES["graph_ktruss"](spark, SF).collect()[0]
    assert row.n_edges == len(want_edges)
    want_nodes = {n for e in want_edges for n in e}
    assert row.n_nodes == len(want_nodes)
    if want_edges:
        assert row.total_support == sum(
            want_support[e] for e in want_edges
        )
    else:
        assert not row.total_support


def test_gini_matches_pure_python(spark):
    rows = QUERIES["stats_gini_inequality"](spark, SF).collect()
    cust = {
        r.c_custkey: r.c_mktsegment
        for r in spark.read.parquet(f"{SF}/customer.parquet").collect()
    }
    import math
    from collections import defaultdict

    vals = defaultdict(list)
    for r in spark.read.parquet(f"{SF}/orders.parquet").collect():
        vals[cust[r.o_custkey]].append(
            math.floor(r.o_totalprice * 100)
        )
    for r in rows:
        xs = sorted(vals[r.c_mktsegment])
        n = len(xs)
        # O(n) pairwise |xi-xj| via the sorted prefix identity
        pref = 0
        total = 0
        for i, x in enumerate(xs):
            total += 2 * (x * i - pref)
            pref += x
        assert int(r.absdiff_num) == total
        assert r.n == n and r.total_cents == sum(xs)


def test_cusum_matches_pure_python(spark):
    rows = {
        r.user_id: r
        for r in QUERIES["ts_cusum_changepoint"](spark, SF).collect()
    }
    import math
    from collections import defaultdict

    series = defaultdict(list)
    for r in (
        spark.read.parquet(f"{SF}/events.parquet")
        .selectExpr(
            "user_id",
            "CAST(ts AS TIMESTAMP) AS ts",
            "event_id",
            "value",
        )
        .collect()
    ):
        series[r.user_id].append((r.ts, r.event_id, r.value))
    for uid, evs in series.items():
        vs = [
            math.floor(v * 1000000)
            for _, _, v in sorted(evs, key=lambda e: (e[0], e[1]))
        ]
        n, total = len(vs), sum(vs)
        prefix = 0
        best = 0
        for t, v in enumerate(vs, start=1):
            prefix += v
            best = max(best, abs(n * prefix - t * total))
        r = rows[uid]
        assert (r.n, r.total_micro, r.max_dev_xn) == (n, total, best)


def test_concurrent_intervals_carries_month_start_plateau(spark):
    # a month with only negative deltas must report the carried-in
    # value (previous month's end) as its max, not the post-drop value
    rows = sorted(
        QUERIES["ts_concurrent_intervals"](spark, SF).collect(),
        key=lambda r: r.month,
    )
    for prev, cur in zip(rows, rows[1:]):
        assert cur.max_open >= prev.eom_open  # plateau carried
        assert cur.max_open >= cur.eom_open


# ---------------------------------------------------------------------------
# round-4 batch: KS two-sample, Kendall tau, label propagation
# ---------------------------------------------------------------------------


def _ks_reference(pairs):
    """pairs = [(cents, is_urgent)] → (n1, n2, d_num, v_at_max)."""
    from collections import Counter

    ca, cb = Counter(), Counter()
    for v, is_a in pairs:
        (ca if is_a else cb)[v] += 1
    n1, n2 = sum(ca.values()), sum(cb.values())
    cum_a = cum_b = 0
    best, best_v = -1, None
    for v in sorted(set(ca) | set(cb)):
        cum_a += ca[v]
        cum_b += cb[v]
        d = abs(n2 * cum_a - n1 * cum_b)
        if d > best:
            best, best_v = d, v
    return n1, n2, best, best_v


def test_ks_test_matches_pure_python(spark):
    import math

    from db_migration_spark.catalog import load_table

    rows = {r.c_mktsegment: r for r in QUERIES["stats_ks_test"](spark, SF).collect()}
    assert rows
    cust = load_table(spark, SF, "customer").select("c_custkey", "c_mktsegment")
    orders = load_table(spark, SF, "orders")
    joined = orders.join(
        cust, orders.o_custkey == cust.c_custkey
    ).select("c_mktsegment", "o_totalprice", "o_orderpriority").collect()
    by_seg = {}
    for r in joined:
        by_seg.setdefault(r.c_mktsegment, []).append(
            (math.floor(r.o_totalprice * 100), r.o_orderpriority == "1-URGENT")
        )
    for seg, pairs in by_seg.items():
        n1, n2, d_num, v_at = _ks_reference(pairs)
        r = rows[seg]
        assert (r.n1, r.n2, r.d_num, r.v_at_max) == (n1, n2, d_num, v_at)
        # D = d_num/(n1*n2) must lie in [0, 1]
        assert 0 <= r.d_num <= r.n1 * r.n2


def test_kendall_tau_pair_identities(spark):
    r = QUERIES["stats_kendall_tau"](spark, SF).collect()[0]
    # every unordered pair is classified exactly once
    assert r.n_concordant + r.n_discordant + r.n_tied == r.n_pairs
    assert r.tau_num == r.n_concordant - r.n_discordant
    assert abs(r.tau_num) <= r.n_pairs
    # 25 nations with 1995/1996 orders at this SF -> C(k,2) pairs
    k = (1 + int((1 + 8 * r.n_pairs) ** 0.5)) // 2
    assert r.n_pairs == k * (k - 1) // 2


def _lpa_reference(edges, rounds=3):
    """Sync LPA, most-frequent neighbor label, ties -> smallest label."""
    from collections import defaultdict

    adj = defaultdict(set)
    for lo, hi in edges:
        adj[lo].add(hi)
        adj[hi].add(lo)
    lab = {v: v for v in adj}
    for _ in range(rounds):
        nxt = {}
        for v, nbrs in adj.items():
            cnt = defaultdict(int)
            for u in nbrs:
                cnt[lab[u]] += 1
            nxt[v] = min(cnt, key=lambda c: (-cnt[c], c))
        lab = nxt
    return lab


def test_label_propagation_matches_pure_python(spark):
    from db_migration_spark.queries_stats import _copurchase_edges

    got = {
        r.node: r.community
        for r in QUERIES["graph_label_propagation"](spark, SF).collect()
    }
    edges = [
        (r.lo, r.hi) for r in _copurchase_edges(spark, SF).collect()
    ]
    want = _lpa_reference(edges)
    assert got == want
    # communities shrink (or hold) vs the singleton start
    assert len(set(got.values())) <= len(got)


def test_kmeans_step_matches_pure_python(spark):
    import math

    from db_migration_spark.catalog import load_table

    rows = QUERIES["emb_kmeans_step"](spark, SF).collect()
    got = {(r.cid, r.i): (r.n_members, r.sum_q) for r in rows}
    vecs = {
        r.vec_id: [math.floor(float(x) * 1000 + 0.5) for x in r.embedding]
        for r in load_table(spark, SF, "embeddings").collect()
    }
    cents = {cid: vecs[cid] for cid in range(8)}
    want = {}
    n_assigned = 0
    for vid, q in vecs.items():
        best = min(
            cents,
            key=lambda c: (
                sum((a - b) ** 2 for a, b in zip(q, cents[c])),
                c,
            ),
        )
        n_assigned += 1
        for i, v in enumerate(q):
            n, s = want.get((best, i), (0, 0))
            want[(best, i)] = (n + 1, s + v)
    assert got == want
    # every vector assigned exactly once: member counts at dim 0 sum to |corpus|
    assert sum(n for (c, i), (n, _) in got.items() if i == 0) == n_assigned
