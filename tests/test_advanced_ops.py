"""Unit tests for the advanced relational + mining batch (session 7):
recursive CTE semantics, association-rule invariants, RFM tile
determinism, OHLC boundary selection, k-core fixpoint properties."""

from __future__ import annotations

from pyspark.sql import functions as F

from db_migration_spark.queries import QUERIES
from db_migration_spark.queries_advanced import KCORE_K

SF = "/root/testdata/sf0.001"


def test_recursive_cte_depth_is_digit_count(spark):
    # parent(k) = k // 10 over a dense key range means depth(k) is the
    # number of decimal digits minus one (root is key 0 or a sub-10 key)
    out = {r.depth: r for r in QUERIES["sql_recursive_cte"](spark, SF).collect()}
    assert 0 in out
    total = sum(r.n_nodes for r in out.values())
    n_keys = (
        spark.read.parquet(f"{SF}/customer.parquet")
        .select("c_custkey")
        .distinct()
        .count()
    )
    # every key appears exactly once in the walk (unique root/depth path)
    assert total == n_keys
    # root is key 0 (its own parent); keys 1-9 hang off it at depth 1,
    # so depth d > 0 holds exactly the d-digit keys
    for d, r in out.items():
        if d > 0:
            assert r.min_key >= 10 ** (d - 1)
            assert r.max_key < 10**d


def test_assoc_rules_counts_are_consistent(spark):
    rows = QUERIES["assoc_rules"](spark, SF).collect()
    for r in rows:
        # pair support can never exceed either single-item support
        assert r.pair_cnt <= min(r.cnt1, r.cnt2)
        assert r.p1 < r.p2
        assert r.lift_den == r.cnt1 * r.cnt2


def test_rfm_tiles_partition_customers(spark):
    rows = QUERIES["rfm_segments"](spark, SF).collect()
    n_cust = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert sum(r.n_customers for r in rows) == n_cust
    for r in rows:
        assert 1 <= r.r_tile <= 4
        assert 1 <= r.f_tile <= 4
        assert 1 <= r.m_tile <= 4


def test_ohlc_open_close_are_boundary_values(spark):
    out = QUERIES["ts_ohlc_bars"](spark, SF)
    rows = out.collect()
    ev = spark.read.parquet(f"{SF}/events.parquet")
    # spot-check one bar against a direct sort
    r = sorted(rows, key=lambda x: (str(x.bar_ts), x.event_type))[0]
    got = (
        ev.filter(
            (F.date_trunc("hour", F.col("ts").cast("timestamp")) == r.bar_ts)
            & (F.col("event_type") == r.event_type)
        )
        .orderBy("ts", "event_id")
        .select("value")
        .collect()
    )
    assert got[0].value == r.open
    assert got[-1].value == r.close
    assert max(g.value for g in got) == r.high
    assert min(g.value for g in got) == r.low
    assert len(got) == r.n_trades
    for r in rows:
        assert r.low <= r.open <= r.high
        assert r.low <= r.close <= r.high


def test_kcore_every_member_meets_degree_floor(spark):
    rows = QUERIES["graph_kcore"](spark, SF).collect()
    # defining property of the k-core: induced degree >= k for every node
    for r in rows:
        assert r.core_deg >= KCORE_K


def test_ab_arms_cover_all_users(spark):
    r = QUERIES["stats_ab_test"](spark, SF).collect()[0]
    n_users = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("user_id")
        .distinct()
        .count()
    )
    assert r.n0 + r.n1 == n_users
    assert r.pooled_x == r.x0 + r.x1
    assert r.delta_num == r.x0 * r.n1 - r.x1 * r.n0


def test_resample_kernel_exact_cases():
    from db_migration_spark.multimodal.audio_ops import resample_linear_scaled

    # 2x upsample: even positions hit sources exactly, odd are midpoints
    out = resample_linear_scaled([0, 10, -20], 8000, 16000)
    # scaled by dst=16000; length = 2*2+1
    assert len(out) == 5
    assert out[0] == 0
    assert out[1] == 16000 * 0 + (10 - 0) * 8000  # midpoint of 0,10
    assert out[2] == 16000 * 10
    assert out[3] == 16000 * 10 + (-20 - 10) * 8000
    assert out[4] == 16000 * -20  # endpoint clamps
    # identity rate is a no-op (scaled)
    same = resample_linear_scaled([3, -7, 11], 8000, 8000)
    assert same == [8000 * 3, 8000 * -7, 8000 * 11]


def test_bmp_roundtrip_pixels_exact():
    from db_migration_spark.multimodal.bmp_codec import (
        decode_bmp_pixels,
        encode_bmp_rgb,
    )

    # non-multiple-of-4 row width exercises padding; gradient exercises
    # bottom-up + BGR ordering
    w, h = 5, 3
    pix = bytes((7 * x + 13 * y + c) % 256 for y in range(h) for x in range(w) for c in range(3))
    dw, dh, ch, out = decode_bmp_pixels(encode_bmp_rgb(w, h, pix))
    assert (dw, dh, ch) == (w, h, 3)
    assert bytes(out) == pix


def test_nn_resize_identity_and_downsample():
    from db_migration_spark.multimodal.image_ops import nn_resize

    pix = bytes(range(4 * 2 * 3))  # 4x2 RGB
    assert bytes(nn_resize(pix, 4, 2, 3, 4, 2)) == pix
    half = nn_resize(pix, 4, 2, 3, 2, 1)
    # (0,0)->src(0,0), (1,0)->src(2,0)
    assert bytes(half) == pix[0:3] + pix[6:9]


def test_image_phash_finds_planted_variants(spark):
    rows = QUERIES["dedup_image_phash"](spark, SF).collect()
    pairs = {(r.id_a, r.id_b): r.hamming for r in rows}
    nations = (
        spark.read.parquet(f"{SF}/nation.parquet").count()
    )
    # every planted (k, k+1000) perturbed pair must be found, hamming<=3
    for k in range(nations):
        assert (k, k + 1000) in pairs
        assert 0 < pairs[(k, k + 1000)] <= 3


def test_skyline_is_exactly_the_undominated_set(spark):
    out = {
        (r.status, r.o_orderkey): (str(r.odate), r.cents)
        for r in QUERIES["orders_skyline"](spark, SF).collect()
    }
    pts = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .filter(F.col("o_orderkey") % 7 == 0)
        .select(
            "o_orderstatus",
            "o_orderkey",
            F.col("o_orderdate").cast("date").cast("string").alias("d"),
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
            .cast("long")
            .alias("c"),
        )
        .collect()
    )
    by_status: dict = {}
    for r in pts:
        by_status.setdefault(r.o_orderstatus, []).append(r)
    expected = set()
    for st, rows in by_status.items():
        for r in rows:
            dominated = any(
                (q.d >= r.d and q.c >= r.c and (q.d > r.d or q.c > r.c))
                for q in rows
            )
            if not dominated:
                expected.add((st, r.o_orderkey))
    assert set(out) == expected


def test_setops_all_multiset_arithmetic(spark):
    rows = QUERIES["u6_setops_all"](spark, SF).collect()
    got = {(r.op, r.v): r.n for r in rows}
    o = spark.read.parquet(f"{SF}/orders.parquet")
    a = {
        r.o_orderpriority: r["count"]
        for r in o.filter(F.col("o_orderstatus") == "O")
        .groupBy("o_orderpriority")
        .count()
        .collect()
    }
    b = {
        r.o_orderpriority: r["count"]
        for r in o.filter(F.col("o_orderstatus") == "F")
        .groupBy("o_orderpriority")
        .count()
        .collect()
    }
    for v in set(a) | set(b):
        inter = min(a.get(v, 0), b.get(v, 0))
        exc = max(0, a.get(v, 0) - b.get(v, 0))
        assert got.get(("intersect_all", v), 0) == inter
        assert got.get(("except_all", v), 0) == exc


def test_kcore_matches_reference_peel_on_random_graphs(spark):
    """Operator vs a pure-Python peel on small seeded random graphs."""
    from db_migration_spark.queries_advanced import KCORE_K

    def py_kcore(edges, k):
        edges = set(edges)
        while True:
            deg: dict = {}
            for u, v in edges:
                deg[u] = deg.get(u, 0) + 1
                deg[v] = deg.get(v, 0) + 1
            keep = {n for n, d in deg.items() if d >= k}
            nxt = {(u, v) for u, v in edges if u in keep and v in keep}
            if nxt == edges:
                return deg if all(d >= k for d in deg.values()) else {
                    n: d for n, d in deg.items() if n in keep
                }
            edges = nxt

    for seed in (3, 17, 99):
        # deterministic pseudo-random graph on 30 nodes
        edges = sorted(
            {
                (min(a, b), max(a, b))
                for i in range(150)
                for a in [(i * i + seed) % 30]
                for b in [(i * 3 + seed * 7 + 1) % 30]
                if a != b
            }
        )
        df = spark.createDataFrame(edges, ["u", "v"])
        # run the same peel loop the operator uses, inlined on this edge df
        from pyspark.sql import functions as SF

        cur = df.localCheckpoint()
        for _i in range(20):
            sym = cur.union(cur.select(SF.col("v").alias("u"), SF.col("u").alias("v")))
            deg = sym.groupBy("u").agg(SF.count(SF.lit(1)).alias("deg"))
            keep = deg.filter(SF.col("deg") >= KCORE_K).select("u")
            nxt = (
                cur.join(keep, "u", "left_semi")
                .join(keep.select(SF.col("u").alias("v")), "v", "left_semi")
                .select("u", "v")
                .localCheckpoint()
            )
            if nxt.count() == cur.count():
                cur = nxt
                break
            cur = nxt
        sym = cur.union(cur.select(SF.col("v").alias("u"), SF.col("u").alias("v")))
        got = {
            r["u"]: r["deg"]
            for r in sym.groupBy("u").agg(SF.count(SF.lit(1)).alias("deg")).collect()
        }
        # reference peel: survivors-only degree map
        want_full = py_kcore(edges, KCORE_K)
        want = {n: d for n, d in want_full.items() if d >= KCORE_K}
        assert got == want, f"seed {seed}"


def test_compaction_reduces_file_count(spark):
    QUERIES["sink_compaction_roundtrip"](spark, SF).collect()
    import glob

    from db_migration_spark.queries_e2e import _fx

    frag = glob.glob(_fx(SF, "orders_fragmented") + "/part-*")
    comp = glob.glob(_fx(SF, "orders_compacted") + "/part-*")
    assert len(frag) > len(comp)
    assert len(comp) <= 4


def test_recursive_cte_leaves_session_conf_untouched(spark):
    """The recursion row-limit valve must be scoped to the query's own
    cloned session — constructing AND executing the query may not mutate
    the caller's session conf (round-3 ADVICE / verdict #5)."""
    key = "spark.sql.cteRecursionRowLimit"
    before = spark.conf.get(key, None)
    QUERIES["sql_recursive_cte"](spark, SF).collect()
    assert spark.conf.get(key, None) == before


# ---------------------------------------------------------------------------
# fact-scale twins (round-8 verdict task 4)
# ---------------------------------------------------------------------------


def test_ntile_cut_ranks_matches_sql_ntile(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from db_migration_spark.operators.relational import ntile_cut_ranks

    for n in (1, 2, 3, 4, 7, 10, 100, 101):
        bs = ntile_cut_ranks(n, 4)
        df = spark.range(1, n + 1).select(F.col("id").alias("v"))
        w = Window.orderBy("v")
        want = {
            r.v: r.t
            for r in df.select(
                "v", F.ntile(4).over(w).alias("t")
            ).collect()
        }
        for rn in range(1, n + 1):
            got = 1 + sum(1 for b in bs if rn > b)
            assert got == want[rn], (n, rn, got, want[rn])


def test_exact_rank_boundaries_vs_row_number(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from db_migration_spark.operators.relational import (
        exact_rank_boundaries,
    )

    # adversarial ties: few distinct sort values, many ids
    rows = [(i % 7, i * 13 % 101) for i in range(101)]
    df = spark.createDataFrame(rows, ["sv", "idv"]).dropDuplicates(
        ["sv", "idv"]
    )
    n = df.count()
    w = Window.orderBy("sv", "idv")
    truth = {
        r.rn: (r.sv, r.idv)
        for r in df.withColumn("rn", F.row_number().over(w)).collect()
    }
    ranks = [1, n // 3, n // 2, n - 1, n]
    got = {
        r["rank"]: (r.sv, r.idv)
        for r in exact_rank_boundaries(
            df, "sv", "idv", ranks, bucket_bits=1
        ).collect()
    }
    assert got == {r: truth[r] for r in ranks}


def test_factscale_twins_equal_window_variants(spark):
    from db_migration_spark.queries import QUERIES

    sf = "/root/testdata/sf0.001"

    def rows(name):
        return {
            tuple(r)
            for r in QUERIES[name](spark, sf).collect()
        }

    assert rows("rfm_segments_factscale") == rows("rfm_segments")
    assert rows("orders_abc_factscale") == rows("orders_abc_pareto")


def test_factscale_plans_have_no_global_per_row_window(spark):
    import contextlib
    import io

    from db_migration_spark.queries import QUERIES

    for name in ("rfm_segments_factscale", "orders_abc_factscale"):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            QUERIES[name](spark, "/root/testdata/sf0.001").explain(
                "formatted"
            )
        plan = buf.getvalue()
        # no ntile / no running total over the raw keyed relation: every
        # surviving Window is either over the COLLAPSED bucket domain
        # (input of a HashAggregate output) or bucket-partitioned
        assert "ntile(" not in plan
        for line in plan.splitlines():
            if "windowspecdefinition" in line and "ASC NULLS FIRST" in line:
                # per-row windows must be bucket-partitioned: the spec's
                # partition list is printed as the trailing argument —
                # an un-partitioned per-row sort would carry the raw
                # sort columns with a SinglePartition exchange upstream
                assert "bkt" in line or "cum_below" in line or "c#" in line, line
