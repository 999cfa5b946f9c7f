"""Property tests for the round-7 second-session operators: the
delta-join IVM rule on random splits, t-closeness vs a Fraction-exact
brute force, PSI term non-negativity, the DSIR stats merge algebra,
and NSW beam-quality monotonicity."""

from __future__ import annotations

from fractions import Fraction

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

from db_migration_spark.catalog import load_table
from db_migration_spark.operators import corpus as C
from db_migration_spark.operators import governance as G

orders_rows = st.lists(
    st.tuples(st.integers(1, 40), st.integers(1, 8)),  # (okey, custkey)
    min_size=1, max_size=25, unique_by=lambda r: r[0],
)
line_rows = st.lists(
    st.tuples(
        st.integers(1, 40),  # l_orderkey
        st.integers(1, 7),   # l_linenumber
        st.integers(1, 10_000),  # cents
    ),
    min_size=1, max_size=60,
    unique_by=lambda r: (r[0], r[1]),
)


@given(o=orders_rows, l=line_rows, om=st.integers(2, 5), lm=st.integers(2, 6))
@settings(
    max_examples=8, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_ivm_join_delta_rule_random_splits(spark, o, l, om, lm):
    """ΔV = γ(ΔO⋈L₀) ⊎ γ(O₀⋈ΔL) ⊎ γ(ΔO⋈ΔL) merged into γ(O₀⋈L₀)
    equals the single-pass γ(O⋈L) for ARBITRARY split predicates."""
    orders = spark.createDataFrame(o, "okey long, ck long")
    li = spark.createDataFrame(l, "lokey long, ln int, cents long")
    o_old = orders.filter(F.col("okey") % om != 0)
    o_dlt = orders.filter(F.col("okey") % om == 0)
    l_old = li.filter(F.col("ln") % lm != 0)
    l_dlt = li.filter(F.col("ln") % lm == 0)

    def view(odf, ldf):
        return (
            odf.join(ldf, F.col("okey") == F.col("lokey"))
            .groupBy("ck")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("cents").alias("cents"),
            )
        )

    parts = (
        view(o_old, l_old)
        .unionByName(view(o_dlt, l_old))
        .unionByName(view(o_old, l_dlt))
        .unionByName(view(o_dlt, l_dlt))
        .groupBy("ck")
        .agg(F.sum("n").alias("n"), F.sum("cents").alias("cents"))
    )
    inc = {r.ck: (r.n, r.cents) for r in parts.collect()}
    batch = {r.ck: (r.n, r.cents) for r in view(orders, li).collect()}
    assert inc == batch


people_rows = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", None]),       # quasi col (incl NULL)
        st.integers(0, 2),                        # quasi col 2
        st.sampled_from(["x", "y", "z"]),        # sensitive
    ),
    min_size=2, max_size=30,
)


@given(rows=people_rows)
@settings(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_t_closeness_matches_fraction_bruteforce(spark, rows):
    df = spark.createDataFrame(
        [(i, z, a, d) for i, (z, a, d) in enumerate(rows)],
        "id int, zip string, age int, dx string",
    )
    audit = {
        (r.zip, r.age): (r.qi_group_n, r.d_num, r.d_den)
        for r in G.t_closeness_audit(df, ["zip", "age"], "dx").collect()
    }
    # brute force with exact Fractions
    from collections import Counter, defaultdict

    glob = Counter(d for (_, _, d) in rows)
    n_tot = len(rows)
    groups = defaultdict(Counter)
    for z, a, d in rows:
        groups[(z, a)][d] += 1
    assert set(audit) == set(groups)
    for key, cnt in groups.items():
        n_g = sum(cnt.values())
        tvd = sum(
            abs(Fraction(cnt.get(v, 0), n_g) - Fraction(glob[v], n_tot))
            for v in glob
        ) / 2
        got_n, d_num, d_den = audit[key]
        assert got_n == n_g
        assert Fraction(d_num, d_den) == tvd
        assert 0 <= d_num <= d_den


def test_psi_terms_nonnegative(spark, sf_dir):
    """(p−q)·ln(p/q) ≥ 0 for every bin; quantization allows −1 nano."""
    from db_migration_spark.queries import QUERIES

    rows = QUERIES["stats_psi_drift"](spark, sf_dir).collect()
    assert rows
    assert all(r.term_nano >= -1 for r in rows)
    by_feat: dict = {}
    for r in rows:
        by_feat[r.feature] = by_feat.get(r.feature, 0) + r.term_nano
    assert all(total >= 0 for total in by_feat.values())


def test_dsir_stats_merge_equals_whole(spark, sf_dir):
    """The streaming-MV algebra as a direct assertion: bucket stats of
    two disjoint halves, folded by per-bucket addition, equal the
    whole-corpus fit bucket-for-bucket."""
    docs = load_table(spark, sf_dir, "documents")
    pred = F.col("lang") == "en"
    whole = {
        r.b: (r.rc, r.tc)
        for r in C.dsir_bucket_stats(
            C.dsir_occurrences(docs), pred
        ).collect()
    }
    halves = [
        C.dsir_bucket_stats(
            C.dsir_occurrences(docs.filter(F.col("doc_id") % 2 == i)),
            pred,
        )
        for i in (0, 1)
    ]
    folded = {
        r.b: (r.rc, r.tc)
        for r in halves[0]
        .unionByName(halves[1])
        .groupBy("b")
        .agg(F.sum("rc").alias("rc"), F.sum("tc").alias("tc"))
        .collect()
    }
    assert folded == whole


def test_nsw_beam_quality_monotone(spark, sf_dir):
    """Each hop's beam keeps the top-W of a SUPERSET of the previous
    beam, so per-query best and W-th-best relevance never decrease."""
    from db_migration_spark.queries_round4 import (
        nsw_beam_search,
        nsw_build_edges,
    )

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    edges = nsw_build_edges(emb).localCheckpoint(eager=False)
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    prev: dict = {}
    for hops in (1, 2, 3):
        beam = nsw_beam_search(emb, edges, q, hops=hops)
        stats = {
            r.query_id: (r.best, r.worst, r.n)
            for r in beam.groupBy("query_id")
            .agg(
                F.max("rel").alias("best"),
                F.min("rel").alias("worst"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        }
        for qid, (best, worst, n) in stats.items():
            if qid in prev:
                pbest, pworst, pn = prev[qid]
                assert best >= pbest
                # the W-th-best only compares when BOTH beams are
                # full-width — a growing beam may lower its minimum
                if n == pn:
                    assert worst >= pworst
                assert n >= pn  # candidate set never shrinks
            prev[qid] = (best, worst, n)
