"""Unit tests for the round-7 additions: join-view IVM, DSIR
importance weights, and NSW graph ANN (the DuckDB oracle gate covers
cross-engine equality; these pin the in-engine invariants)."""

from __future__ import annotations

from pyspark.sql import functions as F

from db_migration_spark.catalog import load_table
from db_migration_spark.operators import corpus as C
from db_migration_spark.queries import QUERIES


def test_ivm_join_delta_equals_batch(spark, sf_dir):
    inc = {
        (r.o_custkey): (r.n_lines, r.rev_cents)
        for r in QUERIES["ivm_join_delta"](spark, sf_dir).collect()
    }
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.floor(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 100
        + F.lit(0.5)
    ).cast("long")
    batch = {
        r.o_custkey: (r.n_lines, r.rev_cents)
        for r in (
            orders.join(
                li, F.col("o_orderkey") == F.col("l_orderkey")
            )
            .groupBy("o_custkey")
            .agg(
                F.count(F.lit(1)).alias("n_lines"),
                F.sum(cents).alias("rev_cents"),
            )
            .collect()
        )
    }
    assert inc == batch


def test_ivm_join_delta_quadrants_nonempty(spark, sf_dir):
    """All three delta terms must carry rows, or the test proves less
    than the delta-join rule."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    o_dlt = orders.filter(F.col("o_orderkey") % 7 == 0)
    o_old = orders.filter(F.col("o_orderkey") % 7 != 0)
    l_dlt = li.filter(F.col("l_linenumber") >= 4)
    l_old = li.filter(F.col("l_linenumber") < 4)
    for o, l in ((o_dlt, l_old), (o_old, l_dlt), (o_dlt, l_dlt)):
        n = o.join(l, F.col("o_orderkey") == F.col("l_orderkey")).count()
        assert n > 0


def test_dsir_weights_favor_target_slice(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    w = C.dsir_weights(docs, F.col("lang") == "en").collect()
    en = [r.w_micro for r in w if r.lang == "en"]
    other = [r.w_micro for r in w if r.lang != "en"]
    assert en and other
    assert sum(en) / len(en) > sum(other) / len(other)


def test_dsir_bigram_counts(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    w = {r.doc_id: r.n_bigrams for r in C.dsir_weights(
        docs, F.col("lang") == "en"
    ).collect()}
    toks = {
        r.doc_id: r.n
        for r in docs.select(
            "doc_id",
            F.size(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias(
                "n"
            ),
        ).collect()
    }
    for doc_id, nb in w.items():
        assert nb == toks[doc_id] - 1


def test_dsir_deterministic(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = sorted(
        C.dsir_weights(docs, F.col("lang") == "en").collect(),
        key=lambda r: r.doc_id,
    )
    b = sorted(
        C.dsir_weights(docs, F.col("lang") == "en").collect(),
        key=lambda r: r.doc_id,
    )
    assert a == b


def test_nsw_answer_invariants(spark, sf_dir):
    rows = QUERIES["ann_nsw_topk"](spark, sf_dir).collect()
    assert rows
    by_q: dict = {}
    for r in rows:
        assert r.neighbor_id != r.query_id
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        rs = sorted(rs, key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        rels = [r.rel for r in rs]
        assert rels == sorted(rels, reverse=True)


def test_nsw_rel_matches_exact_dot(spark, sf_dir):
    """Beam relevance scores equal the fixed-point dot recomputed
    directly for the returned pairs."""
    res = QUERIES["ann_nsw_topk"](spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    qv = emb.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    nv = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("nv"),
    )
    prod = F.zip_with(
        F.col("qv"),
        F.col("nv"),
        lambda x, y: F.floor(
            x.cast("double") * y.cast("double") * F.lit(16777216.0)
            + F.lit(0.5)
        ).cast("long"),
    )
    chk = (
        res.join(qv, "query_id")
        .join(nv, "neighbor_id")
        .select(
            "rel",
            F.aggregate(
                prod, F.lit(0).cast("long"), lambda a, v: a + v
            ).alias("direct"),
        )
        .collect()
    )
    assert chk and all(r.rel == r.direct for r in chk)


def test_nsw_descent_build_quality(spark, sf_dir):
    """NN-descent graph at sf0.001: recovers a solid majority of exact
    kNN edges on random vectors (the adversarial case — see the
    builder's docstring) and serves a full beam answer."""
    from pyspark.sql import functions as F

    from db_migration_spark.queries_round4 import (
        _NSW_K,
        _nsw_answer,
        nsw_beam_search,
        nsw_build_edges,
        nsw_build_edges_descent,
    )

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    exact = nsw_build_edges(emb)
    desc = nsw_build_edges_descent(emb)
    ne = exact.count()
    recovered = exact.join(desc, ["src", "dst"], "left_semi").count()
    assert recovered / ne >= 0.6, (recovered, ne)
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    rows = _nsw_answer(
        nsw_beam_search(emb, desc.localCheckpoint(eager=False), q), emb, q
    ).collect()
    assert len(rows) == 3 * _NSW_K
    # ranks contiguous per query
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r.rank)
    for ranks in by_q.values():
        assert sorted(ranks) == list(range(1, _NSW_K + 1))
