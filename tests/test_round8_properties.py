"""Property tests for the round-8 operators: Block-Max pruning is
invisible in the answer on random postings stores, the exact-rank
boundary operator matches row_number ground truth under random ties
and bucket widths, and the incremental top-M fold is order-invariant."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

# (doc_id, term_idx, tf, dl) — small vocabulary so lists overlap, dl
# spread so block ceilings vary
posting_rows = st.lists(
    st.tuples(
        st.integers(0, 60),  # doc_id
        st.integers(0, 5),   # term index -> "t0".."t5"
        st.integers(1, 9),   # tf
    ),
    min_size=8,
    max_size=80,
    unique_by=lambda r: (r[0], r[1]),
)


@given(rows=posting_rows, groups=st.integers(2, 6))
@settings(
    max_examples=6, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_blockmax_exact_on_random_stores(spark, tmp_path_factory, rows, groups):
    """blockmax_topk == the unpruned decimal-leaf top-k on ANY store
    layout: random postings, random group count, query = the union of
    terms of the two lowest doc_ids (mixed rare/common by chance)."""
    from db_migration_spark.plans.txlog import TxTable
    from db_migration_spark.queries_search import (
        _dec9,
        blockmax_topk,
        bm25_contrib,
    )

    base = tmp_path_factory.mktemp("bmx")
    dl_of = {}
    data = []
    for d, ti, tf in rows:
        dl_of.setdefault(d, 10 + (d * 37) % 200)
        data.append((f"t{ti}", d, tf, dl_of[d]))
    post = spark.createDataFrame(data, ["term", "doc_id", "tf", "dl"])
    df_ = post.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    post = post.join(df_, "term").select(
        "term", "doc_id", "tf", "dl", "df"
    )
    t = TxTable(str(base / "store"))
    t.commit_append(post)
    t.optimize(spark, sort_key=["term", "doc_id"], target_groups=groups)
    post = t.read(spark)
    n_docs = float(len(dl_of))
    avgdl = sum(dl_of.values()) / n_docs
    c = {"n_docs": n_docs, "avgdl": avgdl}
    contrib = bm25_contrib(n_docs, avgdl)
    ub = post.groupBy("term").agg(F.max(contrib).alias("ub"))
    bub = (
        post.withColumn(
            "grp", F.element_at(F.split(F.input_file_name(), "/"), -2)
        )
        .groupBy("grp", "term")
        .agg(F.max(contrib).alias("bub"))
    )
    probe_docs = sorted(dl_of)[:2]
    q = (
        post.filter(F.col("doc_id").isin(probe_docs))
        .select(F.col("doc_id").alias("query_id"), "term")
        .distinct()
    )
    got = {
        (r.query_id, r.rank): (r.doc_id, r.score)
        for r in blockmax_topk(spark, t, post, c, q, ub, bub, k=5).collect()
    }
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), "doc_id")
    want = {
        (r.query_id, r.rank): (r.doc_id, float(r.score))
        for r in post.join(F.broadcast(q), "term")
        .filter(F.col("doc_id") != F.col("query_id"))
        .groupBy("query_id", "doc_id")
        .agg(F.sum(_dec9(contrib)).alias("score"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select(
            "query_id",
            "doc_id",
            F.col("score").cast("double").alias("score"),
            "rank",
        )
        .collect()
    }
    assert got == want


kv_rows = st.lists(
    st.tuples(st.integers(-50, 50), st.integers(0, 200)),  # (sv, idv)
    min_size=3, max_size=80, unique_by=lambda r: (r[0], r[1]),
)


@given(rows=kv_rows, bits=st.integers(0, 6))
@settings(
    max_examples=8, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_exact_rank_boundaries_random(spark, rows, bits):
    """Any tie structure, any bucket width (including bits=0 — every
    value its own bucket — and bits=6 — nearly one bucket): the
    operator returns exactly the row_number ground truth."""
    from db_migration_spark.operators.relational import (
        exact_rank_boundaries,
    )

    df = spark.createDataFrame(rows, ["sv", "idv"])
    n = len(rows)
    w = Window.orderBy("sv", "idv")
    truth = {
        r.rn: (r.sv, r.idv)
        for r in df.withColumn("rn", F.row_number().over(w)).collect()
    }
    ranks = sorted({1, max(1, n // 2), n})
    got = {
        r["rank"]: (r.sv, r.idv)
        for r in exact_rank_boundaries(
            df, "sv", "idv", ranks, bucket_bits=bits
        ).collect()
    }
    assert got == {r: truth[r] for r in ranks}
