"""Dedup tiers (exact / MinHash / SimHash / Jaccard) and ANN quality."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from db_migration_spark.catalog import load_table
from db_migration_spark.operators import dedup, similarity


@pytest.fixture(scope="module")
def near_dup_docs(spark):
    """Documents plus perturbed near-copies (one word changed) and one
    exact copy — known ground truth for the dedup tiers."""
    docs = load_table(spark, "/root/testdata/sf0.001", "documents").filter(
        F.col("doc_id") < 40
    )
    copies = docs.filter(F.col("doc_id") < 10).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.regexp_replace("text", r"^\S+", "changedword").alias("text"),
    )
    exact = docs.filter(F.col("doc_id") == 20).select(
        (F.col("doc_id") + 200000).alias("doc_id"), "text"
    )
    return docs.select("doc_id", "text").unionByName(copies).unionByName(exact)


def test_exact_dedup_finds_the_copy(spark, near_dup_docs):
    out = dedup.exact_dedup(near_dup_docs)
    dups = out.filter(F.col("dup_count") > 1).collect()
    assert len(dups) == 1
    assert dups[0]["keep_id"] == 20
    assert out.count() == near_dup_docs.count() - 1


def test_minhash_recovers_planted_pairs(spark, near_dup_docs):
    pairs = dedup.minhash_near_dups(
        near_dup_docs, num_hashes=64, bands=16, threshold=0.5
    ).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    planted = {(i, i + 100000) for i in range(10)} | {(20, 200020)}
    assert planted <= found
    # est_jaccard for the exact copy should be 1.0
    exact = [r for r in pairs if (r["id_a"], r["id_b"]) == (20, 200020)]
    assert exact[0]["est_jaccard"] == 1.0


def test_minhash_estimates_track_exact_jaccard(spark, near_dup_docs):
    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(
            near_dup_docs, threshold=0.5
        ).collect()
    }
    est = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in dedup.minhash_near_dups(
            near_dup_docs, num_hashes=64, bands=16, threshold=0.3
        ).collect()
    }
    common = set(exact) & set(est)
    assert len(common) >= 10
    for k in common:
        assert abs(exact[k] - est[k]) < 0.25  # 64 hashes ≈ ±0.12 std


def test_simhash_exact_copy_is_distance_zero(spark, near_dup_docs):
    hashes = {
        r["doc_id"]: r["simhash"] for r in dedup.simhash(near_dup_docs).collect()
    }
    assert hashes[20] == hashes[200020]
    pairs = dedup.simhash_near_dups(near_dup_docs, max_hamming=3, bands=4)
    found = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs.collect()}
    assert found[(20, 200020)] == 0


def test_lsh_ann_recall_vs_brute_force(spark):
    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = similarity.brute_force_topk(emb, queries, k=5)
    approx = similarity.lsh_topk(
        emb, queries, dim=64, k=5, num_planes=3, num_tables=8
    )
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.5  # 8 tables × 3 planes OR-construction
    # scores the two methods agree on are identical (same expression)
    exact_scores = {(r["query_id"], r["neighbor_id"]): r["score"] for r in exact.collect()}
    for r in approx.collect():
        k = (r["query_id"], r["neighbor_id"])
        if k in exact_scores:
            assert abs(exact_scores[k] - r["score"]) < 1e-12


def test_brute_force_topk_self_excluded_and_ranked(spark):
    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    q = emb.filter(F.col("vec_id") == 0)
    out = similarity.brute_force_topk(emb, q, k=3).collect()
    assert len(out) == 3
    assert all(r["neighbor_id"] != 0 for r in out)
    scores = [r["score"] for r in sorted(out, key=lambda r: r["rank"])]
    assert scores == sorted(scores, reverse=True)


def test_lsh_banding_includes_signature_remainder(spark):
    """num_hashes % bands != 0: the trailing signature elements fold into
    the last band instead of being silently excluded from every band."""
    # 10 hashes, 4 bands → rows_per_band=2, remainder 2 → last band = 7..10.
    # Docs agreeing only on elements 7-8 but differing on 9-10 used to
    # collide in the last band (trailing elements ignored); now they don't.
    sigs = spark.createDataFrame(
        [
            (1, [1, 2, 3, 4, 5, 6, 7, 8, 9, 10]),
            (2, [11, 12, 13, 14, 15, 16, 7, 8, 19, 20]),
        ],
        "doc_id LONG, signature ARRAY<BIGINT>",
    )
    assert dedup.lsh_candidate_pairs(sigs, bands=4).collect() == []
    # identical signatures still collide in every band
    sigs2 = spark.createDataFrame(
        [
            (1, [1, 2, 3, 4, 5, 6, 7, 8, 9, 10]),
            (2, [1, 2, 3, 4, 5, 6, 7, 8, 9, 10]),
        ],
        "doc_id LONG, signature ARRAY<BIGINT>",
    )
    out = dedup.lsh_candidate_pairs(sigs2, bands=4).collect()
    assert [(r["id_a"], r["id_b"]) for r in out] == [(1, 2)]


def test_blocked_cosine_matches_exact(spark):
    """The LSH-blocked embedding near-dup tier must reproduce the exact
    all-pairs result at the declared threshold on the test corpus."""
    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    exact = {
        (r["id_a"], r["id_b"])
        for r in dedup.embedding_cosine_pairs(emb, threshold=0.4).collect()
    }
    blocked = {
        (r["id_a"], r["id_b"])
        for r in dedup.embedding_cosine_pairs_blocked(
            emb, dim=64, threshold=0.4
        ).collect()
    }
    assert blocked == exact and len(exact) > 0


def test_blocked_cosine_high_dim_arrow_path(spark):
    """dim > FLAT_DOT_MAX_DIM must take the Arrow-batched cosine path
    (the flat unpack would exceed JVM codegen limits and silently run
    interpreted): the plan shows ArrowEvalPython, still no
    CartesianProduct, and the result matches a numpy brute force on
    planted high-similarity pairs."""
    import numpy as np

    # any dim above FLAT_DOT_MAX_DIM exercises the same Arrow branch;
    # 320 keeps the LSH bucketing expression ~3× cheaper than the old
    # 1024 (63 s of the r10 suite wall — r10 VERDICT task 2)
    dim, n = 320, 120
    rng = np.random.RandomState(7)
    base = rng.randn(n, dim)
    # plant 8 near-dup pairs: rows 100+i are tiny perturbations of rows i
    for i in range(8):
        base[100 + i] = base[i] + 0.02 * rng.randn(dim)
    rows = [(i, [float(x) for x in base[i]]) for i in range(n)]
    emb = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")

    out = dedup.embedding_cosine_pairs_blocked(
        emb, dim=dim, threshold=0.9
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan, "high-dim verify must be Arrow-batched"
    assert "CartesianProduct" not in plan

    norms = np.linalg.norm(base, axis=1)
    sims = (base @ base.T) / np.outer(norms, norms)
    expect = {
        (a, b): sims[a, b]
        for a in range(n)
        for b in range(a + 1, n)
        if sims[a, b] >= 0.9
    }
    got = {(r["id_a"], r["id_b"]): r["score"] for r in out.collect()}
    # at threshold 0.9 the auto (P, L) targets per-pair miss < 1e-5 —
    # every planted pair must surface, scores equal to numpy's within fp
    # summation-order noise
    assert set(got) == set(expect) and len(expect) >= 8
    for k, v in got.items():
        assert abs(v - expect[k]) < 1e-9


def test_connected_components_path_clique_isolated(spark):
    """Min-label propagation: a 4-node path (needs >1 round), a triangle,
    and a separate pair must each collapse to their smallest id."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        "id_a LONG, id_b LONG",
    )
    out = {r["id"]: r["comp"] for r in dedup.connected_components(edges).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_dedup_survivors_isolated_docs_keep_themselves(spark):
    docs = spark.createDataFrame([(1,), (2,), (3,), (9,)], "doc_id LONG")
    edges = spark.createDataFrame([(1, 2), (2, 3)], "id_a LONG, id_b LONG")
    out = {
        r["doc_id"]: (r["component"], r["is_canonical"])
        for r in dedup.dedup_survivors(docs, edges).collect()
    }
    assert out == {1: (1, True), 2: (1, False), 3: (1, False), 9: (9, True)}


def test_pq_codes_are_layout_independent(spark):
    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    books = similarity.pq_codebooks(emb, n_sub=8, n_codes=16)
    a = {
        r["vec_id"]: tuple(r["codes"])
        for r in similarity.pq_encode(emb, books, n_sub=8).collect()
    }
    b = {
        r["vec_id"]: tuple(r["codes"])
        for r in similarity.pq_encode(
            emb.repartition(7), books, n_sub=8
        ).collect()
    }
    assert a == b
    for codes in a.values():
        assert len(codes) == 8
        assert all(0 <= c < 16 for c in codes)


def test_pq_identical_vectors_get_identical_codes(spark):
    from pyspark.sql import functions as SF

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    dup = emb.filter(SF.col("vec_id") == 0).select(
        SF.lit(99999).cast("long").alias("vec_id"), "embedding", "label"
    )
    both = emb.unionByName(dup)
    books = similarity.pq_codebooks(emb, n_sub=8, n_codes=16)
    codes = {
        r["vec_id"]: tuple(r["codes"])
        for r in similarity.pq_encode(both, books, n_sub=8).collect()
    }
    assert codes[0] == codes[99999]


def test_pq_rerank_recall_on_clustered_fixture(spark):
    import sys

    sys.path.insert(0, "/root/repo")
    from tools.recall_report import clustered_fixture

    emb = clustered_fixture(
        spark, n=800, dim=64, n_clusters=16, spread=0.35
    ).cache()
    queries = emb.filter(F.col("vec_id") < 5)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.brute_force_topk(emb, queries, k=10).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.pq_topk(
            emb, queries, k=10, n_sub=8, n_codes=16, rerank=50
        ).collect()
    }
    # compressed-scan shortlist + exact re-rank: measured 0.98 here
    assert len(exact & approx) / len(exact) >= 0.9


# ---------------------------------------------------------------------------
# Round-6: adversarial acceptance-gate fixtures.  The driver certifies the
# sketch queries via acceptance rows whose booleans the oracle pins TRUE;
# these tests prove the gates are NOT vacuous: planted near-miss pairs sit
# just below the exact threshold (a loosened threshold changes the count),
# and a silently dead sketch turns the recall boolean RED.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def planted_sf_dir(spark, tmp_path_factory):
    """A miniature sf-dir with surgically planted documents/embeddings:
    one exact-duplicate doc pair (Jaccard 1.0), one near-miss pair at
    Jaccard 33/43 ≈ 0.767 (just below the 0.8 contract threshold), and
    8 clustered 64-dim embedding groups of 3 (tight intra-cluster
    cosine ≈ 1, cross-cluster ≈ orthogonal)."""
    d = tmp_path_factory.mktemp("planted")
    base = " ".join(f"w{i}" for i in range(40))
    near_a = " ".join(f"m{i}" for i in range(40))
    near_b = " ".join(
        f"m{i}" if i < 35 else f"x{i}" for i in range(40)
    )
    rows = [
        (1, base), (2, base),          # exact pair: J = 1.0
        (3, near_a), (4, near_b),      # near-miss: J ≈ 0.767 < 0.8
    ] + [
        (10 + j, " ".join(f"u{j}_{i}" for i in range(40)))
        for j in range(8)              # isolated filler docs
    ]
    docs = spark.createDataFrame(
        [(i, t, "en", "synthetic", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.coalesce(1).write.parquet(str(d / "documents.parquet"))
    import random

    rng = random.Random(7)
    vecs = []
    for c in range(8):
        center = [rng.gauss(0, 1) for _ in range(64)]
        for j in range(3):
            vecs.append(
                (
                    c if j == 0 else 100 + c * 10 + j,  # vec_id<8 = queries
                    [float(x + rng.gauss(0, 0.01)) for x in center],
                    c,
                )
            )
    emb = spark.createDataFrame(
        vecs, "vec_id long, embedding array<float>, label int"
    )
    emb.coalesce(1).write.parquet(str(d / "embeddings.parquet"))
    return str(d)


def test_minhash_gate_on_planted_fixture(spark, planted_sf_dir):
    from db_migration_spark.queries import QUERIES

    row = QUERIES["dedup_minhash"](spark, planted_sf_dir).collect()[0]
    # exactly the ONE exact pair — the 0.767 near-miss must NOT count
    # (a silently loosened exact threshold shows up right here)
    assert row.n_exact_hi == 1
    assert row.recall_ok and row.est_err_ok


def test_minhash_gate_goes_red_when_sketch_dies(spark, planted_sf_dir):
    from db_migration_spark.catalog import load_table
    from db_migration_spark.queries import _minhash_acceptance

    docs = load_table(spark, planted_sf_dir, "documents")
    live = dedup.minhash_near_dups(docs, num_hashes=32, bands=8, threshold=0.4)
    row = _minhash_acceptance(docs, live.limit(0)).collect()[0]
    assert row.n_exact_hi == 1
    assert row.recall_ok is False, (
        "a sketch that returns nothing passed the recall gate"
    )


def test_simhash_gate_on_planted_fixture(spark, planted_sf_dir):
    from db_migration_spark.queries import QUERIES

    row = QUERIES["dedup_simhash"](spark, planted_sf_dir).collect()[0]
    assert row.n_exact_hi == 1
    assert row.recall_ok and row.precision_ok


def test_simhash_gate_goes_red_when_sketch_dies(spark, planted_sf_dir):
    from db_migration_spark.catalog import load_table
    from db_migration_spark.queries import _simhash_acceptance

    docs = load_table(spark, planted_sf_dir, "documents")
    live = dedup.simhash_near_dups(docs, max_hamming=3, bands=4)
    row = _simhash_acceptance(docs, live.limit(0)).collect()[0]
    assert row.n_exact_hi == 1
    assert row.recall_ok is False


@pytest.mark.parametrize("qname", ["ann_lsh_topk", "ann_ivf_topk", "ann_pq_topk"])
def test_ann_gates_on_planted_clusters(spark, planted_sf_dir, qname):
    """On the tight-cluster fixture every variant's recall clears the
    bound honestly (intra-cluster neighbors dominate the exact top-k)."""
    from db_migration_spark.queries import QUERIES

    row = QUERIES[qname](spark, planted_sf_dir).collect()[0]
    assert row.n_queries == 8 and row.n_exact > 0
    assert row.recall_ok


def test_ann_gate_goes_red_when_sketch_dies(spark, planted_sf_dir):
    from db_migration_spark.catalog import load_table
    from db_migration_spark.queries import _ann_recall_gate

    emb = load_table(spark, planted_sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    exact = similarity.brute_force_topk(emb, queries, k=10).select(
        "query_id", "neighbor_id"
    )
    row = _ann_recall_gate(exact.limit(0), exact, bound=0.4).collect()[0]
    assert row.n_exact > 0
    assert row.recall_ok is False


def test_hll_and_quantile_gates_are_computed_not_pinned(spark):
    """The a5/a11 acceptance booleans must be COMPUTED comparisons of
    the sketch against the in-query exact side — if someone replaces
    them with lit(True), the sketch function vanishes from the analyzed
    plan and this goes red."""
    from db_migration_spark.queries import QUERIES

    a5 = QUERIES["a5_approx_distinct"](spark, "/root/testdata/sf0.001")
    plan5 = str(a5._jdf.queryExecution().analyzed())
    assert "approx_count_distinct" in plan5
    assert "count(distinct" in plan5.lower()
    a11 = QUERIES["a11_approx_quantiles"](spark, "/root/testdata/sf0.001")
    plan11 = str(a11._jdf.queryExecution().analyzed())
    assert "approx_percentile" in plan11
    assert "percentile" in plan11.replace("approx_percentile", "")
