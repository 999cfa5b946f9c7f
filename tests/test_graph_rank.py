"""Fixed-point PageRank tests (operators/graph.py)."""

from __future__ import annotations

from db_migration_spark.operators.graph import SCALE, pagerank


def _run(spark, edges, nodes, iters):
    e = spark.createDataFrame(edges, "src long, dst long")
    n = spark.createDataFrame([(x,) for x in nodes], "node long")
    out = pagerank(e, n, iterations=iters)
    return {r["node"]: r["rank"] for r in out.collect()}


def _reference(edges, nodes, iters, damping_pct=85):
    """Independent pure-Python mirror of the integer recurrence."""
    e = sorted(set(edges))
    deg = {}
    for s, _ in e:
        deg[s] = deg.get(s, 0) + 1
    r = {v: SCALE for v in nodes}
    tele = (100 - damping_pct) * SCALE // 100
    for _ in range(iters):
        s = {v: 0 for v in nodes}
        for u, v in e:
            s[v] += r[u] // deg[u]
        r = {v: tele + (damping_pct * s[v]) // 100 for v in nodes}
    return r


def test_cycle_is_exact_fixed_point(spark):
    # A->B->C->A with uniform start: r' = 0.15S + 0.85S = S every round
    edges = [(1, 2), (2, 3), (3, 1)]
    got = _run(spark, edges, [1, 2, 3], iters=4)
    assert got == {1: SCALE, 2: SCALE, 3: SCALE}


def test_matches_python_reference_on_asymmetric_graph(spark):
    edges = [(1, 2), (3, 2), (2, 4), (4, 1), (4, 3), (5, 1)]
    nodes = [1, 2, 3, 4, 5, 6]  # 6 is isolated -> teleport only
    for iters in (1, 3, 5):
        got = _run(spark, edges, nodes, iters)
        assert got == _reference(edges, nodes, iters)
    assert got[6] == 15 * SCALE // 100


def test_duplicate_edges_count_once(spark):
    got_dup = _run(spark, [(1, 2), (1, 2), (2, 1)], [1, 2], 3)
    got_one = _run(spark, [(1, 2), (2, 1)], [1, 2], 3)
    assert got_dup == got_one


def test_dangling_node_leaks_mass(spark):
    # 2 has no out-edges: its mass vanishes; 1 keeps only teleport after
    # round 1 — exactly the simple-formulation semantics the docstring
    # (and the SQL oracle) state
    got = _run(spark, [(1, 2)], [1, 2], 2)
    ref = _reference([(1, 2)], [1, 2], 2)
    assert got == ref
    assert got[1] == 15 * SCALE // 100


def test_mmr_prefers_diverse_over_redundant(spark, tmp_path):
    """Planted pool: the query's two most-relevant candidates are
    identical twins; plain top-2 takes both, MMR's step 2 must skip
    the redundant twin for the diverse third candidate."""
    import os

    from db_migration_spark.queries_round4 import q_emb_mmr_diversify

    def v(*xs):
        return [float(x) for x in xs] + [0.0] * (64 - len(xs))

    rows = [
        (0, v(1, 0, 0, 0)),            # probe 0 (vec_id < 3 are probes)
        (1, v(0, 1, 0, 0)),            # probe filler
        (2, v(0, 0, 1, 0)),            # probe filler
        (10, v(1.0, 0.3, 0, 0)),       # top rel for probe 0
        (11, v(1.0, 0.3, 0, 0)),       # identical twin of 10
        (12, v(0.7, -0.7, 0, 0)),      # diverse, decent rel
        (13, v(0.2, 0, 0.5, 0)),       # diverse, weak
        (14, v(0.1, 0.2, 0.1, 0.2)),
        (15, v(0.05, 0.05, 0.05, 0.05)),
    ]
    df = spark.createDataFrame(
        [(i, e, 0) for i, e in rows],
        "vec_id long, embedding array<float>, label int",
    )
    d = str(tmp_path / "emb")
    os.makedirs(d)
    df.write.parquet(os.path.join(d, "embeddings.parquet"))
    got = {
        (r.query_id, r.step): r.neighbor_id
        for r in q_emb_mmr_diversify(spark, d).collect()
    }
    # step 1: relevance tie 10 vs 11 -> id tie-break
    assert got[(0, 1)] == 10
    # step 2: rel - max_sim: twin 11 scores 1.0 - 1.09 < diverse 12's
    # 0.7 - 0.49 -> the twin is skipped
    assert got[(0, 2)] == 12
    picked = [got[(0, s)] for s in range(1, 6)]
    assert len(set(picked)) == 5      # no repeats
