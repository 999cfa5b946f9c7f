"""Persisted graph-ANN index — the NSW serving tier at store shape.

Round-7 verdict task 1: dedup (band index), BM25 (postings store +
streamed MV), and IVF (``ann_ivf_pruned_store``) all have persisted,
incrementally-maintained serving twins; the graph tier did not — its
NN-descent build ran INSIDE the declared query every sweep.  This
module gives the graph family the same two store tiers:

* ``ann_nsw_store_topk`` — the NN-descent + long-range small-world
  graph built ONCE into a txlog table (``optimize``-clustered on
  ``src`` so every file group owns a node range, min/max zone maps),
  then beam-searched THROUGH the store: each hop plans its frontier's
  groups with batched zone-map point pruning
  (``TxTable.prune_groups_points``) and scans only the planned union.
  A hop's cost is frontier-bounded — ≤ W·(M+1) adjacency rows per
  probe per hop — independent of corpus size, which is the property a
  100 TB vector corpus needs from its graph index.  Gate: the same
  in-gate recall contract as ann_nsw_descent_topk (mean recall@10 vs
  the in-query exact top-10 ≥ 0.5) plus a ``pruned`` boolean
  requiring at least one hop to have physically skipped groups.
* ``stream_nsw_mv`` — the kNN adjacency maintained INCREMENTALLY
  under streaming appends of vectors.  Per micro-batch: score only
  the pairs with ≥ 1 endpoint in the batch (|batch| × corpus-so-far
  — linear per batch, n² TOTAL, same as one batch build), then fold
  into the stored directed top-M via the serializable ``merge``
  primitive with per-batch txn identity.  Top-M per src is a
  MERGEABLE summary — a pair discarded at batch i was beaten by M
  better pairs that can only ever be displaced by still-better ones,
  so it can never re-enter the true top-M — which makes the fold
  EXACT: after the drain the stored graph is proved edge-for-edge
  equal to the one-shot batch build (two exceptAll gates), batch 0
  is adversarially replayed (must be a txn no-op), and the declared
  answer is served from the MV graph against ORACLE_NSW VERBATIM.
  The approximate scale path (per-batch NN-descent delta rounds over
  the batch's neighborhood instead of batch × corpus scoring) keeps
  the same fold shape; the exact fold is declared because its oracle
  is bit-exact.

No counterpart in the reference (azanium has no similarity tier;
pseudoace.py:1-40 is Datomic import plumbing); this completes SURVEY
§2.12's similarity family at serving shape.
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import load_table
from .operators.similarity import (
    NSW_H,
    NSW_M,
    NSW_W,
    _score_pairs,
    _symmetrize,
    fp_dot,
    nsw_build_edges,
    nsw_build_edges_descent,
    nsw_longrange_edges,
)

# ---------------------------------------------------------------------------
# the persisted graph store (shared by ann_nsw_store_topk and the
# refactored ann_nsw_descent_topk — one build, two serving plans)
# ---------------------------------------------------------------------------


def ensure_nsw_graph_store(spark: SparkSession, sf_dir: str):
    """The NN-descent + long-range adjacency built once into a txlog
    table, OPTIMIZE-clustered on ``src`` (each file group owns a
    contiguous node range → min/max zone maps make any frontier's
    groups plannable without I/O).  Priming discipline (r7 verdict
    task 7): behind a ``_BUILD_DONE`` marker so sweeps and bench time
    SERVING, never construction."""
    from .plans.txlog import TxTable
    from .queries_e2e import _fx

    root = _fx(sf_dir, "txlog_nsw_graph")
    done = os.path.join(root, "_BUILD_DONE")
    edges_root = os.path.join(root, "edges")
    if os.path.exists(done):
        return TxTable(edges_root)
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root, exist_ok=True)
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    edges = (
        nsw_build_edges_descent(emb)
        .unionByName(nsw_longrange_edges(emb))
        .dropDuplicates(["src", "dst"])
    )
    t = TxTable(edges_root)
    t.commit_append(edges)
    t.optimize(spark, sort_key=["src"], target_groups=8)
    with open(done, "w"):
        pass
    return t


def store_beam_search(
    spark: SparkSession,
    t,
    emb: DataFrame,
    q: DataFrame,
    hops: int = NSW_H,
    width: int = NSW_W,
):
    """Breadth-beam search where each hop's adjacency comes THROUGH the
    store: collect the hop's frontier (≤ width × |q| node ids — the
    bounded planner state any graph-serving engine keeps per query),
    plan its groups with one batched zone-map pass, scan only the
    planned union.  Semantics are identical to
    operators.similarity.nsw_beam_search over the same edge set —
    deterministic expand → rescore → top-``width`` with id tie-breaks.
    Returns (final beam, groups_scanned, groups_scannable) where the
    counts measure hop-level file skipping."""
    nodes = emb.select(F.col("vec_id").alias("node"), "embedding")

    def score(cand: DataFrame) -> DataFrame:
        return (
            cand.join(nodes, "node")
            .join(F.broadcast(q), "query_id")
            .select(
                "query_id",
                "node",
                fp_dot(F.col("qv"), F.col("embedding")).alias("rel"),
            )
        )

    entry0 = emb.agg(F.min("vec_id").alias("node"))
    seed = q.select("query_id").crossJoin(F.broadcast(entry0))
    beam = score(seed).localCheckpoint(eager=False)
    total = len(t.active_groups())
    scanned = scannable = 0
    for _hop in range(hops):
        frontier = sorted(
            r.node for r in beam.select("node").distinct().collect()
        )
        picked, _tot = t.prune_groups_points("src", frontier)
        scanned += len(picked)
        scannable += total
        hop_edges = t.read_groups(spark, sorted(picked)).filter(
            F.col("src").isin(frontier)
        )
        s = beam.alias("s")
        cand = (
            beam.select("query_id", "node")
            .unionByName(
                s.join(
                    hop_edges.alias("e"),
                    F.col("s.node") == F.col("e.src"),
                ).select(
                    F.col("s.query_id").alias("query_id"),
                    F.col("e.dst").alias("node"),
                )
            )
            .dropDuplicates(["query_id", "node"])
        )
        wb = Window.partitionBy("query_id").orderBy(F.desc("rel"), "node")
        beam = (
            score(cand)
            .withColumn("rn", F.row_number().over(wb))
            .filter(F.col("rn") <= width)
            .drop("rn")
            .localCheckpoint(eager=False)
        )
    return beam, scanned, scannable


def q_ann_nsw_store_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph ANN served FROM the persisted store: beam search whose
    hops plan and scan only the file groups owning the frontier's node
    ranges (zone-map point pruning over the src-clustered adjacency).
    Same recall contract as ann_nsw_descent_topk — the stored graph IS
    the descent graph — plus ``pruned``: the sum over hops of planned
    groups must be strictly below hops × live groups, i.e. at least
    one hop physically skipped files (the first hop always does: its
    frontier is the single entry node)."""
    from .queries import _ann_recall_gate

    t = ensure_nsw_graph_store(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    q = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    beam, scanned, scannable = store_beam_search(spark, t, emb, q)
    wf = Window.partitionBy("query_id").orderBy(F.desc("rel"), "node")
    approx = (
        beam.filter(F.col("node") != F.col("query_id"))
        .withColumn("rn", F.row_number().over(wf))
        .filter(F.col("rn") <= 10)
        .select("query_id", F.col("node").alias("neighbor_id"))
    )
    # exact side ranked by the SAME fixed-point dot the beam ranks by
    exact = (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            fp_dot(F.col("qv"), F.col("embedding")).alias("xrel"),
        )
    )
    wx = Window.partitionBy("query_id").orderBy(
        F.desc("xrel"), "neighbor_id"
    )
    exact = (
        exact.withColumn("rn", F.row_number().over(wx))
        .filter(F.col("rn") <= 10)
        .select("query_id", "neighbor_id")
    )
    return _ann_recall_gate(approx, exact, bound=0.5).withColumn(
        "pruned", F.lit(scanned < scannable)
    )


# ---------------------------------------------------------------------------
# stream_nsw_mv — the adjacency maintained incrementally, proved exact
# ---------------------------------------------------------------------------

_N_SLICES = 4


def _ensure_stream_nsw_mv(spark: SparkSession, sf_dir: str):
    """Incremental kNN-graph maintenance under streaming vector
    appends.  State: a vectors table V (append-only) and the directed
    top-M adjacency K (src, dst, dot).  Per micro-batch B:

    1. candidates = every ordered pair with ≥ 1 endpoint in B
       (B × (V∪B) plus V × B), scored with the exact fixed-point dot;
    2. K ← per-src top-M of (K ∪ candidates) via ``merge`` with txn
       identity ("nsw_knn", batch) — the mergeable-summary fold;
    3. B appends to V under txn ("nsw_vec", batch).

    Crash/replay safety: the fold commits before the vector append, so
    a replayed batch txn-skips the fold and only ever re-appends its
    own vectors once.  After the drain the stored graph is gated
    edge-for-edge against the one-shot batch build, and batch 0 is
    adversarially replayed (both tables must version-no-op); any
    failure rmtrees the fixture before raising."""
    from .plans.txlog import TxTable
    from .queries_e2e import _fx

    root = _fx(sf_dir, "txlog_stream_nsw_mv")
    done = os.path.join(root, "_BUILD_DONE")
    vec_root = os.path.join(root, "vectors")
    knn_root = os.path.join(root, "knn")
    if os.path.exists(done):
        return TxTable(knn_root)
    shutil.rmtree(root, ignore_errors=True)
    src_dir = os.path.join(root, "src")
    os.makedirs(src_dir, exist_ok=True)
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    # a real multi-batch arrival: the corpus split into _N_SLICES files,
    # streamed one file per trigger
    for i in range(_N_SLICES):
        tmp = os.path.join(root, f"_tmp{i}")
        emb.filter(F.col("vec_id") % _N_SLICES == i).coalesce(
            1
        ).write.mode("overwrite").parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        os.rename(part, os.path.join(src_dir, f"slice_{i}.parquet"))
        shutil.rmtree(tmp)

    def refresh(bdf: DataFrame, batch_id: int) -> None:
        b = bdf.select("vec_id", "embedding")
        sp = bdf.sparkSession
        vt = TxTable(vec_root)
        prev = vt.read(sp) if vt.latest_version() >= 0 else None
        allv = b if prev is None else prev.unionByName(b)
        b_src = b.select(F.col("vec_id").alias("src"))
        pairs = b_src.crossJoin(
            allv.select(F.col("vec_id").alias("dst"))
        )
        if prev is not None:
            pairs = pairs.unionByName(
                prev.select(F.col("vec_id").alias("src")).crossJoin(
                    b.select(F.col("vec_id").alias("dst"))
                )
            )
        pairs = pairs.filter(F.col("src") != F.col("dst"))
        scored = _score_pairs(allv, pairs)

        def fold(cur: DataFrame | None) -> DataFrame:
            base = (
                scored
                if cur is None
                else cur.unionByName(scored).dropDuplicates(
                    ["src", "dst"]
                )
            )
            w = Window.partitionBy("src").orderBy(F.desc("dot"), "dst")
            return (
                base.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") <= NSW_M)
                .select("src", "dst", "dot")
            )

        TxTable(knn_root).merge(sp, fold, txn=("nsw_knn", batch_id))
        vt.commit_append(b, txn=("nsw_vec", batch_id))

    schema = emb.schema
    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
        .writeStream.foreachBatch(refresh)
        .option("checkpointLocation", os.path.join(root, "_chk"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    if q.isActive:
        q.stop()
        raise RuntimeError("nsw mv stream drain did not finish")
    kt, vt = TxTable(knn_root), TxTable(vec_root)
    # adversarial replay: batch 0's identity is already in both logs —
    # a deterministic slice (slice_0's own rows), must version-no-op
    before = (kt.latest_version(), vt.latest_version())
    refresh(emb.filter(F.col("vec_id") % _N_SLICES == 0), 0)
    if (kt.latest_version(), vt.latest_version()) != before:
        shutil.rmtree(root, ignore_errors=True)
        raise RuntimeError(
            "replayed batch 0 must no-op both tables (txn dedup broke)"
        )
    # the exactness proof: incremental fold == one-shot batch build,
    # edge for edge (directed, pre-symmetrize)
    stored = kt.read(spark).select("src", "dst")
    batch = nsw_build_edges(emb)  # symmetrized exact top-M
    sym = _symmetrize(stored)
    extra = sym.exceptAll(batch).count()
    missing = batch.exceptAll(sym).count()
    if extra or missing:
        shutil.rmtree(root, ignore_errors=True)
        raise RuntimeError(
            f"streamed graph != batch build: +{extra} -{missing} edges"
        )
    with open(done, "w"):
        pass
    return kt


def q_stream_nsw_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NSW top-10 served from the STREAM-maintained adjacency
    (_ensure_stream_nsw_mv) — the beam search never touches a batch
    build.  The oracle is ORACLE_NSW VERBATIM (exact kNN graph built
    from scratch, beam CTE-replayed hop by hop), so the hash gate
    proves the incremental folds converged to exactly the batch graph
    AND the sink was exactly-once — a dropped, doubled, or
    replay-leaked batch loses or corrupts an edge, and any edge
    difference shifts some hop's beam."""
    from .operators.similarity import nsw_beam_search
    from .queries_round4 import _nsw_answer

    kt = _ensure_stream_nsw_mv(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    edges = _symmetrize(
        kt.read(spark).select("src", "dst")
    ).localCheckpoint(eager=False)
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    beam = nsw_beam_search(emb, edges, q)
    return _nsw_answer(beam, emb, q)


def register(queries: dict, oracles: dict) -> None:
    from .queries import _ORACLE_ANN_EXACT_HEAD
    from .queries_round4 import ORACLE_NSW

    queries["ann_nsw_store_topk"] = q_ann_nsw_store_topk
    oracles["ann_nsw_store_topk"] = _ORACLE_ANN_EXACT_HEAD.replace(
        "TRUE AS recall_ok", "TRUE AS recall_ok,\n       TRUE AS pruned"
    )
    queries["stream_nsw_mv"] = q_stream_nsw_mv
    oracles["stream_nsw_mv"] = ORACLE_NSW
