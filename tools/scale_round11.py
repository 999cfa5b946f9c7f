"""Round-11 scale measurements for SCALE.md / OPTIMIZATION_r11.md:

``descentsem`` — the descent-MV store re-measured on the ADVERSARIAL
id-scattered layout (cluster = id mod 200 — the r10 artifact where
zone-map pruning degraded to full scans) after the round-11 fix:
post-repair OPTIMIZE clusters adjacency/tunnels/vectors by the nodes'
IVF list id (semantic key) and builds batched-probe bloom sidecars, so
"which groups hold these ids" is answered by membership, not id
ranges.  Protocol is tools/scale_round10.py VERBATIM (same corpus
generator, same 8×2,500 drain, same repair, same 4×250 id-uniform
steady batches, same 8-query serve) plus:

* two SEMANTICALLY-LOCAL steady batches (250 new vectors drawn from 2
  of the 200 clusters — the "new data arrives by topic/source"
  production regime): on the r10 layout these read ~every group like
  any other batch; under semantic clustering they must localize.
* a jobs-per-hop audit of the maintenance beam (r10 verdict task 3:
  ≤ 2 Spark jobs per hop), counted through a job group.

Usage: python tools/scale_round11.py [descentsem|descentsemcontig|all]
Prints one JSON line per experiment; numbers in OPTIMIZATION_r11.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")

from pyspark.sql import Window
from pyspark.sql import functions as F

from db_migration_spark.session import get_spark
from tools.scale_round10 import TMP, _clustered_vectors


def exp_descent_semantic(spark, contiguous: bool = False) -> dict:
    from db_migration_spark.operators.similarity import NSW_H, NSW_W, fp_dot
    from db_migration_spark.plans.txlog import TxTable
    from db_migration_spark.queries_annstore import (
        _DESCENT_MV_BUDGET,
        _DESCENT_MV_DEGREE,
        _pruned_beam_search,
        _pruned_beam_search_local,
        _serve_entries,
        descent_mv_recluster,
        descent_mv_refresh,
        descent_mv_repair,
    )

    root = f"{TMP}/r11_descent_sem" + ("_contig" if contiguous else "")
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root, exist_ok=True)
    vec_root = os.path.join(root, "vectors")
    knn_root = os.path.join(root, "knn")
    lr_root = os.path.join(root, "lr")
    stats_path = os.path.join(root, "stats.jsonl")
    emb = _clustered_vectors(spark, contiguous=contiguous)
    n_batches, bsz = 8, 2_500
    walls = []
    live_after = []
    for i in range(n_batches):
        b = emb.filter(
            (F.col("vec_id") >= i * bsz) & (F.col("vec_id") < (i + 1) * bsz)
        )
        t0 = time.time()
        descent_mv_refresh(spark, vec_root, knn_root, stats_path, b, i)
        walls.append(round(time.time() - t0, 2))
        live_after.append(len(TxTable(knn_root).active_groups()))
    stats = [
        json.loads(line)
        for line in open(stats_path)
        if "repair" not in json.loads(line)
    ]
    rows = []
    for s in stats:
        rows.append(
            {
                "batch": s["batch"],
                "n_corpus": s["n_corpus"],
                "candidates": s["candidates"],
                "groups_read": s.get("groups_read"),
                "groups_scannable": s.get("groups_total"),
                "live_adj_groups": live_after[s["batch"]],
                "wall_sec": walls[s["batch"]],
            }
        )
    # post-drain maintenance exactly as the declared ensure runs it:
    # repair round + the round-11 SEMANTIC recluster (IVF-list cluster
    # key + bloom sidecars) at the r10 tool's group count
    t0 = time.time()
    descent_mv_repair(spark, vec_root, knn_root, stats_path)
    repair_wall = round(time.time() - t0, 2)
    t0 = time.time()
    descent_mv_recluster(spark, vec_root, knn_root, lr_root)
    recluster_wall = round(time.time() - t0, 2)
    kt, vt, lt = TxTable(knn_root), TxTable(vec_root), TxTable(lr_root)

    # STEADY-STATE phase A (r10 protocol verbatim): 4 id-uniform small
    # batches — on the scattered layout each spans ~all 200 semantic
    # clusters, so candidate COVERAGE (not layout) floors the pruning;
    # reported as-is
    emb_extra = _clustered_vectors(spark, n=21_000, contiguous=contiguous)
    small_walls = []
    for j in range(4):
        lo_id = 20_000 + j * 250
        b = emb_extra.filter(
            (F.col("vec_id") >= lo_id) & (F.col("vec_id") < lo_id + 250)
        )
        t0 = time.time()
        descent_mv_refresh(
            spark, vec_root, knn_root, stats_path, b, 100 + j
        )
        small_walls.append(round(time.time() - t0, 2))

    # STEADY-STATE phase B (round 11): 2 semantically-LOCAL batches —
    # 250 new vectors from 2 clusters each (ids ≡ c mod 200 in the
    # extension range: maximally id-scattered, semantically tight).
    # This is the regime the semantic layout exists for.
    emb_local = _clustered_vectors(spark, n=71_000, contiguous=contiguous)
    local_walls = []
    for j, (c1, c2) in enumerate([(17, 42), (101, 163)]):
        b = (
            emb_local.filter(F.col("vec_id") >= 21_000 + j * 25_000)
            .filter(F.col("vec_id") < 46_000 + j * 25_000)
            .filter(
                (F.col("vec_id") % 200 == c1) | (F.col("vec_id") % 200 == c2)
            )
        )
        t0 = time.time()
        descent_mv_refresh(
            spark, vec_root, knn_root, stats_path, b, 200 + j
        )
        local_walls.append(round(time.time() - t0, 2))

    small_rows, local_rows = [], []
    for line in open(stats_path):
        s = json.loads(line)
        if "repair" in s:
            continue
        if 100 <= s["batch"] < 200:
            small_rows.append(
                {
                    "batch": s["batch"],
                    "n_batch": s["n_batch"],
                    "n_corpus": s["n_corpus"],
                    "candidates": s["candidates"],
                    "groups_read": s.get("groups_read"),
                    "groups_scannable": s.get("groups_total"),
                    "wall_sec": small_walls[s["batch"] - 100],
                }
            )
        elif s["batch"] >= 200:
            local_rows.append(
                {
                    "batch": s["batch"],
                    "n_batch": s["n_batch"],
                    "n_corpus": s["n_corpus"],
                    "candidates": s["candidates"],
                    "groups_read": s.get("groups_read"),
                    "groups_scannable": s.get("groups_total"),
                    "wall_sec": local_walls[s["batch"] - 200],
                }
            )

    # jobs-per-hop audit (r10 verdict task 3): run the maintenance beam
    # once inside a job group and count the jobs it submitted
    qj = emb_extra.filter(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    entries = qj.select("query_id").withColumn("node", F.lit(0))
    # job-count audit with AQE off so one driver ACTION == one Spark
    # job (with AQE each action fans into one job per materialized
    # query stage, which would count plan internals, not driver
    # round-trips — the thing the r10 verdict's "4 jobs/hop" measured)
    sc = spark.sparkContext
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        sc.setJobGroup("r11_beam_audit", "maintenance beam jobs/hop")
        _pruned_beam_search(
            spark, kt, lt, vt, qj, entries,
            hops=NSW_H, width=NSW_W, cap=_DESCENT_MV_DEGREE,
        ).count()
        sc.setJobGroup("", "")
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    jobs = len(
        sc.statusTracker().getJobIdsForGroup("r11_beam_audit")
    )
    # entry phase = 2 actions + the final .count() = 3 jobs outside
    # the hop loop; report raw count and the per-hop quotient
    beam_jobs = {"total_jobs": jobs, "hops": NSW_H,
                 "jobs_per_hop": round((jobs - 3) / NSW_H, 2)}

    # serve through the pruned beam (declared serve path), counting
    # group reads per hop — the r10 scattered artifact read 431/500.
    # exact side = the STORED corpus (the extension batches cover only
    # a slice of the generator's id range)
    allv = vt.read(spark).select("vec_id", "embedding").localCheckpoint()
    q = allv.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    exact = (
        allv.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            fp_dot(F.col("qv"), F.col("embedding")).alias("x"),
        )
    )
    wx = Window.partitionBy("query_id").orderBy(F.desc("x"), "neighbor_id")
    exact = (
        exact.withColumn("rn", F.row_number().over(wx))
        .filter(F.col("rn") <= 10)
        .select("query_id", "neighbor_id")
        .localCheckpoint()
    )
    n = vt.count_rows(spark)
    hops = max(NSW_H, n.bit_length() - 7)
    width = max(NSW_W, 2 * n.bit_length())
    lo, _hi = vt.column_range("vec_id")
    io = {"groups_read": 0, "groups_total": 0}
    t0 = time.time()
    from db_migration_spark.plans.txlog import TxTable as _TT

    rt = _TT(os.path.join(root, "reps"))
    entries = _serve_entries(
        spark, vt, q, int(lo), int(_hi) - int(lo) + 1, n, rt=rt
    )
    rows_beam = _pruned_beam_search_local(
        spark, kt, lt, vt, q, entries, hops=hops, width=width, io=io
    )
    beam = spark.createDataFrame(
        [(r.query_id, r.node, r.rel) for r in rows_beam],
        "query_id long, node bigint, rel long",
    )
    wf = Window.partitionBy("query_id").orderBy(F.desc("rel"), "node")
    approx = (
        beam.filter(F.col("node") != F.col("query_id"))
        .withColumn("rn", F.row_number().over(wf))
        .filter(F.col("rn") <= 10)
        .select("query_id", F.col("node").alias("neighbor_id"))
    )
    hits = exact.join(
        approx, ["query_id", "neighbor_id"], "left_semi"
    ).count()
    serve_wall = round(time.time() - t0, 2)
    return {
        "exp": "descent_mv_semantic_x10"
        + ("_contig" if contiguous else ""),
        "n_vectors": int(n),
        "batches": rows,
        "steady_state_small_batches": small_rows,
        "steady_state_semantic_batches": local_rows,
        "per_vector_budget": _DESCENT_MV_BUDGET,
        "budget_held_every_batch": all(
            r["candidates"] <= bsz * _DESCENT_MV_BUDGET
            for r in rows
            if r["n_corpus"] > 0
        ),
        "steady_state_pruned": all(
            r["groups_read"] is not None
            and r["groups_read"] < r["groups_scannable"]
            for r in small_rows
        ),
        "semantic_batches_pruned": all(
            r["groups_read"] is not None
            and r["groups_read"] < r["groups_scannable"] / 2
            for r in local_rows
        ),
        "repair_wall_sec": repair_wall,
        "recluster_wall_sec": recluster_wall,
        "beam_jobs": beam_jobs,
        "serve": {
            "recall_at_10": round(hits / 80, 3),
            "hops": hops,
            "width": width,
            "groups_read": io["groups_read"],
            "groups_scannable": io["groups_total"],
            "wall_sec": serve_wall,
        },
    }


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "descentsem"
    spark = get_spark("scale-r11")
    spark.sparkContext.setLogLevel("ERROR")
    if which in ("all", "descentsem"):
        print(json.dumps(exp_descent_semantic(spark)), flush=True)
    if which in ("all", "descentsemcontig"):
        print(
            json.dumps(exp_descent_semantic(spark, contiguous=True)),
            flush=True,
        )


if __name__ == "__main__":
    main()
