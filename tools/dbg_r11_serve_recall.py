"""Round-11 debug: why did scattered-layout serve recall drop from 1.0
(entry = global-min id, r10 form) to 0.863 (per-query semantic entries,
round-11 form)?  Runs BOTH entry policies over the SAME persisted
scattered-layout store the scale run left behind, with identical
hops/width, and reports per-query recall and group-read counters.

Usage: python tools/dbg_r11_serve_recall.py [store_root]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")

from pyspark.sql import Window
from pyspark.sql import functions as F

from db_migration_spark.session import get_spark


def main() -> None:
    root = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.tmp/r11_descent_sem"
    from db_migration_spark.operators.similarity import NSW_H, NSW_W, fp_dot
    from db_migration_spark.plans.txlog import TxTable
    from db_migration_spark.queries_annstore import (
        _pruned_beam_search_local,
        _serve_entries,
    )

    spark = get_spark("dbg-r11-serve")
    spark.sparkContext.setLogLevel("ERROR")
    vt = TxTable(os.path.join(root, "vectors"))
    kt = TxTable(os.path.join(root, "knn"))
    lt = TxTable(os.path.join(root, "lr"))
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
    exact_rows = (
        exact.withColumn("rn", F.row_number().over(wx))
        .filter(F.col("rn") <= 10)
        .select("query_id", "neighbor_id")
        .collect()
    )
    exact_set = {(r.query_id, r.neighbor_id) for r in exact_rows}
    n = vt.count_rows(spark)
    hops = max(NSW_H, n.bit_length() - 7)
    width = max(NSW_W, 2 * n.bit_length())
    lo, hi = vt.column_range("vec_id")

    def run(entry, label):
        io = {"groups_read": 0, "groups_total": 0}
        t0 = time.time()
        beam = _pruned_beam_search_local(
            spark, kt, lt, vt, q, entry, hops=hops, width=width, io=io
        )
        wall = round(time.time() - t0, 2)
        wf = Window.partitionBy("query_id").orderBy(F.desc("rel"), "node")
        bdf = spark.createDataFrame(
            [(r.query_id, r.node, r.rel) for r in beam],
            "query_id long, node bigint, rel long",
        )
        approx = (
            bdf.filter(F.col("node") != F.col("query_id"))
            .withColumn("rn", F.row_number().over(wf))
            .filter(F.col("rn") <= 10)
            .select("query_id", F.col("node").alias("neighbor_id"))
            .collect()
        )
        approx_set = {(r.query_id, r.neighbor_id) for r in approx}
        per_q = {}
        for qid in range(8):
            ex = {b for a, b in exact_set if a == qid}
            ap = {b for a, b in approx_set if a == qid}
            per_q[qid] = round(len(ex & ap) / len(ex), 3)
        out = {
            "label": label,
            "recall": round(
                len(exact_set & approx_set) / len(exact_set), 4
            ),
            "per_query": per_q,
            "io": io,
            "wall": wall,
        }
        print(json.dumps(out), flush=True)
        return out

    rt = TxTable(os.path.join(root, "reps"))
    entries = _serve_entries(
        spark, vt, q, int(lo), int(hi) - int(lo) + 1, n, rt=rt
    )
    print("entries:", sorted(entries), flush=True)
    run(entries, "semantic_entries")
    run(int(lo), "global_min_entry")


if __name__ == "__main__":
    main()
