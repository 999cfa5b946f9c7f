"""Round-11 debug: per-phase group-read attribution for ONE
semantically-local maintenance batch against the leftover scattered
×10 store.  Wraps the three pruned readers + TxTable.prune_groups_points
to log every planning call (which table, how many groups kept / total),
then runs descent_mv_refresh for a fresh 250-vector 2-cluster batch.

Usage: python tools/dbg_r11_batch_io.py [store_root]
Prints one JSON line: the ordered call log + the stats line the batch
wrote.  Pure measurement.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")

from pyspark.sql import functions as F

from db_migration_spark.session import get_spark
from tools.scale_round10 import _clustered_vectors


def main() -> None:
    root = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.tmp/r11_descent_sem"
    import db_migration_spark.queries_annstore as A
    from db_migration_spark.plans.txlog import TxTable

    spark = get_spark("dbg-r11-batchio")
    spark.sparkContext.setLogLevel("ERROR")

    log: list = []
    orig_prune = TxTable.prune_groups_points

    def logged_prune(self, column, values, version=None):
        picked, tot = orig_prune(self, column, values, version=version)
        log.append(
            {
                "table": os.path.basename(self.root),
                "col": column,
                "n_vals": len(list(values)),
                "kept": len(picked),
                "total": tot,
            }
        )
        return picked, tot

    TxTable.prune_groups_points = logged_prune

    vec_root = os.path.join(root, "vectors")
    knn_root = os.path.join(root, "knn")
    stats_path = os.path.join(root, "stats.jsonl")
    # a fresh 250-vector batch from 2 clusters (ids ≡ c mod 200 in an
    # unused id range), exactly the scale tool's phase-B regime
    emb = _clustered_vectors(spark, n=121_000, contiguous=False)
    b = (
        emb.filter(F.col("vec_id") >= 71_000)
        .filter(F.col("vec_id") < 96_000)
        .filter((F.col("vec_id") % 200 == 55) | (F.col("vec_id") % 200 == 77))
    )
    t0 = time.time()
    A.descent_mv_refresh(spark, vec_root, knn_root, stats_path, b, 202)
    wall = round(time.time() - t0, 2)
    tail = [json.loads(line) for line in open(stats_path)][-1]
    print(
        json.dumps(
            {"wall": wall, "stats": tail, "calls": log}
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
