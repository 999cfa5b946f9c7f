"""Round-11 experiment (r10 VERDICT task 6): measure the crossover
between the descent-MV's two serve paths so _PRUNED_SERVE_MIN_ROWS is
set from data instead of a guess.

Path A (pruned): _pruned_beam_search_local — driver beam, 2 jobs/hop,
bloom+zone-map point plans (fixed per-hop planning cost, I/O ∝
frontier groups).  Path B (lazy): symmetrize(knn) ∪ lr as one lazy
plan through nsw_beam_search (zero planning cost, every hop scans the
whole graph).  The declared query gates on vt.count_rows.

Store shape per size n: the post-recluster layout the declared ensure
produces — vectors from the ×10 clustered generator (200 semantic
clusters, id-SCATTERED: cluster = id mod 200), a per-src top-M
adjacency whose dsts are same-cluster ids (id-scattered semantic
neighborhoods — the adversarial case), the real _descent_lr_links
tunnels, descent_mv_recluster (semantic OPTIMIZE + bloom sidecars).
Graph recall is irrelevant here; both paths walk the identical graph
(asserted), only wall clock differs.  warm-up + min-of-3 per path per
size (guide §1.4 discipline; beams collect driver-side, nothing to
noop).  Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")

from pyspark.sql import functions as F

from db_migration_spark.session import get_spark
from tools.scale_round10 import TMP, _clustered_vectors

SIZES = [5_000, 20_000, 50_000, 100_000, 200_000]


def _build(spark, n: int) -> str:
    from db_migration_spark.operators.similarity import NSW_M
    from db_migration_spark.plans.txlog import TxTable
    from db_migration_spark.queries_annstore import (
        _descent_lr_links,
        descent_mv_recluster,
    )

    root = f"{TMP}/r11_serve_gate_{n}"
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    emb = _clustered_vectors(spark, n=n)
    vt = TxTable(os.path.join(root, "vectors"))
    vt.commit_append(emb)
    # per-src top-M adjacency of same-cluster ids (id-scattered
    # semantic neighborhoods): dst_k = src + 200·k mod n, k = 1..M
    kt = TxTable(os.path.join(root, "knn"))
    ks = F.explode(
        F.array(*[F.lit(k) for k in range(1, NSW_M + 1)])
    ).alias("k")
    adj = (
        emb.select(F.col("vec_id").alias("src"), ks)
        .select(
            "src",
            F.pmod(F.col("src") + 200 * F.col("k"), F.lit(n)).alias("dst"),
            (1000 - F.col("k")).cast("long").alias("dot"),
        )
        .filter(F.col("src") != F.col("dst"))
    )
    kt.commit_append(adj)
    lt = TxTable(os.path.join(root, "lr"))
    lt.commit_append(_descent_lr_links(emb.select("vec_id"), n))
    descent_mv_recluster(
        spark,
        os.path.join(root, "vectors"),
        os.path.join(root, "knn"),
        os.path.join(root, "lr"),
    )
    emb.unpersist()
    return root


def _measure(spark, root: str, n: int) -> dict:
    from db_migration_spark.operators.similarity import (
        NSW_H,
        NSW_W,
        _symmetrize,
        nsw_beam_search,
    )
    from db_migration_spark.plans.txlog import TxTable
    from db_migration_spark.queries_annstore import (
        _pruned_beam_search_local,
        _serve_entries,
    )

    vt = TxTable(os.path.join(root, "vectors"))
    kt = TxTable(os.path.join(root, "knn"))
    lt = TxTable(os.path.join(root, "lr"))
    rt = TxTable(os.path.join(root, "reps"))
    emb = vt.read(spark).select("vec_id", "embedding")
    q = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    hops = max(NSW_H, n.bit_length() - 7)
    width = max(NSW_W, 2 * n.bit_length())
    lo, _hi = vt.column_range("vec_id")
    span = int(_hi) - int(lo) + 1

    def run_pruned():
        entries = _serve_entries(spark, vt, q, int(lo), span, n, rt=rt)
        return {
            (r.query_id, r.node, r.rel)
            for r in _pruned_beam_search_local(
                spark, kt, lt, vt, q, entries, hops=hops, width=width
            )
        }

    def run_lazy():
        entries = _serve_entries(spark, vt, q, int(lo), span, n, rt=rt)
        edges = (
            _symmetrize(kt.read(spark).select("src", "dst"))
            .unionByName(lt.read(spark).select("src", "dst"))
            .dropDuplicates(["src", "dst"])
            .localCheckpoint(eager=False)
        )
        entry = spark.createDataFrame(entries, "query_id long, node bigint")
        return {
            (r.query_id, r.node, r.rel)
            for r in nsw_beam_search(
                emb, edges, q, entry=entry, hops=hops, width=width
            ).collect()
        }

    beams = {}
    walls = {}
    for name, fn in (("pruned", run_pruned), ("lazy", run_lazy)):
        ws = []
        for i in range(4):
            t0 = time.time()
            beams[name] = fn()
            ws.append(round(time.time() - t0, 3))
        walls[name] = {"min3": min(ws[1:]), "runs": ws}
    assert beams["pruned"] == beams["lazy"], "paths diverged"
    return {"n": n, "hops": hops, "width": width, **walls}


def main():
    spark = get_spark("exp-r11-servegate")
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for n in SIZES:
        root = _build(spark, n)
        rows.append(_measure(spark, root, n))
        shutil.rmtree(root, ignore_errors=True)
        print(json.dumps(rows[-1]), flush=True)
    print(json.dumps({"exp": "serve_gate_crossover", "rows": rows}), flush=True)


if __name__ == "__main__":
    main()
