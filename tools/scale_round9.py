"""Round-9 scale measurements for SCALE.md:

1. ``descentmv`` — the scale-safe incremental graph maintenance
   (queries_annstore.descent_mv_refresh — the IDENTICAL code the
   declared stream_nsw_descent_mv runs) driven over 8 batches of 2,500
   clustered vectors (20k total, ×10 the sf0.1 corpus).  Expect: the
   measured per-batch scored-candidate count stays ~FLAT as the corpus
   grows (corpus-independent budget), while the exact tier's
   batch×corpus candidate count (computed analytically — it is
   deterministic by construction) grows linearly; serving recall@10
   through the final maintained graph vs brute force.
2. ``blockmaxplan`` — executor-side vs driver-side block planning on a
   ×10-group postings store (320 file groups, the Zipf corpus):
   identical top-10 both ways (asserted), planner wall and the number
   of rows that ever reach the driver (driver path: the full
   |query terms| × |groups| sidecar slice; executor path: only the
   DISTINCT allowed group ids).
3. ``ivfpqrecall`` — the recall-vs-probes curve behind
   ann_ivfpq_hirecall_topk's documented setting: the real store +
   _serve_ivfpq path, swept over probe counts on (a) the isotropic
   sf0.01 corpus (adversarial for IVF: median pairwise cosine ≈ 0)
   and (b) 20k clustered vectors (the regime real embeddings live
   in).  Expect: 0.9 recall costs a ~0.9 probe fraction on isotropic
   data but a far smaller fraction on clustered data.

Usage: python tools/scale_round9.py [descentmv|blockmaxplan|ivfpqrecall|all]
Prints one JSON line per experiment; paste the numbers into SCALE.md.
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

TMP = "/root/repo/.tmp"


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _clustered_vectors(spark, n=20_000, dim=64, n_clusters=200):
    """The round-7/8 clustered-embedding generator (200 centers +
    0.25-amplitude noise — the regime real embeddings live in)."""
    cid = F.col("id") % n_clusters
    emb = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(dim)),
            lambda i: (
                (
                    F.pmod(F.xxhash64(cid * dim + i), F.lit(2001)) - 1000
                ).cast("double")
                / 1000.0
                + (
                    F.pmod(
                        F.xxhash64(F.col("id") * dim + i + 7_777_777),
                        F.lit(2001),
                    )
                    - 1000
                ).cast("double")
                / 4000.0
            ).cast("float"),
        ).alias("embedding"),
    )
    emb = emb.repartition(32).cache()
    emb.count()
    return emb


def exp_descent_mv(spark) -> dict:
    """8 batches × 2,500 clustered vectors through descent_mv_refresh;
    per-batch measured candidates vs the exact tier's analytic
    batch×corpus count; serving recall through the final graph."""
    from db_migration_spark.operators.similarity import (
        _symmetrize,
        fp_dot,
        nsw_beam_search,
        nsw_longrange_edges,
    )
    from db_migration_spark.plans.txlog import TxTable
    from db_migration_spark.queries_annstore import (
        _DESCENT_MV_BUDGET,
        descent_mv_refresh,
    )

    root = f"{TMP}/r9_descent_mv"
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root, exist_ok=True)
    vec_root = os.path.join(root, "vectors")
    knn_root = os.path.join(root, "knn")
    stats_path = os.path.join(root, "stats.jsonl")
    emb = _clustered_vectors(spark)
    n_batches, bsz = 8, 2_500
    walls = []
    for i in range(n_batches):
        b = emb.filter(
            (F.col("vec_id") >= i * bsz) & (F.col("vec_id") < (i + 1) * bsz)
        )
        t0 = time.time()
        descent_mv_refresh(spark, vec_root, knn_root, stats_path, b, i)
        walls.append(round(time.time() - t0, 2))
    stats = [
        json.loads(line)
        for line in open(stats_path)
        if "repair" not in line or "repair" not in json.loads(line)
    ]
    rows = []
    for s in stats:
        exact_cands = (
            s["n_batch"] * (s["n_corpus"] + s["n_batch"] - 1)
            + s["n_corpus"] * s["n_batch"]
        )
        rows.append(
            {
                "batch": s["batch"],
                "n_corpus": s["n_corpus"],
                "descent_candidates": s["candidates"],
                "exact_tier_candidates": exact_cands,
                "per_vector": round(s["candidates"] / s["n_batch"], 1),
                "wall_sec": walls[s["batch"]],
            }
        )
    # serving parity: the maintained MV graph vs the ONE-SHOT batch
    # descent build (its honest twin — same algorithm, unlimited view
    # of the corpus), both + stateless long-range links, both served
    # with the same deeper beam (20k vectors across 200 clusters need
    # more hops than the sf-fixture defaults)
    from db_migration_spark.operators.similarity import (
        nsw_build_edges_descent,
    )

    kt = TxTable(knn_root)
    mv_edges = (
        _symmetrize(kt.read(spark).select("src", "dst"))
        .unionByName(nsw_longrange_edges(emb))
        .dropDuplicates(["src", "dst"])
        .localCheckpoint()
    )
    batch_edges = (
        nsw_build_edges_descent(emb)
        .unionByName(nsw_longrange_edges(emb))
        .dropDuplicates(["src", "dst"])
        .localCheckpoint()
    )
    q = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    exact = (
        emb.crossJoin(F.broadcast(q))
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

    def recall(edges) -> float:
        beam = nsw_beam_search(emb, edges, q, hops=6, width=32)
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
        return round(hits / 80, 3)

    recall_pre_repair = recall(mv_edges)
    # REPAIR round (compaction-analog): one full-graph descent round
    # through the identical descent_mv_repair the declared ensure runs;
    # scorings must stay ≤ |V| · D·(D+1) (LINEAR in the corpus)
    from db_migration_spark.queries_annstore import (
        _DESCENT_MV_REPAIR_BUDGET,
        descent_mv_repair,
    )

    t0 = time.time()
    descent_mv_repair(spark, vec_root, knn_root, stats_path)
    repair_wall = round(time.time() - t0, 2)
    repair_rows = [
        json.loads(line)
        for line in open(stats_path)
        if "repair" in json.loads(line)
    ]
    mv_edges2 = (
        _symmetrize(kt.read(spark).select("src", "dst"))
        .unionByName(nsw_longrange_edges(emb))
        .dropDuplicates(["src", "dst"])
        .localCheckpoint()
    )
    last = rows[-1]
    return {
        "exp": "descent_mv_x10",
        "n_vectors": 20_000,
        "batches": rows,
        "per_vector_budget": _DESCENT_MV_BUDGET,
        "budget_held_every_batch": all(
            r["descent_candidates"]
            <= bsz * _DESCENT_MV_BUDGET
            for r in rows
            if r["n_corpus"] > 0
        ),
        "last_batch_descent_vs_exact": round(
            last["exact_tier_candidates"] / last["descent_candidates"], 1
        ),
        "serving_recall_at_10_mv": recall_pre_repair,
        "serving_recall_at_10_mv_after_repair": recall(mv_edges2),
        "serving_recall_at_10_batch_build": recall(batch_edges),
        "repair_scorings": [r["candidates"] for r in repair_rows],
        "repair_per_node": [
            round(r["candidates"] / r["n_corpus"], 1) for r in repair_rows
        ],
        "repair_budget_per_node": _DESCENT_MV_REPAIR_BUDGET,
        "repair_linear_bound_held": all(
            r["candidates"] <= r["n_corpus"] * _DESCENT_MV_REPAIR_BUDGET
            for r in repair_rows
        ),
        "repair_wall_sec": repair_wall,
    }


def exp_blockmax_plan(spark) -> dict:
    """Executor vs driver block planning on a 320-group store: equal
    answers, planner walls, rows reaching the driver."""
    import math

    from db_migration_spark.plans.txlog import TxTable
    from db_migration_spark.queries_search import (
        BLOCKMAX_LAST_STATS,
        blockmax_topk,
        bm25_contrib,
    )

    V, N, L = 50_000, 400_000, 100
    store_root = f"{TMP}/r9_zipf_store_320"
    t = TxTable(store_root)
    if not t.active_groups():
        toks = (
            spark.range(N)
            .select(F.col("id").alias("doc_id"))
            .select(
                "doc_id",
                F.explode(F.sequence(F.lit(0), F.lit(L - 1))).alias("pos"),
            )
        )
        u = (
            F.abs(F.xxhash64("doc_id", "pos", F.lit(7))) % 1_000_000_003
        ) / 1_000_000_003.0
        rank = F.least(
            F.lit(V),
            F.greatest(F.lit(1), F.floor(F.exp(u * F.lit(math.log(V))))),
        ).cast("long")
        term = F.concat(F.lit("t"), F.format_string("%06d", rank))
        tf = (
            toks.select("doc_id", term.alias("term"))
            .groupBy("doc_id", "term")
            .agg(F.count(F.lit(1)).alias("tf"))
        )
        dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
        df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
        post = (
            tf.join(dl, "doc_id").join(df_, "term")
            .select("term", "doc_id", "tf", "dl", "df")
        )
        t.commit_append(post)
        t.optimize(spark, sort_key=["term"], target_groups=320)
    post = t.read(spark)
    consts = (
        post.select("doc_id", "dl").distinct()
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.avg("dl").alias("a"),
        )
        .collect()[0]
    )
    c = {"n_docs": consts["n"], "avgdl": consts["a"]}
    contrib = bm25_contrib(c["n_docs"], c["avgdl"])
    ub = post.groupBy("term").agg(F.max(contrib).alias("ub")).localCheckpoint()
    bub = (
        post.withColumn(
            "grp", F.element_at(F.split(F.input_file_name(), "/"), -2)
        )
        .groupBy("grp", "term")
        .agg(F.max(contrib).alias("bub"))
        .localCheckpoint()
    )
    stats = post.select("term", "df").distinct()
    common = [
        r.term
        for r in stats.orderBy(F.desc("df"), "term").limit(6).collect()
    ]
    rare = [
        r.term
        for r in stats.filter(
            (F.col("df") >= 50) & (F.col("df") <= 200)
        ).orderBy("term").limit(6).collect()
    ]
    qrows = []
    for qid in range(3):
        qrows += [
            (qid, common[2 * qid]),
            (qid, common[2 * qid + 1]),
            (qid, rare[2 * qid]),
            (qid, rare[2 * qid + 1]),
        ]
    q = spark.createDataFrame(qrows, ["query_id", "term"]).persist()
    q.count()

    out = {}
    answers = {}
    for name, thr in (("driver", 10**9), ("executor", 0)):
        t0 = time.time()
        res = {
            (r.query_id, r.rank): (r.doc_id, r.score)
            for r in blockmax_topk(
                spark, t, post, c, q, ub, bub,
                exec_planner_threshold=thr,
            ).collect()
        }
        wall = round(time.time() - t0, 2)
        st = dict(BLOCKMAX_LAST_STATS)
        assert st["planner"] == name
        answers[name] = res
        # rows that reach the driver: the full query-vocabulary sidecar
        # slice on the driver path; only distinct allowed group ids on
        # the executor path
        driver_rows = (
            st["pairs_total"] if name == "driver" else st["groups_allowed"]
        )
        out[name] = {
            "wall_sec": wall,
            "driver_rows": driver_rows,
            "groups_allowed": st["groups_allowed"],
            "groups_total": st["groups_total"],
        }
    assert answers["driver"] == answers["executor"], "planners disagree"
    return {
        "exp": "blockmax_planner_x10_groups",
        "n_docs": N,
        "groups": out["driver"]["groups_total"],
        "driver_path": out["driver"],
        "executor_path": out["executor"],
        "group_skip_frac": round(
            1 - out["executor"]["groups_allowed"]
            / out["executor"]["groups_total"],
            4,
        ),
    }


def _ivfpq_curve(spark, emb, lists, probes_list, shortlist=300, nq=8):
    """Recall@10 vs probe count through a real txlog IVF-PQ store and
    the declared _serve_ivfpq path."""
    from db_migration_spark.operators import similarity
    from db_migration_spark.plans.txlog import TxTable
    from db_migration_spark.queries_annstore import (
        _IVFPQ_CODES,
        _IVFPQ_REFINE_ITERS,
        _IVFPQ_SUB,
        _serve_ivfpq,
    )

    root = f"{TMP}/r9_ivfpq_curve_{lists}_{emb.count()}"
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root, exist_ok=True)
    books_path = os.path.join(root, "codebooks.parquet")
    books = similarity.pq_refine_codebooks(
        emb,
        similarity.pq_codebooks(
            emb, n_sub=_IVFPQ_SUB, n_codes=_IVFPQ_CODES
        ),
        n_sub=_IVFPQ_SUB,
        iterations=_IVFPQ_REFINE_ITERS,
    )
    books.coalesce(1).write.mode("overwrite").parquet(books_path)
    books = spark.read.parquet(books_path)
    cents = similarity.deterministic_centroids(emb, lists)
    codes = similarity.pq_encode(emb, books, n_sub=_IVFPQ_SUB).join(
        similarity.ivf_assign(emb, cents).select("vec_id", "list_id"),
        "vec_id",
    )
    t = TxTable(os.path.join(root, "codes"))
    t.commit_append_partitioned(
        codes.select("list_id", "vec_id", "codes"), "list_id"
    )
    exact = similarity.brute_force_topk(
        emb, emb.filter(F.col("vec_id") < nq), k=10
    ).select("query_id", "neighbor_id").localCheckpoint()
    n_exact = exact.count()
    curve = []
    for p in probes_list:
        approx, picked, total = _serve_ivfpq(
            spark, t, books_path, emb, cents, nq, p, shortlist
        )
        hits = exact.join(
            approx, ["query_id", "neighbor_id"], "left_semi"
        ).count()
        curve.append(
            {
                "probes": p,
                "recall": round(hits / n_exact, 3),
                "groups_scanned": picked if isinstance(picked, int)
                else len(picked),
                "groups_total": total,
            }
        )
    return curve


def exp_ivfpq_recall(spark) -> dict:
    iso = spark.read.parquet(
        "/root/testdata/sf0.01/embeddings.parquet"
    ).select("vec_id", "embedding").cache()
    iso.count()
    iso_curve = _ivfpq_curve(spark, iso, 16, [2, 4, 6, 8, 10, 12, 14, 16])
    clu = _clustered_vectors(spark)
    clu_curve = _ivfpq_curve(spark, clu, 64, [2, 4, 8, 16, 32])
    return {
        "exp": "ivfpq_recall_vs_probes",
        "isotropic_sf001_lists16": iso_curve,
        "clustered_20k_lists64": clu_curve,
    }


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    spark = get_spark("scale-r9")
    spark.sparkContext.setLogLevel("ERROR")
    exps = {
        "descentmv": exp_descent_mv,
        "blockmaxplan": exp_blockmax_plan,
        "ivfpqrecall": exp_ivfpq_recall,
    }
    for name, fn in exps.items():
        if which not in ("all", name):
            continue
        print(json.dumps(fn(spark)), flush=True)


if __name__ == "__main__":
    main()
