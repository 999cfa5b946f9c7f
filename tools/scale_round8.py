"""Round-8 scale measurements for SCALE.md:

1. ``blockmaxzipf`` — Block-Max WAND (search_bm25_blockmax's engine) on
   the round-7 Zipf corpus (400k docs, 50k-term Zipf vocabulary, 3
   keyword queries of 2 common + 2 rare terms).  Expect: the block
   sidecar prunes file GROUPS inside the essential terms' lists on top
   of MaxScore's term pruning, answers stay exactly equal to the plain
   indexed top-10.
2. ``nswstore`` — graph-ANN serving THROUGH the persisted txlog store
   at sf0.1 (2k vectors; the descent+longrange build primes once):
   per-hop zone-map group planning vs full-table edge reads, warm
   serving walls, group-skip fraction.
3. ``catalog100`` — multi-table catalog soak at x100 commit volume:
   4 tables (one deliberately ~100x the others), 100 main commits,
   a 25-commit branch merged back.  Expect: snapshot resolution and
   commit/conflict-check latency FLAT in table data size — the catalog
   touches only its own JSON log, never table bytes.
4. ``rfmx100`` — global-ntile vs the exact-rank-boundary plan on 1.5M
   keyed rows (segment aggregates asserted equal).
5. ``ivfpqx10`` — the IVF-PQ store at 20k clustered vectors: build
   once, planned-group probes + compressed ADC + exact re-rank vs
   brute force, recall@10.

Usage: python tools/scale_round8.py [blockmaxzipf|nswstore|catalog100|rfmx100|ivfpqx10|all]
Prints one JSON line per experiment; paste the numbers into SCALE.md.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")

from pyspark.sql import functions as F

from db_migration_spark.session import get_spark

BASE_SF = "/root/testdata/sf0.1"
TMP = "/root/repo/.tmp"


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _ensure_zipf_store(spark):
    """The round-7 Zipf postings store (tools/scale_round7.py
    exp_maxscore_zipf's generator, unchanged: same seed, same layout)
    — rebuilt here only if the shared TMP copy is missing."""
    from db_migration_spark.plans.txlog import TxTable

    V, N, L = 50_000, 400_000, 100
    store_root = f"{TMP}/r7_zipf_store"
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
        t.optimize(spark, sort_key=["term"], target_groups=32)
    return t, N, V


def exp_blockmax_zipf(spark) -> dict:
    """Block-Max vs MaxScore vs plain on the Zipf store: same top-10
    three ways (asserted), group-skip fraction from the block sidecar."""
    from pyspark.sql import Window

    from db_migration_spark.queries_search import (
        BLOCKMAX_LAST_STATS,
        MAXSCORE_LAST_STATS,
        _dec9,
        blockmax_topk,
        bm25_contrib,
        maxscore_topk,
    )

    t, N, V = _ensure_zipf_store(spark)
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

    t0 = time.time()
    ub_path = f"{TMP}/r8_zipf_ub.parquet"
    post.groupBy("term").agg(F.max(contrib).alias("ub")).coalesce(
        1
    ).write.mode("overwrite").parquet(ub_path)
    ub = spark.read.parquet(ub_path)
    ub_build = round(time.time() - t0, 2)

    t0 = time.time()
    bub_path = f"{TMP}/r8_zipf_bub.parquet"
    (
        post.withColumn(
            "grp", F.element_at(F.split(F.input_file_name(), "/"), -2)
        )
        .groupBy("grp", "term")
        .agg(F.max(contrib).alias("bub"))
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(bub_path)
    )
    bub = spark.read.parquet(bub_path)
    bub_build = round(time.time() - t0, 2)

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
    all_terms = sorted({r[1] for r in qrows})

    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.col("doc_id")
    )

    def plain_topk():
        return (
            post.filter(F.col("term").isin(all_terms))
            .join(F.broadcast(q), "term")
            .filter(F.col("doc_id") != F.col("query_id"))
            .groupBy("query_id", "doc_id")
            .agg(F.sum(_dec9(contrib)).alias("score"))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 10)
            .select(
                "query_id",
                "doc_id",
                F.col("score").cast("double").alias("score"),
                "rank",
            )
        )

    def timed(fn) -> float:
        t0 = time.time()
        _noop(fn())
        return time.time() - t0

    runs = {
        "plain": lambda: plain_topk(),
        "maxscore": lambda: maxscore_topk(spark, post, c, q, ub),
        "blockmax": lambda: blockmax_topk(spark, t, post, c, q, ub, bub),
    }
    walls = {}
    for name, fn in runs.items():
        timed(fn)  # warm
        walls[name] = round(min(timed(fn) for _ in range(3)), 3)

    full = {
        (r.query_id, r.rank): (r.doc_id, float(r.score))
        for r in plain_topk().collect()
    }
    bm = {
        (r.query_id, r.rank): (r.doc_id, r.score)
        for r in blockmax_topk(spark, t, post, c, q, ub, bub).collect()
    }
    assert bm == full, "block-max pruning changed the top-10"
    bst = dict(BLOCKMAX_LAST_STATS)
    mst = dict(MAXSCORE_LAST_STATS)
    n_terms = sum(s["n_terms"] for s in mst.values())
    n_ess = sum(s["n_essential"] for s in mst.values())
    return {
        "exp": "bm25_blockmax_zipf",
        "n_docs": N,
        "vocab": V,
        "ub_sidecar_build_sec": ub_build,
        "block_sidecar_build_sec": bub_build,
        "block_sidecar_rows": bub.count(),
        "query_terms": n_terms,
        "essential_terms": n_ess,
        "groups_allowed": bst["groups_allowed"],
        "groups_total": bst["groups_total"],
        "group_skip_frac": round(
            1 - bst["groups_allowed"] / bst["groups_total"], 4
        ),
        "term_group_pairs": [bst["pairs_allowed"], bst["pairs_total"]],
        "plain_indexed_warm_min3_sec": walls["plain"],
        "maxscore_warm_min3_sec": walls["maxscore"],
        "blockmax_warm_min3_sec": walls["blockmax"],
        "exact_top10": True,
    }


def exp_nswstore(spark) -> dict:
    """Graph serving through the persisted store at sf0.1: build primes
    once (descent + long-range, linear), probes plan each hop's frontier
    groups with batched zone maps.  Reports build amortization, per-hop
    group planning, and warm serving walls vs the full-edge-read plan."""
    from db_migration_spark.catalog import load_table
    from db_migration_spark.operators.similarity import nsw_beam_search
    from db_migration_spark.queries_annstore import (
        ensure_nsw_graph_store,
        store_beam_search,
    )

    t0 = time.time()
    t = ensure_nsw_graph_store(spark, BASE_SF)
    build = round(time.time() - t0, 2)  # ~0 when already primed
    emb = load_table(spark, BASE_SF, "embeddings").select(
        "vec_id", "embedding"
    )
    q = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )

    def through_store() -> tuple[float, int, int]:
        t0 = time.time()
        beam, scanned, scannable = store_beam_search(spark, t, emb, q)
        _noop(beam)
        return time.time() - t0, scanned, scannable

    def full_read() -> float:
        t0 = time.time()
        edges = t.read(spark).localCheckpoint(eager=False)
        _noop(nsw_beam_search(emb, edges, q))
        return time.time() - t0

    through_store()
    full_read()
    store_runs = [through_store() for _ in range(3)]
    full_sec = round(min(full_read() for _ in range(3)), 3)
    store_sec = round(min(r[0] for r in store_runs), 3)
    scanned, scannable = store_runs[0][1], store_runs[0][2]
    return {
        "exp": "nsw_store_serving_sf01",
        "n_vectors": emb.count(),
        "store_build_sec": build,
        "edges_rows": t.read(spark).count(),
        "groups_total": len(t.active_groups()),
        "hop_groups_planned": [scanned, scannable],
        "hop_group_skip_frac": round(1 - scanned / scannable, 4),
        "store_beam_warm_min3_sec": store_sec,
        "fullread_beam_warm_min3_sec": full_sec,
    }


def exp_catalog100(spark) -> dict:
    """Catalog soak at x100: 4 tables — one ~100x bigger than the others
    — 100 main commits, a 25-commit branch merged back.  The quantities
    that matter: commit latency on the big table vs a small one
    (conflict check = JSON log replay, never table bytes), snapshot
    resolution at head and at v1 (one commit file each), history cost."""
    from db_migration_spark.plans.catalog_txn import TxCatalog

    root = f"{TMP}/r8_catalog100"
    shutil.rmtree(root, ignore_errors=True)
    cat = TxCatalog(root)
    names = ["orders_t", "lineitem_t", "dims_t", "audit_t"]
    sizes = {"orders_t": 1_000_000, "lineitem_t": 10_000, "dims_t": 10_000, "audit_t": 10_000}
    t_commit: dict[str, list[float]] = {n: [] for n in names}
    for n in names:
        tab = cat.table(n)
        v = tab.commit_append(
            spark.range(sizes[n]).select(
                F.col("id").alias("k"), (F.col("id") * 3).alias("v")
            )
        )
        cat.commit({n: v})
    # 100 commits round-robin: each appends a SMALL batch to its table
    # and publishes; latency must not grow with table data size
    for i in range(96):
        n = names[i % 4]
        tab = cat.table(n)
        t0 = time.time()
        v = tab.commit_append(
            spark.range(100).select(
                (F.col("id") + i * 1000).alias("k"),
                F.lit(i).cast("long").alias("v"),
            )
        )
        cat.commit({n: v}, txn=("soak", i))
        t_commit[n].append(time.time() - t0)
    head = cat.latest_version()
    # branch: 25 commits on a side branch touching only audit_t, merged
    br = cat.create_branch("r8soak")
    for i in range(25):
        tab = br.table("audit_t")
        v = tab.commit_append(
            spark.range(10).select(
                (F.col("id") + 10_000_000 + i * 100).alias("k"),
                F.lit(-i).cast("long").alias("v"),
            )
        )
        br.commit({"audit_t": v}, txn=("br", i))
    merged_v = cat.merge_branch("r8soak")
    t0 = time.time()
    snap_head = cat.snapshot()
    snap_head_sec = time.time() - t0
    t0 = time.time()
    cat.snapshot(1)
    snap_v1_sec = time.time() - t0
    t0 = time.time()
    hist = cat.history()
    hist_sec = time.time() - t0
    big = t_commit["orders_t"]
    small = t_commit["dims_t"]
    return {
        "exp": "catalog_txn_x100",
        "main_commits": head + 1,
        "merged_head": merged_v,
        "tables": {n: sizes[n] for n in names},
        "commit_latency_big_table_med_sec": round(
            sorted(big)[len(big) // 2], 4
        ),
        "commit_latency_small_table_med_sec": round(
            sorted(small)[len(small) // 2], 4
        ),
        "flat_in_table_size": sorted(big)[len(big) // 2]
        < 3 * sorted(small)[len(small) // 2] + 0.5,
        "snapshot_head_sec": round(snap_head_sec, 4),
        "snapshot_v1_sec": round(snap_v1_sec, 4),
        "history_sec": round(hist_sec, 4),
        "n_history_rows": len(hist),
        "n_tables_at_head": len(snap_head),
    }


def exp_rfm_x100(spark) -> dict:
    """The ntile cliff vs the two-level prefix sum at ×100 key volume
    (1.5M keyed rows — the volume where SCALE.md:303 measured the
    global window at 10.4s): same three-metric quartile segmentation,
    (a) the global un-partitioned ntile plan, (b) the
    exact_rank_boundaries plan (collapsed buckets + in-bucket ranks +
    map-only tile comparison).  Segment aggregates asserted equal."""
    from pyspark.sql import Window

    from db_migration_spark.operators.relational import (
        exact_rank_boundaries,
        ntile_cut_ranks,
    )

    n = 1_500_000
    pc = (
        spark.range(n)
        .select(
            F.col("id").alias("k"),
            (F.abs(F.xxhash64("id", F.lit(1))) % 365).alias("recency"),
            (F.abs(F.xxhash64("id", F.lit(2))) % 40).alias("freq"),
            (F.abs(F.xxhash64("id", F.lit(3))) % 10_000_000).alias(
                "cents"
            ),
        )
        .localCheckpoint()
    )

    def window_plan():
        w_r = Window.orderBy("recency", "k")
        w_f = Window.orderBy(F.col("freq").desc(), "k")
        w_m = Window.orderBy(F.col("cents").desc(), "k")
        return (
            pc.select(
                "k",
                "cents",
                F.ntile(4).over(w_r).alias("r"),
                F.ntile(4).over(w_f).alias("f"),
                F.ntile(4).over(w_m).alias("m"),
            )
            .groupBy("r", "f", "m")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("cents").alias("spend"),
            )
        )

    def boundary_plan():
        pcx = pc.withColumn("neg_f", -F.col("freq")).withColumn(
            "neg_m", -F.col("cents")
        )
        ranks = ntile_cut_ranks(n, 4)
        parts = []
        for tag, col, bits in (
            ("r", "recency", 2),
            ("f", "neg_f", 2),
            ("m", "neg_m", 18),
        ):
            parts.append(
                exact_rank_boundaries(
                    pcx, col, "k", ranks, bucket_bits=bits
                ).withColumn("metric", F.lit(tag))
            )
        rows = (
            parts[0].unionByName(parts[1]).unionByName(parts[2]).collect()
        )
        by = {(r.metric, r["rank"]): (r.sv, r.idv) for r in rows}

        def tile(sv_col, tag):
            e = F.lit(1)
            for rk in ranks:
                bsv, bid = by[(tag, rk)]
                e = e + (
                    (F.col(sv_col) > F.lit(bsv))
                    | (
                        (F.col(sv_col) == F.lit(bsv))
                        & (F.col("k") > F.lit(bid))
                    )
                ).cast("int")
            return e

        return (
            pcx.select(
                "k",
                "cents",
                tile("recency", "r").alias("r"),
                tile("neg_f", "f").alias("f"),
                tile("neg_m", "m").alias("m"),
            )
            .groupBy("r", "f", "m")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("cents").alias("spend"),
            )
        )

    def timed(fn) -> float:
        t0 = time.time()
        _noop(fn())
        return time.time() - t0

    timed(window_plan)
    win_sec = round(min(timed(window_plan) for _ in range(3)), 3)
    timed(boundary_plan)
    bnd_sec = round(min(timed(boundary_plan) for _ in range(3)), 3)
    a = {tuple(r) for r in window_plan().collect()}
    b = {tuple(r) for r in boundary_plan().collect()}
    assert a == b, "boundary plan changed the segment aggregates"
    return {
        "exp": "rfm_ntile_vs_boundaries_x100",
        "n_keys": n,
        "ntile_window_warm_min3_sec": win_sec,
        "rank_boundaries_warm_min3_sec": bnd_sec,
        "segments_equal": True,
    }


def _clustered_vectors(spark, n=20_000, dim=64, n_clusters=200):
    """The round-7 clustered-embedding generator (200 centers +
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


def exp_ivfpq_x10(spark) -> dict:
    """IVF-PQ store at 20k clustered vectors (×10 the sf0.1 corpus):
    build the partitioned code store once, then compare warm serving —
    zone-map-pruned compressed ADC + exact 50-deep re-rank — against
    the brute-force scan, with recall@10 for 8 probes.  The quantities
    that matter at 100 TB: bytes/vector in the serving store (8 int
    codes vs 64 floats), fraction of file groups a probe plans, and
    probe wall vs brute."""
    from pyspark.sql import Window

    from db_migration_spark.operators import similarity
    from db_migration_spark.operators.similarity import (
        centroid_array,
        cosine,
    )
    from db_migration_spark.plans.txlog import TxTable

    emb = _clustered_vectors(spark)
    n = emb.count()
    store_root = f"{TMP}/r8_ivfpq_x10"
    books_path = f"{store_root}/codebooks.parquet"
    t = TxTable(f"{store_root}/codes")
    t0 = time.time()
    lists = 64
    if not t.active_groups():
        similarity.pq_codebooks(emb, n_sub=8, n_codes=16).coalesce(
            1
        ).write.mode("overwrite").parquet(books_path)
        books = spark.read.parquet(books_path)
        cents = similarity.deterministic_centroids(emb, lists)
        t.commit_append_partitioned(
            similarity.pq_encode(emb, books, n_sub=8)
            .join(
                similarity.ivf_assign(emb, cents).select(
                    "vec_id", "list_id"
                ),
                "vec_id",
            )
            .select("list_id", "vec_id", "codes"),
            "list_id",
        )
    build = round(time.time() - t0, 2)
    books = spark.read.parquet(books_path)
    cents = similarity.deterministic_centroids(emb, lists)
    q = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    probe_sorted = F.array_sort(
        F.transform(
            F.col("__cents"),
            lambda s: F.struct(
                (-cosine(F.col("query_vec"), s["centroid"])).alias("ns"),
                s["list_id"].alias("lid"),
            ),
        )
    )
    q_probe = q.crossJoin(F.broadcast(centroid_array(cents))).select(
        "query_id",
        F.explode(F.slice(probe_sorted, 1, 8)["lid"]).alias("list_id"),
    )
    probes = sorted(
        r.list_id for r in q_probe.select("list_id").distinct().collect()
    )
    picked, total = t.prune_groups_points("list_id", probes)
    lut = similarity.pq_lut(
        q.withColumnRenamed("query_id", "vec_id").withColumnRenamed(
            "query_vec", "embedding"
        ),
        books,
    )

    def store_topk():
        corpus = t.read_groups(spark, picked).filter(
            F.col("list_id").isin(probes)
        )
        scored = (
            corpus.join(F.broadcast(q_probe), "list_id")
            .filter(F.col("vec_id") != F.col("query_id"))
            .join(F.broadcast(lut), "query_id")
            .select(
                "query_id",
                F.col("vec_id").alias("neighbor_id"),
                F.aggregate(
                    F.sequence(F.lit(0), F.lit(7)),
                    F.lit(0.0),
                    lambda acc, m: acc
                    + F.element_at(
                        F.col("lut"),
                        (
                            m * 16 + F.element_at(F.col("codes"), m + 1) + 1
                        ).cast("int"),
                    ),
                ).alias("approx_score"),
            )
        )
        w = Window.partitionBy("query_id").orderBy(
            F.desc("approx_score"), F.col("neighbor_id")
        )
        short = (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 50)
            .select("query_id", "neighbor_id")
        )
        cv = emb.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("embedding").alias("corpus_vec"),
        )
        w2 = Window.partitionBy("query_id").orderBy(
            F.desc("score"), F.col("neighbor_id")
        )
        return (
            short.join(F.broadcast(q), "query_id")
            .join(cv, "neighbor_id")
            .select(
                "query_id",
                "neighbor_id",
                cosine("query_vec", "corpus_vec").alias("score"),
            )
            .withColumn("rank", F.row_number().over(w2))
            .filter(F.col("rank") <= 10)
        )

    def brute():
        return similarity.brute_force_topk(emb, emb.filter(F.col("vec_id") < 8), k=10)

    def timed(fn):
        t0 = time.time()
        _noop(fn().select("query_id", "neighbor_id"))
        return time.time() - t0

    timed(store_topk); timed(brute)
    store_sec = round(min(timed(store_topk) for _ in range(3)), 3)
    brute_sec = round(min(timed(brute) for _ in range(3)), 3)
    got = {(r.query_id, r.neighbor_id) for r in store_topk().collect()}
    want = {
        (r.query_id, r.neighbor_id)
        for r in brute().select("query_id", "neighbor_id").collect()
    }
    recall = len(got & want) / len(want)
    return {
        "exp": "ivfpq_store_x10",
        "n_vectors": n,
        "lists": lists,
        "store_build_sec": build,
        "groups_planned": [len(picked), total],
        "group_plan_frac": round(len(picked) / total, 4),
        "bytes_per_vector": "8 int codes vs 64 float dims (8x smaller serving store)",
        "store_probe_warm_min3_sec": store_sec,
        "brute_warm_min3_sec": brute_sec,
        "recall_at_10": round(recall, 3),
    }


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    spark = get_spark("scale-r8")
    spark.sparkContext.setLogLevel("ERROR")
    exps = {
        "blockmaxzipf": exp_blockmax_zipf,
        "nswstore": exp_nswstore,
        "catalog100": exp_catalog100,
        "rfmx100": exp_rfm_x100,
        "ivfpqx10": exp_ivfpq_x10,
    }
    for name, fn in exps.items():
        if which not in ("all", name):
            continue
        print(json.dumps(fn(spark)), flush=True)


if __name__ == "__main__":
    main()
