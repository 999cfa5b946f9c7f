"""Round-7 scale/variance measurements for SCALE.md:

1. ``simhash``  — three consecutive same-JVM timed runs of the headline
   simhash near-dup pipeline at sf0.1 under the new 24g bench heap
   (+ per-run GC time).  Round-6 verdict: the same plan ran 8.0s then
   >=32s inside one JVM at the old 8g heap — the done-bar is three runs
   within +/-25%.
2. ``logbin100`` — the log-bin quantile rollup build at 100M raw rows
   (the round-6 table stopped at x10/10M; HLL/theta go to x100).
   Expect: build time flat vs the 10M row (map-side combine bounds the
   shuffle by dims x bins at any volume).
3. ``bm25x10`` — the indexed-BM25 serving probe against a 10x corpus
   (replicated+perturbed documents, same remap as tools/scale_test.py).
   Expect: probe cost proportional to MATCHED POSTINGS, not corpus; a
   single-term point probe plans a small fraction of the store's file
   groups (zone-map file skipping asserted).

Usage: python tools/scale_round7.py [simhash|logbin100|bm25x10|all]
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

from pyspark.sql import functions as F

from db_migration_spark.session import get_spark

BASE_SF = "/root/testdata/sf0.1"
TMP = "/root/repo/.tmp"


def _gc_millis(spark) -> int:
    beans = (
        spark._jvm.java.lang.management.ManagementFactory
        .getGarbageCollectorMXBeans()
    )
    return sum(max(b.getCollectionTime(), 0) for b in beans)


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def exp_simhash(spark) -> dict:
    from db_migration_spark.catalog import load_table
    from db_migration_spark.operators import dedup

    docs = load_table(spark, BASE_SF, "documents")
    docs.count()  # table warm-up

    def run() -> float:
        t0 = time.time()
        _noop(dedup.simhash_near_dups(docs, max_hamming=3, bands=4))
        return time.time() - t0

    # TWO untimed warm-ups: with the GC cliff gone (gc_ms ~20 per run at
    # 24g vs multi-second old-gen pauses at 8g), the residual run-to-run
    # decay is C2 tier-up, which takes ~2 executions of this plan shape
    # to finish — the +/-25% bar is about steady-state variance
    run()
    run()
    runs, gcs = [], []
    for _ in range(3):
        g0 = _gc_millis(spark)
        runs.append(round(run(), 3))
        gcs.append(_gc_millis(spark) - g0)
    spread = round((max(runs) - min(runs)) / min(runs), 3)
    return {
        "exp": "simhash_same_jvm_x3",
        "driver_mem": os.environ["SPARK_GRAFT_DRIVER_MEM"],
        "runs_sec": runs,
        "gc_ms": gcs,
        "spread": spread,
        "within_25pct": spread <= 0.25,
    }


def exp_logbin100(spark) -> dict:
    from db_migration_spark.functions.qsketch import (
        logbin_quantiles,
        logbin_table,
    )

    n = 100_000_000
    # synthetic uniform ints 1..1M over 8 dims — the same shape as the
    # round-6 x1/x10 rows (true p50 ~ 500k)
    raw = spark.range(n).select(
        (F.col("id") % 8).cast("string").alias("dim"),
        (F.pmod(F.xxhash64("id"), F.lit(1_000_000)) + 1).alias("v"),
    )
    t0 = time.time()
    tbl = logbin_table(raw, ["dim"], "v")
    rollup_rows = tbl.count()
    build = round(time.time() - t0, 2)
    tbl = tbl.cache()
    tbl.count()
    t0 = time.time()
    q = logbin_quantiles(tbl.drop("dim"), [], [("p50", 0.5)]).collect()
    quantile = round(time.time() - t0, 2)
    tbl.unpersist()
    p50 = float(q[0]["p50"])
    return {
        "exp": "logbin_build_100M",
        "raw_rows": n,
        "rollup_rows": rollup_rows,
        "build_sec": build,
        "quantile_sec": quantile,
        "p50": p50,
        "p50_err_vs_500k": round(p50 / 500_000.0 - 1, 4),
    }


def exp_bm25x10(spark) -> dict:
    from db_migration_spark.catalog import load_table
    from db_migration_spark.functions import text as TXT
    from db_migration_spark.plans.txlog import TxTable

    docs10_path = _ensure_docs10(spark)

    docs = spark.read.parquet(docs10_path)
    n_docs = docs.count()

    store_root = f"{TMP}/r7_bm25x10_store"
    shutil.rmtree(store_root, ignore_errors=True)
    terms_df = docs.select(
        "doc_id",
        F.explode(TXT.tokens(F.lower(F.col("text")))).alias("term"),
    )
    tf = terms_df.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    post = (
        tf.join(dl, "doc_id").join(df_, "term")
        .select("term", "doc_id", "tf", "dl", "df")
    )
    t0 = time.time()
    t = TxTable(store_root)
    t.commit_append(post)
    t.optimize(spark, sort_key=["term"], target_groups=32)
    build = round(time.time() - t0, 2)
    n_post = t.read(spark).count()

    # probe terms: the distinct tokens of docs 0..2 (the serving query)
    probe_terms = sorted(
        r.term
        for r in tf.filter(F.col("doc_id") < 3)
        .select("term").distinct().collect()
    )
    matched = (
        t.read(spark)
        .filter(F.col("term").isin(probe_terms))
        .count()
    )

    def probe() -> float:
        t0 = time.time()
        _noop(
            t.read(spark)
            .filter(F.col("term").isin(probe_terms))
            .groupBy("doc_id")
            .agg(F.sum("tf").alias("s"))
        )
        return time.time() - t0

    probe()
    probe_sec = round(min(probe() for _ in range(3)), 3)

    # zone-map file skipping: a single-term point probe must plan a
    # small fraction of the term-clustered store's groups
    one = probe_terms[len(probe_terms) // 2]
    picked, total = t.prune_groups("term", lo=one, hi=one)
    frac = len(picked) / total
    assert frac <= 0.25, (
        f"point probe planned {len(picked)}/{total} groups — "
        "term clustering is not skipping files"
    )
    return {
        "exp": "bm25_indexed_x10",
        "n_docs": n_docs,
        "postings_rows": n_post,
        "store_build_sec": build,
        "probe_terms": len(probe_terms),
        "matched_postings": matched,
        "probe_warm_min3_sec": probe_sec,
        "point_probe_groups": [len(picked), total],
        "point_probe_file_skip": round(1 - frac, 3),
    }


def exp_maxscorex10(spark) -> dict:
    """MaxScore-pruned BM25 vs plain indexed serving at the 10x corpus:
    same top-10 (asserted row-for-row), but candidate generation reads
    only the essential terms' postings.  The quantities that matter at
    100 TB: essential-term fraction, candidate-generation postings
    (essential-matched vs all-matched), and warm wall time."""
    from db_migration_spark.functions import text as TXT
    from db_migration_spark.plans.txlog import TxTable
    from db_migration_spark.queries_search import (
        MAXSCORE_LAST_STATS,
        _dec9,
        bm25_contrib,
        maxscore_topk,
    )

    docs10_path = f"{TMP}/r7_docs10.parquet"
    if not os.path.exists(docs10_path):
        raise SystemExit("run bm25x10 first (builds the 10x corpus)")
    docs = spark.read.parquet(docs10_path)

    store_root = f"{TMP}/r7_bm25x10_store"
    if not os.path.exists(store_root):
        raise SystemExit("run bm25x10 first (builds the postings store)")
    t = TxTable(store_root)
    post = t.read(spark)

    consts = post.select("doc_id", "dl").distinct().agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    ).collect()[0]
    c = {"n_docs": consts["n_docs"], "avgdl": consts["avgdl"]}

    contrib = bm25_contrib(c["n_docs"], c["avgdl"])
    t0 = time.time()
    ub = post.groupBy("term").agg(F.max(contrib).alias("ub"))
    ub_path = f"{TMP}/r7_maxscore_ub.parquet"
    ub.coalesce(1).write.mode("overwrite").parquet(ub_path)
    ub = spark.read.parquet(ub_path)
    ub_build = round(time.time() - t0, 2)

    q = docs.filter(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("query_id"),
        F.explode(TXT.tokens(F.lower(F.col("text")))).alias("term"),
    ).distinct().persist()
    q.count()
    all_terms = sorted(r.term for r in q.select("term").distinct().collect())

    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.col("doc_id")
    )

    def scored_topk():
        # the FULL plain serving pipeline incl. the top-k rank stage, so
        # plain vs maxscore wall times compare the same deliverable
        return (
            post.filter(F.col("term").isin(all_terms))
            .join(F.broadcast(q), "term")
            .filter(F.col("doc_id") != F.col("query_id"))
            .groupBy("query_id", "doc_id")
            .agg(F.sum(_dec9(contrib)).alias("score"))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 10)
        )

    def plain() -> float:
        t0 = time.time()
        _noop(scored_topk())
        return time.time() - t0

    def pruned() -> float:
        t0 = time.time()
        _noop(maxscore_topk(spark, post, c, q, ub))
        return time.time() - t0

    plain()
    plain_sec = round(min(plain() for _ in range(3)), 3)
    pruned()
    pruned_sec = round(min(pruned() for _ in range(3)), 3)
    # exactness at x10: pruned top-10 == unpruned top-10
    full_top = {
        (r.query_id, r.rank): (r.doc_id, float(r.score))
        for r in scored_topk()
        .select("query_id", "doc_id",
                F.col("score").cast("double").alias("score"), "rank")
        .collect()
    }
    pruned_top = {
        (r.query_id, r.rank): (r.doc_id, r.score)
        for r in maxscore_topk(spark, post, c, q, ub).collect()
    }
    assert pruned_top == full_top, "MaxScore pruning changed the top-10"

    stats = dict(MAXSCORE_LAST_STATS)
    n_terms = sum(s["n_terms"] for s in stats.values())
    n_ess = sum(s["n_essential"] for s in stats.values())
    # postings read for candidate generation, both ways: the union of
    # essential terms is what phase 3 In-filters at the scan
    from db_migration_spark.queries_search import MAXSCORE_LAST_ESSENTIAL

    all_matched = post.filter(F.col("term").isin(all_terms)).count()
    ess_matched = post.filter(
        F.col("term").isin(sorted(MAXSCORE_LAST_ESSENTIAL))
    ).count()
    return {
        "exp": "bm25_maxscore_x10",
        "n_docs": docs.count(),
        "ub_sidecar_build_sec": ub_build,
        "query_terms": n_terms,
        "essential_terms": n_ess,
        "essential_term_frac": round(n_ess / n_terms, 3),
        "all_matched_postings": all_matched,
        "essential_matched_postings": ess_matched,
        "candidate_postings_frac": round(ess_matched / all_matched, 4),
        "plain_indexed_warm_min3_sec": plain_sec,
        "maxscore_warm_min3_sec": pruned_sec,
        "exact_top10": True,
    }


def exp_maxscore_zipf(spark) -> dict:
    """MaxScore on a REALISTIC vocabulary: the sf0.1 documents table has
    40 distinct terms with min df = 5% of docs — a worst case where no
    impact ordering can differentiate (measured: 75% of terms stay
    essential, pruning buys nothing).  Real text is Zipfian; this
    experiment generates a log-uniform-rank corpus (P(rank r) ~ 1/r,
    i.e. Zipf s=1: 50k-term vocabulary, a few ubiquitous terms, a long
    rare tail) and serves 3 keyword queries of 2 common + 2 rare terms —
    the workload WAND/MaxScore was built for.  Expected shape: the rare
    terms alone are essential, candidate generation reads their short
    lists only, and the common terms' giant lists are touched only
    through the candidate semi-join at scoring."""
    import math

    from pyspark.sql import Window

    from db_migration_spark.plans.txlog import TxTable
    from db_migration_spark.queries_search import (
        MAXSCORE_LAST_ESSENTIAL,
        MAXSCORE_LAST_STATS,
        _dec9,
        bm25_contrib,
        maxscore_topk,
    )

    V, N, L = 50_000, 400_000, 100
    store_root = f"{TMP}/r7_zipf_store"
    t = TxTable(store_root)
    t0 = time.time()
    if not t.active_groups():
        toks = (
            spark.range(N)
            .select(F.col("id").alias("doc_id"))
            .select(
                "doc_id",
                F.explode(
                    F.sequence(F.lit(0), F.lit(L - 1))
                ).alias("pos"),
            )
        )
        u = (
            F.abs(F.xxhash64("doc_id", "pos", F.lit(7))) % 1_000_000_003
        ) / 1_000_000_003.0
        rank = F.least(
            F.lit(V),
            F.greatest(
                F.lit(1), F.floor(F.exp(u * F.lit(math.log(V))))
            ),
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
    build = round(time.time() - t0, 2)
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
    ub_path = f"{TMP}/r7_zipf_ub.parquet"
    post.groupBy("term").agg(F.max(contrib).alias("ub")).coalesce(
        1
    ).write.mode("overwrite").parquet(ub_path)
    ub = spark.read.parquet(ub_path)
    ub_build = round(time.time() - t0, 2)

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

    def scored_full():
        return (
            post.filter(F.col("term").isin(all_terms))
            .join(F.broadcast(q), "term")
            .filter(F.col("doc_id") != F.col("query_id"))
            .groupBy("query_id", "doc_id")
            .agg(F.sum(_dec9(contrib)).alias("score"))
        )

    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.col("doc_id")
    )

    def plain() -> float:
        t0 = time.time()
        _noop(
            scored_full()
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 10)
        )
        return time.time() - t0

    def pruned() -> float:
        t0 = time.time()
        _noop(maxscore_topk(spark, post, c, q, ub))
        return time.time() - t0

    plain()
    plain_sec = round(min(plain() for _ in range(3)), 3)
    pruned()
    pruned_sec = round(min(pruned() for _ in range(3)), 3)

    full_top = {
        (r.query_id, r.rank): (r.doc_id, float(r.score))
        for r in scored_full()
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select(
            "query_id",
            "doc_id",
            F.col("score").cast("double").alias("score"),
            "rank",
        )
        .collect()
    }
    pruned_top = {
        (r.query_id, r.rank): (r.doc_id, r.score)
        for r in maxscore_topk(spark, post, c, q, ub).collect()
    }
    assert pruned_top == full_top, "MaxScore pruning changed the top-10"

    st = dict(MAXSCORE_LAST_STATS)
    n_terms = sum(s["n_terms"] for s in st.values())
    n_ess = sum(s["n_essential"] for s in st.values())
    ess_terms = sorted(MAXSCORE_LAST_ESSENTIAL)
    all_matched = post.filter(F.col("term").isin(all_terms)).count()
    ess_matched = post.filter(F.col("term").isin(ess_terms)).count()

    # group-level planning: zone maps on the term-clustered layout — how
    # many of the 32 file groups each phase's In-filter plans
    def groups_for(terms: list) -> int:
        picked: set = set()
        for term in terms:
            g, _ = t.prune_groups("term", lo=term, hi=term)
            picked.update(g)
        return len(picked)

    n_groups = len(t.active_groups())
    cand_frac = ess_matched / all_matched
    assert n_ess / n_terms <= 0.6, "expected common terms pruned"
    assert cand_frac <= 0.05, "expected candidate postings collapse"
    return {
        "exp": "bm25_maxscore_zipf",
        "n_docs": N,
        "vocab": V,
        "postings_rows": post.count(),
        "store_build_sec": build,
        "ub_sidecar_build_sec": ub_build,
        "query_terms": n_terms,
        "essential_terms": n_ess,
        "essential_term_frac": round(n_ess / n_terms, 3),
        "all_matched_postings": all_matched,
        "essential_matched_postings": ess_matched,
        "candidate_postings_frac": round(cand_frac, 5),
        "candidate_groups_planned": [groups_for(ess_terms), n_groups],
        "scoring_groups_planned": [groups_for(all_terms), n_groups],
        "plain_indexed_warm_min3_sec": plain_sec,
        "maxscore_warm_min3_sec": pruned_sec,
        "exact_top10": True,
    }


def exp_lshx10(spark) -> dict:
    """Persisted LSH band store at a 10x corpus: build once, then (a)
    batch-probe with a 5k-doc batch (cost = batch x matched buckets)
    and (b) point-probe one stored doc's text (planning bounded by
    BANDS groups at any store size — bloom + disjoint zone ranges)."""
    from db_migration_spark.operators import dedup
    from db_migration_spark.plans.txlog import TxTable
    from db_migration_spark.queries_dedupstore import (
        point_candidates,
        probe_pairs,
    )

    docs10_path = f"{TMP}/r7_docs10.parquet"
    if not os.path.exists(docs10_path):
        raise SystemExit("run bm25x10 first (builds the 10x corpus)")
    docs = spark.read.parquet(docs10_path)
    store_root = f"{TMP}/r7_lshx10_store"
    shutil.rmtree(store_root, ignore_errors=True)
    sig_path = f"{TMP}/r7_lshx10_sigs.parquet"

    t0 = time.time()
    sigs = dedup.minhash_signatures(docs, num_hashes=32)
    sigs.write.mode("overwrite").parquet(sig_path)
    sigs = spark.read.parquet(sig_path)
    t = TxTable(store_root)
    t.commit_append(dedup.band_rows(sigs, "doc_id", 8))
    t.optimize(spark, sort_key=["bucket"], target_groups=32)
    t.add_bloom_index(spark, "bucket")
    build = round(time.time() - t0, 2)
    n_docs = docs.count()

    batch = docs.filter(F.col("doc_id") % 10 == 3)
    bsigs = dedup.minhash_signatures(batch, num_hashes=32).persist()
    bsigs.count()

    def probe() -> float:
        t0 = time.time()
        _noop(probe_pairs(t.read(spark), sigs, bsigs))
        return time.time() - t0

    probe()
    probe_sec = round(min(probe() for _ in range(3)), 3)

    one = docs.orderBy("doc_id").limit(1).select(
        F.lit(-1).cast("long").alias("doc_id"), "text"
    )
    psig = dedup.minhash_signatures(one, num_hashes=32)
    t0 = time.time()
    cand, scanned = point_candidates(spark, t, psig)
    n_cand = cand.count()
    point_sec = round(time.time() - t0, 3)
    assert len(scanned) <= 8, scanned
    return {
        "exp": "lsh_store_x10",
        "n_docs": n_docs,
        "store_build_sec": build,
        "batch_docs": batch.count(),
        "batch_probe_warm_min3_sec": probe_sec,
        "point_probe_sec": point_sec,
        "point_candidates": n_cand,
        "point_groups_scanned": [len(scanned), len(t.active_groups())],
    }


def exp_nswserve(spark) -> dict:
    """NSW graph-ANN: the serving claim is that SEARCH cost is bounded
    by beam x degree x hops, independent of corpus size.  Build the kNN
    graph offline at x1 (sf0.01, 500 vecs) and x4 (sf0.1, 2000 vecs),
    persist the adjacency, then time the beam search alone — expect
    build ~corpus^2 while search stays flat with near-identical
    candidate counts.  Build and search run the SAME code the oracle
    gate certifies (queries_round4.nsw_build_edges/nsw_beam_search)."""
    from db_migration_spark.catalog import load_table
    from db_migration_spark.queries_round4 import (
        _NSW_K,
        nsw_beam_search,
        nsw_build_edges,
    )

    scales = []
    for sf, tag in (("/root/testdata/sf0.01", "x1"), (BASE_SF, "x4")):
        emb = load_table(spark, sf, "embeddings").select(
            "vec_id", "embedding"
        )
        n_vecs = emb.count()
        path = f"{TMP}/r7_nsw_edges_{tag}.parquet"
        t0 = time.time()
        nsw_build_edges(emb).write.mode("overwrite").parquet(path)
        build = round(time.time() - t0, 2)

        edges = spark.read.parquet(path)
        q = emb.filter(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qv"),
        )

        def search(count_cands: bool = False):
            t0 = time.time()
            cands = [0]
            on_c = (
                (lambda df: cands.__setitem__(0, cands[0] + df.count()))
                if count_cands
                else None
            )
            beam = nsw_beam_search(emb, edges, q, on_candidates=on_c)
            n = beam.filter(F.col("node") != F.col("query_id")).count()
            assert n >= _NSW_K
            return time.time() - t0, cands[0]

        search()  # warm-up
        _, cands = search(count_cands=True)
        best = round(min(search()[0] for _ in range(3)), 3)
        scales.append(
            {
                "tag": tag,
                "n_vecs": n_vecs,
                "build_sec": build,
                "search_warm_min3_sec": best,
                "cands_scored": cands,
            }
        )
    return {"exp": "nsw_serving_x4", "scales": scales}


def exp_nswdescent(spark) -> dict:
    """NN-descent graph build at 20,000 synthetic vectors — a corpus
    where the n² exact build is ~100× the sf0.1 one and off the table.
    Measures: descent build wall (4 rounds, cost ∝ n·(2m)² per round),
    then beam-search recall@10 for 5 probes against the exact
    brute-force answer (brute only for those 5 probes — 5·n dots, the
    verification-sized exception)."""
    from pyspark.sql import Window

    from db_migration_spark.queries_round4 import (
        _NSW_K,
        _fp_dot,
        nsw_beam_search,
        nsw_build_edges_descent,
        nsw_longrange_edges,
    )

    # clustered vectors (200 centers + 0.25-amplitude noise) — the
    # regime real embeddings live in; UNIFORM random vectors are the
    # degenerate ANN case (pairwise dots concentrate, so neighbor
    # structure barely exists: recall there was 11/50 even at 15 hops,
    # for descent AND for any index — recorded as the honest negative)
    n, dim, n_clusters = 20_000, 64, 200
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
    t0 = time.time()
    edges = nsw_build_edges_descent(
        emb, seed_planes=10, seed_tables=4
    ).unionByName(nsw_longrange_edges(emb)).dropDuplicates(["src", "dst"])
    n_edges = edges.count()
    build = round(time.time() - t0, 2)
    path = f"{TMP}/r7_nsw_descent_edges.parquet"
    edges.write.mode("overwrite").parquet(path)
    edges = spark.read.parquet(path)

    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    # hop count scales with graph diameter (~log2 n): 3 hops navigates
    # a 500-node graph, a 20k-node one needs ~15 to reach the query's
    # region from the fixed entry — candidates stay beam-bounded per hop
    t0 = time.time()
    beam = nsw_beam_search(emb, edges, q, hops=15)
    wf = Window.partitionBy("query_id").orderBy(F.desc("rel"), "node")
    got = (
        beam.filter(F.col("node") != F.col("query_id"))
        .withColumn("rn", F.row_number().over(wf))
        .filter(F.col("rn") <= _NSW_K)
        .select("query_id", F.col("node").alias("neighbor_id"))
    )
    exact = (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            _fp_dot(F.col("qv"), F.col("embedding")).alias("rel"),
        )
    )
    wx = Window.partitionBy("query_id").orderBy(
        F.desc("rel"), "neighbor_id"
    )
    exact = (
        exact.withColumn("rn", F.row_number().over(wx))
        .filter(F.col("rn") <= _NSW_K)
        .select("query_id", "neighbor_id")
    )
    hits = got.join(exact, ["query_id", "neighbor_id"], "left_semi").count()
    search = round(time.time() - t0, 2)
    emb.unpersist()
    return {
        "exp": "nsw_descent_20k",
        "n_vecs": n,
        "n_edges": n_edges,
        "build_sec": build,
        "search_plus_verify_sec": search,
        "recall_at_10": f"{hits}/{5 * _NSW_K}",
    }


def _ensure_docs10(spark) -> str:
    """Materialize (once) the 10x replicated+perturbed documents corpus
    shared by the bm25/lsh/dsir x10 experiments."""
    from db_migration_spark.catalog import load_table

    docs10_path = f"{TMP}/r7_docs10.parquet"
    if os.path.exists(docs10_path):
        return docs10_path
    base = load_table(spark, BASE_SF, "documents")
    reps = spark.range(10).select(F.col("id").alias("__rep"))
    df = (
        base.crossJoin(F.broadcast(reps))
        .withColumn(
            "doc_id", F.col("doc_id") + F.col("__rep") * 10_000_000
        )
        .withColumn(
            "text",
            F.when(F.col("__rep") == 0, F.col("text")).otherwise(
                F.concat(
                    F.format_string("rep%d ", F.col("__rep")),
                    F.col("text"),
                )
            ),
        )
        .drop("__rep")
    )
    df.repartition(32).write.mode("overwrite").parquet(docs10_path)
    return docs10_path


def exp_dsirx10(spark) -> dict:
    """DSIR fit+score at 1x vs 10x documents: expect ~linear wall time
    (two corpus passes) with the stats frame pinned at <=256 rows."""
    from db_migration_spark.catalog import load_table
    from db_migration_spark.operators.corpus import (
        dsir_bucket_stats,
        dsir_occurrences,
        dsir_weights,
    )

    docs10_path = _ensure_docs10(spark)
    out = []
    for tag, docs in (
        ("x1", load_table(spark, BASE_SF, "documents")),
        ("x10", spark.read.parquet(docs10_path)),
    ):
        n = docs.count()
        t0 = time.time()
        stats_rows = dsir_bucket_stats(
            dsir_occurrences(docs), F.col("lang") == "en"
        ).count()
        fit = round(time.time() - t0, 2)
        t0 = time.time()
        _noop(dsir_weights(docs, F.col("lang") == "en"))
        full = round(time.time() - t0, 2)
        out.append(
            {
                "tag": tag,
                "n_docs": n,
                "stats_rows": stats_rows,
                "fit_sec": fit,
                "fit_plus_score_sec": full,
            }
        )
    return {"exp": "dsir_x10", "scales": out}


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    spark = get_spark("scale-r7")
    spark.sparkContext.setLogLevel("ERROR")
    exps = {
        "simhash": exp_simhash,
        "logbin100": exp_logbin100,
        "bm25x10": exp_bm25x10,
        "lshx10": exp_lshx10,
        "maxscorex10": exp_maxscorex10,
        "maxscorezipf": exp_maxscore_zipf,
        "nswserve": exp_nswserve,
        "dsirx10": exp_dsirx10,
        "nswdescent": exp_nswdescent,
    }
    for name, fn in exps.items():
        if which not in ("all", name):
            continue
        print(json.dumps(fn(spark)), flush=True)


if __name__ == "__main__":
    main()
