"""theta/KMV sketch primitives (functions/theta.py): merge losslessness,
hot-group pre-truncation equivalence, exact-path behavior, and
adversarial planted-set bounds — the local red line in front of the
oracle gates in queries_sketches.py."""

import pytest
from pyspark.sql import functions as F

from db_migration_spark.functions.theta import (
    DOMAIN,
    kmv_merge,
    kmv_scale_count,
    kmv_sketch,
    kmv_stats,
    theta_hash,
)


def _ids(spark, n, seg="a", start=0):
    return spark.range(start, start + n).select(
        F.lit(seg).alias("seg"), F.col("id").cast("string").alias("key")
    )


def _naive_topk(spark, df, k):
    """Reference: k smallest distinct hashes per seg via plain SQL."""
    hashed = df.select("seg", theta_hash("key").alias("v")).distinct()
    hashed.createOrReplaceTempView("naive_hv")
    return spark.sql(
        f"""SELECT seg, v FROM (
              SELECT seg, v,
                     row_number() OVER (PARTITION BY seg ORDER BY v) rn
              FROM naive_hv) WHERE rn <= {k}"""
    )


def test_sketch_equals_naive_topk(spark):
    """The salted two-level build returns EXACTLY the global top-k
    (the pre-truncation must be invisible)."""
    df = _ids(spark, 5000)
    got = kmv_sketch(df, ["seg"], "key", 64).orderBy("v").collect()
    want = _naive_topk(spark, df, 64).orderBy("v").collect()
    assert [r.v for r in got] == [r.v for r in want]
    assert len(got) == 64


def test_merge_is_lossless(spark):
    """top-k of merged per-slice sketches == sketch of the union —
    the associativity contract incremental rollups rely on."""
    parts = [_ids(spark, 800, start=i * 500) for i in range(4)]  # overlap
    whole = parts[0]
    for p in parts[1:]:
        whole = whole.unionByName(p)
    direct = kmv_sketch(whole, ["seg"], "key", 128)
    merged = kmv_merge(
        kmv_sketch(parts[0], ["seg"], "key", 128)
        .unionByName(kmv_sketch(parts[1], ["seg"], "key", 128))
        .unionByName(kmv_sketch(parts[2], ["seg"], "key", 128))
        .unionByName(kmv_sketch(parts[3], ["seg"], "key", 128)),
        ["seg"],
        128,
    )
    assert sorted(r.v for r in direct.collect()) == sorted(
        r.v for r in merged.collect()
    )


def test_exact_path_under_k(spark):
    """n < k: the sketch IS the value set; theta covers the domain and
    the estimate is exactly n."""
    st = kmv_stats(
        kmv_sketch(_ids(spark, 37), ["seg"], "key", 256), ["seg"], 256
    ).collect()[0]
    assert st.n_vals == 37
    assert st.theta_v == DOMAIN
    assert st.est == 37


def test_estimate_bound_planted(spark):
    """Planted 20_000-key set: the k=256 estimate lands within 20%
    (RSE ≈ 6.3%; 20% is > 3σ)."""
    st = kmv_stats(
        kmv_sketch(_ids(spark, 20_000), ["seg"], "key", 256), ["seg"], 256
    ).collect()[0]
    assert st.n_vals == 256 and st.theta_v < DOMAIN
    assert abs(st.est / 20_000 - 1.0) <= 0.20


def test_disjoint_sets_intersect_to_zero(spark):
    """Adversarial: two DISJOINT planted sets must estimate a zero
    intersection (any common retained value would be a hash collision
    across different keys — none at these sizes)."""
    a = kmv_sketch(_ids(spark, 3000, seg="a"), ["seg"], "key", 256)
    b = kmv_sketch(
        _ids(spark, 3000, seg="b", start=1_000_000), ["seg"], "key", 256
    )
    common = a.select("v").intersect(b.select("v"))
    assert common.count() == 0


def test_scale_count_exact_when_domain(spark):
    """theta = full domain ⇒ the sample is the whole set: scaling is
    the identity, no float path."""
    df = spark.createDataFrame(
        [(5, DOMAIN), (7, DOMAIN // 2)], "cnt long, th long"
    )
    out = {
        (r.cnt, r.th): r.est
        for r in df.select(
            "cnt",
            "th",
            kmv_scale_count(F.col("cnt"), F.col("th")).alias("est"),
        ).collect()
    }
    assert out[(5, DOMAIN)] == 5
    assert out[(7, DOMAIN // 2)] == 14


def test_no_python_udf_in_plan(spark):
    """The whole family is JVM expressions — no Python eval nodes."""
    plan = kmv_stats(
        kmv_sketch(_ids(spark, 100), ["seg"], "key", 64), ["seg"], 64
    )._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_det_sample_deterministic_and_nested(spark):
    """Same rows under any partitioning; the 1/16 tier is a subset of
    the 1/4 tier (nested-sample property random() cannot give)."""
    from db_migration_spark.functions.theta import det_sample

    df = _ids(spark, 4000)
    s16a = sorted(r.key for r in det_sample(df, "key", 16).collect())
    s16b = sorted(
        r.key for r in det_sample(df.repartition(13), "key", 16).collect()
    )
    assert s16a == s16b and len(s16a) > 0
    s4 = set(r.key for r in det_sample(df, "key", 4).collect())
    assert set(s16a) <= s4
    # fraction sanity: 1/16 ± 3σ
    import math

    n, p = 4000, 1 / 16
    assert abs(len(s16a) - n * p) <= 3 * math.sqrt(n * p * (1 - p))


def test_det_sample_filter_pushes_to_scan(spark, tmp_path):
    """The sample predicate is a JVM expression at the scan — no
    Python nodes, and the parquet scan carries the filter."""
    from db_migration_spark.functions.theta import det_sample

    p = str(tmp_path / "t.parquet")
    _ids(spark, 1000).write.mode("overwrite").parquet(p)
    plan = (
        det_sample(spark.read.parquet(p), "key", 16)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# --- priority sampling -------------------------------------------------------


def _weighted(spark, n, seg="a"):
    # deterministic skewed weights: w in {1, 2, ..} with a few heavy items
    return spark.range(n).select(
        F.lit(seg).alias("seg"),
        F.col("id").cast("string").alias("key"),
        (
            F.when(F.col("id") % 97 == 0, F.lit(1000.0)).otherwise(
                (F.col("id") % 7 + 1).cast("double")
            )
        ).alias("w"),
    )


def test_priority_sample_salted_equals_naive(spark):
    """The salted two-level top-(k+1) must equal a plain global
    top-(k+1) by (q desc, v) — pre-truncation invisible."""
    from db_migration_spark.functions.theta import priority_sample

    df = _weighted(spark, 4000)
    k = 64
    got = priority_sample(df, ["seg"], "key", "w", k=k)
    hashed = df.select(
        "seg",
        theta_hash("key").alias("v"),
        F.col("w"),
        (
            (F.col("w") * F.lit(float(DOMAIN)))
            / (theta_hash("key") + F.lit(1)).cast("double")
        ).alias("q"),
    )
    hashed.createOrReplaceTempView("naive_pq")
    naive = spark.sql(
        f"""SELECT seg, v FROM (
              SELECT seg, v,
                     row_number() OVER (PARTITION BY seg
                                        ORDER BY q DESC, v) rn
              FROM naive_pq) WHERE rn <= {k + 1}"""
    )
    assert sorted(r.v for r in got.collect()) == sorted(
        r.v for r in naive.collect()
    )


def test_priority_merge_lossless(spark):
    """Partial samples over a split of the data merge to EXACTLY the
    direct sample (same retained v set, same tau row)."""
    from db_migration_spark.functions.theta import (
        priority_merge,
        priority_sample,
    )

    df = _weighted(spark, 3000).withColumn(
        "part", (F.col("key").cast("long") % 5).cast("int")
    )
    k = 32
    fine = priority_sample(df, ["seg", "part"], "key", "w", k=k)
    merged = priority_merge(fine.drop("part"), ["seg"], k=k)
    direct = priority_sample(df, ["seg"], "key", "w", k=k)
    assert sorted((r.v, r.rn) for r in merged.collect()) == sorted(
        (r.v, r.rn) for r in direct.collect()
    )


def test_priority_estimator_exact_when_undersized(spark):
    """n <= k: everything is sampled, tau = 0, estimate == exact sum."""
    from db_migration_spark.functions.theta import (
        priority_estimate_cents,
        priority_sample,
    )

    df = _weighted(spark, 20)
    k = 64
    sp = priority_sample(df, ["seg"], "key", "w", k=k)
    tau = sp.filter(F.col("rn") == k + 1)
    assert tau.count() == 0
    est_c = (
        sp.filter(F.col("rn") <= k)
        .select(priority_estimate_cents(F.col("w"), F.lit(0.0)).alias("c"))
        .agg(F.sum("c"))
        .collect()[0][0]
    )
    exact = df.agg(F.sum("w")).collect()[0][0]
    assert est_c == int(round(exact * 100))


def test_priority_estimator_subset_unbiased_band(spark):
    """Large-n sanity: total and a ~1/7 subset estimate land within the
    declared gates on skewed weights."""
    from db_migration_spark.functions.theta import (
        priority_estimate_cents,
        priority_merge,
        priority_sample,
    )

    df = _weighted(spark, 30000).withColumn(
        "flag", (F.col("key").cast("long") % 7 == 3).cast("boolean")
    )
    k = 256
    sp = priority_sample(df, ["seg"], "key", "w", payload=("flag",), k=k)
    tau_row = sp.filter(F.col("rn") == k + 1).collect()
    tau = tau_row[0].q if tau_row else 0.0
    leaf = priority_estimate_cents(F.col("w"), F.lit(tau))
    agg = (
        sp.filter(F.col("rn") <= k)
        .agg(
            F.sum(leaf).alias("tot"),
            F.sum(F.when(F.col("flag"), leaf).otherwise(F.lit(0))).alias(
                "sub"
            ),
        )
        .collect()[0]
    )
    ex = df.agg(
        F.sum("w").alias("tot"),
        F.sum(F.when(F.col("flag"), F.col("w")).otherwise(0.0)).alias("sub"),
    ).collect()[0]
    assert abs(agg.tot / 100.0 / ex.tot - 1) <= 0.15
    assert abs(agg.sub / 100.0 / ex.sub - 1) <= 0.35


def test_bottomk_sample_equals_naive_and_merges_lossless(spark):
    """bottomk_sample == the global bottom-k rows by key hash (payload
    riding along), and partition-wise partials merged re-truncate to
    the identical set — the digest equality the declared query gates."""
    from db_migration_spark.functions.theta import (
        bottomk_merge,
        bottomk_sample,
    )

    k = 64
    df = spark.range(0, 5000).select(
        F.lit("a").alias("seg"),
        F.col("id").cast("string").alias("key"),
        (F.col("id") * 3 % 1000).alias("val"),
    )
    got = bottomk_sample(df, ["seg"], "key", payload=("val",), k=k)
    hashed = df.select("seg", "val", theta_hash("key").alias("v"))
    hashed.createOrReplaceTempView("bk_naive")
    want = spark.sql(
        f"""SELECT seg, val, v FROM (
              SELECT seg, val, v,
                     row_number() OVER (PARTITION BY seg ORDER BY v) rn
              FROM bk_naive) WHERE rn <= {k}"""
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )

    # lossless merge: 4 overlapping slices -> merge == direct
    parts = [
        bottomk_sample(
            df.filter(F.col("id") % 4 == i), ["seg"], "key",
            payload=("val",), k=k,
        )
        for i in range(4)
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    merged = bottomk_merge(u, ["seg"], k=k)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, got.collect())
    )


def test_bottomk_quantiles_rank_error(spark):
    """Sample order statistics hit population rank targets within the
    distribution-free bound on a skewed (lognormal-ish) planted set."""
    from db_migration_spark.functions.theta import bottomk_sample

    k = 512
    n = 40_000
    df = spark.range(0, n).select(
        F.lit("a").alias("seg"),
        F.col("id").cast("string").alias("key"),
        # deterministic heavy-tailed values: (id*2654435761 % n)^2
        (
            F.pmod(F.col("id") * 2654435761, F.lit(n))
            * F.pmod(F.col("id") * 2654435761, F.lit(n))
        ).alias("val"),
    )
    sp = bottomk_sample(df, ["seg"], "key", payload=("val",), k=k)
    sample_vals = sorted(r.val for r in sp.collect())
    assert len(sample_vals) == k
    for q, bound in ((0.5, 0.08), (0.9, 0.05), (0.99, 0.025)):
        est = sample_vals[int(q * k + 0.999999) - 1]
        true_rank = df.filter(F.col("val") <= est).count()
        assert abs(true_rank / n - q) <= bound, (q, true_rank / n)
