"""Stateful streaming profiles, IVF ANN, versioned snapshots."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from db_migration_spark.catalog import load_table
from db_migration_spark.operators import similarity
from db_migration_spark.plans import snapshots
from db_migration_spark.streaming.stateful import user_profiles

TS = datetime.datetime


def test_stateful_user_profiles(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    src = tmp_path / "ev_src"
    events.write.parquet(str(src))
    stream = spark.readStream.schema(
        spark.read.parquet(str(src)).schema
    ).parquet(str(src))
    q = (
        user_profiles(stream)
        .writeStream.format("memory")
        .queryName("profiles")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    # the ProcessingTimeTimeout timer loops empty micro-batches, so an
    # availableNow drain never self-terminates (processAllAvailable
    # blocks on the same loop) — poll the sink until the data batch has
    # landed, then stop the query explicitly
    import time as _time

    deadline = _time.time() + 120
    while _time.time() < deadline:
        done = [p for p in q.recentProgress if p["numInputRows"] > 0]
        if done and spark.sql("SELECT count(*) FROM profiles").head()[0]:
            break
        _time.sleep(1)
    q.stop()
    got = {
        r["user_id"]: r
        for r in spark.sql(
            "SELECT * FROM profiles"
        ).collect()
    }
    want = {
        r["user_id"]: r
        for r in events.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("s"),
            F.max("ts").alias("m"),
        )
        .collect()
    }
    assert set(got) == set(want)
    for uid, w in want.items():
        g = got[uid]
        assert g["n_events"] == w["n"]
        assert abs(g["sum_value"] - w["s"]) < 1e-6
        assert g["last_ts"] == w["m"]


def test_ivf_topk_recall(spark):
    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = similarity.brute_force_topk(emb, queries, k=5)
    approx = similarity.ivf_topk(emb, queries, k=5, n_lists=8, n_probe=4)
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.4  # probing half the lists
    # determinism: second run identical
    again = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.ivf_topk(
            emb, queries, k=5, n_lists=8, n_probe=4
        ).collect()
    }
    assert again == approx_set


def test_ivf_assignment_covers_corpus(spark):
    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    cents = similarity.deterministic_centroids(emb, 8)
    assert cents.count() == 8
    assigned = similarity.ivf_assign(emb, cents)
    assert assigned.count() == emb.count()
    n_lists = assigned.select("list_id").distinct().count()
    assert 2 <= n_lists <= 8


def test_snapshots_roundtrip(spark, tmp_path):
    root = str(tmp_path / "snaps")
    df1 = spark.createDataFrame([(1, "a")], "id LONG, v STRING")
    df2 = spark.createDataFrame([(1, "a"), (2, "b")], "id LONG, v STRING")
    v0 = snapshots.write_snapshot(df1, root, label="initial")
    v1 = snapshots.write_snapshot(df2, root, label="after-patch")
    assert (v0, v1) == (0, 1)
    # re-entrancy: same label again is a no-op returning the old version
    assert snapshots.write_snapshot(df1, root, label="initial") == 0
    assert len(snapshots.list_snapshots(root)) == 2
    assert snapshots.read_snapshot(spark, root, version=0).count() == 1
    assert snapshots.read_snapshot(spark, root).count() == 2  # latest
    assert (
        snapshots.read_snapshot(spark, root, label="after-patch").count() == 2
    )


def test_merge_upsert_copy_on_write(spark, tmp_path):
    from db_migration_spark.plans import upsert

    root = str(tmp_path / "store")
    base = spark.createDataFrame(
        [
            (1, "name", "old", TS(2020, 1, 1), True, "Gene"),
            (2, "name", "keep", TS(2020, 1, 1), True, "Protein"),
        ],
        "e LONG, a STRING, v STRING, tx TIMESTAMP, op BOOLEAN, class STRING",
    )
    snapshots.write_snapshot(base, root, label="v0")
    patches = spark.createDataFrame(
        [
            (1, "name", "new", TS(2020, 2, 1), True, "Gene"),
        ],
        "e LONG, a STRING, v STRING, tx TIMESTAMP, op BOOLEAN, class STRING",
    )
    v = upsert.merge_upsert(spark, root, patches, partition_col="class")
    assert v == 1
    latest = {
        (r["e"], r["a"]): r["v"]
        for r in snapshots.read_snapshot(spark, root).collect()
    }
    assert latest == {(1, "name"): "new", (2, "name"): "keep"}
    # time travel: version 0 still shows the old fact
    v0 = {
        (r["e"], r["a"]): r["v"]
        for r in snapshots.read_snapshot(spark, root, version=0).collect()
    }
    assert v0[(1, "name")] == "old"


def test_salted_join_matches_plain_join(spark, sf_dir):
    from db_migration_spark.operators.relational import salted_join

    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").withColumnRenamed(
        "n_nationkey", "c_nationkey"
    )
    plain = customer.join(nation, "c_nationkey").select("c_custkey", "n_name")
    salted = salted_join(customer, nation, "c_nationkey", salt=8).select(
        "c_custkey", "n_name"
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_kmeans_refine_improves_or_holds_recall(spark):
    from pyspark.sql import functions as F2

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    seeds = similarity.deterministic_centroids(emb, 8)
    refined = similarity.kmeans_refine(emb, seeds, iterations=2)
    assert refined.count() == 8
    # determinism: rerun produces identical centroids
    again = similarity.kmeans_refine(emb, seeds, iterations=2)
    a = sorted(map(tuple, refined.select("list_id", "centroid").collect()))
    b = sorted(map(tuple, again.select("list_id", "centroid").collect()))
    assert [(i, list(c)) for i, c in a] == [(i, list(c)) for i, c in b]
    # refined assignment covers the corpus and is more balanced than seeds
    assigned = similarity.ivf_assign(emb, refined)
    assert assigned.count() == emb.count()
    sizes = [
        r["n"]
        for r in assigned.groupBy("list_id").agg(F2.count("*").alias("n")).collect()
    ]
    assert max(sizes) < emb.count()  # not collapsed to one list


def test_merge_upsert_null_partition_rows_survive(spark, tmp_path):
    """Base rows whose partition_col is NULL must carry over (isin() is
    NULL for NULL input, which used to drop them from both sides)."""
    from db_migration_spark.plans import upsert

    root = str(tmp_path / "store_null")
    base = spark.createDataFrame(
        [
            (1, "name", "old", TS(2020, 1, 1), True, "Gene"),
            (3, "name", "nullpart", TS(2020, 1, 1), True, None),
        ],
        "e LONG, a STRING, v STRING, tx TIMESTAMP, op BOOLEAN, class STRING",
    )
    snapshots.write_snapshot(base, root, label="v0")
    patches = spark.createDataFrame(
        [(1, "name", "new", TS(2020, 2, 1), True, "Gene")],
        "e LONG, a STRING, v STRING, tx TIMESTAMP, op BOOLEAN, class STRING",
    )
    upsert.merge_upsert(spark, root, patches, partition_col="class")
    latest = {
        (r["e"], r["a"]): r["v"]
        for r in snapshots.read_snapshot(spark, root).collect()
    }
    assert latest == {
        (1, "name"): "new",
        (3, "name"): "nullpart",  # NULL-partition row survived
    }


def test_stateful_timeout_evicts_state():
    """When the processing-time timeout fires, _update_profile must drop
    the state and emit nothing (idle eviction), not re-arm the timer."""
    from db_migration_spark.streaming.stateful import _update_profile

    class FakeState:
        hasTimedOut = True
        exists = True
        get = (3, 1.5, 1000)

        def __init__(self):
            self.removed = False
            self.updated = False

        def remove(self):
            self.removed = True

        def update(self, v):
            self.updated = True

        def setTimeoutDuration(self, ms):
            self.updated = True

    st = FakeState()
    rows = list(_update_profile((7,), iter([]), st))
    assert rows == []
    assert st.removed and not st.updated
