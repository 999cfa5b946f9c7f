"""Lakehouse-layer behavior the oracle gate cannot see: that zone-map
pruning actually SKIPS file groups (queries_lakehouse oracles pin result
content + scanned counts; these tests pin the physical layout effects),
and that OPTIMIZE tightens group-level zone maps enough for range
predicates to skip groups."""

from __future__ import annotations

from pyspark.sql import functions as F

from db_migration_spark.plans.txlog import TxTable


def _store(spark, tmp_path, n_groups=4, rows_per=1000):
    """Scan-hostile layout: every group spans the full key domain."""
    t = TxTable(str(tmp_path / "t"))
    base = spark.range(n_groups * rows_per).select(
        F.col("id").alias("k"),
        (F.col("id") % 97).cast("int").alias("day"),
        (F.col("id") % 13).cast("int").alias("bucket"),
    )
    for i in range(n_groups):
        t.commit_append(base.filter(F.col("k") % n_groups == i))
    return t, base


def test_optimize_clustering_enables_group_skipping(spark, tmp_path):
    """Before OPTIMIZE every group intersects any day range (appends are
    domain-spanning); after OPTIMIZE BY day (range layout + sort) a
    narrow day range plans a strict subset of groups."""
    t, base = _store(spark, tmp_path)
    pre_picked, pre_total = t.prune_groups("day", lo=10, hi=15)
    assert (len(pre_picked), pre_total) == (4, 4)  # nothing skippable
    t.optimize(spark, sort_key=["day"], target_groups=4)
    post_picked, post_total = t.prune_groups("day", lo=10, hi=15)
    assert post_total == 4
    assert len(post_picked) < 4, "range layout must make skipping fire"
    # and the pruned read is still exact
    got = t.read_pruned(spark, "day", 10, 15).count()
    want = base.filter(F.col("day").between(10, 15)).count()
    assert got == want


def test_optimize_zorder_tightens_both_dimensions(spark, tmp_path):
    """Morton clustering narrows group zone maps on BOTH interleaved
    columns: a range predicate on either column must skip groups after
    OPTIMIZE ZORDER (before it, none are skippable).  The two columns
    are scaled to EQUAL bit widths first — the standard z-order
    prerequisite (with unequal widths the high interleaved bits all come
    from the wider column and the narrow one never splits)."""
    from db_migration_spark.operators.relational import zorder_key

    t = TxTable(str(tmp_path / "t"))
    base = spark.range(16384).select(
        F.col("id").alias("k"),
        (F.col("id") % 16).cast("int").alias("day"),
        ((F.col("id") / 16).cast("long") % 16).cast("int").alias("bucket"),
    )
    for i in range(4):  # contiguous k blocks: each spans BOTH domains
        t.commit_append(
            base.filter((F.col("k") / 4096).cast("long") == i)
        )
    for col in ("day", "bucket"):
        picked, _tot = t.prune_groups(col, lo=0, hi=2)
        assert len(picked) == 4
    t.optimize(
        spark, sort_key=[zorder_key("day", "bucket", bits=4)], target_groups=16
    )
    total = len(t.active_groups())
    skipped_day = total - len(t.prune_groups("day", lo=0, hi=2)[0])
    skipped_bucket = total - len(t.prune_groups("bucket", lo=0, hi=2)[0])
    assert skipped_day >= total // 4 and skipped_bucket >= total // 4, (
        f"z-order must narrow both dims (total={total}, skipped "
        f"day={skipped_day}, bucket={skipped_bucket})"
    )
    # and pruned reads stay exact on both dimensions
    for col in ("day", "bucket"):
        got = t.read_pruned(spark, col, 0, 2).count()
        assert got == base.filter(F.col(col).between(0, 2)).count()


def test_foreachbatch_sink_replay_is_exactly_once(spark, tmp_path):
    """A foreachBatch-style writer that redelivers every batch TWICE
    (at-least-once delivery) still yields exactly-once table content."""
    root = str(tmp_path / "t")
    src = spark.range(300).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    )
    for batch_id in range(3):
        bdf = src.filter(F.col("k") % 3 == batch_id)
        TxTable(root).commit_append(bdf, txn=("app", batch_id))
        TxTable(root).commit_append(bdf, txn=("app", batch_id))  # redelivery
    t = TxTable(root)
    assert t.read(spark).count() == 300
    assert t.latest_version() == 2  # one commit per logical batch


def test_table_maintain_cli(spark, tmp_path, capsys):
    """The table-maintain CLI drives optimize/checkpoint/vacuum/history
    end-to-end on a real store."""
    import json

    from db_migration_spark.cli import main

    t, base = _store(spark, tmp_path)
    root = str(tmp_path / "t")

    assert main(["table-maintain", "--table", root, "--action", "history"]) == 0
    hist = json.loads(capsys.readouterr().out)
    assert [c["op"] for c in hist["commits"]] == ["append"] * 4

    assert (
        main(
            [
                "table-maintain", "--table", root, "--action", "optimize",
                "--cluster-by", "day", "--target-groups", "2",
            ]
        )
        == 0
    )
    opt = json.loads(capsys.readouterr().out)
    assert opt["groups_before"] == 4 and opt["groups_after"] == 2
    assert t.read(spark).count() == base.count()

    assert (
        main(["table-maintain", "--table", root, "--action", "checkpoint"])
        == 0
    )
    cp = json.loads(capsys.readouterr().out)
    assert cp["checkpointed_version"] == t.latest_version()

    assert (
        main(
            [
                "table-maintain", "--table", root, "--action", "vacuum",
                "--retain-versions", "0", "--min-age-seconds", "0",
            ]
        )
        == 0
    )
    vac = json.loads(capsys.readouterr().out)
    assert vac["deleted_groups"] == 4  # the four pre-optimize groups
    assert t.read(spark).count() == base.count()  # current state intact

    # restore to the post-optimize version via the CLI (pre-optimize
    # layouts were just vacuumed, so restore to the optimize commit)
    opt_v = t.latest_version() - 0  # checkpoint/vacuum add no commits
    assert (
        main(
            [
                "table-maintain", "--table", root, "--action", "restore",
                "--to-version", str(opt_v),
            ]
        )
        == 0
    )
    res = json.loads(capsys.readouterr().out)
    assert res["restored_to"] == opt_v and res["version"] == opt_v + 1
    assert t.read(spark).count() == base.count()

    # round-5 actions: ALTER column surface + bloom index + partitions
    assert (
        main(
            [
                "table-maintain", "--table", root, "--action",
                "rename-column", "--column", "bucket", "--to-name",
                "amount",
            ]
        )
        == 0
    )
    ren = json.loads(capsys.readouterr().out)
    assert ren["version"] == t.latest_version()
    assert "amount" in t.read(spark).columns

    assert (
        main(
            [
                "table-maintain", "--table", root, "--action",
                "bloom-index", "--column", "amount",
            ]
        )
        == 0
    )
    bl = json.loads(capsys.readouterr().out)
    assert bl["groups_indexed"] == len(t.active_groups())

    assert (
        main(
            [
                "table-maintain", "--table", root, "--action",
                "partitions", "--column", "day",
            ]
        )
        == 0
    )
    parts = json.loads(capsys.readouterr().out)
    assert len(parts["partitions"]) >= 1

    assert (
        main(
            [
                "table-maintain", "--table", root, "--action",
                "drop-column", "--column", "amount",
            ]
        )
        == 0
    )
    dr = json.loads(capsys.readouterr().out)
    assert dr["version"] == t.latest_version()
    assert "amount" not in t.read(spark).columns


def test_stream_source_incremental_and_nonappend_contract(spark, tmp_path):
    """The txlog streaming source: (1) a second drain after a new append
    picks up ONLY the new commit; (2) a rewrite commit errors the stream
    by default and is skipped under ignoreChanges=true — the Delta
    streaming-source contract."""
    import pytest as _pytest

    from db_migration_spark.sources import txlog_datasource

    root = str(tmp_path / "t")
    t = TxTable(root)
    t.commit_append(_mk(spark, 0, 10))
    t.commit_append(_mk(spark, 10, 30))
    txlog_datasource.register(spark)
    chk = str(tmp_path / "chk")  # ONE checkpoint reused across drains
    out_dir = str(tmp_path / "out")

    def drain(**opts):
        reader = spark.readStream.format("txlog").option("path", root)
        for k, v in opts.items():
            reader = reader.option(k, v)
        q = (
            reader.load()
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", chk)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert not q.isActive
        return spark.read.parquet(out_dir)

    out1 = drain()
    assert out1.count() == 30
    assert {r._commit_version for r in out1.collect()} == {0, 1}

    t.commit_append(_mk(spark, 30, 35))
    out2 = drain()  # same checkpoint → only the NEW commit arrives
    assert out2.count() == 35
    assert {r._commit_version for r in out2.collect()} == {0, 1, 2}

    # a rewrite commit poisons the default stream ...
    t.optimize(spark)
    with _pytest.raises(Exception, match="ignoreChanges|non-append"):
        drain()
    # ... and is skipped (with nothing after it) under ignoreChanges
    out4 = drain(ignoreChanges="true")
    assert out4.count() == 35
    # appends AFTER the rewrite flow again
    t.commit_append(_mk(spark, 100, 103))
    out5 = drain(ignoreChanges="true")
    assert out5.count() == 38
    assert {r._commit_version for r in out5.collect()} == {0, 1, 2, 4}


def _mk(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )


def test_cdf_read_versions_and_ops(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    t.commit_append(_mk(spark, 0, 10))    # v0
    t.commit_append(_mk(spark, 10, 15))   # v1
    t.commit_overwrite(_mk(spark, 50, 52))  # v2 rewrite
    ch = t.read_changes(spark, from_version=0)
    rows = ch.collect()
    assert {r._commit_version for r in rows} == {1, 2}
    assert {r._change_op for r in rows} == {"append", "overwrite"}
    assert sorted(r.k for r in rows if r._commit_version == 1) == list(
        range(10, 15)
    )
    assert sorted(r.k for r in rows if r._commit_version == 2) == [50, 51]


def test_stream_source_starting_version(spark, tmp_path):
    """startingVersion begins the stream AFTER the given commit — a
    catch-up consumer that already processed the backlog via the batch
    CDF path starts the continuous tail where it left off."""
    from pyspark.sql import functions as F

    from db_migration_spark.plans.txlog import TxTable
    from db_migration_spark.sources import txlog_datasource

    t = TxTable(str(tmp_path / "t"))
    for i in range(3):
        t.commit_append(
            spark.range(i * 10, i * 10 + 10).select(
                F.col("id").alias("k"), (F.col("id") * 2).alias("v")
            )
        )
    txlog_datasource.register(spark)
    q = (
        spark.readStream.format("txlog")
        .option("path", t.root)
        .option("startingVersion", "1")
        .load()
        .writeStream.format("memory")
        .queryName("sv_tail")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "chk"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert not q.isActive and q.exception() is None
    rows = spark.table("sv_tail")
    assert rows.count() == 10  # only commit v2
    assert rows.agg(F.min("_commit_version")).collect()[0][0] == 2


def test_ivf_store_partition_pruned_probes(spark, tmp_path):
    """The IVF-on-txlog layout: embeddings partitioned by list_id give
    one group per inverted list with min==max zone maps, so a probe's
    point read plans EXACTLY its list's group — the scan fraction
    n_probe/n_lists is file skipping, not a post-scan filter."""
    from db_migration_spark.operators import similarity

    emb = spark.range(400).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(8)),
            lambda i: (
                F.pmod(F.xxhash64(F.col("id").cast("string"), i), 97)
                / 97.0
            ).cast("float"),
        ).alias("embedding"),
    )
    cents = similarity.deterministic_centroids(emb, 8)
    assigned = similarity.ivf_assign(emb, cents)
    t = TxTable(str(tmp_path / "ivf"))
    t.commit_append_partitioned(assigned, "list_id")
    lists = sorted(r.list_id for r in assigned.select("list_id").distinct().collect())
    total = len(t.active_groups())
    assert total == len(lists)  # one group per inverted list
    for p in lists[:3]:
        picked, tot = t.prune_groups("list_id", lo=p, hi=p)
        assert len(picked) == 1 and tot == total
        got = t.read_pruned(spark, "list_id", p, p).count()
        want = assigned.filter(F.col("list_id") == p).count()
        assert got == want
