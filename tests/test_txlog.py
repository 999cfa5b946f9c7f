"""ACID commit-protocol tests for the transaction-log table format
(plans/txlog.py): atomic visibility, optimistic-concurrency appends from
racing threads, serializable merge retry, time travel, and invisibility of
uncommitted data."""

from __future__ import annotations

import threading

import pytest
from pyspark.sql import functions as F

from db_migration_spark.plans.txlog import CommitConflict, TxTable


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )


def test_append_read_roundtrip(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    assert t.latest_version() == -1
    v0 = t.commit_append(_df(spark, 0, 10))
    v1 = t.commit_append(_df(spark, 10, 15))
    assert (v0, v1) == (0, 1)
    assert t.read(spark).count() == 15
    assert t.read(spark, version=0).count() == 10  # time travel


def test_overwrite_is_atomic_and_time_travels(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    t.commit_append(_df(spark, 0, 10))
    t.commit_overwrite(_df(spark, 100, 103))
    got = sorted(r.k for r in t.read(spark).collect())
    assert got == [100, 101, 102]
    # the pre-overwrite snapshot is still fully readable
    assert t.read(spark, version=0).count() == 10
    ops = [c["op"] for c in t.history()]
    assert ops == ["append", "overwrite"]


def test_concurrent_appends_lose_nothing(spark, tmp_path):
    """8 threads race blind appends; the hard-link publish means every
    version is owned by exactly one writer and no append is lost."""
    t = TxTable(str(tmp_path / "t"))
    errs = []

    def worker(i):
        try:
            t.commit_append(_df(spark, i * 100, i * 100 + 10))
        except Exception as exc:  # noqa: BLE001
            errs.append(exc)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errs
    assert t.latest_version() == 7  # contiguous versions, one per writer
    assert t.read(spark).count() == 80  # no lost updates
    ks = sorted(r.k for r in t.read(spark).select("k").collect())
    assert ks == sorted(i * 100 + j for i in range(8) for j in range(10))


def test_merge_retries_on_interleaved_commit(spark, tmp_path):
    """A commit landing between a merge's read and publish must force the
    merge to re-run its transform on the ADVANCED snapshot (serializable
    outcome), not publish a result computed from stale state."""
    t = TxTable(str(tmp_path / "t"))
    t.commit_append(_df(spark, 0, 5))
    calls = {"n": 0}

    def transform(cur):
        calls["n"] += 1
        if calls["n"] == 1:
            # simulate a concurrent writer winning the race mid-merge
            t.commit_append(_df(spark, 1000, 1005))
        return cur.withColumn("v", F.col("v") + 1)

    t.merge(spark, transform)
    assert calls["n"] == 2, "stale merge must have been retried"
    out = t.read(spark)
    assert out.count() == 10  # both the interleaved rows and the base
    # the merge's +1 applied to the INTERLEAVED rows too (it re-read)
    assert (
        out.filter(F.col("k") == 1000).select("v").collect()[0][0] == 2001
    )


def test_uncommitted_group_is_invisible(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    t.commit_append(_df(spark, 0, 5))
    # an aborted writer: data group written, log never published
    t._write_group(_df(spark, 500, 600))
    assert t.read(spark).count() == 5
    assert t.latest_version() == 0


def test_publish_is_exactly_once(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    t.commit_append(_df(spark, 0, 5))
    with pytest.raises(CommitConflict):
        t._publish(0, {"version": 0, "op": "append", "add": [], "remove": []})
