"""Partitioned txlog tables (plans/txlog.py commit_append_partitioned):
one atomic commit, one file group per partition tuple, partition
pruning through the existing zone-map planner (exact min == max
bounds), SHOW PARTITIONS from stats alone, and full composition with
the rest of the format — DVs, merge-on-read DML, time travel, txn
idempotence.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from db_migration_spark.plans.txlog import TxTable


def _mk(spark, rows, schema="day string, k long, v long"):
    return spark.createDataFrame(rows, schema)


@pytest.fixture()
def ptable(spark, tmp_path):
    t = TxTable(str(tmp_path / "pt"))
    rows = [
        (f"2024-01-{d:02d}", d * 100 + i, d * 10 + i)
        for d in (1, 2, 3)
        for i in range(4)
    ]
    t.commit_append_partitioned(_mk(spark, rows), "day")
    return t


def test_one_group_per_partition_value(spark, ptable):
    assert ptable.latest_version() == 0, "partitioned append = ONE commit"
    assert len(ptable.active_groups()) == 3
    assert ptable.partitions("day") == [
        "2024-01-01", "2024-01-02", "2024-01-03",
    ]


def test_equality_predicate_prunes_to_one_group(spark, ptable):
    picked, total = ptable.prune_groups(
        "day", lo="2024-01-02", hi="2024-01-02"
    )
    assert (len(picked), total) == (1, 3)
    got = ptable.read_pruned(
        spark, "day", lo="2024-01-02", hi="2024-01-02"
    )
    rows = {(r.day, r.k) for r in got.collect()}
    assert rows == {("2024-01-02", 200 + i) for i in range(4)}


def test_files_keep_full_schema_not_hive_dropped(spark, ptable):
    # the staged partitionBy duplicates the key, so the data files
    # retain the partition column — no re-attach at read
    got = ptable.read(spark)
    assert set(got.columns) == {"day", "k", "v"}
    assert got.filter(F.col("day").isNull()).count() == 0


def test_multi_column_partitioning(spark, tmp_path):
    t = TxTable(str(tmp_path / "pt2"))
    rows = [
        (d, s, d * 10 + s)
        for d in (1, 2)
        for s in (7, 8, 9)
    ]
    t.commit_append_partitioned(
        _mk(spark, rows, "d long, s long, v long"), ["d", "s"]
    )
    assert len(t.active_groups()) == 6
    picked, total = t.prune_groups("s", lo=8, hi=8)
    assert (len(picked), total) == (2, 6)  # one per d value
    assert t.partitions("d") == [1, 2]
    assert t.partitions("s") == [7, 8, 9]


def test_dml_composes_with_partitions(spark, ptable):
    # delete inside ONE partition: the DV must cover only that group
    ptable.delete_where(spark, F.col("day") == "2024-01-02")
    _a, _s, dvs = ptable._replay(ptable.latest_version())
    assert len(dvs) == 1 and len(dvs[0]["covers"]) == 1
    assert ptable.read(spark).count() == 8
    # merge upsert touching two partitions lands as a normal delta
    src = _mk(
        spark,
        [("2024-01-01", 101, 999), ("2024-01-03", 999, 1)],
    )
    ptable.merge_into(spark, src, ["day", "k"])
    got = {(r.day, r.k): r.v for r in ptable.read(spark).collect()}
    assert got[("2024-01-01", 101)] == 999
    assert got[("2024-01-03", 999)] == 1
    assert ("2024-01-02", 201) not in got


def test_time_travel_and_restore(spark, ptable):
    v0 = ptable.latest_version()
    ptable.delete_where(spark, F.col("day") == "2024-01-01")
    ptable.commit_append_partitioned(
        _mk(spark, [("2024-01-04", 400, 40)]), "day"
    )
    assert ptable.read(spark).count() == 9
    assert ptable.read(spark, version=v0).count() == 12
    assert "2024-01-04" in ptable.partitions("day")
    ptable.restore(v0)
    assert ptable.read(spark).count() == 12
    assert ptable.partitions("day") == [
        "2024-01-01", "2024-01-02", "2024-01-03",
    ]


def test_partitioned_append_txn_idempotent(spark, ptable):
    v1 = ptable.commit_append_partitioned(
        _mk(spark, [("2024-02-01", 500, 50)]), "day", txn=("ingest", 9)
    )
    v2 = ptable.commit_append_partitioned(
        _mk(spark, [("2024-02-01", 500, 50)]), "day", txn=("ingest", 9)
    )
    assert v1 == v2
    assert ptable.read(spark).filter(F.col("k") == 500).count() == 1


def test_partition_schema_enforced(spark, ptable):
    with pytest.raises(ValueError, match="unknown partition columns"):
        ptable.commit_append_partitioned(
            _mk(spark, [("x", 1, 1)]), "nope"
        )
    with pytest.raises(ValueError, match="schema mismatch"):
        ptable.commit_append_partitioned(
            spark.createDataFrame([("x", 1)], "day string, k long"), "day"
        )


def test_plain_append_mixes_with_partitioned(spark, ptable):
    # a plain (unpartitioned) append is a valid writer on the same
    # table; its group spans several partition values, so SHOW
    # PARTITIONS reports the non-constant group as None
    ptable.commit_append(
        _mk(spark, [("2024-01-01", 900, 9), ("2024-01-03", 901, 9)])
    )
    parts = ptable.partitions("day")
    assert None in parts
    assert {"2024-01-01", "2024-01-02", "2024-01-03"} <= {
        p for p in parts if p
    }
    # pruning still correct: the mixed group intersects both days
    picked, total = ptable.prune_groups(
        "day", lo="2024-01-03", hi="2024-01-03"
    )
    assert total == 4 and len(picked) == 2
    got = ptable.read_pruned(
        spark, "day", lo="2024-01-03", hi="2024-01-03"
    )
    assert got.count() == 5  # 4 original + 1 from the mixed group


def test_replace_where_atomic_slice_swap(spark, ptable):
    v0 = ptable.latest_version()
    repl = _mk(spark, [("2024-01-02", 777, 7), ("2024-01-02", 778, 8)])
    ptable.replace_where(spark, F.col("day") == "2024-01-02", repl)
    got = {(r.day, r.k) for r in ptable.read(spark).collect()}
    # old slice fully gone, new slice fully in, other days untouched
    assert ("2024-01-02", 201) not in got
    assert ("2024-01-02", 777) in got and ("2024-01-02", 778) in got
    assert sum(1 for d, _ in got if d == "2024-01-01") == 4
    assert sum(1 for d, _ in got if d == "2024-01-02") == 2
    # pre-replace state stays time-travelable
    assert ptable.read(spark, version=v0).count() == 12


def test_replace_where_rejects_out_of_predicate_rows(spark, ptable):
    bad = _mk(spark, [("2024-01-03", 1, 1)])  # wrong slice
    with pytest.raises(ValueError, match="do not satisfy"):
        ptable.replace_where(spark, F.col("day") == "2024-01-02", bad)
    assert ptable.read(spark).count() == 12  # nothing committed


def test_overwrite_partitions_dynamic(spark, ptable):
    # df carries TWO partition values -> exactly those two replaced
    repl = _mk(
        spark,
        [("2024-01-01", 11, 1), ("2024-01-03", 33, 3)],
    )
    ptable.overwrite_partitions(spark, repl, "day")
    got = {(r.day, r.k) for r in ptable.read(spark).collect()}
    assert got == {
        ("2024-01-01", 11),
        ("2024-01-03", 33),
        *{("2024-01-02", 200 + i) for i in range(4)},
    }
    # partition listing survives: stats of the new group span the two
    # replaced days; the untouched day is still exactly listed
    assert "2024-01-02" in ptable.partitions("day")


def test_replace_where_txn_idempotent(spark, ptable):
    repl = _mk(spark, [("2024-01-01", 50, 5)])
    v1 = ptable.overwrite_partitions(
        spark, repl, "day", txn=("backfill", 3)
    )
    v2 = ptable.overwrite_partitions(
        spark, repl, "day", txn=("backfill", 3)
    )
    assert v1 == v2
    assert ptable.read(spark).filter(
        F.col("day") == "2024-01-01"
    ).count() == 1


def test_optimize_where_compacts_one_partition(spark, ptable):
    # fragment one partition with three more partitioned appends
    for i in range(3):
        ptable.commit_append_partitioned(
            _mk(spark, [("2024-01-02", 900 + i, i)]), "day"
        )
    before = ptable.active_groups()
    assert len(before) == 6  # 3 original + 3 fragments
    full = {(r.day, r.k, r.v) for r in ptable.read(spark).collect()}
    ptable.optimize(
        spark, where=("day", "2024-01-02", "2024-01-02"), target_groups=1
    )
    after = ptable.active_groups()
    # the 4 day-02 groups collapsed to 1; the other days' groups are
    # untouched (same group ids — their bytes were never read)
    assert len(after) == 3
    untouched = {g for g in before if g in after}
    assert len(untouched) == 2
    assert {(r.day, r.k, r.v) for r in ptable.read(spark).collect()} == full
    # pruning tightens back to one group for the compacted day
    picked, total = ptable.prune_groups(
        "day", lo="2024-01-02", hi="2024-01-02"
    )
    assert (len(picked), total) == (1, 3)


def test_optimize_where_respects_deletion_vectors(spark, ptable):
    ptable.delete_where(
        spark, (F.col("day") == "2024-01-02") & (F.col("k") == 201)
    )
    full = {(r.day, r.k) for r in ptable.read(spark).collect()}
    ptable.optimize(spark, where=("day", "2024-01-02", "2024-01-02"))
    assert {(r.day, r.k) for r in ptable.read(spark).collect()} == full
    assert ("2024-01-02", 201) not in full
    # the rewrite read through the DV, so no live DV remains
    assert ptable._replay(ptable.latest_version())[2] == []


def test_optimize_where_empty_slice_is_noop(spark, ptable):
    v = ptable.latest_version()
    assert ptable.optimize(
        spark, where=("day", "2030-01-01", "2030-01-01")
    ) == v
    assert ptable.latest_version() == v


def test_count_rows_metadata_only(spark, ptable, monkeypatch):
    ptable.delete_where(spark, F.col("k") == 201)
    ptable.merge_into(
        spark, _mk(spark, [("2024-01-01", 101, 0), ("2024-09-01", 1, 1)]),
        ["day", "k"],
    )
    expected = ptable.read(spark).count()
    # prove the fast path never opens a data file: a scan would raise
    monkeypatch.setattr(
        ptable, "read",
        lambda *a, **k: (_ for _ in ()).throw(AssertionError("scanned")),
    )
    assert ptable.count_rows(spark) == expected


def test_count_rows_falls_back_on_partial_dv_cover(spark, ptable):
    ptable.delete_where(spark, F.col("day") == "2024-01-02")
    # compact a DIFFERENT slice plus... rewrite only day-01 so the DV's
    # covered day-02 group stays live — still metadata-provable
    assert ptable.count_rows(spark) == 8
    # now rewrite EVERYTHING (optimize): the DV retires with its covered
    # groups; metadata count must match the scan either way
    ptable.optimize(spark, target_groups=1)
    assert ptable.count_rows(spark) == ptable.read(spark).count() == 8


def test_count_rows_tracks_replace_where(spark, ptable):
    ptable.replace_where(
        spark, F.col("day") == "2024-01-03",
        _mk(spark, [("2024-01-03", 1, 1)]),
    )
    assert ptable.count_rows(spark) == 9  # 4 + 4 + 1
    assert ptable.count_rows(spark, version=0) == 12
