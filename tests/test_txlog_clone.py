"""SHALLOW CLONE (plans/txlog.py clone_shallow/_gpath): zero-copy
semantics, bidirectional isolation, DV transfer by reference, sidecar
reuse, transitive clone-of-clone resolution, and vacuum safety."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from db_migration_spark.plans.txlog import TxTable


def _mk_source(spark, root: str) -> TxTable:
    t = TxTable(root)
    t.commit_append(
        spark.range(100).select(
            F.col("id"), (F.col("id") % 5).alias("k")
        )
    )
    t.delete_where(spark, "id >= 90")  # live DV
    t.commit_append(
        spark.range(100, 120).select(
            F.col("id"), (F.col("id") % 5).alias("k")
        )
    )
    return t


def test_clone_is_zero_copy_and_reads_identically(spark, tmp_path):
    src = _mk_source(spark, str(tmp_path / "src"))
    cl = src.clone_shallow(str(tmp_path / "cl"))
    # no data group physically copied
    c0 = cl._read_commit(0)
    assert c0["op"] == "clone"
    assert not any(
        os.path.isdir(os.path.join(cl.data_dir, g)) for g in c0["add"]
    )
    # content identical, including the DV mask (by file-path reference)
    assert cl.read(spark).count() == src.read(spark).count() == 110
    assert (
        sorted(r.id for r in cl.read(spark).collect())
        == sorted(r.id for r in src.read(spark).collect())
    )
    # metadata-only COUNT works from the cloned stats + DV cardinality
    assert cl.count_rows(spark) == 110


def test_clone_isolation_both_directions(spark, tmp_path):
    src = _mk_source(spark, str(tmp_path / "src"))
    cl = src.clone_shallow(str(tmp_path / "cl"))
    cl.delete_where(spark, "id < 10")
    cl.commit_append(
        spark.range(200, 205).select(
            F.col("id"), (F.col("id") % 5).alias("k")
        )
    )
    assert cl.read(spark).count() == 105
    assert src.read(spark).count() == 110  # clone DML invisible to source
    src.delete_where(spark, "id = 50")
    assert src.read(spark).count() == 109
    assert cl.read(spark).count() == 105  # source DML invisible to clone


def test_clone_version_as_of_and_time_travel(spark, tmp_path):
    src = _mk_source(spark, str(tmp_path / "src"))
    v1 = 1  # after first append + delete
    cl = src.clone_shallow(str(tmp_path / "cl"), version=v1)
    assert cl.read(spark).count() == 90  # pre-second-append state
    cl.commit_append(spark.range(300, 310).select(F.col("id"), (F.col("id") % 5).alias("k")))
    assert cl.read(spark).count() == 100
    assert cl.read(spark, 0).count() == 90  # clone's own v0 = cloned state


def test_clone_of_clone_transitive_bases(spark, tmp_path):
    src = _mk_source(spark, str(tmp_path / "src"))
    a = src.clone_shallow(str(tmp_path / "a"))
    a.commit_append(
        spark.range(500, 510).select(F.col("id"), (F.col("id") % 5).alias("k"))
    )
    b = a.clone_shallow(str(tmp_path / "b"))
    # b resolves src-owned groups AND a-owned groups
    assert b.read(spark).count() == 120
    bases = b._base_dirs()
    assert os.path.abspath(a.data_dir) == bases[0]
    assert os.path.abspath(src.data_dir) in bases


def test_clone_optimize_rematerializes_locally(spark, tmp_path):
    src = _mk_source(spark, str(tmp_path / "src"))
    cl = src.clone_shallow(str(tmp_path / "cl"))
    cl.optimize(spark, target_groups=1)
    assert cl.read(spark).count() == 110
    # all live groups now local; foreign refs dropped from the active set
    for g in cl.active_groups():
        assert os.path.isdir(os.path.join(cl.data_dir, g))


def test_clone_vacuum_never_touches_source_bytes(spark, tmp_path):
    src = _mk_source(spark, str(tmp_path / "src"))
    cl = src.clone_shallow(str(tmp_path / "cl"))
    cl.optimize(spark, target_groups=1)
    before = set(os.listdir(src.data_dir))
    cl.vacuum(min_age_seconds=0.0)
    assert set(os.listdir(src.data_dir)) == before
    assert cl.read(spark).count() == 110
    assert src.read(spark).count() == 110


def test_clone_reuses_source_bloom_sidecars(spark, tmp_path):
    src = _mk_source(spark, str(tmp_path / "src"))
    assert src.add_bloom_index(spark, "id") > 0
    cl = src.clone_shallow(str(tmp_path / "cl"))
    kept, total = cl.prune_groups_point(spark, "id", 5)
    assert total >= 2 and len(kept) < total  # sidecar actually pruned
    got = cl.read_point(spark, "id", 5).collect()
    assert [r.id for r in got] == [5]


def test_clone_bloom_build_skips_foreign_groups(spark, tmp_path):
    src = _mk_source(spark, str(tmp_path / "src"))
    cl = src.clone_shallow(str(tmp_path / "cl"))
    # no sidecars anywhere: the clone must NOT write into the source dir
    assert cl.add_bloom_index(spark, "id") == 0
    for g in cl.active_groups():
        assert not os.path.exists(
            os.path.join(cl._gpath(g), "_bloom_id.json")
        )
    # point lookup stays correct (conservative keep-all)
    assert [r.id for r in cl.read_point(spark, "id", 7).collect()] == [7]


def test_clone_carries_schema_and_constraints(spark, tmp_path):
    src = _mk_source(spark, str(tmp_path / "src"))
    src.add_constraint(spark, "k_range", "k BETWEEN 0 AND 4")
    cl = src.clone_shallow(str(tmp_path / "cl"))
    assert cl.constraints() == {"k_range": "k BETWEEN 0 AND 4"}
    from db_migration_spark.plans.txlog import ConstraintViolation

    with pytest.raises(ConstraintViolation):
        cl.commit_append(
            spark.range(1).select(F.col("id"), F.lit(99).alias("k"))
        )
    sch = cl.read_schema(spark)
    assert [f.name for f in sch.fields] == ["id", "k"]


def test_clone_requires_empty_target_and_nonempty_source(spark, tmp_path):
    src = _mk_source(spark, str(tmp_path / "src"))
    cl = src.clone_shallow(str(tmp_path / "cl"))
    with pytest.raises(ValueError):
        src.clone_shallow(str(tmp_path / "cl"))  # target not empty
    empty = TxTable(str(tmp_path / "empty"))
    with pytest.raises(ValueError):
        empty.clone_shallow(str(tmp_path / "cl2"))


def test_clone_cdf_reads_foreign_dv_positions(spark, tmp_path):
    src = _mk_source(spark, str(tmp_path / "src"))
    cl = src.clone_shallow(str(tmp_path / "cl"))
    cl.delete_where(spark, "id = 3")
    feed = cl.read_changes(spark, 0)
    dels = feed.filter(F.col("_change_op") == "delete").collect()
    assert [r.id for r in dels] == [3]


def test_cli_clone_front_door(spark, tmp_path):
    """table-maintain --action clone, driven as a subprocess."""
    import json
    import subprocess
    import sys

    src = _mk_source(spark, str(tmp_path / "src"))
    r = subprocess.run(
        [
            sys.executable, "-m", "db_migration_spark.cli",
            "table-maintain", "--table", str(tmp_path / "src"),
            "--action", "clone", "--to-table", str(tmp_path / "cl"),
        ],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["bytes_copied"] == 0
    assert out["source_version"] == src.latest_version()
    assert out["groups_referenced"] == len(src.active_groups())
    cl = TxTable(str(tmp_path / "cl"))
    assert cl.read(spark).count() == 110


def test_clone_under_concurrent_writers_is_consistent_snapshot(
    spark, tmp_path
):
    """Clones taken WHILE writers race must each equal the source's
    state at their recorded source_version — the snapshot-isolation
    contract commit-pinning gives for free, verified under fire."""
    import threading

    src = TxTable(str(tmp_path / "src"))
    src.commit_append(
        spark.range(50).select(F.col("id"), (F.col("id") % 5).alias("k"))
    )
    stop = threading.Event()
    errs: list[Exception] = []

    def writer(i: int) -> None:
        lo = 1000 * (i + 1)
        n = 0
        while not stop.is_set() and n < 6:
            try:
                src.commit_append(
                    spark.range(lo + n * 10, lo + n * 10 + 10).select(
                        F.col("id"), (F.col("id") % 5).alias("k")
                    )
                )
                if n % 3 == 2:
                    src.delete_where(
                        spark, f"id = {lo + n * 10}", max_retries=30
                    )
            except Exception as e:  # pragma: no cover - surfaced below
                errs.append(e)
                return
            n += 1

    threads = [threading.Thread(target=writer, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    clones = []
    for j in range(4):
        clones.append(src.clone_shallow(str(tmp_path / f"cl{j}")))
    for t in threads:
        t.join()
    stop.set()
    assert not errs, errs
    for cl in clones:
        v = cl._read_commit(0)["source_version"]
        assert (
            sorted(r.id for r in cl.read(spark).collect())
            == sorted(r.id for r in src.read(spark, v).collect())
        )


def test_rtbf_erasure_is_physical(spark, tmp_path):
    """Right-to-be-forgotten: after delete -> optimize -> vacuum, the
    subject's bytes must be GONE from every file on disk (not merely
    DV-masked), others' rows intact, and pre-erasure time travel must
    raise because the bytes no longer exist."""
    import pytest as _pytest

    t = TxTable(str(tmp_path / "t"))
    df = spark.range(1000).select(
        (F.col("id") % 50).alias("cust"), F.col("id").alias("v")
    )
    t.commit_append(df.filter("id % 2 = 0"))
    t.commit_append(df.filter("id % 2 = 1"))
    pre_groups = set(t.active_groups())
    t.delete_where(spark, "cust = 7")
    t.optimize(spark, target_groups=1)
    deleted = t.vacuum(retain_versions=0, min_age_seconds=0.0)
    assert pre_groups <= set(deleted)  # original bytes physically gone
    live = t.read(spark)
    assert live.filter("cust = 7").count() == 0
    assert live.count() == 1000 - 20
    # every remaining parquet file on disk is subject-free
    import os

    for g in t.active_groups():
        raw = spark.read.parquet(os.path.join(t.data_dir, g))
        assert raw.filter("cust = 7").count() == 0
    with _pytest.raises(Exception):
        t.read(spark, 1).count()  # pre-erasure layout unreadable


def test_bloom_and_point_planning_survive_source_vacuum(spark, tmp_path):
    """r7 regression (_gpath now raises for missing-everywhere groups):
    maintenance and PLANNING on a clone whose source was vacuumed must
    not raise — add_bloom_index skips the dangling foreign groups and
    indexes the clone's own, prune_groups_point keeps them (pruning is
    an optimization; the diagnostic raise belongs to the SCAN, which
    the last assert pins)."""
    src = _mk_source(spark, str(tmp_path / "src"))
    cl = src.clone_shallow(str(tmp_path / "cl"))
    cl.commit_append(
        spark.range(500, 520).select(
            F.col("id"), (F.col("id") % 5).alias("k")
        )
    )
    # rewrite everything in the source, then drop its old bytes
    src.update_where(spark, F.lit(True), {"k": F.lit(99)})
    src.optimize(spark, target_groups=1)
    assert src.vacuum(retain_versions=0, min_age_seconds=0.0)
    fresh = TxTable(str(tmp_path / "cl"))  # no memoized group paths
    assert fresh.add_bloom_index(spark, "id") >= 1  # local group indexed
    picked, total = fresh.prune_groups_point(spark, "id", 510)
    assert picked and total == len(fresh.active_groups())
    with pytest.raises(FileNotFoundError, match="clone base"):
        fresh.read(spark).count()  # the scan still raises the diagnostic
