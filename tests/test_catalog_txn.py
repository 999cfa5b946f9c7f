"""Catalog-tier multi-table transactions (plans/catalog_txn.py):
snapshot pinning, in-flight invisibility, and optimistic concurrency
(disjoint rebase vs overlapping conflict) — the local red line in
front of the txlog_catalog_snapshot oracle gate."""

from __future__ import annotations

import pytest

from db_migration_spark.plans.catalog_txn import CatalogConflict, TxCatalog


def _df(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "x int")


def test_snapshot_pins_and_inflight_hidden(spark, tmp_path):
    cat = TxCatalog(str(tmp_path / "cat"))
    a = cat.table("a")
    v0 = a.commit_append(_df(spark, [1, 2]))
    cat.commit({"a": v0})
    v1 = a.commit_append(_df(spark, [3]))
    cat.commit({"a": v1})
    # in-flight table commit, never published in the catalog
    a.commit_append(_df(spark, [99]))

    assert cat.latest_version() == 1
    assert sorted(r.x for r in cat.read(spark, "a", 0).collect()) == [1, 2]
    assert sorted(r.x for r in cat.read(spark, "a", 1).collect()) == [1, 2, 3]
    # head read resolves via catalog, not the table head
    assert sorted(r.x for r in cat.read(spark, "a").collect()) == [1, 2, 3]
    assert a.latest_version() > cat.snapshot()["a"]


def test_multi_table_atomicity(spark, tmp_path):
    cat = TxCatalog(str(tmp_path / "cat"))
    a, b = cat.table("a"), cat.table("b")
    cat.commit({"a": a.commit_append(_df(spark, [1])),
                "b": b.commit_append(_df(spark, [10]))})
    cat.commit({"a": a.commit_append(_df(spark, [2])),
                "b": b.commit_append(_df(spark, [20]))})
    # every snapshot sees the pair move together
    for cv, (ea, eb) in {0: ([1], [10]), 1: ([1, 2], [10, 20])}.items():
        assert sorted(r.x for r in cat.read(spark, "a", cv).collect()) == ea
        assert sorted(r.x for r in cat.read(spark, "b", cv).collect()) == eb


def test_disjoint_commits_rebase(spark, tmp_path):
    cat = TxCatalog(str(tmp_path / "cat"))
    a, b = cat.table("a"), cat.table("b")
    base = cat.commit({"a": a.commit_append(_df(spark, [1])),
                       "b": b.commit_append(_df(spark, [10]))})
    # two writers based on the same catalog version touch DISJOINT
    # tables: both must land (second rebases)
    va = a.commit_append(_df(spark, [2]))
    vb = b.commit_append(_df(spark, [20]))
    cat.commit({"a": va}, based_on=base)
    v = cat.commit({"b": vb}, based_on=base)
    snap = cat.snapshot(v)
    assert snap == {"a": va, "b": vb}


def test_overlapping_commits_conflict(spark, tmp_path):
    cat = TxCatalog(str(tmp_path / "cat"))
    a = cat.table("a")
    base = cat.commit({"a": a.commit_append(_df(spark, [1]))})
    v1 = a.commit_append(_df(spark, [2]))
    v2 = a.commit_append(_df(spark, [3]))
    cat.commit({"a": v1}, based_on=base)
    with pytest.raises(CatalogConflict):
        cat.commit({"a": v2}, based_on=base)


def test_illegal_names_and_missing_table(spark, tmp_path):
    cat = TxCatalog(str(tmp_path / "cat"))
    with pytest.raises(ValueError):
        cat.table("_catalog_log")
    with pytest.raises(ValueError):
        cat.table("x/y")
    with pytest.raises(ValueError):
        cat.commit({})
    a = cat.table("a")
    cat.commit({"a": a.commit_append(_df(spark, [1]))})
    with pytest.raises(KeyError):
        cat.read(spark, "nope")
