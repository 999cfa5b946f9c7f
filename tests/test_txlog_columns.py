"""ALTER TABLE column surface (plans/txlog.py column mapping): RENAME
COLUMN and DROP COLUMN as metadata-only commits — no data file is read
or rewritten at any table size.  Files keep their stable PHYSICAL
column names; the log schema carries the logical→physical mapping;
every reader and writer translates at the boundary."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from db_migration_spark.plans.txlog import TxTable


def _mk(spark, rows, schema="k long, v long"):
    return spark.createDataFrame(rows, schema)


@pytest.fixture()
def table(spark, tmp_path):
    t = TxTable(str(tmp_path / "ct"))
    t.commit_append(_mk(spark, [(1, 10), (2, 20), (3, 30)]))
    return t


def test_rename_is_metadata_only(spark, table):
    groups_before = set(table.active_groups())
    table.alter_rename_column(spark, "v", "amount")
    assert set(table.active_groups()) == groups_before, "no rewrite"
    got = {r.k: r.amount for r in table.read(spark).collect()}
    assert got == {1: 10, 2: 20, 3: 30}
    assert [f.name for f in table.read_schema(spark).fields] == [
        "k", "amount",
    ]
    # time travel returns the version's OWN schema (old name)
    v0 = table.read(spark, version=0)
    assert v0.columns == ["k", "v"]


def test_writes_after_rename_roundtrip(spark, table):
    table.alter_rename_column(spark, "v", "amount")
    table.commit_append(_mk(spark, [(4, 40)], "k long, amount long"))
    table.update_where(spark, F.col("k") == 1, {"amount": F.lit(11)})
    table.merge_into(
        spark, _mk(spark, [(2, 22), (5, 50)], "k long, amount long"), "k"
    )
    table.delete_where(spark, F.col("amount") == 30)
    got = {r.k: r.amount for r in table.read(spark).collect()}
    assert got == {1: 11, 2: 22, 4: 40, 5: 50}


def test_zone_maps_follow_rename(spark, table):
    # per-group stats are keyed by the physical name; pruning on the
    # NEW logical name must still work
    table.commit_append(_mk(spark, [(100, 1000)]))
    table.alter_rename_column(spark, "k", "id")
    picked, total = table.prune_groups("id", lo=100, hi=100)
    assert total == 2 and len(picked) == 1
    assert table.read_pruned(spark, "id", lo=100, hi=100).count() == 1


def test_bloom_survives_rename(spark, table):
    table.add_bloom_index(spark, "k")
    table.alter_rename_column(spark, "k", "id")
    kept, total = table.prune_groups_point(spark, "id", 2)
    assert total == 1 and len(kept) == 1
    assert {r.id for r in table.read_point(spark, "id", 2).collect()} == {2}


def test_drop_column_projects_away_keeps_history(spark, table):
    groups_before = set(table.active_groups())
    table.alter_drop_column(spark, "v")
    assert set(table.active_groups()) == groups_before
    assert table.read(spark).columns == ["k"]
    # pre-drop version still serves the column
    assert {r.v for r in table.read(spark, version=0).collect()} == {
        10, 20, 30,
    }
    # appends align to the narrowed schema
    table.commit_append(_mk(spark, [(9,)], "k long"))
    assert {r.k for r in table.read(spark).collect()} == {1, 2, 3, 9}


def test_readded_column_does_not_resurrect_dropped_bytes(spark, table):
    table.alter_drop_column(spark, "v")
    # re-add the same logical name via evolve: pre-drop file bytes for
    # the old 'v' must stay invisible (fresh physical name)
    table.commit_append(
        _mk(spark, [(7, 700)], "k long, v long"), evolve=True
    )
    got = {r.k: r.v for r in table.read(spark).collect()}
    assert got == {1: None, 2: None, 3: None, 7: 700}


def test_rename_then_drop_then_readd(spark, table):
    table.alter_rename_column(spark, "v", "amount")
    table.alter_drop_column(spark, "amount")
    table.commit_append(
        _mk(spark, [(8, 1)], "k long, amount long"), evolve=True
    )
    got = {r.k: r.amount for r in table.read(spark).collect()}
    assert got == {1: None, 2: None, 3: None, 8: 1}


def test_alter_guards(spark, table):
    with pytest.raises(ValueError, match="no column named"):
        table.alter_rename_column(spark, "zzz", "y")
    with pytest.raises(ValueError, match="already exists"):
        table.alter_rename_column(spark, "v", "k")
    table.add_constraint(spark, "v_pos", "v > 0")
    with pytest.raises(ValueError, match="referenced by constraints"):
        table.alter_rename_column(spark, "v", "amount")
    with pytest.raises(ValueError, match="referenced by constraints"):
        table.alter_drop_column(spark, "v")
    table.drop_constraint("v_pos")
    table.alter_drop_column(spark, "v")
    with pytest.raises(ValueError, match="only column"):
        table.alter_drop_column(spark, "k")


def test_partitioned_append_after_rename(spark, tmp_path):
    t = TxTable(str(tmp_path / "cpt"))
    t.commit_append_partitioned(
        _mk(spark, [("a", 1), ("b", 2)], "day string, k long"), "day"
    )
    t.alter_rename_column(spark, "day", "dt")
    t.commit_append_partitioned(
        _mk(spark, [("c", 3)], "dt string, k long"), "dt"
    )
    assert t.partitions("dt") == ["a", "b", "c"]
    picked, total = t.prune_groups("dt", lo="c", hi="c")
    assert (len(picked), total) == (1, 3)
    got = {(r.dt, r.k) for r in t.read(spark).collect()}
    assert got == {("a", 1), ("b", 2), ("c", 3)}
