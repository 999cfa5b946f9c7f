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


def test_alter_losing_race_rebases_onto_evolved_schema(
    spark, table, monkeypatch
):
    """A rename that loses its commit race must re-derive the schema
    from the ADVANCED snapshot — republishing its stale one would erase
    the concurrent evolve's column."""
    root = table.root
    state = {"raced": False}
    orig = table._publish

    def racy(version, commit):
        if not state["raced"] and commit.get("op") == "alter_rename":
            state["raced"] = True
            TxTable(root).commit_append(
                _mk(spark, [(9, 90, 900)], "k long, v long, w long"),
                evolve=True,
            )
        return orig(version, commit)

    monkeypatch.setattr(table, "_publish", racy)
    table.alter_rename_column(spark, "v", "amount")
    names = [f.name for f in table.read_schema(spark).fields]
    assert names == ["k", "amount", "w"], (
        "the losing rename clobbered the concurrently evolved column"
    )
    got = {r.k: (r.amount, r.w) for r in table.read(spark).collect()}
    assert got[9] == (90, 900)


def test_evolve_append_racing_concurrent_drop_fails_loudly(
    spark, table, monkeypatch
):
    """An evolve append that loses its race to ALTER DROP of a column
    it carries must fail as a metadata conflict — silently re-adding
    the column would resurrect the retired physical bytes."""
    from db_migration_spark.plans.txlog import CommitConflict

    root = table.root
    state = {"raced": False}
    orig = table._publish

    def racy(version, commit):
        if not state["raced"] and commit.get("op") == "append":
            state["raced"] = True
            TxTable(root).alter_drop_column(spark, "v")
        return orig(version, commit)

    monkeypatch.setattr(table, "_publish", racy)
    with pytest.raises(CommitConflict, match="removed"):
        table.commit_append(
            _mk(spark, [(5, 50, 500)], "k long, v long, w long"),
            evolve=True,
        )
    # the drop won; the loser's group never became visible
    assert table.read(spark).columns == ["k"]


def test_evolve_readds_renamed_away_name_without_collision(spark, table):
    """ADD COLUMN of a name whose physical slot is occupied by a
    renamed field must take a fresh physical name, not collide."""
    table.alter_rename_column(spark, "v", "amount")
    table.commit_append(
        _mk(spark, [(4, 40, 7)], "k long, amount long, v long"),
        evolve=True,
    )
    got = {r.k: (r.amount, r.v) for r in table.read(spark).collect()}
    # pre-existing rows: old physical 'v' serves amount, new v is NULL
    assert got == {1: (10, None), 2: (20, None), 3: (30, None),
                   4: (40, 7)}


def test_cdf_speaks_each_versions_logical_schema(spark, table):
    table.alter_rename_column(spark, "v", "amount")
    table.commit_append(_mk(spark, [(4, 40)], "k long, amount long"))
    feed = table.read_changes(spark, from_version=1)
    assert "amount" in feed.columns and "v" not in feed.columns
    assert {r.k for r in feed.collect()} == {4}


def test_empty_partitioned_append(spark, tmp_path):
    t = TxTable(str(tmp_path / "ept"))
    t.commit_append_partitioned(
        _mk(spark, [("a", 1)], "day string, k long"), "day"
    )
    empty = spark.createDataFrame([], "day string, k long")
    # without a txn: nothing to record, no commit
    assert t.commit_append_partitioned(empty, "day") == 0
    assert t.latest_version() == 0
    # with a txn: metadata-only commit so the batch cursor advances
    v = t.commit_append_partitioned(empty, "day", txn=("sink", 5))
    assert v == 1 and t.txn_latest_batch("sink") == 5
    assert t.read(spark).count() == 1
