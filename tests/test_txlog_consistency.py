"""Deterministic regressions for txlog replay/commit consistency holes
found by the round-4 review: checkpoint-seeded replays vs restore,
schema races between concurrent appends, merge-on-read DML under schema
evolution, version-consistency of older-version checkpoints, and the
txn cursor on provable no-op merges.

Reference contract: the reference's migration pipeline treats its
backup/restore surface (azanium/runcommand.py snapshot handling) as
exactly-replayable; these tests pin the equivalent invariant for the
self-built log format.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from db_migration_spark.plans.txlog import CommitConflict, TxTable


def _kv(spark, rows, schema="k long, v long"):
    return spark.createDataFrame(rows, schema)


def _state(spark, t, version=None):
    return {r.k: r.v for r in t.read(spark, version=version).collect()}


# ---------------------------------------------------------------------------
# fix 1: restore must re-assert the target's live DVs, so a replay
# seeded from a post-rewrite checkpoint cannot resurrect deleted rows
# ---------------------------------------------------------------------------


def test_restore_after_checkpoint_keeps_deletes(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    t.commit_append(_kv(spark, [(1, 10), (2, 20), (3, 30)]))  # v0
    t.delete_where(spark, F.col("k") == 2)                    # v1: DV live
    t.optimize(spark, target_groups=1)                        # v2: DV retires
    t.checkpoint()                                            # snapshot at v2
    v3 = t.restore(1)                                         # back to v1
    assert v3 == 3
    # the checkpoint-seeded replay of v3 must mask k=2 exactly like a
    # full replay from commit 0 would
    assert _state(spark, t) == {1: 10, 3: 30}
    assert _state(spark, t, version=3) == {1: 10, 3: 30}
    # and the restore itself stays time-travelable in both directions
    assert _state(spark, t, version=2) == {1: 10, 3: 30}
    assert _state(spark, t, version=0) == {1: 10, 2: 20, 3: 30}


def test_restore_dv_reassertion_survives_later_checkpoint(spark, tmp_path):
    """A checkpoint taken AFTER the restore must itself carry the
    re-asserted DVs forward (the checkpoint stores the already-replayed
    state, so this exercises the end-filter with restored groups)."""
    t = TxTable(str(tmp_path / "t"))
    t.commit_append(_kv(spark, [(1, 10), (2, 20)]))  # v0
    t.delete_where(spark, F.col("k") == 1)           # v1
    t.optimize(spark, target_groups=1)               # v2
    t.checkpoint()                                   # at v2 (DV filtered out)
    t.restore(1)                                     # v3
    t.checkpoint()                                   # at v3 (must keep DV)
    t.commit_append(_kv(spark, [(9, 90)]))           # v4 replays from cp v3
    assert _state(spark, t) == {2: 20, 9: 90}


# ---------------------------------------------------------------------------
# fix 2: an append losing a commit race to a concurrent evolve=True
# append must not clobber the evolved schema with its own narrower one
# ---------------------------------------------------------------------------


def test_append_conflict_preserves_concurrent_evolution(
    spark, tmp_path, monkeypatch
):
    root = str(tmp_path / "t")
    t = TxTable(root)
    t.commit_append(_kv(spark, [(1, 10)]))  # v0: schema (k, v)

    state = {"raced": False}
    orig_publish = t._publish

    def racy_publish(version, commit):
        if not state["raced"] and commit.get("op") == "append":
            state["raced"] = True
            # a second writer wins THIS version with an evolved append
            TxTable(root).commit_append(
                _kv(spark, [(2, 20, 200)], "k long, v long, w long"),
                evolve=True,
            )
        return orig_publish(version, commit)

    monkeypatch.setattr(t, "_publish", racy_publish)
    t.commit_append(_kv(spark, [(3, 30)]))  # loses v1, retries at v2

    sch = t.read_schema(spark)
    assert [f.name for f in sch.fields] == ["k", "v", "w"], (
        "the losing append's commit clobbered the evolved column"
    )
    got = {r.k: (r.v, r.w) for r in t.read(spark).collect()}
    assert got == {1: (10, None), 2: (20, 200), 3: (30, None)}


def test_append_conflict_with_concurrent_column_removal_fails(
    spark, tmp_path, monkeypatch
):
    """The symmetric race — an overwrite that DROPPED one of our columns
    — is a metadata conflict, not a silent re-widen (Delta's rule)."""
    root = str(tmp_path / "t")
    t = TxTable(root)
    t.commit_append(_kv(spark, [(1, 10)]))

    state = {"raced": False}
    orig_publish = t._publish

    def racy_publish(version, commit):
        if not state["raced"] and commit.get("op") == "append":
            state["raced"] = True
            TxTable(root).commit_overwrite(
                spark.createDataFrame([(7,)], "k long")
            )
        return orig_publish(version, commit)

    monkeypatch.setattr(t, "_publish", racy_publish)
    with pytest.raises(CommitConflict, match="schema change"):
        t.commit_append(_kv(spark, [(3, 30)]))
    # the loser's data group must not leak into the live state
    assert {r.k for r in t.read(spark).collect()} == {7}


# ---------------------------------------------------------------------------
# fix 3: merge-on-read DML must see the log-owned (evolved) schema
# ---------------------------------------------------------------------------


def test_update_after_add_column_preserves_new_column(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    t.commit_append(_kv(spark, [(1, 10), (2, 20)]))
    t.commit_append(
        _kv(spark, [(3, 30, 300)], "k long, v long, w long"), evolve=True
    )
    t.update_where(spark, F.col("k") == 3, {"v": F.lit(31)})
    got = {r.k: (r.v, r.w) for r in t.read(spark).collect()}
    # w=300 must survive the rewrite of row k=3
    assert got == {1: (10, None), 2: (20, None), 3: (31, 300)}
    # and updating a PRE-evolution row must emit w=NULL, not drop the col
    t.update_where(spark, F.col("k") == 1, {"v": F.lit(11)})
    got = {r.k: (r.v, r.w) for r in t.read(spark).collect()}
    assert got == {1: (11, None), 2: (20, None), 3: (31, 300)}


def test_merge_after_add_column_accepts_full_width_source(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    t.commit_append(_kv(spark, [(1, 10), (2, 20)]))
    t.commit_append(
        _kv(spark, [(3, 30, 300)], "k long, v long, w long"), evolve=True
    )
    # source carries EVERY table column including the evolved one —
    # must not be rejected as 'extra' by a pre-evolution footer schema
    t.merge_into(
        spark,
        _kv(spark, [(2, 21, 210), (4, 40, 400)], "k long, v long, w long"),
        "k",
    )
    got = {r.k: (r.v, r.w) for r in t.read(spark).collect()}
    assert got == {
        1: (10, None),
        2: (21, 210),
        3: (30, 300),
        4: (40, 400),
    }


def test_delete_after_add_column(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    t.commit_append(_kv(spark, [(1, 10), (2, 20)]))
    t.commit_append(
        _kv(spark, [(3, 30, 300)], "k long, v long, w long"), evolve=True
    )
    # predicate over the NEW column must resolve on pre-evolution files
    t.delete_where(spark, F.col("w") == 300)
    assert {r.k for r in t.read(spark).collect()} == {1, 2}


# ---------------------------------------------------------------------------
# fix 4: checkpoint(version=v) content is consistent AT v
# ---------------------------------------------------------------------------


def test_checkpoint_of_older_version_is_version_consistent(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    t.commit_append(_kv(spark, [(1, 10)]), txn=("app", 1))     # v0
    t.commit_append(_kv(spark, [(2, 20)]), txn=("app", 2))     # v1
    t.add_constraint(spark, "v_pos", "v > 0")                  # v2
    t.checkpoint(version=0)
    with open(
        os.path.join(t.log_dir, f"{0:020d}.checkpoint.json")
    ) as fh:
        snap = json.load(fh)
    assert snap["constraints"] == {}, "constraint from v2 leaked into cp@v0"
    assert snap["txns"] == {"app": {"1": 0}}, "txn from v1 leaked into cp@v0"
    assert snap["active"], "cp@v0 must carry v0's file state"
    # lookups at LATEST still see everything (the walk past the
    # checkpoint picks v1/v2 back up)
    assert t.txn_latest_batch("app") == 2
    assert set(t.constraints()) == {"v_pos"}
    assert _state(spark, t, version=0) == {1: 10}


# ---------------------------------------------------------------------------
# fix 5: a provable no-op merge carrying a txn identity still records it
# ---------------------------------------------------------------------------


def test_noop_merge_with_txn_advances_cursor(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    t.commit_append(_kv(spark, [(1, 10)]))
    before = t.latest_version()
    empty = spark.createDataFrame([], "k long, v long")
    v = t.merge_into(spark, empty, "k", txn=("feed", 7))
    assert v == before + 1, "no-op merge with txn must still commit"
    assert t.txn_latest_batch("feed") == 7
    assert t.txn_version("feed", 7) == v
    # replaying the same batch is idempotent on the recorded identity
    assert t.merge_into(spark, empty, "k", txn=("feed", 7)) == v
    assert _state(spark, t) == {1: 10}
    # a no-op merge WITHOUT a txn still commits nothing
    assert t.merge_into(spark, empty, "k") == v
    assert t.latest_version() == v


def test_noop_merge_txn_then_real_batch_orders_cursor(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    t.commit_append(_kv(spark, [(1, 10)]))
    empty = spark.createDataFrame([], "k long, v long")
    t.merge_into(spark, empty, "k", txn=("feed", 1))
    t.merge_into(spark, _kv(spark, [(2, 20)]), "k", txn=("feed", 2))
    assert t.txn_latest_batch("feed") == 2
    assert _state(spark, t) == {1: 10, 2: 20}
