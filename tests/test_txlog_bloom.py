"""Bloom-filter point-lookup sidecars (plans/txlog.py add_bloom_index /
prune_groups_point / read_point): the high-cardinality complement to
zone maps.  The fixtures interleave keys across groups so every group's
min/max covers the whole domain — zone maps keep everything, and only
the bloom can skip files."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from db_migration_spark.plans.txlog import TxTable

N_GROUPS = 4
KEYS_PER_GROUP = 500


def _mk(spark, rows):
    return spark.createDataFrame(rows, "k long, v string")


def _build(spark, tmp_path):
    t = TxTable(str(tmp_path / "bt"))
    for g in range(N_GROUPS):
        # strided keys: group g holds {g, g+4, g+8, ...} — all ranges
        # overlap, so zone maps cannot tell the groups apart
        rows = [
            (g + i * N_GROUPS, f"g{g}") for i in range(KEYS_PER_GROUP)
        ]
        t.commit_append(_mk(spark, rows))
    return t


def test_bloom_prunes_interleaved_groups(spark, tmp_path):
    t = _build(spark, tmp_path)
    assert t.add_bloom_index(spark, "k") == N_GROUPS
    # zone maps alone keep everything (overlapping ranges)
    zone_kept, total = t.prune_groups("k", lo=5, hi=5)
    assert (len(zone_kept), total) == (N_GROUPS, N_GROUPS)
    # bloom keeps the owning group (false positives are possible but
    # bounded far below N_GROUPS at 10 bits/key)
    kept, total = t.prune_groups_point(spark, "k", 5)
    assert total == N_GROUPS and 1 <= len(kept) < N_GROUPS
    got = t.read_point(spark, "k", 5).collect()
    assert [(r.k, r.v) for r in got] == [(5, "g1")]


def test_bloom_absent_key_reads_empty(spark, tmp_path):
    t = _build(spark, tmp_path)
    t.add_bloom_index(spark, "k")
    assert t.read_point(spark, "k", 10_000_000).count() == 0


def test_unindexed_groups_never_wrongly_pruned(spark, tmp_path):
    t = _build(spark, tmp_path)
    t.add_bloom_index(spark, "k")
    # a new group WITHOUT a sidecar must always be kept
    t.commit_append(_mk(spark, [(999_999, "late")]))
    kept, total = t.prune_groups_point(spark, "k", 999_999)
    assert total == N_GROUPS + 1
    got = t.read_point(spark, "k", 999_999).collect()
    assert [(r.k, r.v) for r in got] == [(999_999, "late")]
    # indexing is incremental: only the new group is built
    assert t.add_bloom_index(spark, "k") == 1


def test_bloom_composes_with_deletion_vectors(spark, tmp_path):
    t = _build(spark, tmp_path)
    t.add_bloom_index(spark, "k")
    t.delete_where(spark, F.col("k") == 5)
    assert t.read_point(spark, "k", 5).count() == 0
    assert t.read_point(spark, "k", 9).count() == 1


def test_sidecar_invisible_to_scans_and_stats(spark, tmp_path):
    t = _build(spark, tmp_path)
    t.add_bloom_index(spark, "k")
    g = t.active_groups()[0]
    assert os.path.exists(
        os.path.join(t.data_dir, g, "_bloom_k.json")
    )
    # plain reads and aggregates are unaffected by the sidecar bytes
    assert t.read(spark).count() == N_GROUPS * KEYS_PER_GROUP


def test_batched_build_with_evolved_and_renamed_groups(spark, tmp_path):
    """Round-6 batched builder: groups written BEFORE an evolve lack the
    indexed column physically (null-filled at scan — only deterministic
    null-hash bits get set), and a renamed logical column indexes under
    its stable physical name.  One call builds every group; lookups stay
    exact on live rows."""
    from db_migration_spark.plans.txlog import TxTable

    t = TxTable(str(tmp_path / "t"))
    t.commit_append(spark.createDataFrame([(1, "a")], "k long, v string"))
    t.commit_append(
        spark.createDataFrame(
            [(2, "b", 20), (3, "c", 30)], "k long, v string, ev long"
        ),
        evolve=True,
    )
    for i in range(4, 10):
        t.commit_append(
            spark.createDataFrame(
                [(i, f"x{i}", i * 10)], "k long, v string, ev long"
            )
        )
    t.alter_rename_column(spark, "ev", "event_id")
    built = t.add_bloom_index(spark, "event_id")
    assert built == len(t.active_groups())
    # the group predating the evolve cannot hold event_id=50 and the
    # bloom planner must keep exactly the real group (plus any false
    # positives — assert content, then that pruning actually fired)
    got = t.read_point(spark, "event_id", 50).collect()
    assert [(r.k, r.event_id) for r in got] == [(4 + 1, 50)]
    kept, total = t.prune_groups_point(spark, "event_id", 50)
    assert total == len(t.active_groups())
    assert len(kept) < total, "bloom pruned nothing across 8 groups"
    # incremental: a second call is a no-op, and a fresh group builds solo
    assert t.add_bloom_index(spark, "event_id") == 0
