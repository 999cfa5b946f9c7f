"""Model-based ACID check for the txlog table format: random operation
sequences (append / delete / update / merge / optimize / restore) run
against BOTH the real TxTable and a trivial in-memory dict model; after
every step the table's read() must equal the model exactly, and after
the whole sequence every historical version must still time-travel to
the state the model had at that point.

This is the test shape a commit protocol needs most: interleavings no
hand-written case enumerates (delete of already-updated rows, merge over
a DV mask, restore across an optimize, …) — the model is so simple it
is obviously correct, so any divergence is a format bug."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from db_migration_spark.plans.txlog import TxTable

KEYS = list(range(12))  # small key domain → operations genuinely collide


def _ops():
    append = st.tuples(
        st.just("append"),
        st.lists(st.sampled_from(KEYS), min_size=1, max_size=4),
        st.integers(0, 99),
    )
    delete = st.tuples(
        st.just("delete"), st.sampled_from(KEYS), st.just(0)
    )
    update = st.tuples(
        st.just("update"), st.sampled_from(KEYS), st.integers(100, 199)
    )
    merge = st.tuples(
        st.just("merge"),
        st.lists(st.sampled_from(KEYS), min_size=1, max_size=4, unique=True),
        st.integers(200, 299),
    )
    optimize = st.tuples(st.just("optimize"), st.just(None), st.just(0))
    # arg picks the restore target among committed versions (mod len),
    # so restores land mid-history — where DVs may be live — not just v0
    restore = st.tuples(st.just("restore"), st.integers(0, 31), st.just(0))
    # checkpoint is metadata-only (no new version) but changes the
    # REPLAY PATH of every later read — interleaving it with restore is
    # what caught the end-filtered-DV resurrection bug (round-4 advice)
    checkpoint = st.tuples(st.just("checkpoint"), st.just(None), st.just(0))
    return st.lists(
        st.one_of(
            append, delete, update, merge, optimize, restore, checkpoint
        ),
        min_size=3,
        max_size=7,
    )


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=_ops())
def test_random_dml_sequences_match_model(spark, tmp_path_factory, ops):
    tmp = tmp_path_factory.mktemp("txmodel")
    t = TxTable(str(tmp / "t"))
    # seed state so every op has something to act on
    seed = {k: k * 10 for k in KEYS[:6]}
    t.commit_append(
        spark.createDataFrame(
            [(k, v) for k, v in seed.items()], "k long, v long"
        )
    )
    model = dict(seed)
    history = [dict(model)]  # model state per committed version

    def mkdf(rows):
        return spark.createDataFrame(rows, "k long, v long")

    for op, arg, val in ops:
        before_v = t.latest_version()
        if op == "append":
            # appends may duplicate keys — the table is a bag; model as
            # "last value wins per key" would be wrong, so keep appends
            # key-disjoint from live keys to stay a map
            rows = [(k, val) for k in set(arg) if k not in model]
            if not rows:
                continue
            t.commit_append(mkdf(rows))
            for k, v in rows:
                model[k] = v
        elif op == "delete":
            t.delete_where(spark, F.col("k") == arg)
            model.pop(arg, None)
        elif op == "update":
            t.update_where(spark, F.col("k") == arg, {"v": F.lit(val)})
            if arg in model:
                model[arg] = val
        elif op == "merge":
            t.merge_into(spark, mkdf([(k, val) for k in arg]), "k")
            for k in arg:
                model[k] = val
        elif op == "optimize":
            if not model:
                continue
            t.optimize(spark, target_groups=1)
        elif op == "checkpoint":
            t.checkpoint()
        elif op == "restore":
            target = arg % len(history)
            t.restore(target)
            model = dict(history[target])
        if t.latest_version() != before_v:
            history.append(dict(model))
        got = (
            {r.k: r.v for r in t.read(spark).collect()} if model else {}
        )
        if model:
            assert got == model, f"divergence after {op}"
    # every historical version still time-travels to its model state
    for v, snap in enumerate(history):
        if not snap:
            continue
        tv = {r.k: r.v for r in t.read(spark, version=v).collect()}
        assert tv == snap, f"time travel to v{v} diverged"


@pytest.mark.parametrize("n", [1])
def test_model_smoke(spark, tmp_path, n):
    """Deterministic mini-sequence covering every op once (fast gate for
    the model harness itself)."""
    t = TxTable(str(tmp_path / "t"))
    t.commit_append(
        spark.createDataFrame([(1, 10), (2, 20)], "k long, v long")
    )
    t.update_where(spark, F.col("k") == 1, {"v": F.lit(11)})
    t.delete_where(spark, F.col("k") == 2)
    t.merge_into(
        spark,
        spark.createDataFrame([(3, 30), (1, 12)], "k long, v long"),
        "k",
    )
    t.optimize(spark, target_groups=1)
    t.restore(0)
    assert {r.k: r.v for r in t.read(spark).collect()} == {1: 10, 2: 20}
