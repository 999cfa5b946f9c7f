"""Plan-property regression guards: the physical plans we designed for
must survive refactors (broadcasts stay broadcasts, pushdown reaches the
scan, no Python nodes sneak into expression-only operators)."""

from __future__ import annotations

import contextlib
import io

from db_migration_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        QUERIES[name](spark, SF).explain("formatted")
    return buf.getvalue()


def test_x6_broadcasts_dims(spark):
    plan = _plan(spark, "x6_qa_report")
    # the two nation dim joins against the fact side must be broadcast;
    # the final full-outer reconcile of the two tiny aggregates is
    # legitimately a sort-merge join (Spark can't broadcast full outer)
    assert plan.count("BroadcastHashJoin") >= 2


def test_q1_pushdown_reaches_scan(spark):
    plan = _plan(spark, "q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan
    # column pruning: shipdate filter + 5 referenced columns, not all 11
    assert "l_comment" not in plan


def test_expression_only_operators_have_no_python_nodes(spark):
    for name in (
        "dedup_minhash",
        "dedup_simhash",
        "ann_cosine_topk",
        "text_stats",
        "text_lang_id",
        "x1_eav_melt",
    ):
        plan = _plan(spark, name)
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan, name


def test_topk_uses_takeordered(spark):
    plan = _plan(spark, "t2_top_nations")
    assert "TakeOrderedAndProject" in plan
