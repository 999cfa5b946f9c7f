"""Web-text wave plan/behavior pins: the HTML extraction chain must stay
a map-only codegen plan (no Python nodes — the UDTF entry is the ONLY
sanctioned Python seam, and it must actually go through the arrow batch
path)."""

from __future__ import annotations

import contextlib
import io

from db_migration_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _plan(spark, name):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        QUERIES[name](spark, SF).explain("formatted")
    return buf.getvalue()


def test_html_extract_is_codegen_map_only(spark):
    plan = _plan(spark, "text_html_extract")
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    # extraction adds no shuffle of its own (the loader's round-robin
    # spread is the only exchange; nothing hash/range-partitions)
    assert "hashpartitioning" not in plan
    assert "rangepartitioning" not in plan


def test_udtf_runs_on_arrow_batch_path(spark):
    plan = _plan(spark, "udtf_passage_split")
    # the declared UDTF seam must be the arrow-optimized eval, not the
    # pickled row-at-a-time python UDTF worker
    assert "ArrowEvalPythonUDTF" in plan or "ArrowEvalUDTF" in plan, plan


def test_html_extract_decodes_entities_and_strips_tags(spark):
    rows = (
        QUERIES["text_html_extract"](spark, SF)
        .orderBy("doc_id")
        .limit(3)
        .collect()
    )
    for r in rows:
        assert r.body_preserved  # the body text survives extraction
        assert "<" not in r.clean_prefix or '"' in r.clean_prefix
        assert r.n_links == 3
