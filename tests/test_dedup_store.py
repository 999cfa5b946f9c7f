"""Persisted LSH band index (queries_dedupstore.py): store/probe parity,
plan guards, adversarial red gates, and the streaming MV contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from db_migration_spark.operators import dedup
from db_migration_spark.queries import QUERIES
from db_migration_spark.queries_dedupstore import _store_acceptance


def test_band_rows_is_the_candidate_generators_banding(spark, sf_dir):
    """lsh_candidate_pairs and the persisted store derive bucketing from
    the SAME band_rows helper — prove the refactor by recomputing the
    self-join pairs from band_rows output and matching exactly."""
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    )
    sigs = dedup.minhash_signatures(docs, num_hashes=32).persist()
    via_op = {
        (r.id_a, r.id_b)
        for r in dedup.lsh_candidate_pairs(sigs, bands=8).collect()
    }
    rows = dedup.band_rows(sigs, "doc_id", 8)
    a = rows.withColumnRenamed("doc_id", "id_a")
    b = rows.withColumnRenamed("doc_id", "id_b")
    via_rows = {
        (r.id_a, r.id_b)
        for r in a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
        .collect()
    }
    sigs.unpersist()
    assert via_op == via_rows


def test_store_probe_acceptance_green(spark, sf_dir):
    row = QUERIES["dedup_lsh_store_probe"](spark, sf_dir).collect()[0]
    assert row.recall_ok and row.est_err_ok
    assert row.n_exact_hi >= 0


def test_store_probe_plan_no_cartesian_no_python(spark, sf_dir):
    plan = QUERIES["dedup_lsh_store_probe"](
        spark, sf_dir
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_crippled_store_goes_red(spark):
    """An empty/stale band index must not pass the gate vacuously: with
    a planted exact cross-parity duplicate and an EMPTY found-pair set,
    recall_ok goes False."""
    base = " ".join(f"w{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(0, base), (1, base)]
        + [(10 + j, " ".join(f"u{j}_{i}" for i in range(40)))
           for j in range(6)],
        "doc_id long, text string",
    )
    empty_found = spark.createDataFrame(
        [], "id_a long, id_b long, est_jaccard double"
    )
    row = _store_acceptance(docs, empty_found).collect()[0]
    assert row.n_exact_hi == 1
    assert not row.recall_ok


def test_probe_finds_planted_cross_split_dup(spark, tmp_path):
    """End-to-end through the REAL store fixture on a planted corpus:
    an even/odd exact-duplicate pair must surface through the persisted
    index path (collision certain: identical signatures)."""
    import hashlib

    base = " ".join(f"w{i}" for i in range(40))
    rows = [
        (0, base, "en", "s", len(base)), (1, base, "en", "s", len(base))
    ] + [
        (10 + j, " ".join(f"u{j}_{i}" for i in range(40)), "en", "s", 0)
        for j in range(6)
    ]
    docs = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    # dir name carries a content hash: _ensure_lsh_store caches fixtures
    # by sf_dir BASENAME (+ package-code hash, which does not see test
    # files) — editing the planted rows must move the cache key, or the
    # probe would silently run against the previous corpus's band index
    h = hashlib.md5(repr(rows).encode()).hexdigest()[:8]
    d = tmp_path / f"planted_{h}"
    d.mkdir()
    docs.coalesce(1).write.parquet(str(d / "documents.parquet"))
    row = QUERIES["dedup_lsh_store_probe"](spark, str(d)).collect()[0]
    assert row.n_exact_hi == 1
    assert row.recall_ok and row.est_err_ok


def test_point_probe_serves_self_match(spark, sf_dir):
    row = QUERIES["dedup_lsh_point_probe"](spark, sf_dir).collect()[0]
    assert row.self_found            # identical text => certain collision
    assert row.probe_cost_bounded    # <= BANDS groups planned, any size
    assert row.probe_id % 2 == 0


def test_stream_mv_equals_batch(spark, sf_dir):
    row = QUERIES["stream_dedup_lsh_mv"](spark, sf_dir).collect()[0]
    assert row.store_equals_batch
    assert row.n_band_rows == row.n_docs * 8
