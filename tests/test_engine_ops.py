"""Unit tests for the engine/corpus batch (session 8): GROUP BY ALL
dimension inference, binaryFile listing-level pruning + byte fidelity,
bigram census tokenizer edges, gazetteer broadcast join."""

from __future__ import annotations

import hashlib
import os

from db_migration_spark.queries import QUERIES
from db_migration_spark.queries_engine import _binfile_dir, _ensure_binfiles

SF = "/root/testdata/sf0.001"


def test_group_by_all_matches_explicit(spark):
    implied = QUERIES["sql_group_by_all"](spark, SF).collect()
    explicit = spark.sql(
        """
        SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
               CAST(sum(CAST(floor(l_quantity * 100) AS BIGINT))
                    AS DECIMAL(38,0)) AS qty_cents,
               CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT))
                    AS DECIMAL(38,0)) AS price_cents
        FROM lineitem WHERE l_quantity < 45
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus, n_rows, qty_cents, price_cents
        """
    ).collect()
    assert implied == explicit


def test_binaryfile_bytes_roundtrip(spark):
    rows = {r.file: r for r in QUERIES["binaryfile_scan"](spark, SF).collect()}
    d = _ensure_binfiles(spark, SF)
    names = sorted(os.listdir(d))
    assert "_SUCCESS" in names
    txt = [n for n in names if n.endswith(".txt")]
    assert set(rows) == set(txt)
    for n in txt:
        raw = open(os.path.join(d, n), "rb").read()
        assert rows[n].n_bytes == len(raw)
        assert rows[n].digest == hashlib.md5(raw).hexdigest()
    # _SUCCESS marker excluded by pathGlobFilter (listing-level pruning)
    assert "_SUCCESS" not in rows


def test_binaryfile_fixture_idempotent(spark):
    d1 = _ensure_binfiles(spark, SF)
    before = {
        n: os.path.getmtime(os.path.join(d1, n)) for n in os.listdir(d1)
    }
    d2 = _ensure_binfiles(spark, SF)
    after = {
        n: os.path.getmtime(os.path.join(d2, n)) for n in os.listdir(d2)
    }
    assert d1 == d2 == _binfile_dir(SF)
    assert before == after  # _SUCCESS gate short-circuits the rewrite


def test_bigram_census_shapes(spark):
    rows = QUERIES["corpus_ngram_counts"](spark, SF).collect()
    assert len(rows) == 20
    counts = [r.n_mentions for r in rows]
    assert counts == sorted(counts, reverse=True)
    for r in rows:
        # a bigram is exactly two lowercase alnum tokens
        parts = r.bigram.split(" ")
        assert len(parts) == 2 and all(p for p in parts)
        assert r.n_docs <= r.n_mentions


def test_gazetteer_counts_consistent(spark):
    rows = QUERIES["text_gazetteer_tag"](spark, SF).collect()
    assert rows
    from db_migration_spark.queries_engine import _GAZETTEER

    gaz = dict(_GAZETTEER)
    for r in rows:
        assert gaz[r.term] == r.entity
        assert 0 < r.n_docs <= r.n_mentions
