"""Unit tests for the round-3 analytics batch: containment dedup, CMS
properties, deterministic sampling, gap-fill boundary semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from db_migration_spark.operators import dedup
from db_migration_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def test_containment_detects_planted_subset(spark):
    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon"
    )
    rows = [
        (1, base + " phi chi psi omega extra words beyond the subset part"),
        (2, base),  # strict subset of doc 1's shingle set
        (3, "completely different vocabulary with no overlap at all here"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = dedup.containment_pairs(df, k=3, threshold=0.9).collect()
    pairs = {(r.id_a, r.id_b): r for r in out}
    assert (1, 2) in pairs
    # the subset doc's shingles are all inside doc 1 → contain_b == 1.0
    assert abs(pairs[(1, 2)].contain_b - 1.0) < 1e-12
    # but Jaccard would be diluted: contain_a (the big doc's side) < 1
    assert pairs[(1, 2)].contain_a < 1.0
    assert not any(3 in p for p in pairs)


def test_cms_estimate_never_undercounts(spark):
    # count-min property: est >= exact for every probed key
    out = QUERIES["heavy_hitters_cms"](spark, SF).collect()
    # sf0.001 has fewer than 20 distinct users; top-k caps at the corpus
    assert 10 <= len(out) <= 20
    for r in out:
        assert r.cms_est >= r.exact_n, (r.user_id, r.cms_est, r.exact_n)


def test_sampling_is_layout_independent(spark):
    # the kept set must not change under repartitioning (no RNG, no
    # rowid dependence) — the property rand()-based sampling lacks
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    h = (F.col("doc_id") * F.lit(1103515245) + F.lit(12345)) % F.lit(1048576)
    thr = F.least(F.lit(1048576), F.expr("n_chars * 1048576 div 5000"))
    a = set(
        r.doc_id for r in docs.filter(h < thr).select("doc_id").collect()
    )
    b = set(
        r.doc_id
        for r in docs.repartition(7)
        .filter(h < thr)
        .select("doc_id")
        .collect()
    )
    assert a == b and len(a) > 0


def test_stratified_rates_approximate_budgets(spark):
    rows = {
        r.lang: r
        for r in QUERIES["sample_stratified"](spark, SF).collect()
    }
    en = rows["en"]
    # multiplicative-hash uniformity: en keep rate within ±15pp of 50%
    assert abs(en.n_kept / en.n_total - 0.5) < 0.15


def test_gapfill_boundaries_and_interpolation(spark):
    out = QUERIES["ts_gapfill"](spark, SF).collect()
    by_type: dict = {}
    for r in out:
        by_type.setdefault(r.event_type, []).append(r)
    for rows in by_type.values():
        rows.sort(key=lambda r: r.h)
        # grid is dense: consecutive hours, first/last are real data
        assert rows[0].is_gap == 0 and rows[-1].is_gap == 0
        for a, b in zip(rows, rows[1:]):
            assert (b.h - a.h).total_seconds() == 3600
        for r in rows:
            if r.is_gap == 0:
                assert r.interp_micro == r.locf_cnt * 1_000_000
    # interpolation lands strictly between neighbors on at least one gap
    gaps = [r for r in out if r.is_gap == 1]
    assert gaps, "sf0.001 events should have hourly gaps"


def test_bpe_encode_compresses_vs_chars(spark):
    # applying merges can only shrink the symbol count vs raw chars,
    # and never below the word count
    out = QUERIES["bpe_encode"](spark, SF)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    joined = out.join(docs.select("doc_id", "text"), "doc_id").collect()
    for r in joined:
        n_chars_nospace = sum(len(w) for w in r.text.lower().split())
        assert r.n_words <= r.n_tokens <= n_chars_nospace


def test_excise_removes_history_and_leaves_audit(spark):
    from db_migration_spark.operators import eav as EAV

    datoms = spark.createDataFrame(
        [
            (1, "name", "a", 10, True),
            (1, "name", "a2", 20, True),   # history: two asserts
            (1, "size", "9", 15, True),
            (2, "name", "b", 11, True),
        ],
        ["e", "a", "v", "tx", "op"],
    )
    targets = spark.createDataFrame([(1,)], ["e"])
    out = EAV.excise(datoms, targets).collect()
    # ALL of entity 1's datoms are gone (history included), unlike a
    # retraction which would add op=false rows and keep the history
    assert all(not (r.e == 1 and r.a in ("name", "size")) for r in out)
    audits = [r for r in out if r.a == ":db/excise"]
    assert len(audits) == 1 and audits[0].e == 1
    assert audits[0].tx == 20  # max tx at excision time
    assert any(r.e == 2 and r.a == "name" for r in out)


def test_mixture_temperature_flattens_distribution(spark):
    rows = {
        r.lang: r for r in QUERIES["mixture_temperature"](spark, SF).collect()
    }
    ens = rows["en"]
    others = [r for k, r in rows.items() if k != "en"]
    # temperature sampling must compress the ratio: en's share of the
    # budget is strictly below its share of raw docs
    tot_docs = sum(r.n_docs for r in rows.values())
    tot_budget = sum(r.budget_micro for r in rows.values())
    assert ens.budget_micro / tot_budget < ens.n_docs / tot_docs
    assert all(r.budget_micro > 0 for r in others)
