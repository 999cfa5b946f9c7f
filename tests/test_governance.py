"""Data-governance operator tests (operators/governance.py): exact
k-anonymity tagging, l-diversity counts, and the window-free plan shape
(groupBy partial-agg + equi-join, never a per-partition sort)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from db_migration_spark.operators import governance as G


@pytest.fixture()
def people(spark):
    rows = [
        # (id, zip3, age_bin, disease)
        (1, "130", 2, "flu"),
        (2, "130", 2, "cold"),
        (3, "130", 2, "flu"),
        (4, "130", 2, "flu"),
        (5, "130", 3, "covid"),   # group of 1 → suppressed
        (6, "141", 2, "flu"),
        (7, "141", 2, "flu"),     # group of 2 → suppressed at k=3
        (8, None, 2, "cold"),
        (9, None, 2, "cold"),
        (10, None, 2, "cold"),    # NULL zip is ONE group of 3
    ]
    return spark.createDataFrame(rows, "id int, zip3 string, age int, dx string")


def test_k_anonymize_tags_and_null_groups(spark, people):
    out = G.k_anonymize(people, ["zip3", "age"], 3)
    status = {r.id: (r.qi_status, r.qi_group_n) for r in out.collect()}
    assert status[1] == ("kept", 4)
    assert status[5] == ("suppressed", 1)
    assert status[6] == ("suppressed", 2)
    # NULL quasi-identifiers group together (grouping-key semantics)
    assert status[8] == ("kept", 3)
    assert out.count() == 10  # no row lost by the size join


def test_k_anonymize_rejects_bad_k(spark, people):
    with pytest.raises(ValueError):
        G.k_anonymize(people, ["zip3"], 0)


def test_l_diversity_finds_homogeneous_group(spark, people):
    audit = G.l_diversity_audit(people, ["zip3", "age"], "dx")
    by_group = {
        (r.zip3, r.age): (r.qi_group_n, r.l_distinct)
        for r in audit.collect()
    }
    assert by_group[("130", 2)] == (4, 2)   # flu+cold
    assert by_group[(None, 2)] == (3, 1)    # homogeneous: the leak
    assert by_group[("141", 2)] == (2, 1)


def test_generalize_is_projection_only(spark, people):
    gen = G.generalize(people, {"age": (F.col("age") * 10).cast("int")})
    assert gen.columns == people.columns
    assert {r.age for r in gen.select("age").distinct().collect()} == {20, 30}
    plan = gen._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure codegen projection


def test_group_size_plan_has_no_window(spark, people):
    """The size annotation must be groupBy+join (partial-aggregable),
    never a count() OVER window (full sort of every partition)."""
    out = G.with_group_size(people, ["zip3", "age"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "HashAggregate" in plan


def test_t_closeness_exact_fractions(spark, people):
    """Hand-computed TVD fractions: global dist flu=5, cold=4, covid=1
    over N=10."""
    audit = G.t_closeness_audit(people, ["zip3", "age"], "dx")
    by_group = {
        (r.zip3, r.age): (r.qi_group_n, r.d_num, r.d_den)
        for r in audit.collect()
    }
    # ("130",2): n=4, flu=3 cold=1 → |30-20|+|10-16|+|0-4| = 20 / 80
    assert by_group[("130", 2)] == (4, 20, 80)
    # ("130",3): n=1, covid=1 → 5+4+9 = 18 / 20 (TVD 0.9)
    assert by_group[("130", 3)] == (1, 18, 20)
    # ("141",2): n=2, flu=2 → 10+8+2 = 20 / 40 (TVD 0.5)
    assert by_group[("141", 2)] == (2, 20, 40)
    # NULL zip is ONE group: n=3, cold=3 → 15+18+3 = 36 / 60 (TVD 0.6)
    assert by_group[(None, 2)] == (3, 36, 60)
    # TVD ≤ 1 always: d_num ≤ d_den
    assert all(d <= dd for (_, d, dd) in by_group.values())
