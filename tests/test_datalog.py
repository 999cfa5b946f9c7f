"""Datalog query surface over the datoms store."""

from __future__ import annotations

import datetime

import pytest

from db_migration_spark import datalog

TS = datetime.datetime


@pytest.fixture(scope="module")
def store(spark):
    rows = [
        (1, "gene/id", "G1", TS(2020, 1, 1), True),
        (1, "gene/name", "aap-1", TS(2020, 1, 1), True),
        (1, "gene/status", "live", TS(2020, 1, 1), True),
        (2, "gene/id", "G2", TS(2020, 1, 1), True),
        (2, "gene/name", "abc-2", TS(2020, 1, 1), True),
        (2, "gene/status", "dead", TS(2020, 1, 1), True),
        (3, "protein/id", "P1", TS(2020, 1, 1), True),
        (3, "protein/gene", "1", TS(2020, 1, 1), True),  # ref to e=1
        (4, "gene/id", "G4", TS(2020, 1, 1), False),  # retracted
    ]
    return spark.createDataFrame(
        rows, "e LONG, a STRING, v STRING, tx TIMESTAMP, op BOOLEAN"
    )


def test_single_clause(store):
    out = datalog.query(store, ["?e", "?id"], [["?e", "gene/id", "?id"]])
    assert {(r["e"], r["id"]) for r in out.collect()} == {(1, "G1"), (2, "G2")}


def test_retracted_facts_invisible(store):
    out = datalog.query(store, ["?id"], [["_", "gene/id", "?id"]])
    assert {r["id"] for r in out.collect()} == {"G1", "G2"}


def test_self_join_on_entity(store):
    out = datalog.query(
        store,
        ["?name"],
        [["?e", "gene/status", "live"], ["?e", "gene/name", "?name"]],
    )
    assert [r["name"] for r in out.collect()] == ["aap-1"]


def test_ref_traversal_value_to_entity(store):
    # protein -> gene ref: ?g appears as value in one clause, entity in next
    out = datalog.query(
        store,
        ["?pid", "?gname"],
        [
            ["?p", "protein/id", "?pid"],
            ["?p", "protein/gene", "?g"],
            ["?g", "gene/name", "?gname"],
        ],
    )
    assert [(r["pid"], r["gname"]) for r in out.collect()] == [("P1", "aap-1")]


def test_cross_product_when_disjoint(store):
    out = datalog.query(
        store,
        ["?gid", "?pid"],
        [["_", "gene/id", "?gid"], ["_", "protein/id", "?pid"]],
    )
    assert {(r["gid"], r["pid"]) for r in out.collect()} == {
        ("G1", "P1"),
        ("G2", "P1"),
    }


def test_find_unbound_raises(store):
    with pytest.raises(ValueError, match="not bound"):
        datalog.query(store, ["?nope"], [["?e", "gene/id", "?id"]])


def test_constant_entity(store):
    out = datalog.query(store, ["?a", "?v"], [[1, "?a", "?v"]])
    got = {(r["a"], r["v"]) for r in out.collect()}
    assert got == {("gene/id", "G1"), ("gene/name", "aap-1"), ("gene/status", "live")}


def test_migrated_store_roundtrip(spark, tmp_path):
    """Datalog over an actual MigrationJob store."""
    import gzip

    from db_migration_spark.migrate import MigrationJob

    (tmp_path / "dumps").mkdir()
    with gzip.open(tmp_path / "dumps" / "d.ace.gz", "wt") as fp:
        fp.write(
            'Gene : "G1"\nCGC_name "aap-1" -O "2010-01-01_10:00:00"\n\n'
            'Gene : "G2"\nCGC_name "abc-2" -O "2010-01-02_10:00:00"\n'
        )
    (tmp_path / "models").write_text("?Gene\n  CGC_name UNIQUE Text\n")
    with gzip.open(tmp_path / "cat.txt.gz", "wt") as fp:
        fp.write("Gene 2\n")
    job = MigrationJob(
        spark, str(tmp_path / "ws"), str(tmp_path / "dumps"),
        str(tmp_path / "models"), str(tmp_path / "cat.txt.gz"), "WS300",
    )
    job.run()
    store = spark.read.parquet(job._path("datoms_patched"))
    out = datalog.query(
        store, ["?name"], [["?e", "Gene/CGC_name", "?name"]]
    )
    assert {r["name"] for r in out.collect()} == {"aap-1", "abc-2"}


def test_predicate_clause(store):
    out = datalog.query(
        store,
        ["?e", "?name"],
        [
            ["?e", "gene/name", "?name"],
            "?name like 'a%'",
        ],
    )
    assert {(r["e"], r["name"]) for r in out.collect()} == {
        (1, "aap-1"),
        (2, "abc-2"),
    }


def test_predicate_on_entity_var(store):
    out = datalog.query(
        store, ["?e"], [["?e", "gene/id", "_"], "?e > 1"]
    )
    assert [r["e"] for r in out.collect()] == [2]


def test_predicate_unbound_raises(store):
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unbound"):
        datalog.query(store, ["?e"], [["?e", "gene/id", "_"], "?nope > 1"])


def test_fast_path_eliminates_self_joins(store):
    # single-entity-var, literal-attr queries compile to one grouped pass:
    # no join nodes at all in the physical plan
    out = datalog.query(
        store,
        ["?e", "?name"],
        [["?e", "gene/status", "live"], ["?e", "gene/name", "?name"]],
    )
    import contextlib, io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "Join" not in plan, plan


def test_fast_path_matches_fold_path(store):
    # force the fold path with a two-entity-var shape anchor, then compare
    # an equivalent qualifying query: repeated value var + wildcard + pred
    q = dict(
        find=["?e", "?qty"],
        where=[
            ["?e", "gene/id", "_"],
            ["?e", "gene/name", "?qty"],
            ["?e", "gene/name", "?qty"],  # repeated var: constrains binding
            "?qty like '%-%'",
        ],
    )
    fast = datalog.query(store, **q)
    assert datalog._single_entity_plan(store, **q) is not None
    # build the fold answer by disabling the fast path
    import unittest.mock as mock

    with mock.patch.object(datalog, "_single_entity_plan", lambda *a, **k: None):
        fold = datalog.query(store, **q)
    assert sorted(map(tuple, fast.collect())) == sorted(map(tuple, fold.collect()))


def test_fast_path_rejects_entity_value_unification(store):
    # ?x in both e and v positions needs string unification — fold path only
    q = dict(
        find=["?x"],
        where=[["?x", "gene/id", "_"], ["_", "protein/gene", "?x"]],
    )
    assert datalog._single_entity_plan(store, **q) is None


def test_find_aggregates_set_semantics(spark):
    """(count ?v) aggregates over DISTINCT solutions (Datomic default):
    duplicate datoms contribute once."""
    from db_migration_spark import datalog

    datoms = spark.createDataFrame(
        [
            (1, "tag", "x"),
            (1, "tag", "x"),   # duplicate solution — counted once
            (1, "tag", "y"),
            (2, "tag", "x"),
            (2, "other", "z"),
        ],
        "e LONG, a STRING, v STRING",
    )
    out = {
        r["e"]: r["count_v"]
        for r in datalog.query(
            datoms, find=["?e", "(count ?v)"], where=[["?e", "tag", "?v"]]
        ).collect()
    }
    assert out == {1: 2, 2: 1}
    # global aggregate (no plain find var) + min/max
    row = datalog.query(
        datoms,
        find=["(count-distinct ?e)", "(min ?v)", "(max ?v)"],
        where=[["?e", "tag", "?v"]],
    ).collect()[0]
    assert (row["count_distinct_e"], row["min_v"], row["max_v"]) == (2, "x", "y")


def test_not_clause_anti_join(spark):
    from db_migration_spark import datalog

    datoms = spark.createDataFrame(
        [
            (1, "click", "a"),
            (1, "error", "b"),
            (2, "click", "c"),
            (3, "view", "d"),
        ],
        "e LONG, a STRING, v STRING",
    )
    out = sorted(
        r["e"]
        for r in datalog.query(
            datoms,
            find=["?e"],
            where=[["?e", "click", "_"], ("not", ["?e", "error", "_"])],
        ).collect()
    )
    assert out == [2]  # 1 errored, 3 never clicked
    # not-clause with a value variable shared through the solution set
    out2 = sorted(
        (r["e"], r["v"])
        for r in datalog.query(
            datoms,
            find=["?e", "?v"],
            where=[["?e", "click", "?v"], ("not", ["_", "error", "?v"])],
        ).collect()
    )
    assert out2 == [(1, "a"), (2, "c")]


def test_or_clause_union(spark):
    from db_migration_spark import datalog

    datoms = spark.createDataFrame(
        [
            (1, "click", "a"),
            (2, "view", "b"),
            (3, "error", "c"),
            (4, "click", "d"),
            (4, "view", "e"),
        ],
        "e LONG, a STRING, v STRING",
    )
    out = sorted(
        r["e"]
        for r in datalog.query(
            datoms,
            find=["?e"],
            where=[("or", [["?e", "click", "_"], ["?e", "view", "_"]])],
        ).collect()
    )
    assert out == [1, 2, 4]  # 4 matches both branches, appears once (set)
    # or composed with not and an aggregate
    row = datalog.query(
        datoms,
        find=["(count ?e)"],
        where=[
            ("or", [["?e", "click", "_"], ["?e", "view", "_"]]),
            ("not", ["?e", "error", "_"]),
        ],
    ).collect()[0]
    assert row["count_e"] == 3


def test_transitive_closure_chain_and_dag(spark):
    from db_migration_spark import datalog

    # chain 1→2→3→4 plus a diamond 10→{11,12}→13
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (10, 12), (11, 13), (12, 13)],
        "src LONG, dst LONG",
    )
    got = sorted(
        (r["src"], r["dst"])
        for r in datalog.transitive_closure(edges).collect()
    )
    assert got == sorted(
        [
            (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
            (10, 11), (10, 12), (10, 13), (11, 13), (12, 13),
        ]
    )


def test_pull_scalar_and_ref(store):
    # protein 3 pulls its id and navigates protein/gene → gene entity 1
    out = {
        r["e"]: r["pulled"]
        for r in datalog.pull(
            store,
            ["protein/id", {"protein/gene": ["gene/id", "gene/name"]}],
        ).collect()
    }
    assert out == {
        3: '{"protein/id":["P1"],"protein/gene":'
        '[{"gene/id":["G1"],"gene/name":["aap-1"]}]}'
    }


def test_pull_absent_attr_is_empty_array_and_retracted_invisible(store):
    out = {
        r["e"]: r["pulled"]
        for r in datalog.pull(store, ["gene/id", "gene/missing"]).collect()
    }
    # e=4's gene/id is retracted (op=false) → entity absent entirely
    assert set(out) == {1, 2}
    assert out[1] == '{"gene/id":["G1"],"gene/missing":[]}'


def test_pull_multivalued_sorted_and_escaped(spark):
    rows = [
        (7, "doc/tag", "zeta", True),
        (7, "doc/tag", "alpha", True),
        (7, "doc/note", 'say "hi" \\ there', True),
    ]
    df = spark.createDataFrame(rows, "e LONG, a STRING, v STRING, op BOOLEAN")
    out = datalog.pull(df, ["doc/tag", "doc/note"]).collect()
    assert len(out) == 1
    assert out[0]["pulled"] == (
        '{"doc/tag":["alpha","zeta"],'
        '"doc/note":["say \\"hi\\" \\\\ there"]}'
    )
    # the canonical form must be real JSON
    import json

    doc = json.loads(out[0]["pulled"])
    assert doc["doc/note"] == ['say "hi" \\ there']


def test_pull_depth_two_and_multi_ref(spark):
    rows = [
        (1, "a/name", "root", True),
        (1, "a/child", "10", True),
        (1, "a/child", "11", True),
        (10, "b/name", "left", True),
        (10, "b/leaf", "100", True),
        (11, "b/name", "right", True),
        (100, "c/name", "deep", True),
    ]
    df = spark.createDataFrame(rows, "e LONG, a STRING, v STRING, op BOOLEAN")
    out = datalog.pull(
        df,
        ["a/name", {"a/child": ["b/name", {"b/leaf": ["c/name"]}]}],
    ).collect()
    docs = {r["e"]: r["pulled"] for r in out}
    # top level only includes entities with a/* attrs
    assert set(docs) == {1}
    assert docs[1] == (
        '{"a/name":["root"],"a/child":['
        '{"b/name":["left"],"b/leaf":[{"c/name":["deep"]}]},'
        '{"b/name":["right"],"b/leaf":[]}]}'
    )


def test_pull_reverse_ref(spark):
    """Datomic :ns/_attr reverse navigation: a region pulls the nations
    pointing at it, including a target entity with no forward attrs."""
    rows = [
        (1, "nation/name", "AAA", True),
        (1, "nation/region", "100", True),
        (2, "nation/name", "BBB", True),
        (2, "nation/region", "100", True),
        (3, "nation/name", "CCC", True),
        (3, "nation/region", "200", True),
        (100, "region/name", "R1", True),
        # 200 carries NO region/* attrs — must still appear (it is
        # pointed at), with empty scalar arrays
    ]
    df = spark.createDataFrame(rows, "e LONG, a STRING, v STRING, op BOOLEAN")
    out = {
        r["e"]: r["pulled"]
        for r in datalog.pull(
            df,
            ["region/name", {"nation/_region": ["nation/name"]}],
        ).collect()
    }
    assert set(out) == {100, 200}
    assert out[100] == (
        '{"region/name":["R1"],"nation/_region":['
        '{"nation/name":["AAA"]},{"nation/name":["BBB"]}]}'
    )
    assert out[200] == (
        '{"region/name":[],"nation/_region":[{"nation/name":["CCC"]}]}'
    )


def test_rules_disjunctive_definitions(store):
    # relative(?x ?y) := gene/status live OR gene/status dead — two
    # definitions of one rule act as or-branches
    rules = {
        "flagged": [
            (["?e"], [["?e", "gene/status", "live"]]),
            (["?e"], [["?e", "gene/status", "dead"]]),
        ]
    }
    out = datalog.query(
        store, find=["?e"], where=[("rule", "flagged", ["?e"])], rules=rules
    )
    assert sorted(r["e"] for r in out.collect()) == [1, 2]


def test_rules_multi_clause_body_and_local_vars(store):
    # rule body with a join and a rule-LOCAL variable (?s must not leak
    # or capture the caller's variables)
    rules = {
        "named_with_status": [
            (
                ["?e", "?name"],
                [
                    ["?e", "gene/name", "?name"],
                    ["?e", "gene/status", "?s"],
                    '?s = "live"',
                ],
            )
        ]
    }
    out = datalog.query(
        store,
        find=["?e", "?name"],
        where=[("rule", "named_with_status", ["?e", "?name"])],
        rules=rules,
    )
    assert [(r["e"], r["name"]) for r in out.collect()] == [(1, "aap-1")]


def test_rules_calling_rules_and_recursion_rejected(store):
    rules = {
        "alive": [(["?e"], [["?e", "gene/status", "live"]])],
        "alive_named": [
            (
                ["?e", "?n"],
                [("rule", "alive", ["?e"]), ["?e", "gene/name", "?n"]],
            )
        ],
        "loop": [(["?e"], [("rule", "loop", ["?e"])])],
    }
    out = datalog.query(
        store,
        find=["?n"],
        where=[("rule", "alive_named", ["?e", "?n"])],
        rules=rules,
    )
    assert [r["n"] for r in out.collect()] == ["aap-1"]

    import pytest as _pytest

    with _pytest.raises(ValueError, match="transitive_closure"):
        datalog.query(
            store, find=["?e"], where=[("rule", "loop", ["?e"])], rules=rules
        )
