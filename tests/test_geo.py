"""Geospatial operator tests (operators/geo.py): brute-force
equivalence for the grid-join candidate generators (including exact
cell-boundary geometry), known-answer point-in-polygon cases on a
concave polygon, and plan guards — the radius join must never become a
cartesian / nested-loop product."""

from __future__ import annotations

import contextlib
import io
import itertools

from pyspark.sql import functions as F

from db_migration_spark.operators import geo


def _pts(spark, coords):
    return spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(coords)], "id long, x long, y long"
    )


def _brute_pairs(coords, r):
    out = set()
    for (i, (xa, ya)), (j, (xb, yb)) in itertools.combinations(
        enumerate(coords), 2
    ):
        d2 = (xa - xb) ** 2 + (ya - yb) ** 2
        if d2 <= r * r:
            out.add((i, j, d2))
    return out


def test_radius_pairs_matches_brute_force(spark):
    """Deterministic scatter incl. points exactly at distance r, at
    distance r+1, on shared cell corners, and coincident points."""
    coords = [
        (0, 0),
        (10, 0),       # d2=100 == r² at r=10 → included
        (0, 11),       # d2=121 > 100 → excluded from (0,0)
        (10, 10),
        (9, 9),
        (100, 100),
        (109, 100),    # within 10 of (100,100)
        (100, 100),    # coincident duplicate
        (19, 0),       # 9 from (10,0) but 19 from (0,0)
        (25, 25),
    ]
    r = 10
    got = {
        (row.id_a, row.id_b, row.dist2)
        for row in geo.radius_pairs(_pts(spark, coords), r).collect()
    }
    assert got == _brute_pairs(coords, r)


def test_radius_pairs_pseudorandom_brute_force(spark):
    coords = [
        ((k * k + 1) % 97 * 13 % 101, (k * k + k + 7) % 89 * 17 % 103)
        for k in range(120)
    ]
    for r in (5, 12, 30):
        got = {
            (row.id_a, row.id_b, row.dist2)
            for row in geo.radius_pairs(_pts(spark, coords), r).collect()
        }
        assert got == _brute_pairs(coords, r), f"radius {r}"


def test_nn_within_radius_matches_brute_force(spark):
    coords = [
        ((k * 37 + 11) % 211, (k * 53 + 5) % 199) for k in range(80)
    ]
    r = 25
    got = {
        (row.id, row.nn_id, row.dist2)
        for row in geo.nn_within_radius(_pts(spark, coords), r).collect()
    }
    want = {}
    for i, (xa, ya) in enumerate(coords):
        best = None
        for j, (xb, yb) in enumerate(coords):
            if i == j:
                continue
            d2 = (xa - xb) ** 2 + (ya - yb) ** 2
            if d2 <= r * r and (best is None or (d2, j) < best):
                best = (d2, j)
        if best is not None:
            want[i] = best
    assert got == {(i, j, d2) for i, (d2, j) in want.items()}


def test_point_in_polygon_known_answers(spark):
    """Concave chevron: interior, exterior, concave-notch, and
    ray-through-two-edges cases (all point coords even, vertex coords
    odd — the parity contract)."""
    polygon = [(1, 1), (21, 1), (21, 15), (11, 7), (1, 15)]
    cases = [
        ((4, 4), True),    # interior, left lobe
        ((18, 4), True),   # interior, right lobe
        ((11, 12), False), # inside bounding box but in the concave notch
        ((30, 4), False),  # exterior right — ray exits leftward through 0 or 2 edges
        ((0, 4), False),   # exterior left of everything
        ((11, 2), True),   # under the notch apex, inside
        ((2, 14), True),   # high in the left lobe (notch spans 2.25..19.75 at y=14)
        ((4, 14), False),  # already inside the concave notch at this height
        ((11, 20), False), # above everything
    ]
    pts = spark.createDataFrame(
        [(i, x, y) for i, ((x, y), _) in enumerate(cases)],
        "id long, x long, y long",
    )
    got = {
        row.id: row.inside
        for row in geo.point_in_polygon(pts, polygon).collect()
    }
    for i, ((x, y), want) in enumerate(cases):
        assert got[i] == want, f"point {(x, y)} want inside={want}"


def test_point_in_polygon_square_census(spark):
    """Every even point of a grid against an odd-vertex square — the
    crossing parity must match the axis-aligned containment truth."""
    polygon = [(5, 5), (25, 5), (25, 25), (5, 25)]
    pts = spark.createDataFrame(
        [
            (x * 100 + y, x, y)
            for x in range(0, 32, 2)
            for y in range(0, 32, 2)
        ],
        "id long, x long, y long",
    )
    rows = geo.point_in_polygon(pts, polygon).collect()
    for row in rows:
        want = 5 < row.x < 25 and 5 < row.y < 25
        assert row.inside == want, (row.x, row.y)


def test_radius_join_plans_are_equi_joins(spark):
    """The spatial candidate generator must stay a hash/sort-merge
    EQUI-join on cell ids — a cartesian or nested-loop plan here is the
    100 TB failure mode."""
    pts = _pts(spark, [(k % 50, k // 50) for k in range(100)])
    for df in (
        geo.radius_pairs(pts, 7),
        geo.nn_within_radius(pts, 7),
    ):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


def test_polygon_plan_is_map_only(spark):
    pts = _pts(spark, [(2, 2), (4, 4)])
    flagged = geo.point_in_polygon(pts, [(1, 1), (9, 1), (9, 9), (1, 9)])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        flagged.explain("formatted")
    plan = buf.getvalue()
    assert "Exchange" not in plan  # constant-folded projection, no shuffle
    assert "Join" not in plan
