"""Grid-based geospatial operators — exact integer geometry, Spark-first.

The reference has no geospatial tier; this is north-star surface (the
class of analytics a general engine must offer, same mandate as the
dedup/ANN pillar).  Everything here works on INTEGER coordinates
(micro-degrees / grid units), so every predicate is exact integer
arithmetic and the declared queries sit under the cross-engine oracle
gate — no float trig, no epsilon.

Scale design (the part that matters at 100 TB):

* **Radius joins never go all-pairs.**  ``radius_pairs`` buckets points
  into square cells of side ≥ R; a point's true neighbors can only live
  in the 3×3 cell neighborhood, so the candidate generator is a pure
  EQUI-join on cell id (one side explodes to its 9 neighbor cells —
  9× row inflation of (id, x, y) triples only, never the payload),
  followed by the exact distance² refine.  Plan-guarded: no
  CartesianProduct, no BroadcastNestedLoop.  This is the standard
  published grid-file / fixed-grid spatial-join design.
* **Each true pair is produced exactly once** — the probe side keeps its
  single home cell while the build side explodes, so a (a, b) match
  fires only in b's home cell; no post-join dedup shuffle.
* **Skew valve**: urban-density hot cells are the spatial analog of hot
  join keys; cells are 2-D so one city block never concentrates a whole
  region the way one key can, and AQE skew-join splitting applies to
  the cell-id shuffle like any other equi-join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def cell_of(x: Column | str, y: Column | str, cell: int) -> tuple[Column, Column]:
    """Grid cell coordinates (floor division — inputs are non-negative
    integers by construction of the callers)."""

    def _c(v):
        return F.col(v) if isinstance(v, str) else v

    return (
        (_c(x) / cell).cast("long"),
        (_c(y) / cell).cast("long"),
    )


def _with_cells(pts: DataFrame, cell: int) -> DataFrame:
    cx, cy = cell_of("x", "y", cell)
    return pts.withColumn("cx", cx).withColumn("cy", cy)


def _explode_neighbors(pts: DataFrame) -> DataFrame:
    """Explode each point to its 3×3 neighbor cells — the candidate
    cells its neighbors within one cell-side can occupy."""
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    return (
        pts.withColumn("o", F.explode(offsets))
        .withColumn("ncx", F.col("cx") + F.col("o.dx"))
        .withColumn("ncy", F.col("cy") + F.col("o.dy"))
        .drop("o")
    )


def radius_pairs(pts: DataFrame, radius: int) -> DataFrame:
    """All unordered point pairs with squared Euclidean distance
    ≤ radius² — ``pts`` has columns (id, x, y) with integer coords.

    Cell side = radius, so any pair within radius spans at most one
    cell boundary per axis and the 3×3 explode side meets the home-cell
    side on a plain equi-join.  Returns (id_a, id_b, dist2) with
    id_a < id_b, each true pair exactly once."""
    a = _explode_neighbors(_with_cells(pts, radius)).select(
        F.col("id").alias("id_a"),
        F.col("x").alias("xa"),
        F.col("y").alias("ya"),
        "ncx",
        "ncy",
    )
    b = _with_cells(pts, radius).select(
        F.col("id").alias("id_b"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        "cx",
        "cy",
    )
    dx = F.col("xa") - F.col("xb")
    dy = F.col("ya") - F.col("yb")
    d2 = dx * dx + dy * dy  # stays integer — ** would go through pow/double
    return (
        a.join(
            b,
            on=[
                a.ncx == b.cx,
                a.ncy == b.cy,
                F.col("id_a") < F.col("id_b"),
            ],
        )
        .withColumn("dist2", d2.cast("long"))
        .filter(F.col("dist2") <= radius * radius)
        .select("id_a", "id_b", "dist2")
    )


def nn_within_radius(pts: DataFrame, radius: int) -> DataFrame:
    """Bounded-radius nearest neighbor: for each point, the closest
    OTHER point within ``radius`` (ties broken by smaller neighbor id),
    or no row if none — the production kNN shape (unbounded NN requires
    expanding-ring search; real pipelines always bound the radius).

    Same candidate generator as :func:`radius_pairs` but directional
    (every point probes its 3×3 neighborhood), refined by one
    row_number window over (dist2, neighbor id)."""
    a = _explode_neighbors(_with_cells(pts, radius)).select(
        F.col("id").alias("id"),
        F.col("x").alias("xa"),
        F.col("y").alias("ya"),
        "ncx",
        "ncy",
    )
    b = _with_cells(pts, radius).select(
        F.col("id").alias("nn_id"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        "cx",
        "cy",
    )
    dx = F.col("xa") - F.col("xb")
    dy = F.col("ya") - F.col("yb")
    d2 = dx * dx + dy * dy  # stays integer — ** would go through pow/double
    cand = (
        a.join(
            b,
            on=[
                a.ncx == b.cx,
                a.ncy == b.cy,
                F.col("id") != F.col("nn_id"),
            ],
        )
        .withColumn("dist2", d2.cast("long"))
        .filter(F.col("dist2") <= radius * radius)
    )
    w = Window.partitionBy("id").orderBy("dist2", "nn_id")
    return (
        cand.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("id", "nn_id", "dist2")
    )


def point_in_polygon(
    pts: DataFrame, polygon: list[tuple[int, int]]
) -> DataFrame:
    """Ray-casting point-in-polygon as pure integer expressions: a
    horizontal ray from (x, y) crosses edge (x1,y1)–(x2,y2) iff the
    edge straddles y strictly and the crossing lies strictly right of
    the point; the strict < is made exact by cross-multiplication with
    a sign flip for descending edges (no division, no floats).  Callers
    must keep point y-parities disjoint from vertex y-parities (e.g.
    even point coords, odd vertex coords) so no ray grazes a vertex —
    the standard integer-robustness trick.

    Adds a boolean ``inside`` column (odd crossing count).  The edge
    terms are constant-folded literals summed in one codegen projection
    — no arrays, no explode, no shuffle; the 100 TB plan is a map-only
    scan."""
    return pts.withColumn("inside", _pip_expr(polygon) % 2 == 1)


def _pip_expr(polygon: list[tuple[int, int]]) -> Column:
    """Crossing COUNT for the current row's (x, y) against a literal
    polygon — a sum of per-edge CASE expressions (whole-stage codegen,
    no arrays, no explode)."""
    x, y = F.col("x"), F.col("y")
    total = F.lit(0).cast("long")
    for (x1, y1), (x2, y2) in zip(polygon, polygon[1:] + polygon[:1]):
        if y1 == y2:
            continue  # horizontal edges never satisfy the straddle test
        straddles = (F.lit(y1) > y) != (F.lit(y2) > y)
        lhs = (x - F.lit(x1)) * F.lit(y2 - y1)
        rhs = (y - F.lit(y1)) * F.lit(x2 - x1)
        crossing = lhs < rhs if y2 > y1 else lhs > rhs
        total = total + F.when(straddles & crossing, 1).otherwise(0)
    return total


def path_manhattan(
    pts: DataFrame, part_col: str, *order_cols: str
) -> DataFrame:
    """Per-partition trajectory length in Manhattan metric (exact
    integers): |Δx| + |Δy| between consecutive points ordered by
    ``order_cols`` (pass a tiebreaker for a total order) within each
    ``part_col`` — one lag window, one aggregate; the window and the
    aggregate share the same hash partitioning so there is a single
    exchange."""
    w = Window.partitionBy(part_col).orderBy(*order_cols)
    step = F.abs(F.col("x") - F.lag("x").over(w)) + F.abs(
        F.col("y") - F.lag("y").over(w)
    )
    return (
        pts.withColumn("step", step)
        .groupBy(part_col)
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.sum("step").cast("long").alias("path_len"),
        )
    )
