"""Graph algorithms over edge-list DataFrames.

Triangle counting (queries_tpch_ext.copurchase_triangles) and connected
components (dedup.connected_components) established the degree-oriented
wedge join and the min-label-propagation loop; this module adds ranking.

Determinism note: classic PageRank accumulates floating-point
contributions whose addition order is partition-dependent — fine for
ranking, fatal for an exact cross-engine oracle.  ``pagerank`` therefore
runs the WHOLE iteration in scaled integer arithmetic (ranks are
fixed-point BIGINTs, per-edge contributions use floor division, damping
is an integer percentage) — the result is bit-identical on any engine
and any partitioning, and the fixed-point error (≤ out-degree per node
per round) is orders of magnitude below ranking resolution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000_000_000  # 1.0 of rank mass, fixed-point


def pagerank(
    edges: DataFrame,
    nodes: DataFrame,
    iterations: int = 5,
    damping_pct: int = 85,
) -> DataFrame:
    """Deterministic fixed-point PageRank.

    ``edges``: (src LONG, dst LONG), duplicates allowed (deduped);
    ``nodes``: (node LONG) — the rank universe (isolated nodes keep the
    teleport mass).  Per iteration::

        r'(v) = (100 − d)% · SCALE  +  d% · Σ_{(u,v)∈E} r(u) div deg(u)

    with every operation on BIGINTs (``div`` = floor).  Dangling nodes
    (no out-edges) leak their mass, as in the simple formulation —
    documented, matching the oracle exactly.

    Plan shape: the edge list joins the (small) out-degree relation ONCE
    up front and is persisted; each iteration is then one hash join
    (ranks ⋈ edges on src) + one hash aggregate (sum per dst) + one left
    join back to the node universe — 3 shuffles per round on (node) keys
    only, no vectors/payloads moving, lineage cut per round with
    localCheckpoint so the plan stays flat at any iteration count.
    At 100 TB-scale graphs the join is the standard power-iteration
    shape; pre-partitioning edges and nodes by the node key makes the
    per-round exchanges co-located.
    """
    e = edges.select(
        F.col("src").cast("long").alias("src"),
        F.col("dst").cast("long").alias("dst"),
    ).distinct()
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("__deg"))
    weighted = (
        e.join(deg, "src")
        .select("src", "dst", "__deg")
        .persist()
    )
    weighted.count()  # materialize once

    n = nodes.select(F.col("node").cast("long").alias("node")).distinct()
    teleport = (100 - damping_pct) * SCALE // 100
    ranks = n.withColumn("rank", F.lit(SCALE).cast("long")).localCheckpoint()
    for _ in range(iterations):
        contribs = (
            ranks.join(weighted, ranks["node"] == weighted["src"])
            .select(
                F.col("dst").alias("node"),
                F.expr("rank div __deg").alias("__c"),
            )
            .groupBy("node")
            .agg(F.sum("__c").alias("__s"))
        )
        ranks = (
            n.join(contribs, "node", "left")
            .select(
                "node",
                (
                    F.lit(teleport)
                    + F.expr(
                        f"({damping_pct} * coalesce(__s, 0L)) div 100"
                    )
                ).cast("long").alias("rank"),
            )
            .localCheckpoint()
        )
    weighted.unpersist()
    return ranks


def bfs_hops(
    edges: DataFrame,
    sources: DataFrame,
    max_hops: int = 4,
) -> DataFrame:
    """Minimum hop distance from a source set, bounded breadth-first.

    ``edges``: (src, dst) directed, deduped internally; ``sources``:
    (node) at distance 0.  Returns (node, hops) for every node reachable
    within ``max_hops`` — min over paths, ties impossible by
    construction (a node enters at its first-discovered level and is
    never revisited).

    One hash join + one anti-join per level, frontier-only expansion
    (the classic distributed BFS: work per level ∝ frontier out-edges,
    never ∝ paths — the reason this terminates where naive path
    enumeration explodes on cyclic graphs).  Lineage cut per level.
    """
    e = edges.select(
        F.col("src").cast("long").alias("src"),
        F.col("dst").cast("long").alias("dst"),
    ).distinct().persist()
    e.count()
    seen = (
        sources.select(F.col("node").cast("long").alias("node"))
        .distinct()
        .withColumn("hops", F.lit(0))
        .localCheckpoint()
    )
    frontier = seen
    for level in range(1, max_hops + 1):
        nxt = (
            frontier.join(e, frontier["node"] == e["src"])
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(seen.select("node"), "node", "left_anti")
            .withColumn("hops", F.lit(level))
            .localCheckpoint()
        )
        if nxt.rdd.isEmpty():
            break
        seen = seen.unionByName(nxt).localCheckpoint()
        frontier = nxt
    e.unpersist()
    return seen
