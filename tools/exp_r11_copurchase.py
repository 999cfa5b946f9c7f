"""Round-11 experiment (r10 VERDICT task 4): copurchase_triangles —
can grouped-array pair generation beat the self-join shape?

Variants, all producing the IDENTICAL (n_edges, n_triangles) row
(asserted against the declared query before any timing is trusted):

* base — the declared q_copurchase_triangles (per-order self-join edge
  gen; wedge self-join on src with an inequality post-filter).
* A    — edge generation via sorted per-order basket arrays + HOF pair
  explode (one shuffle of lineitem instead of two; pairs emitted
  exactly once instead of k² filtered to k(k-1)/2).
* B    — A plus WEDGE generation via sorted per-src adjacency arrays +
  HOF pair explode (removes the oriented⋈oriented self-join: one
  groupBy shuffle of `oriented`, map-side pair explode emits exactly
  the ordered wedges the join's post-filter kept).

Timing: noop sink, warm-up + min-of-3, per-variant (guide §1.4);
also phase-timed.  Run on a QUIET box.  Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from db_migration_spark.catalog import load_table
from db_migration_spark.queries_tpch_ext import q_copurchase_triangles
from db_migration_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _pair_explode(df, arr_col, out_a, out_b):
    """All ordered pairs (x_i, x_j), i < j, of a sorted array column —
    emitted exactly once, map-side."""
    pairs = F.flatten(
        F.transform(
            F.col(arr_col),
            lambda x, i: F.transform(
                F.slice(
                    F.col(arr_col), i + 2, F.size(F.col(arr_col))
                ),
                lambda y: F.struct(x.alias(out_a), y.alias(out_b)),
            ),
        )
    )
    return df.select(F.explode(pairs).alias("p")).select(
        f"p.{out_a}", f"p.{out_b}"
    )


def _edges_grouped(li):
    baskets = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("ps")
    )
    return _pair_explode(baskets, "ps", "lo", "hi").distinct()


def _edges_selfjoin(li):
    a, b = li.alias("x"), li.alias("y")
    return (
        a.join(
            b.hint("shuffle_hash"),
            (F.col("x.l_orderkey") == F.col("y.l_orderkey"))
            & (F.col("x.l_partkey") < F.col("y.l_partkey")),
        )
        .select(
            F.col("x.l_partkey").alias("lo"),
            F.col("y.l_partkey").alias("hi"),
        )
        .distinct()
    )


def _orient(und):
    deg = (
        und.select(F.explode(F.array("lo", "hi")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    e = und.join(
        deg.select(F.col("node").alias("lo"), F.col("d").alias("d_lo")),
        "lo",
    ).join(
        deg.select(F.col("node").alias("hi"), F.col("d").alias("d_hi")),
        "hi",
    )
    lo_first = F.struct(F.col("d_lo"), F.col("lo")) < F.struct(
        F.col("d_hi"), F.col("hi")
    )
    return e.select(
        F.when(lo_first, F.col("lo")).otherwise(F.col("hi")).alias("src"),
        F.when(lo_first, F.col("hi")).otherwise(F.col("lo")).alias("dst"),
        F.when(lo_first, F.col("d_hi")).otherwise(F.col("d_lo")).alias(
            "dst_d"
        ),
    ).localCheckpoint(eager=False)


def _close_selfjoin(oriented):
    o1, o2, o3 = oriented.alias("o1"), oriented.alias("o2"), oriented.alias("o3")
    wedges = o1.join(
        o2,
        (F.col("o1.src") == F.col("o2.src"))
        & (
            F.struct(F.col("o1.dst_d"), F.col("o1.dst"))
            < F.struct(F.col("o2.dst_d"), F.col("o2.dst"))
        ),
    ).select(F.col("o1.dst").alias("wa"), F.col("o2.dst").alias("wb"))
    return wedges.join(
        o3,
        (F.col("wa") == F.col("o3.src")) & (F.col("wb") == F.col("o3.dst")),
        "left_semi",
    )


def _close_grouped(oriented):
    adj = oriented.groupBy("src").agg(
        F.array_sort(
            F.collect_list(F.struct("dst_d", "dst"))
        ).alias("ns")
    )
    wedges = _pair_explode(adj, "ns", "a", "b").select(
        F.col("a.dst").alias("wa"), F.col("b.dst").alias("wb")
    )
    return wedges.join(
        oriented.alias("o3"),
        (F.col("wa") == F.col("o3.src")) & (F.col("wb") == F.col("o3.dst")),
        "left_semi",
    )


def _variant(spark, edges_fn, close_fn):
    li = (
        load_table(spark, SF_DIR, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    und = edges_fn(li)
    oriented = _orient(und)
    tri = close_fn(oriented)
    return oriented.agg(F.count(F.lit(1)).alias("n_edges")).crossJoin(
        tri.agg(F.count(F.lit(1)).alias("n_triangles"))
    )


def _time(df_fn, runs=4):
    walls = []
    for _ in range(runs):
        t0 = time.time()
        df_fn().write.format("noop").mode("overwrite").save()
        walls.append(round(time.time() - t0, 3))
    return {"min3": min(walls[1:]), "runs": walls}


def main():
    spark = get_spark("exp-r11-copurchase")
    spark.sparkContext.setLogLevel("ERROR")
    base_row = q_copurchase_triangles(spark, SF_DIR).collect()
    a_row = _variant(spark, _edges_grouped, _close_selfjoin).collect()
    b_row = _variant(spark, _edges_grouped, _close_grouped).collect()
    assert [tuple(r) for r in a_row] == [tuple(r) for r in base_row], (
        a_row, base_row)
    assert [tuple(r) for r in b_row] == [tuple(r) for r in base_row], (
        b_row, base_row)
    out = {
        "exp": "copurchase_variants",
        "sf_dir": SF_DIR,
        "row": [tuple(r) for r in base_row][0],
        "base": _time(lambda: q_copurchase_triangles(spark, SF_DIR)),
        "A_grouped_edges": _time(
            lambda: _variant(spark, _edges_grouped, _close_selfjoin)
        ),
        "B_grouped_edges_and_wedges": _time(
            lambda: _variant(spark, _edges_grouped, _close_grouped)
        ),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
