"""Round-11 experiment (r10 VERDICT task 5): dedup_embedding_cosine —
can angular center blocking cut the LSH candidate set at threshold 0.4?

Principle (public: triangle inequality on the sphere): for any anchor
c, angle(a,b) >= |angle(a,c) - angle(b,c)|, so a pair can reach
cosine(a,b) >= t only if |ang_a - ang_b| <= arccos(t).  Carrying one
extra float per row through the band join would let the join condition
drop candidates BEFORE the distinct shuffle — IF the bound bites.

This script measures whether it does on this corpus: per-anchor angle
spread of the actual LSH candidate pairs vs the arccos(0.4) budget,
for 1 and 4 anchors (max over anchors).  Expectation from
concentration of measure: random unit vectors in d=64 have angles to
ANY fixed anchor concentrated in ~90° ± arcsin(1/sqrt(d)) ≈ ±7°, so
|ang_a - ang_b| ~ ±10° while the budget is 66.4° — the bound should
prune ≈ nothing, and the item retires with this evidence.

Prints one JSON line.
"""

from __future__ import annotations

import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from db_migration_spark.catalog import load_table
from db_migration_spark.operators.similarity import lsh_bucket
from db_migration_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
THRESHOLD = 0.4
DIM = 64


def main():
    spark = get_spark("exp-r11-cosblock")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", "embedding"
    )
    # the auto-chosen blocked-plan parameters at threshold 0.4
    p = 1.0 - math.acos(THRESHOLD) / math.pi
    planes = max(1, int(math.log(0.35) / math.log(p)))
    per_table = p**planes
    tables = max(1, math.ceil(math.log(1e-5) / math.log(1.0 - per_table)))

    # anchors: 4 deterministic corpus vectors (hash-min ids)
    anchors = [
        r.embedding
        for r in emb.orderBy(F.xxhash64(F.col("vec_id").cast("string")))
        .limit(4)
        .collect()
    ]

    def ang_cols(vec_col):
        outs = []
        for ai, a in enumerate(anchors):
            dot = sum(
                F.element_at(F.col(vec_col), i + 1) * float(a[i])
                for i in range(DIM)
            )
            na = math.sqrt(sum(float(x) * x for x in a))
            nb = F.sqrt(
                sum(
                    F.element_at(F.col(vec_col), i + 1)
                    * F.element_at(F.col(vec_col), i + 1)
                    for i in range(DIM)
                )
            )
            outs.append(
                F.acos(F.greatest(F.lit(-1.0), F.least(F.lit(1.0),
                       dot / (nb * float(na))))).alias(f"ang{ai}")
            )
        return outs

    tb = F.array(
        *[
            F.struct(
                F.lit(t).alias("table"),
                lsh_bucket("embedding", DIM, planes, t).alias("bucket"),
            )
            for t in range(tables)
        ]
    )
    bucketed = emb.select(
        F.col("vec_id").alias("id"),
        F.explode(tb).alias("tbx"),
        *ang_cols("embedding"),
    ).select("id", "tbx.table", "tbx.bucket", *[f"ang{i}" for i in range(4)])
    a, b = bucketed.alias("a"), bucketed.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.table") == F.col("b.table"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            *[
                F.abs(F.col(f"a.ang{i}") - F.col(f"b.ang{i}")).alias(
                    f"d{i}"
                )
                for i in range(4)
            ],
        )
        .distinct()
    )
    budget = math.acos(THRESHOLD)
    agg = cand.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.avg("d0").alias("mean_d1"),
        F.max("d0").alias("max_d1"),
        F.sum((F.col("d0") > budget).cast("long")).alias("pruned_1anchor"),
        F.sum(
            (
                F.greatest(*[F.col(f"d{i}") for i in range(4)]) > budget
            ).cast("long")
        ).alias("pruned_4anchors"),
    ).collect()[0]
    out = {
        "exp": "cosine_center_blocking",
        "sf_dir": SF_DIR,
        "threshold": THRESHOLD,
        "planes": planes,
        "tables": tables,
        "angle_budget_rad": round(budget, 4),
        "candidate_pairs": agg["n_pairs"],
        "mean_anchor_angle_gap_rad": round(agg["mean_d1"], 4),
        "max_anchor_angle_gap_rad": round(agg["max_d1"], 4),
        "prunable_pairs_1_anchor": agg["pruned_1anchor"],
        "prunable_pairs_4_anchors": agg["pruned_4anchors"],
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
