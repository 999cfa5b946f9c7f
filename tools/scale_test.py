"""Scale stress test: replicate the sf0.1 tables ×N (with key remapping so
join/group cardinalities grow realistically), write them as properly
multi-file parquet, and run the headline queries against the result.

This answers the question the small-SF bench can't: do the plans survive a
10×/100× scale-up, or does some operator go quadratic / single-task?

Usage: python tools/scale_test.py [N] [query ...]   (default N=10)
Writes /root/repo/.tmp/sfx{N}/ and prints one JSON line like bench.py.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from db_migration_spark.catalog import load_table
from db_migration_spark.queries import QUERIES
from db_migration_spark.session import get_spark

BASE_SF = "/root/testdata/sf0.1"

# key column to offset per table so replicas don't collide
KEYED = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "nation": [],
    "region": [],
}

OFFSETS = {
    "l_orderkey": 1_000_000,
    "o_orderkey": 1_000_000,
    "o_custkey": 1_000_000,
    "c_custkey": 1_000_000,
    "p_partkey": 1_000_000,
    "s_suppkey": 1_000_000,
    "event_id": 10_000_000,
    "user_id": 1_000_000,
    "doc_id": 10_000_000,
    "vec_id": 10_000_000,
}

DEFAULT_QUERIES = [
    "x6_qa_report",
    "q1_pricing_summary",
    "q3_top_revenue",
    "x1_eav_melt",
    "x4_apply_patches",
    "w1_last_write_wins",
    "events_hourly_rollup",
    "dedup_exact",
    "dedup_minhash",
    "ann_cosine_topk",
    "text_stats",
]


def build(spark, n: int, out_dir: str) -> None:
    reps = spark.range(n).select(F.col("id").alias("__rep"))
    for table, keys in KEYED.items():
        src = load_table(spark, BASE_SF, table)
        if not keys:  # pure dims replicate as-is (they join by key range)
            src.write.mode("overwrite").parquet(f"{out_dir}/{table}.parquet")
            continue
        df = src.crossJoin(F.broadcast(reps))
        for k in keys:
            df = df.withColumn(k, F.col(k) + F.col("__rep") * OFFSETS[k])
        # documents: perturb replicated text so dedup stays honest
        if table == "documents":
            df = df.withColumn(
                "text",
                F.when(F.col("__rep") == 0, F.col("text")).otherwise(
                    F.concat(
                        F.format_string("rep%d ", F.col("__rep")), F.col("text")
                    )
                ),
            )
        (
            df.drop("__rep")
            .repartition(32)
            .write.mode("overwrite")
            .parquet(f"{out_dir}/{table}.parquet")
        )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    names = sys.argv[2:] or DEFAULT_QUERIES
    out_dir = f"/root/repo/.tmp/sfx{n}"
    spark = get_spark("scale-test")
    spark.sparkContext.setLogLevel("ERROR")

    if not os.path.exists(f"{out_dir}/_BUILT"):
        shutil.rmtree(out_dir, ignore_errors=True)
        t0 = time.time()
        build(spark, n, out_dir)
        open(f"{out_dir}/_BUILT", "w").write("ok")
        print(f"built x{n} dataset in {time.time()-t0:.1f}s", file=sys.stderr)

    timings = {}
    for name in names:
        t0 = time.time()
        QUERIES[name](spark, out_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)
    print(
        json.dumps(
            {
                "metric": f"headline subset at {n}x sf0.1",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": 0.1 * n,
            }
        )
    )


if __name__ == "__main__":
    main()
