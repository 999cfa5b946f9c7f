"""ANN quality tracking: recall@10 of the LSH and IVF tiers vs the exact
brute-force baseline, swept over their pruning knobs.

Prints a markdown table (pasted into STATUS.md each round so ANN quality
is tracked across rounds, not thresholded once).

Usage: python tools/recall_report.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from db_migration_spark.catalog import load_table
from db_migration_spark.operators import similarity
from db_migration_spark.session import get_spark

K = 10
N_QUERIES = 32


def _topk_sets(df) -> dict[int, set[int]]:
    out: dict[int, set[int]] = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def recall(approx, exact) -> float:
    hits = sum(
        len(approx.get(q, set()) & nbrs) for q, nbrs in exact.items()
    )
    total = sum(len(nbrs) for nbrs in exact.values())
    return hits / total if total else 0.0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("recall-report")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    exact = _topk_sets(
        similarity.brute_force_topk(emb, queries, k=K)
    )
    print(f"ANN recall@{K} vs brute force — {sf_dir}, {N_QUERIES} queries\n")
    print("| tier | knob | recall@10 |")
    print("|---|---|---|")
    for num_tables in (2, 4, 8):
        approx = _topk_sets(
            similarity.lsh_topk(
                emb, queries, dim=64, k=K, num_planes=6,
                num_tables=num_tables,
            )
        )
        print(
            f"| LSH (P=6) | L={num_tables} | {recall(approx, exact):.3f} |"
        )
    for n_probe in (2, 4, 6, 8):
        approx = _topk_sets(
            similarity.ivf_topk(
                emb, queries, k=K, n_lists=16, n_probe=n_probe
            )
        )
        print(
            f"| IVF (16 lists) | probe={n_probe} | "
            f"{recall(approx, exact):.3f} |"
        )


if __name__ == "__main__":
    main()
