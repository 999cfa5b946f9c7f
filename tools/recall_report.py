"""ANN quality tracking: recall@10 of the LSH and IVF tiers vs the exact
brute-force baseline, swept over their pruning knobs.

Two corpora:

* the driver's synthetic ``embeddings`` table — near-orthogonal uniform
  vectors, the adversarial worst case for sign-LSH (no planted
  neighborhood structure, every top-10 list sits near the cosine noise
  floor);
* ``--clustered`` — planted Gaussian clusters (centers ~ N(0, I),
  points = center + spread·noise), the geometry real embedding corpora
  have, on which defaults are tuned.

Prints markdown tables (pasted into STATUS.md each round so ANN quality
is tracked across rounds, not thresholded once).

Usage: python tools/recall_report.py [sf_dir|--clustered]
"""

from __future__ import annotations

import math
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


def clustered_fixture(spark, n=4000, dim=64, n_clusters=40, spread=0.35):
    """Planted-Gaussian-cluster corpus: deterministic (seeded), centers on
    the unit sphere, points = normalize(center + noise) where the noise
    NORM is ``spread`` relative to the unit center (per-component sigma
    spread/√dim — at dim 64 an unscaled per-component sigma would make
    the noise dominate and dissolve the clusters).  With spread 0.35 the
    within-cluster cosine is ≈ 1/(1+spread²) ≈ 0.89 and between-cluster
    ≈ 0 — the geometry a real embedding model produces for
    near-duplicate/same-topic content."""
    import numpy as np

    rng = np.random.RandomState(42)
    centers = rng.randn(n_clusters, dim)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    assign = rng.randint(0, n_clusters, size=n)
    pts = centers[assign] + (spread / math.sqrt(dim)) * rng.randn(n, dim)
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    rows = [
        (i, [float(x) for x in pts[i]], int(assign[i])) for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "vec_id LONG, embedding ARRAY<FLOAT>, label INT"
    )


def sweep(spark, emb, title: str) -> None:
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    exact = _topk_sets(similarity.brute_force_topk(emb, queries, k=K))
    print(f"ANN recall@{K} vs brute force — {title}, {N_QUERIES} queries\n")
    print("| tier | knob | recall@10 |")
    print("|---|---|---|")
    for num_planes in (4, 6, 8):
        for num_tables in (2, 4, 8):
            approx = _topk_sets(
                similarity.lsh_topk(
                    emb, queries, dim=64, k=K, num_planes=num_planes,
                    num_tables=num_tables,
                )
            )
            print(
                f"| LSH (P={num_planes}) | L={num_tables} | "
                f"{recall(approx, exact):.3f} |"
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
    for rerank in (0, 25, 50, 100):
        approx = _topk_sets(
            similarity.pq_topk(
                emb, queries, k=K, n_sub=8, n_codes=16, rerank=rerank
            )
        )
        print(
            f"| PQ (8×16 codes) | rerank={rerank} | "
            f"{recall(approx, exact):.3f} |"
        )


def main() -> None:
    arg = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("recall-report")
    spark.sparkContext.setLogLevel("ERROR")
    if arg == "--clustered":
        emb = clustered_fixture(spark)
        sweep(spark, emb, "clustered fixture (40 Gaussian clusters)")
    else:
        emb = load_table(spark, arg, "embeddings")
        sweep(spark, emb, arg)


if __name__ == "__main__":
    main()
