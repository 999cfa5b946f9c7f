"""Similarity search over embedding columns (SURVEY §2.12).

Two tiers:

* brute-force cosine top-k — the exact baseline.  Queries are broadcast
  (the query set is small by definition); the corpus side is a pure map
  stage + per-query top-k, so the only shuffle carries (query_id, k) rows.
* LSH-bucketed ANN — random-hyperplane signs bucket the corpus; a query
  only scans its bucket (and optionally neighboring probes).  The
  hyperplanes are derived deterministically from seeded xxhash64 so results
  are reproducible without storing a model.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k for each query vector.

    ``queries`` (query_id, query_vec) is broadcast; the cross join is a map
    stage over the corpus (|corpus| × |queries| similarity evaluations, all
    inside codegen); the window keeps k rows per query before anything
    shuffles beyond (query_id, score) pairs.

    Self-matches (same id) are excluded.  Ties broken by neighbor id for
    determinism.  Returns (query_id, neighbor_id, score, rank).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("query_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("corpus_vec")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine("query_vec", "corpus_vec").alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _hyperplane(dim: int, plane_idx: int) -> "F.Column":
    """Deterministic pseudo-random hyperplane: component j of plane i is a
    sign derived from xxhash64(i, j).  No RNG state, reproducible anywhere."""
    return F.array(
        *[
            F.when(
                F.xxhash64(F.lit(plane_idx), F.lit(j)).bitwiseAND(F.lit(1)) == 1,
                F.lit(1.0),
            ).otherwise(F.lit(-1.0))
            for j in range(dim)
        ]
    )


def lsh_bucket(vec_col, dim: int, num_planes: int = 8):
    """Random-hyperplane LSH bucket id (0 .. 2^num_planes-1) as a Column.
    Sign of <v, h_i> contributes bit i."""
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    bits = []
    for i in range(num_planes):
        plane = _hyperplane(dim, i)
        d = F.aggregate(
            F.zip_with(c, plane, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(
            F.when(d >= 0, F.shiftleft(F.lit(1), i)).otherwise(F.lit(0))
        )
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseOR(b)
    return out


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    num_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: only corpus vectors in the query's LSH bucket are
    scored.  At 100 TB the bucket column is a partition key for the corpus
    table, so a query touches 1/2^planes of the data (partition pruning);
    recall is tuned by num_planes (fewer planes → bigger buckets → higher
    recall, more compute)."""
    cb = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("corpus_vec"),
        lsh_bucket(vec_col, dim, num_planes).alias("bucket"),
    )
    qb = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("query_vec"),
        lsh_bucket(vec_col, dim, num_planes).alias("bucket"),
    )
    scored = (
        cb.join(F.broadcast(qb), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine("query_vec", "corpus_vec").alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
