"""Shared query-building helpers and oracle CTE fragments used by more
than one queries_* module — a LEAF module (imports only operators), so
family modules can import it without touching the registry's import
cycle."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import load_table
from .operators import eav


_MELT_ATTRS = ["l_quantity", "l_returnflag", "l_linestatus", "l_shipdate"]


def _melt_lineitem_df(li: DataFrame) -> DataFrame:
    prepared = li.select(
        (F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias("__e"),
        F.col("l_quantity").cast("long").cast("string").alias("l_quantity"),
        "l_returnflag",
        "l_linestatus",
        F.col("l_shipdate").cast("date").cast("string").alias("l_shipdate"),
        F.col("l_shipdate").alias("__tx"),
    )
    return eav.melt(prepared, F.col("__e"), _MELT_ATTRS, "__tx")


def _melted_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _melt_lineitem_df(load_table(spark, sf_dir, "lineitem"))


_ORACLE_MELT_BODY = """
SELECT l_orderkey * 8 + l_linenumber AS e, 'l_quantity' AS a,
       CAST(CAST(floor(l_quantity) AS BIGINT) AS VARCHAR) AS v, l_shipdate AS tx, true AS op
FROM lineitem
UNION ALL
SELECT l_orderkey * 8 + l_linenumber, 'l_returnflag', l_returnflag, l_shipdate, true
FROM lineitem
UNION ALL
SELECT l_orderkey * 8 + l_linenumber, 'l_linestatus', l_linestatus, l_shipdate, true
FROM lineitem
UNION ALL
SELECT l_orderkey * 8 + l_linenumber, 'l_shipdate',
       CAST(CAST(l_shipdate AS DATE) AS VARCHAR), l_shipdate, true
FROM lineitem
"""


def _ann_recall_gate(approx: DataFrame, exact: DataFrame, bound: float) -> DataFrame:
    """One deterministic acceptance row for an ANN variant: exact-side
    counts (SQL-recomputable) plus a mean-recall@k boolean.  The
    hashing/seeding inside each variant is deterministic, so the
    boolean is a fixed property of the fixture, not a flaky check."""
    hits = exact.join(
        approx.select("query_id", "neighbor_id"),
        ["query_id", "neighbor_id"],
        "left_semi",
    ).agg(F.count(F.lit(1)).alias("n_hit"))
    base = exact.agg(
        F.countDistinct("query_id").alias("n_queries"),
        F.count(F.lit(1)).alias("n_exact"),
    )
    return base.crossJoin(hits).select(
        "n_queries",
        "n_exact",
        # vacuous pass on an empty exact set (matches the oracle's TRUE)
        F.coalesce(
            F.try_divide(F.col("n_hit"), F.col("n_exact")) >= bound,
            F.lit(True),
        ).alias("recall_ok"),
    )


# exact top-10 head shared by the three ANN acceptance oracles
_ORACLE_ANN_EXACT_HEAD = """
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 8),
c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
scored AS (
  SELECT query_id, neighbor_id,
         list_sum(list_transform(range(1, len(qv) + 1),
                  i -> CAST(qv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE)))
         / (sqrt(list_sum(list_transform(range(1, len(qv) + 1),
                  i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))))
            * sqrt(list_sum(list_transform(range(1, len(cv) + 1),
                  i -> CAST(cv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE))))) AS score
  FROM c CROSS JOIN q
  WHERE neighbor_id <> query_id
), ranked AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
  FROM scored
)
SELECT CAST(count(DISTINCT query_id) AS BIGINT) AS n_queries,
       CAST(count(*) AS BIGINT) AS n_exact,
       TRUE AS recall_ok
FROM ranked WHERE rank <= 10
"""

