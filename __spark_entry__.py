"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship QA count-reconciliation report (SURVEY
§2.9 X6 — the reference's own success criterion, runcommand.py:188-203) on
sf0.001.  ``queries()``/``oracle_sql()`` expose the declared operator
inventory from db_migration_spark.queries.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from db_migration_spark.queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["x6_qa_report"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (same column aliases).

    Keys absent here (dedup_minhash, dedup_simhash, ann_lsh_topk) are
    genuinely non-SQL-expressible (seeded xxhash64 signatures / hyperplanes);
    the driver records the weaker rows-only check for them, and tests/ assert
    their quality against exact counterparts.
    """
    return dict(ORACLES)
