"""Cross-engine NULL-path gates: run the REAL oracle SQL strings on
synthetic data that contains the NULLs the fixtures lack, against the
REAL Spark queries over the same parquet — the dormant-divergence
class the round-7 review fixes (NULL bins, null-safe QI joins) stays
permanently exercised."""

from __future__ import annotations

import duckdb


def _rows(res):
    return sorted(tuple(r) for r in res)


def test_psi_null_bins_cross_engine(spark, tmp_path):
    from db_migration_spark.queries_stats import (
        ORACLE_PSI,
        q_stats_psi_drift,
    )

    rows = [
        (1, "en", 100, "a b"),
        (2, None, 300, "c d"),
        (3, "fr", None, "e f"),
        (4, None, None, "g h"),
        (5, "en", 900, "i j"),
        (6, "fr", 900, "k l"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, lang string, n_chars long, text string"
    )
    path = str(tmp_path)
    df.write.parquet(path + "/documents.parquet")
    got = _rows(
        (r.feature, r.bin, r.ref_n, r.cur_n, r.term_nano)
        for r in q_stats_psi_drift(spark, path).collect()
    )
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"parquet_scan('{path}/documents.parquet/*.parquet')"
    )
    exp = _rows(con.sql(ORACLE_PSI).fetchall())
    assert got == exp
    # the NULL bins exist and carry counts on both sides
    assert any(b == "(null)" for (_, b, *_rest) in got)


def test_t_closeness_null_qi_cross_engine(spark, tmp_path):
    from db_migration_spark.queries_governance import (
        ORACLE_T_CLOSENESS,
        q_privacy_t_closeness,
    )

    rows = [
        # (custkey, mktsegment, nationkey, acctbal) with NULL QI values
        (1, "AUTO", None, 100.0),
        (2, "AUTO", None, 120.0),
        (3, "BLDG", None, 130.0),
        (4, "AUTO", 7, 900.0),
        (5, "BLDG", 7, 910.0),
        (6, "AUTO", 7, None),
        (7, "BLDG", 7, None),
        (8, "MACH", 9, 100.0),
    ]
    df = spark.createDataFrame(
        rows,
        "c_custkey long, c_mktsegment string, c_nationkey long, "
        "c_acctbal double",
    )
    path = str(tmp_path)
    df.write.parquet(path + "/customer.parquet")
    got = _rows(
        (r.meets_t, r.meets_k, r.n_qi_groups, r.n_rows_covered,
         r.d_num_total)
        for r in q_privacy_t_closeness(spark, path).collect()
    )
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW customer AS SELECT * FROM "
        f"parquet_scan('{path}/customer.parquet/*.parquet')"
    )
    exp = _rows(con.sql(ORACLE_T_CLOSENESS).fetchall())
    assert got == exp
