"""Registry-wide oracle output-type gate.

The driver's value-multiset hash is type-sensitive: DuckDB types an uncast
integer ``sum()`` as HUGEINT (int128) while Spark emits BIGINT, so a
value-identical result still hash-reds (round-3 verdict: chunk_dedup,
sql_recursive_cte, stream_outer_join, plus 45 latent).  This gate binds
(``DESCRIBE`` — no execution) every declared oracle and fails on any
HUGEINT/UHUGEINT output column, so the class of bug cannot re-enter.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from db_migration_spark.queries import ORACLES

BAD = {"HUGEINT", "UHUGEINT"}
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def _connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def test_no_hugeint_oracle_columns() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR_TYPES", "/root/testdata/sf0.01")
    if not os.path.exists(f"{sf_dir}/lineitem.parquet"):
        pytest.skip(f"testdata missing at {sf_dir}")
    con = _connect(sf_dir)
    offenders: dict[str, list[tuple[str, str]]] = {}
    unbindable: list[str] = []
    for name, sql in ORACLES.items():
        try:
            rows = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception:  # noqa: BLE001 — fixture-backed oracle, file absent
            unbindable.append(name)
            continue
        bad = [(r[0], r[1]) for r in rows if r[1].upper() in BAD]
        if bad:
            offenders[name] = bad
    assert not offenders, f"HUGEINT output columns: {offenders}"
    # Fixture-backed oracles bind only after their query generated the file;
    # most fixtures are cached under /tmp, so nearly all should bind.  The
    # floor keeps the gate honest without coupling to test-execution order.
    assert len(unbindable) <= len(ORACLES) // 4, (
        f"too many unbindable oracles — type gate lost coverage: {unbindable}"
    )


def test_no_decimal_oracle_columns() -> None:
    """No DECIMAL at the oracle boundary either (round-4 lesson,
    mv_reuse_rollup): client canonicalizers disagree on decimals —
    DuckDB's pandas path converts every DECIMAL to float64 while Spark
    keeps exact Decimal objects, so a value-identical decimal column can
    still hash-red.  Exact wide integers must cross as BIGINT or as
    canonical decimal STRINGS; fractional exact sums as DOUBLE (see
    tools/check_correctness.py, which enforces the same policy on the
    Spark side per sweep).  Decimal math INSIDE a query is fine — this
    gates output columns only."""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR_TYPES", "/root/testdata/sf0.01")
    if not os.path.exists(f"{sf_dir}/lineitem.parquet"):
        pytest.skip(f"testdata missing at {sf_dir}")
    con = _connect(sf_dir)
    offenders: dict[str, list[tuple[str, str]]] = {}
    for name, sql in ORACLES.items():
        try:
            rows = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception:  # noqa: BLE001 — counted by the HUGEINT gate
            continue
        bad = [
            (r[0], r[1])
            for r in rows
            if r[1].upper().startswith("DECIMAL")
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, f"DECIMAL output columns: {offenders}"
