"""Registry-wide DuckDB oracle output-type audit.

The driver's value-multiset hash is type-sensitive: DuckDB types an uncast
integer ``sum()`` as HUGEINT (int128) while Spark returns BIGINT, so
identical values hash differently and the query goes red even though every
value matches.  This tool binds (``DESCRIBE`` — no execution) every oracle
in the registry against the sf0.01 views + cached fixtures and reports any
output column whose DuckDB type is HUGEINT/UHUGEINT.

Usage: python tools/oracle_type_audit.py [sf_dir]
Exit 0 = clean registry; 1 = offending oracles listed on stdout.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import duckdb

from db_migration_spark.queries import ORACLES

BAD = {"HUGEINT", "UHUGEINT"}


def audit(sf_dir: str = "/root/testdata/sf0.01") -> dict[str, list[tuple[str, str]]]:
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    offenders: dict[str, list[tuple[str, str]]] = {}
    errors: dict[str, str] = {}
    for name, sql in ORACLES.items():
        try:
            rows = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as exc:  # noqa: BLE001 — fixture not generated yet
            errors[name] = str(exc)[:160]
            continue
        bad = [(r[0], r[1]) for r in rows if r[1].upper() in BAD]
        if bad:
            offenders[name] = bad
    for name, msg in errors.items():
        print(f"SKIP {name}: {msg}")
    return offenders


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    offenders = audit(sf_dir)
    for name, cols in sorted(offenders.items()):
        print(f"HUGEINT {name}: {cols}")
    print(f"\n{len(offenders)} offending oracles / {len(ORACLES)} total")
    return 1 if offenders else 0


if __name__ == "__main__":
    raise SystemExit(main())
