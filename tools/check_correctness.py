"""Local stand-in for the driver's t2 correctness gate.

Runs every declared query on Spark and its oracle on DuckDB at a given
sf dir, compares row count, column names, and an order-insensitive value
multiset (with exact equality — no tolerance — since the declared queries
are engineered for bit-identical results).

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb

from db_migration_spark.queries import ORACLES, QUERIES
from db_migration_spark.session import get_spark


def normalize(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(normalize(x) for x in v)
    return v


def row_key(row, col_order):
    # stringify with a type tag so NULLs and mixed types sort totally
    # (the driver hashes the multiset; sorting is just our local stand-in)
    def k(v):
        n = normalize(v)
        return "\x00None" if n is None else f"{type(n).__name__}:{n}"

    return tuple(k(row[i]) for i in col_order)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("correctness-check")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    failures = []
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = sdf.collect()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: spark error: {exc}")
            continue
        if name not in ORACLES:
            print(f"pass {name}: rows-only ({len(srows)} rows, "
                  f"{time.time()-t0:.1f}s)")
            if len(srows) == 0:
                print(f"  WARNING: {name} returned 0 rows")
            continue
        try:
            ddf = con.execute(ORACLES[name])
            dcols = [d[0] for d in ddf.description]
            drows = ddf.fetchall()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {exc}")
            continue
        if sorted(scols) != sorted(dcols):
            failures.append(name)
            print(f"FAIL {name}: columns spark={scols} duck={dcols}")
            continue
        if len(srows) != len(drows):
            failures.append(name)
            print(f"FAIL {name}: rowcount spark={len(srows)} duck={len(drows)}")
            continue
        s_order = [scols.index(c) for c in sorted(scols)]
        d_order = [dcols.index(c) for c in sorted(dcols)]
        s_set = sorted(row_key(tuple(r), s_order) for r in srows)
        d_set = sorted(row_key(r, d_order) for r in drows)
        if s_set != d_set:
            failures.append(name)
            ndiff = sum(1 for a, b in zip(s_set, d_set) if a != b)
            print(f"FAIL {name}: value mismatch ({ndiff}/{len(s_set)} rows)")
            for a, b in list(zip(s_set, d_set))[:200]:
                if a != b:
                    print(f"  spark: {a}\n  duck : {b}")
                    break
        else:
            print(
                f"PASS {name} ({len(srows)} rows, {time.time()-t0:.1f}s)"
            )
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
