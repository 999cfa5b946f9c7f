"""Capture ``.explain("formatted")`` for declared queries into text
files — the optimization-round evidence trail (plans/r10/*.txt): the
judge checks plan claims (Exchange counts, join strategies, pushed
filters, scan subsets) against these captures and the code.

Usage:
    python tools/capture_plans.py <outdir> <suffix> <query> [<query>...]

Writes <outdir>/<query>_<suffix>.txt.  Queries that build fixtures do
so on first touch (cached per code version); the capture itself runs
no job beyond what query construction triggers.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")


def explain_formatted(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    outdir, suffix, *names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from db_migration_spark.queries import QUERIES
    from db_migration_spark.session import get_spark

    spark = get_spark("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(outdir, exist_ok=True)
    for n in names:
        df = QUERIES[n](spark, sf_dir)
        path = os.path.join(outdir, f"{n}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(explain_formatted(df))
        print("wrote", path, flush=True)


if __name__ == "__main__":
    main()
