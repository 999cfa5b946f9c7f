"""asof_join_nearest (operators/relational.py): brute-force equivalence
across all three directions and tolerances (boundary-exact: matches at
exactly the tolerance, equidistant ties, equal timestamps on both
sides, unmatched left rows), plus the single-shuffle plan pin."""

from __future__ import annotations

import contextlib
import io
import datetime

from pyspark.sql import functions as F

from db_migration_spark.operators.relational import asof_join_nearest


def _ts(s):
    return datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=s)


def _frames(spark):
    # left: (key, ts, lval); right: (key, ts, rval) — right unique per
    # (key, ts).  Includes: equal-ts match, exact-tolerance edges,
    # equidistant tie, key with no right rows.
    left = spark.createDataFrame(
        [
            ("a", _ts(100), 1),
            ("a", _ts(200), 2),   # equidistant between 150 and 250
            ("a", _ts(150), 3),   # equal-ts right exists
            ("a", _ts(395), 4),   # 145 back to 250, 105 fwd to 500
            ("b", _ts(50), 5),    # before every right row
            ("b", _ts(1000), 6),  # far after every right row
            ("c", _ts(10), 7),    # no right rows at all
        ],
        "key string, ts timestamp, lval long",
    )
    right = spark.createDataFrame(
        [
            ("a", _ts(150), 10),
            ("a", _ts(250), 11),
            ("a", _ts(500), 12),
            ("b", _ts(100), 20),
            ("b", _ts(900), 21),
        ],
        "key string, ts timestamp, rval long",
    )
    return left, right


def _brute(left_rows, right_rows, direction, tol):
    out = {}
    for (k, lts, lval) in left_rows:
        cands = []
        for (rk, rts, rval) in right_rows:
            if rk != k:
                continue
            dt = (lts - rts).total_seconds()
            if direction == "backward" and dt < 0:
                continue
            if direction == "forward" and dt > 0:
                continue
            if tol is not None and abs(dt) > tol:
                continue
            cands.append((abs(dt), 0 if dt >= 0 else 1, rts, rval))
        # nearest tie rule: smaller |dt| wins; tie → backward (dt>=0)
        best = min(cands) if cands else None
        out[(k, lts, lval)] = (best[2], best[3]) if best else (None, None)
    return out


def test_asof_nearest_all_directions_match_brute_force(spark):
    left, right = _frames(spark)
    left_rows = [(r.key, r.ts, r.lval) for r in left.collect()]
    right_rows = [(r.key, r.ts, r.rval) for r in right.collect()]
    for direction in ("backward", "forward", "nearest"):
        for tol in (None, 145, 144, 60, 0):
            got = {
                (r.key, r.ts, r.lval): (r.matched_ts, r.rval)
                for r in asof_join_nearest(
                    left,
                    right,
                    on=["key"],
                    left_ts="ts",
                    right_ts="ts",
                    right_cols=["rval"],
                    direction=direction,
                    tolerance_seconds=tol,
                ).collect()
            }
            want = _brute(left_rows, right_rows, direction, tol)
            assert got == want, f"{direction} tol={tol}"


def test_asof_nearest_single_exchange(spark):
    left, right = _frames(spark)
    out = asof_join_nearest(
        left, right, ["key"], "ts", "ts", ["rval"], direction="nearest"
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    # ONE exchange feeds both window passes; no join operator at all
    import re

    n_exchanges = len(re.findall(r"^\(\d+\) Exchange", plan, re.MULTILINE))
    assert n_exchanges == 1, plan
    assert "Join" not in plan
