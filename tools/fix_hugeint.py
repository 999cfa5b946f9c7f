"""One-off: wrap HUGEINT-producing oracle expressions in CAST(... AS BIGINT).

For each offending (oracle, column) from tools/oracle_type_audit.py, find every
``<expr> AS <col>`` occurrence in the oracle's runtime SQL (so CTE-level
aliases that feed the output column are cast too), extract ``<expr>`` with a
balanced-paren backward scan, and rewrite it to ``CAST(<expr> AS BIGINT)``
both in the runtime string (for verification) and in the defining source file
(exact-fragment replacement — oracle SQL is stored as plain literals).

Prints every rewrite; verifies with DESCRIBE that the fixed SQL has no
HUGEINT output and that fetchall() results are value-identical to the
original before touching any file.
"""

from __future__ import annotations

import glob
import re
import sys

sys.path.insert(0, "/root/repo")

import duckdb

from db_migration_spark.queries import ORACLES
from tools.oracle_type_audit import audit

SF = "/root/testdata/sf0.01"


def expr_start(sql: str, as_pos: int) -> int:
    """Scan backwards from the char before ' AS col' to the expression start."""
    i = as_pos - 1
    while i >= 0 and sql[i].isspace():
        i -= 1
    depth = 0
    end = i
    while i >= 0:
        ch = sql[i]
        if ch == ")":
            depth += 1
        elif ch == "(":
            if depth == 0:
                i += 1
                break
            depth -= 1
        elif depth == 0 and ch == ",":
            i += 1
            break
        elif depth == 0 and ch.isspace():
            # stop after SELECT / DISTINCT keywords
            head = sql[max(0, i - 8):i].upper()
            if head.endswith("SELECT") or head.endswith("DISTINCT"):
                i += 1
                break
        i -= 1
    if i < 0:
        i = 0
    while i <= end and sql[i].isspace():
        i += 1
    return i


def fix_sql(sql: str, col: str) -> tuple[str, list[tuple[str, str]]]:
    pat = re.compile(r"(?i)\bAS\s+" + re.escape(col) + r"\b")
    out = sql
    frags: list[tuple[str, str]] = []
    # process right-to-left so positions stay valid
    for m in reversed(list(pat.finditer(sql))):
        s = expr_start(sql, m.start())
        expr = sql[s:m.start()].rstrip()
        if re.match(r"(?is)^CAST\s*\(.*AS\s+BIGINT\s*\)$", expr):
            continue
        old_frag = sql[s:m.end()]
        new_frag = f"CAST({expr} AS BIGINT) {sql[m.start():m.end()].strip()}"
        out = out[:s] + new_frag + out[m.end():]
        frags.append((old_frag, new_frag))
    return out, frags


def main() -> int:
    offenders = audit(SF)
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

    files = sorted(glob.glob("/root/repo/db_migration_spark/*.py"))
    src = {f: open(f).read() for f in files}
    all_repl: list[tuple[str, str]] = []
    bad = 0
    for name, cols in sorted(offenders.items()):
        sql = ORACLES[name]
        new_sql = sql
        frags: list[tuple[str, str]] = []
        for col, _typ in cols:
            new_sql, fr = fix_sql(new_sql, col)
            frags.extend(fr)
        # verify: types clean + values identical
        try:
            desc = con.execute(f"DESCRIBE {new_sql}").fetchall()
        except Exception as exc:  # noqa: BLE001
            print(f"BROKEN-REWRITE {name}: {exc}")
            for old, new in frags:
                print(f"    frag: {old!r}\n      -> {new!r}")
            bad += 1
            continue
        hug = [(r[0], r[1]) for r in desc if r[1].upper() in ("HUGEINT", "UHUGEINT")]
        if hug:
            print(f"STILL-HUGEINT {name}: {hug}")
            bad += 1
            continue
        a = con.execute(sql).fetchall()
        b = con.execute(new_sql).fetchall()
        if sorted(map(repr, a)) != sorted(map(repr, b)):
            print(f"VALUE-CHANGE {name} — not applying")
            bad += 1
            continue
        # locate fragments in source
        for old, new in frags:
            hits = [f for f in files if old in src[f]]
            if not hits:
                print(f"NO-SOURCE-MATCH {name}: {old[:80]!r}")
                bad += 1
                continue
            print(f"OK {name}: {old!r}\n    -> {new!r}  in {[h.split('/')[-1] for h in hits]}")
            all_repl.append((old, new))
    if bad:
        print(f"\n{bad} problems — no files written")
        return 1
    for f in files:
        t = src[f]
        for old, new in all_repl:
            t = t.replace(old, new)
        if t != src[f]:
            open(f, "w").write(t)
            print(f"wrote {f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
