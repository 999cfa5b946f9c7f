"""Driver-certification coverage ledger (round-8 verdict task 8).

Reads every CORRECTNESS_r*.json driver artifact plus the live registry
and prints per-family certified/total counts and the never-certified
backlog, so window-rotation priorities stop depending on judge
archaeology.  Run at round close; paste the summary into STATUS.md.

Usage: python tools/cert_ledger.py [--json]
"""

from __future__ import annotations

import glob
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def family(name: str) -> str:
    head = name.split("_")[0]
    # collapse the one-letter/one-digit legacy prefixes into one bucket
    if len(head) <= 3 and any(c.isdigit() for c in head):
        return "core_" + head[0]
    return head


def main() -> None:
    from db_migration_spark.queries import QUERIES

    certified: set[str] = set()
    no_hash: set[str] = set()  # rows/schema matched, hash not verified
    rounds = sorted(glob.glob("CORRECTNESS_r*.json"))
    for f in rounds:
        d = json.load(open(f))
        for k, v in d.items():
            if not (
                isinstance(v, dict)
                and v.get("rows_match")
                and v.get("schema_match")
            ):
                continue
            # r9 ADVICE #4: hash_match=None is NOT full certification —
            # count it separately so rotation priorities are not
            # overstated by rows/schema-only results
            if v.get("hash_match") is True:
                certified.add(k)
            else:
                no_hash.add(k)
    no_hash -= certified
    allq = list(QUERIES)
    never = [q for q in allq if q not in certified]
    fam_tot: dict[str, int] = defaultdict(int)
    fam_cert: dict[str, int] = defaultdict(int)
    for q in allq:
        fam_tot[family(q)] += 1
        if q in certified:
            fam_cert[family(q)] += 1
    out = {
        "registry": len(allq),
        "cumulative_certified": len([q for q in allq if q in certified]),
        "certified_no_hash": len(
            [q for q in allq if q in no_hash]
        ),
        "never_certified": len(never),
        "families": {
            f: {"certified": fam_cert[f], "total": fam_tot[f]}
            for f in sorted(fam_tot)
        },
        "never_list": never,
    }
    if "--json" in sys.argv:
        print(json.dumps(out))
        return
    print(
        f"registry {out['registry']} | cumulative driver-certified "
        f"{out['cumulative_certified']} | never-certified "
        f"{out['never_certified']}"
    )
    gaps = sorted(
        (f for f in fam_tot if fam_cert[f] < fam_tot[f]),
        key=lambda f: fam_cert[f] / fam_tot[f],
    )
    line = ", ".join(
        f"{f} {fam_cert[f]}/{fam_tot[f]}" for f in gaps
    )
    print("families with gaps:", line)


if __name__ == "__main__":
    main()
