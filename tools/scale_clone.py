"""SHALLOW CLONE scale measurement for SCALE.md.

Clone cost must be O(metadata) — flat in DATA volume, linear only in
the group count (one commit-0 JSON) — and reading through a clone's
foreign references must cost the same as reading the source directly.

Usage: python tools/scale_clone.py [rows]   (default 10_000_000)
Prints one JSON line; paste the numbers into SCALE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from db_migration_spark.plans.txlog import TxTable
from db_migration_spark.session import get_spark


def timed(fn):
    t0 = time.time()
    r = fn()
    return round(time.time() - t0, 3), r


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    work = "/root/repo/.tmp/clone_scale"
    shutil.rmtree(work, ignore_errors=True)
    spark = get_spark("scale-clone")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"rows": rows}

    df = spark.range(rows).select(
        F.col("id"),
        (F.col("id") % 1000).alias("k"),
        (F.rand(7) * 100).alias("v"),
    )

    for n_groups in (4, 256):
        t = TxTable(f"{work}/src{n_groups}")
        t.commit_append(df)
        t.optimize(spark, sort_key=["k"], target_groups=n_groups)
        t.delete_where(spark, "id % 101 = 0")  # ~1% DV rides the clone
        dt_clone, cl = timed(
            lambda t=t, n=n_groups: t.clone_shallow(f"{work}/cl{n}")
        )
        # warm both, then compare read cost source vs clone
        t.read(spark).count()
        cl.read(spark).count()
        dt_src, n_src = timed(lambda t=t: t.read(spark).count())
        dt_cl, n_cl = timed(lambda cl=cl: cl.read(spark).count())
        assert n_src == n_cl
        c0 = cl._read_commit(0)
        out[f"groups_{n_groups}"] = {
            "clone_s": dt_clone,
            "src_read_s": dt_src,
            "clone_read_s": dt_cl,
            "live_rows": n_cl,
            "groups_referenced": len(c0["add"]),
            "local_group_dirs": sum(
                os.path.isdir(os.path.join(cl.data_dir, g))
                for g in c0["add"]
            ),
        }
    print(json.dumps(out))
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
