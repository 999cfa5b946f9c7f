"""Round-6 ×10/×100 scale measurements for SCALE.md:

1. OPTIMIZE ... WHERE — partition-scoped compaction must cost the
   slice, not the table (round-5 feature, no SCALE row yet).
2. ALTER column mapping — RENAME is metadata-only, so reads through
   the physical→logical alias must cost the same as pre-rename reads.
3. Batched ``add_bloom_index`` — round-6 rewrite: ONE Spark job for
   every un-indexed group; build time must be near-flat in group count
   at fixed data volume (the round-5 per-group loop was linear).

Usage: python tools/scale_round6.py 10|100   (uses .tmp/sfx{N})
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
    return round(time.time() - t0, 2), r


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    sf = f"/root/repo/.tmp/sfx{n}"
    work = f"/root/repo/.tmp/r6scale_{n}"
    shutil.rmtree(work, ignore_errors=True)
    spark = get_spark("scale-r6")
    spark.sparkContext.setLogLevel("ERROR")
    ev = spark.read.parquet(f"{sf}/events.parquet")
    out: dict = {"x": n, "rows": ev.count()}

    # -- 1. OPTIMIZE ... WHERE ------------------------------------------
    t = TxTable(f"{work}/opt")
    dt, _ = timed(
        lambda: [
            t.commit_append_partitioned(
                ev.filter(F.col("event_id") % 8 == i), "event_type"
            )
            for i in range(8)
        ]
    )
    out["ingest_8_batches_partitioned"] = dt
    out["groups_before"] = len(t.active_groups())
    tgt = sorted(
        r[0] for r in ev.select("event_type").distinct().collect()
    )[0]
    dt, _ = timed(
        lambda: t.optimize(spark, where=("event_type", tgt, tgt))
    )
    out["optimize_where_one_type"] = dt
    out["groups_after"] = len(t.active_groups())
    dt, cnt = timed(
        lambda: t.read_pruned(spark, "event_type", tgt, tgt).count()
    )
    out["warm_pruned_read_after"] = dt
    out["slice_rows"] = cnt
    if n <= 10:  # whole-table rewrite for contrast (too hot at x100)
        dt, _ = timed(lambda: t.optimize(spark, target_groups=8))
        out["optimize_full_table"] = dt

    # -- 2. ALTER column mapping ----------------------------------------
    t2 = TxTable(f"{work}/map")
    t2.commit_append(ev.repartition(32))
    agg = lambda c: (  # noqa: E731
        t2.read(spark).agg(F.countDistinct(c).alias("n")).collect()[0].n
    )
    timed(lambda: agg("user_id"))  # warm-up (JIT + page cache)
    dt_pre, _ = timed(lambda: agg("user_id"))
    t2.alter_rename_column(spark, "user_id", "uid")
    dt_post, _ = timed(lambda: agg("uid"))
    out["read_pre_rename"] = dt_pre
    out["read_post_rename"] = dt_post

    # -- 3. batched bloom build vs group count --------------------------
    for g_target in (4, 64):
        t3 = TxTable(f"{work}/bloom{g_target}")
        t3.commit_append_partitioned(
            ev.withColumn("bkt", F.col("event_id") % g_target), "bkt"
        )
        n_groups = len(t3.active_groups())
        dt, built = timed(lambda: t3.add_bloom_index(spark, "event_id"))
        out[f"bloom_build_{n_groups}_groups"] = dt
        assert built == n_groups, (built, n_groups)
        needle = ev.limit(1).collect()[0].event_id
        dt, _ = timed(
            lambda: t3.read_point(spark, "event_id", needle).count()
        )
        out[f"bloom_lookup_{n_groups}_groups"] = dt

    print(json.dumps(out))
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
