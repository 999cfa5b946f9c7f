"""Copy-on-write MERGE for plain-Parquet stores — the Delta ``MERGE INTO``
analog (SURVEY §2.9 X4's persistent form).

Datomic transacts patches over the live DB (``pseudoace.py:105-110``); on a
cluster with Delta/Iceberg the engine would issue ``MERGE INTO store USING
patches ON (e, a)``.  Plain Parquet has no transaction log, so this module
implements the same semantics as copy-on-write against the versioned
snapshot store (plans/snapshots.py):

1. read current version,
2. resolve patches with last-write-wins + retraction (operators/eav),
3. write the result as the next snapshot version (atomic via the manifest
   swap — readers of version N never see a partial N+1).

When only a few partitions are touched, ``merge_upsert`` rewrites just
those (partition-pruned copy-on-write), which is what keeps this viable at
100 TB: cost scales with the patch's partition footprint, not store size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.eav import apply_patches
from . import snapshots


def merge_upsert(
    spark: SparkSession,
    store_root: str,
    patches: DataFrame,
    partition_col: str | None = "class",
    label: str | None = None,
) -> int:
    """MERGE patches into the latest snapshot → new snapshot version.

    With ``partition_col``, untouched partitions are carried over without
    resolution (their bytes are re-linked by the snapshot write; only
    touched partitions pay the LWW window).
    """
    base = snapshots.read_snapshot(spark, store_root)
    if partition_col and partition_col in base.columns:
        touched = [
            r[0]
            for r in patches.select(partition_col).distinct().collect()
        ]
        # NULL partition values: isin(touched) and ~isin(touched) are both
        # NULL for NULL input, which would drop such base rows from BOTH
        # sides.  Build a never-NULL touched predicate instead: NULL
        # partitions count as touched iff the patch set itself has NULL
        # partitions (so they resolve against their patches), otherwise
        # they carry over untouched.
        touched_vals = [t for t in touched if t is not None]
        null_touched = len(touched_vals) != len(touched)
        is_touched = F.coalesce(
            F.col(partition_col).isin(touched_vals), F.lit(False)
        )
        if null_touched:
            is_touched = is_touched | F.col(partition_col).isNull()
        base_touched = base.filter(is_touched)
        base_rest = base.filter(~is_touched)
        merged = apply_patches(base_touched, patches).unionByName(base_rest)
    else:
        merged = apply_patches(base, patches)
    return snapshots.write_snapshot(merged, store_root, label=label, overwrite=True)
