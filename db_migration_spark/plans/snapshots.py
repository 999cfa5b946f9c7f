"""Versioned snapshots — the backup/time-travel surface (SURVEY §2.1 S9).

The reference's backup step is ``bin/datomic backup-db`` + a dated tar.xz
archive (``runcommand.py:221-255``), skipped when the archive already
exists (re-entrancy, ``runcommand.py:240-251``).  On Parquet the analog is
a dated snapshot directory per version plus a manifest; Delta's
``VERSION AS OF`` supersedes this on clusters that ship it — the API here
is deliberately shaped the same way (write / list / read-version).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession

MANIFEST = "_snapshots.json"


def _load_manifest(root: str) -> list[dict]:
    p = os.path.join(root, MANIFEST)
    if os.path.exists(p):
        with open(p) as fp:
            return json.load(fp)
    return []


def _save_manifest(root: str, entries: list[dict]) -> None:
    os.makedirs(root, exist_ok=True)
    tmp = os.path.join(root, MANIFEST + ".tmp")
    with open(tmp, "w") as fp:
        json.dump(entries, fp, indent=2)
    os.replace(tmp, os.path.join(root, MANIFEST))


def write_snapshot(
    df: DataFrame, root: str, label: str | None = None, overwrite: bool = False
) -> int:
    """Write the next snapshot version.  Re-entrancy (runcommand.py:240-251):
    an existing same-label snapshot is a no-op unless ``overwrite``."""
    entries = _load_manifest(root)
    if label and not overwrite:
        for e in entries:
            if e["label"] == label:
                return e["version"]
    version = (entries[-1]["version"] + 1) if entries else 0
    path = os.path.join(root, f"v{version:05d}")
    df.write.mode("overwrite").parquet(path)
    entries.append(
        {
            "version": version,
            "label": label or "",
            "path": path,
            "created_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
    )
    _save_manifest(root, entries)
    return version


def list_snapshots(root: str) -> list[dict]:
    return _load_manifest(root)


def read_snapshot(
    spark: SparkSession, root: str, version: int | None = None, label: str | None = None
) -> DataFrame:
    """VERSION AS OF analog: read a specific snapshot (default latest)."""
    entries = _load_manifest(root)
    if not entries:
        raise FileNotFoundError(f"no snapshots under {root}")
    if label is not None:
        matches = [e for e in entries if e["label"] == label]
        if not matches:
            raise KeyError(f"no snapshot labeled {label!r}")
        entry = matches[-1]
    elif version is not None:
        by_v = {e["version"]: e for e in entries}
        if version not in by_v:
            raise KeyError(f"no snapshot version {version}")
        entry = by_v[version]
    else:
        entry = entries[-1]
    return spark.read.parquet(entry["path"])
