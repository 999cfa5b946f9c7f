"""Multi-table transactions: an atomic CATALOG commit log over txlog
tables — the Iceberg-catalog / Nessie / Delta-multi-statement seam the
single-table log cannot give.

A :class:`TxTable` commit is atomic for ONE table; a pipeline that
maintains a fact table and its summary (or an index sidecar, or a
lineage table) needs readers to see the PAIR move together.  The
catalog provides that with the same one store primitive the table log
uses (plans/txlog.py publish_if_absent — ``os.link`` put-if-absent; S3
conditional PUT at scale):

* each catalog version is one JSON file holding the FULL pinned
  mapping ``{table_name: table_version}`` — reading a snapshot is one
  GET, never a replay (the mapping is small: #tables, not #commits);
* a multi-table transaction stages ordinary single-table commits
  first (each internally atomic, but NOT yet visible to catalog
  readers), then publishes the new mapping with put-if-absent;
* optimistic concurrency at the catalog tier: a writer declares the
  catalog version its transaction was BASED ON; on a lost race the
  commit rebases onto the new head only if the interleaved commits
  touched DISJOINT tables, else raises :class:`CatalogConflict` —
  the same logical conflict detection Delta applies to file overlaps,
  lifted to table granularity.

Readers that resolve table versions through a catalog snapshot can
never observe table A's new version next to table B's old one, and
table-level commits not yet published in the catalog (in-flight
transactions) are invisible — the isolation property the declared
query (queries_lakehouse.py txlog_catalog_snapshot) oracle-gates.

No counterpart in the reference (azanium drives a single Datomic
transactor — runcommand.py:1-60); extends SURVEY §2.9's migration/
snapshot tier to cross-table atomicity.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

from .txlog import CommitConflict, TxTable, publish_if_absent


class CatalogConflict(RuntimeError):
    """Concurrent catalog commit touched an overlapping table set."""


def _check_branch_name(name: str) -> None:
    if (
        not name
        or name in ("main", "branches")
        or "/" in name
        or name.startswith((".", "_"))
    ):
        raise ValueError(f"illegal branch name {name!r}")


class TxCatalog:
    def __init__(self, root: str, branch: str = "main"):
        self.root = root
        self.branch = branch
        if branch == "main":
            self.log_dir = os.path.join(root, "_catalog_log")
            os.makedirs(self.log_dir, exist_ok=True)
        else:
            # branch log dirs are created by create_branch ONLY —
            # referencing a nonexistent branch must never conjure one
            _check_branch_name(branch)
            self.log_dir = os.path.join(
                root, "_catalog_log", "branches", branch
            )

    # -- log ------------------------------------------------------------

    def _versions(self) -> list[int]:
        if not os.path.isdir(self.log_dir):
            return []  # nonexistent branch: empty log, no side effects
        return sorted(
            int(f[: -len(".json")])
            for f in os.listdir(self.log_dir)
            if f.endswith(".json") and not f.startswith(".")
        )

    def latest_version(self) -> int:
        vs = self._versions()
        return vs[-1] if vs else -1

    def snapshot(self, version: int | None = None) -> dict[str, int]:
        """The pinned ``{table: version}`` mapping at a catalog
        version (default: head).  Empty mapping for an empty log."""
        if version is None:
            version = self.latest_version()
        if version < 0:
            return {}
        path = os.path.join(self.log_dir, f"{version:020d}.json")
        with open(path) as fh:
            return {k: int(v) for k, v in json.load(fh)["tables"].items()}

    # -- tables -----------------------------------------------------------

    def table(self, name: str) -> TxTable:
        if "/" in name or name.startswith("_") or name.startswith("."):
            raise ValueError(f"illegal table name {name!r}")
        return TxTable(os.path.join(self.root, name))

    def read(
        self,
        spark: SparkSession,
        name: str,
        catalog_version: int | None = None,
    ) -> DataFrame:
        """Read a table AT the version the catalog snapshot pins —
        never the table head, so cross-table reads are consistent."""
        snap = self.snapshot(catalog_version)
        if name not in snap:
            raise KeyError(
                f"table {name!r} not in catalog snapshot "
                f"{catalog_version if catalog_version is not None else self.latest_version()}"
            )
        return self.table(name).read(spark, version=snap[name])

    # -- commits ----------------------------------------------------------

    def txn_version(self, app: str, batch: int) -> int | None:
        """Catalog version that already carries this (app, batch)
        transaction identity, or None — the exactly-once seam for
        streaming multi-table sinks (same contract as
        TxTable.commit_append's ``txn``).

        Scanned NEWEST-first with an early exit once a commit of the
        SAME app carries a smaller batch id (streaming batch ids are
        monotone per app), so the common non-replay publish checks
        O(1) commits instead of replaying the whole log — at batch B
        the naive forward scan is O(B) per publish, O(B²) per run."""
        for v in reversed(self._versions()):
            t = self._read_commit(v).get("txn")
            if not t or t.get("app") != app:
                continue
            got = int(t.get("batch"))
            if got == int(batch):
                return v
            if got < int(batch):
                return None  # monotone per app: older batches only below
        return None

    def commit(
        self,
        updates: dict[str, int],
        based_on: int | None = None,
        max_retries: int = 20,
        txn: tuple[str, int] | None = None,
    ) -> int:
        """Publish ``updates`` (table → new pinned version) atomically
        as the next catalog version.

        ``based_on`` is the catalog version the writer's transaction
        read from (default: the head observed now).  If another commit
        lands first, this commit REBASES onto the new head when the
        interleaved commits touched only disjoint tables, and raises
        :class:`CatalogConflict` when they overlap — the caller must
        re-run its transaction against fresh reads (its staged table
        versions may be built on stale inputs).

        With ``txn=(app_id, batch_id)`` the catalog publish is
        IDEMPOTENT: a replayed micro-batch whose identity already
        appears in the log is a no-op returning the original catalog
        version — together with the table-level ``txn`` dedup this
        makes a multi-table streaming sink exactly-once END TO END."""
        if not updates:
            raise ValueError("empty catalog commit")
        if self.branch != "main" and self.latest_version() < 0:
            raise ValueError(
                f"branch {self.branch!r} does not exist (create_branch "
                "seeds version 0 with main's mapping)"
            )
        if txn is not None:
            seen = self.txn_version(*txn)
            if seen is not None:
                return seen
        base = self.latest_version() if based_on is None else based_on
        for _ in range(max_retries):
            head = self.latest_version()
            if head > base:
                # someone committed since our reads: table-level
                # write-write conflict check before rebasing
                for v in range(base + 1, head + 1):
                    if txn is not None:
                        c = self._read_commit(v)
                        t = c.get("txn")
                        if (
                            t
                            and t.get("app") == txn[0]
                            and int(t.get("batch")) == int(txn[1])
                        ):
                            return v  # our own identity won the race
                    theirs = self._commit_updates(v)
                    clash = theirs & set(updates)
                    if clash:
                        raise CatalogConflict(
                            f"catalog commit lost race on tables "
                            f"{sorted(clash)} (version {v} updated them "
                            f"after base {base})"
                        )
            mapping = self.snapshot(head)
            mapping.update({k: int(v) for k, v in updates.items()})
            version = head + 1
            commit = {
                "version": version,
                "tables": mapping,
                "updated": sorted(updates),
                "based_on": base,
                "committed_at": time.strftime(
                    "%Y-%m-%dT%H:%M:%SZ", time.gmtime()
                ),
                "committed_ts": time.time(),
            }
            if txn is not None:
                commit["txn"] = {"app": txn[0], "batch": int(txn[1])}
            if publish_if_absent(self.log_dir, version, commit):
                return version
            # lost the publish race: loop re-checks overlap
        raise CommitConflict(
            f"catalog commit lost {max_retries} publish races"
        )

    def _read_commit(self, version: int) -> dict:
        path = os.path.join(self.log_dir, f"{version:020d}.json")
        with open(path) as fh:
            return json.load(fh)

    def _commit_updates(self, version: int) -> set[str]:
        return set(self._read_commit(version)["updated"])

    def history(self) -> list[dict]:
        out = []
        for v in self._versions():
            path = os.path.join(self.log_dir, f"{v:020d}.json")
            with open(path) as fh:
                out.append(json.load(fh))
        return out

    # -- branches ---------------------------------------------------------
    #
    # Nessie-style refs: a branch is its own numbered commit log seeded
    # (version 0) with the full main mapping at the branch point, so
    # branch snapshot resolution is the SAME one-GET read as main's.
    # Table data is shared storage — a branch pins different VERSIONS of
    # the same immutable table logs, so branching copies zero bytes.

    def create_branch(self, name: str, at: int | None = None) -> "TxCatalog":
        """Branch off main at catalog version ``at`` (default head).
        The branch starts with exactly main's pinned mapping; commits
        on it are invisible to main until :meth:`merge_branch`."""
        if self.branch != "main":
            raise ValueError("branches fork from main only")
        _check_branch_name(name)
        at = self.latest_version() if at is None else at
        br = TxCatalog(self.root, branch=name)
        if br.latest_version() >= 0:
            raise ValueError(f"branch {name!r} already exists")
        commit = {
            "version": 0,
            "tables": self.snapshot(at),
            "updated": [],
            "branched_from": at,
        }
        if not publish_if_absent(br.log_dir, 0, commit):
            raise ValueError(f"branch {name!r} already exists")
        return br

    def checkout(self, name: str) -> "TxCatalog":
        br = TxCatalog(self.root, branch=name) if name != "main" else (
            TxCatalog(self.root)
        )
        if br.latest_version() < 0:
            raise ValueError(f"branch {name!r} does not exist")
        return br

    def branches(self) -> list[str]:
        d = os.path.join(self.root, "_catalog_log", "branches")
        if not os.path.isdir(d):
            return []
        return sorted(
            n for n in os.listdir(d)
            if os.path.isdir(os.path.join(d, n))
        )

    def merge_branch(self, name: str) -> int:
        """Merge a branch's net table updates into main as ONE atomic
        catalog commit.  Conflict detection is the same table-granular
        rule as concurrent commits: if main moved any table the branch
        updated since the branch point, raise :class:`CatalogConflict`
        (rebase the branch by re-running its transactions); disjoint
        main progress merges cleanly."""
        if self.branch != "main":
            raise ValueError("merge lands on main only")
        br = self.checkout(name)
        hist = br.history()
        base = hist[0].get("branched_from", -1)
        updated: set[str] = set()
        for c in hist[1:]:
            updated.update(c["updated"])
        if not updated:
            return self.latest_version()  # nothing to merge
        head_map = br.snapshot()
        return self.commit(
            {t: head_map[t] for t in sorted(updated)}, based_on=base
        )

    # -- tags & time travel ------------------------------------------------

    def version_at_timestamp(self, ts: float) -> int:
        """Catalog version in effect AT a wall-clock time (AS OF
        semantics): the newest commit with committed_ts ≤ ts.  Raises
        if the catalog is empty or ts predates the first commit."""
        best = -1
        for c in self.history():
            if float(c.get("committed_ts", 0.0)) <= ts:
                best = int(c["version"])
        if best < 0:
            raise ValueError(
                f"no catalog commit at or before timestamp {ts}"
            )
        return best

    def create_tag(self, name: str, version: int | None = None) -> int:
        """Immutable named ref to one catalog version (a release
        pointer: 'v2024.08' → version N).  Tags never move — re-tagging
        a taken name raises; published with the same put-if-absent
        primitive as commits so concurrent taggers cannot split-brain
        a name."""
        _check_branch_name(name)  # same lexical rules as branches
        version = self.latest_version() if version is None else version
        if not (0 <= version <= self.latest_version()):
            raise ValueError(f"no catalog version {version} to tag")
        tag_dir = os.path.join(self.root, "_catalog_log", "tags")
        os.makedirs(tag_dir, exist_ok=True)
        path = os.path.join(tag_dir, f"{name}.json")
        tmp = os.path.join(tag_dir, f".tmp-{uuid.uuid4().hex}.json")
        payload = {"tag": name, "version": int(version)}
        with open(tmp, "w") as fh:
            json.dump(payload, fh)
        try:
            os.link(tmp, path)
        except FileExistsError as exc:
            raise ValueError(f"tag {name!r} already exists") from exc
        finally:
            os.remove(tmp)
        return int(version)

    def tags(self) -> dict[str, int]:
        d = os.path.join(self.root, "_catalog_log", "tags")
        if not os.path.isdir(d):
            return {}
        out = {}
        for f in sorted(os.listdir(d)):
            if not f.endswith(".json") or f.startswith("."):
                continue
            with open(os.path.join(d, f)) as fh:
                c = json.load(fh)
            if "tag" in c:
                out[c["tag"]] = int(c["version"])
        return out

    def tag_version(self, name: str) -> int:
        t = self.tags()
        if name not in t:
            raise ValueError(f"tag {name!r} does not exist")
        return t[name]
