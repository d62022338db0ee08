"""Versioned snapshot tables: ACID-ish parquet without connector jars.

The reference's users get transactional tables from the backend RDBMS
(`/root/reference/datum/postgis/table.py` — every write runs in a DB
transaction); a Spark deployment normally reaches for Delta/Iceberg,
whose jars this runtime does not ship (`sources/registry.py` gates
them).  This module supplies the load-bearing subset of that behavior
with nothing but parquet + an atomically-published manifest, the same
core design as Iceberg's metadata tree cut down to one level:

- layout::

      <path>/data/<commit-token>/part-*.parquet   (immutable once written)
      <path>/_manifests/v{N:012d}.json            (file list per version)

- COMMIT = write data files into a fresh commit directory, then publish
  ``v{N}.json`` via ``os.rename`` of a temp file — atomic on POSIX, so
  readers see either the old version or the new one, never a partial
  file list.  The rename FAILS if another writer took version N first;
  the committer re-reads the head and retries at N+1 (optimistic
  concurrency, Iceberg-style).
- SNAPSHOT ISOLATION = a reader resolves one manifest and reads only
  the files it lists; data files are never mutated or appended to, so a
  long query is unaffected by later commits (until ``vacuum`` reclaims
  files its retained manifests no longer reference).
- TIME TRAVEL = ``read(version=...)`` / ``read(as_of=<unix ts>)``.

Scale posture: a manifest lists FILES, not rows — O(file count), the
same scaling unit as Iceberg's manifests; ``append`` writes only the
new files and copies the parent's file LIST (no data rewrite);
``overwrite``/``delete_where`` are copy-on-write.  The single-level
manifest caps out around millions of files per table — the point where
real deployments move to Iceberg/Delta proper (and `registry.py`'s
gates lift); everything above the format (the engine's operators) is
unchanged by that swap.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


class CommitConflict(RuntimeError):
    """Another writer published this version first (after retries)."""


class SnapshotTable:
    """A versioned parquet table at ``path`` (local/posix scheme)."""

    def __init__(self, spark: SparkSession, path: str) -> None:
        self.spark = spark
        self.path = path
        self._data = os.path.join(path, "data")
        self._manifests = os.path.join(path, "_manifests")

    # -- bootstrap ---------------------------------------------------------

    @classmethod
    def create(cls, spark: SparkSession, path: str) -> "SnapshotTable":
        t = cls(spark, path)
        os.makedirs(t._data, exist_ok=True)
        os.makedirs(t._manifests, exist_ok=True)
        if t.current_version() is None:
            t._publish(0, files=[], operation="create", parent=None)
        return t

    # -- manifest plumbing -------------------------------------------------

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self._manifests, f"v{version:012d}.json")

    def current_version(self) -> int | None:
        try:
            names = [n for n in os.listdir(self._manifests)
                     if n.startswith("v") and n.endswith(".json")]
        except FileNotFoundError:
            return None
        if not names:
            return None
        return max(int(n[1:-5]) for n in names)

    def _load_manifest(self, version: int) -> dict:
        with open(self._manifest_path(version)) as fh:
            return json.load(fh)

    def _publish(self, version: int, files: list[str], operation: str,
                 parent: int | None, extra: dict | None = None) -> None:
        """Atomically publish one manifest.

        ``os.rename`` to an EXISTING path silently replaces it on POSIX,
        which would let two concurrent committers both "win" version N —
        so the temp manifest is first hard-linked into place via
        ``os.link`` (fails with EEXIST if the version was taken) and
        the temp unlinked after.  link+unlink is the portable atomic
        create-exclusive publish.
        """
        doc = {
            "version": version,
            "parent": parent,
            "operation": operation,
            "files": sorted(files),
            "committed_at": time.time(),
            "n_files": len(files),
        }
        doc.update(extra or {})
        tmp = os.path.join(self._manifests,
                           f".tmp-{uuid.uuid4().hex}.json")
        with open(tmp, "w") as fh:
            json.dump(doc, fh, indent=1)
            fh.flush()
            os.fsync(fh.fileno())
        try:
            os.link(tmp, self._manifest_path(version))
        except FileExistsError as exc:
            raise CommitConflict(
                f"version {version} already committed") from exc
        finally:
            os.unlink(tmp)

    def _commit(self, new_files: list[str], operation: str,
                base_files_of_parent: bool, retries: int = 10,
                extra: dict | None = None) -> int:
        """Optimistic commit loop: try head+1; on conflict re-read the
        head (re-basing the parent file list for appends) and retry."""
        for _ in range(retries):
            parent = self.current_version()
            version = 0 if parent is None else parent + 1
            files = list(new_files)
            if base_files_of_parent and parent is not None:
                files += self._load_manifest(parent)["files"]
            try:
                self._publish(version, files, operation, parent,
                              extra=extra)
                return version
            except CommitConflict:
                continue
        raise CommitConflict(
            f"lost the commit race {retries} times at {self.path}")

    # -- writes ------------------------------------------------------------

    def _write_data(self, df: DataFrame) -> list[str]:
        commit_dir = os.path.join(self._data, f"commit-{uuid.uuid4().hex}")
        df.write.parquet(commit_dir)
        return [os.path.join(commit_dir, n)
                for n in os.listdir(commit_dir)
                if n.endswith(".parquet")]

    def append(self, df: DataFrame) -> int:
        """Add ``df``'s rows; parent files are REFERENCED, not rewritten
        (O(new data), the daily-ingest posture).  Returns the version."""
        return self._commit(self._write_data(df), "append",
                            base_files_of_parent=True)

    def append_once(self, df: DataFrame, txn_id: str,
                    txn_version: int) -> int | None:
        """Transactional append for at-least-once producers (the Delta
        ``txn`` pattern): if the producer's LAST commit already carries
        ``txn_version' >= txn_version``, the append is a no-op (returns
        None) — a replayed micro-batch commits zero rows twice.  The
        check and the publish are not one atomic step, so this guards
        REPLAYS of the same producer (which re-runs batches serially),
        not two concurrent producers sharing one txn_id.

        The check walks manifests NEWEST-first and stops at the first
        commit from this producer — O(commits since the producer's last
        one), i.e. O(1) for a steady stream, not O(table history); the
        walk also stops at the vacuum horizon, so ``vacuum`` retention
        must exceed the producer's replay window (size ``keep_last`` to
        at least the checkpoint-recovery depth)."""
        if self._last_txn_version(txn_id) >= txn_version:
            return None
        return self._commit(self._write_data(df), "append",
                            base_files_of_parent=True,
                            extra={"txn_id": txn_id,
                                   "txn_version": int(txn_version)})

    def _last_txn_version(self, txn_id: str) -> int:
        head = self.current_version()
        if head is None:
            return -1
        for v in range(head, -1, -1):
            try:
                meta = self._load_manifest(v)
            except FileNotFoundError:
                return -1                    # vacuum horizon reached
            if meta.get("txn_id") == txn_id:
                return int(meta.get("txn_version", -1))
        return -1

    def merge(self, df: DataFrame, keys: list[str]) -> int:
        """MERGE/upsert by key: rows of the current snapshot whose key
        appears in ``df`` are replaced, new keys are inserted —
        copy-on-write (full rewrite; file-level pruning needs manifest
        column stats, the graduate-to-Iceberg point; semantics match)."""
        current = self.read()
        remaining = current.join(df.select(*keys).distinct(), keys, "anti")
        merged = remaining.unionByName(df)
        return self._commit(self._write_data(merged), "merge",
                            base_files_of_parent=False)

    def overwrite(self, df: DataFrame) -> int:
        """Replace the table contents (copy-on-write: old files stay on
        disk for older-version readers until ``vacuum``)."""
        return self._commit(self._write_data(df), "overwrite",
                            base_files_of_parent=False)

    def delete_where(self, condition: str) -> int:
        """Copy-on-write delete: rewrite the current snapshot minus the
        matching rows.  (A file-level skip would need column stats in
        the manifest — the point where a real deployment graduates to
        Iceberg; semantics here are identical.)"""
        current = self.read()
        remaining = current.filter(f"NOT ({condition})")
        return self._commit(self._write_data(remaining), "delete",
                            base_files_of_parent=False)

    def compact(self, target_files: int = 8) -> int:
        """Rewrite the current snapshot into ``target_files`` files as a
        new version — the small-files maintenance pass a streaming
        ``snapshot_sink`` table needs periodically (each micro-batch
        commit adds its own files; manifests and scan listings grow by
        file COUNT).  Old versions still time-travel until ``vacuum``."""
        df = self.read().coalesce(max(1, target_files))
        return self._commit(self._write_data(df), "compact",
                            base_files_of_parent=False)

    # -- reads -------------------------------------------------------------

    def read(self, version: int | None = None,
             as_of: float | None = None,
             merge_schema: bool = False) -> DataFrame:
        """Snapshot read.  ``version`` pins an exact version; ``as_of``
        (unix seconds) picks the newest version committed at-or-before
        that time; default = current head.  ``merge_schema`` unions the
        schemas across the snapshot's files (additive schema evolution:
        appends may carry new columns, old files read them as NULL)."""
        if version is None:
            version = self._resolve_as_of(as_of) if as_of is not None \
                else self.current_version()
        if version is None:
            raise ValueError(f"no snapshot table at {self.path}")
        manifest = self._load_manifest(version)
        files = manifest["files"]
        if not files:
            return self.spark.createDataFrame([], "__empty string") \
                .drop("__empty")
        reader = self.spark.read
        if merge_schema:
            reader = reader.option("mergeSchema", "true")
        return reader.parquet(*files)

    def _resolve_as_of(self, ts: float) -> int:
        best = None
        for v, meta in self.history():
            if meta["committed_at"] <= ts and (best is None or v > best):
                best = v
        if best is None:
            raise ValueError(f"no version committed at or before {ts}")
        return best

    def history(self) -> list[tuple[int, dict]]:
        """(version, manifest) pairs, oldest first."""
        out = []
        for n in sorted(os.listdir(self._manifests)):
            if n.startswith("v") and n.endswith(".json"):
                v = int(n[1:-5])
                out.append((v, self._load_manifest(v)))
        return out

    # -- maintenance -------------------------------------------------------

    def vacuum(self, keep_last: int = 2) -> list[str]:
        """Drop manifests older than the newest ``keep_last`` versions
        and delete data files no retained manifest references.  Returns
        removed paths.  Readers pinned to a vacuumed version fail like
        any engine's expired snapshot — size ``keep_last`` to the
        longest query you run."""
        versions = sorted(v for v, _ in self.history())
        if len(versions) <= keep_last:
            return []
        keep = set(versions[-keep_last:])
        referenced: set[str] = set()
        for v in keep:
            referenced.update(self._load_manifest(v)["files"])
        removed: list[str] = []
        for v in versions:
            if v not in keep:
                os.unlink(self._manifest_path(v))
                removed.append(self._manifest_path(v))
        # commit dirs whose every file is unreferenced can go wholesale
        for d in os.listdir(self._data):
            cdir = os.path.join(self._data, d)
            files = {os.path.join(cdir, n) for n in os.listdir(cdir)}
            if files and not (files & referenced):
                shutil.rmtree(cdir)
                removed.append(cdir)
        return removed
