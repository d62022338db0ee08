"""Scale probe: delta manifests (SCALE.md §23).

Sweeps the TABLE FILE COUNT (10² → 10⁵) and measures, at each size,
the cost of one marginal 4-file append commit and one cold head
resolve under the r10 delta-manifest format:

  - ``commit_ms``    — wall of `_commit_append` (manifest write only;
    file paths are synthetic, no parquet IO, so this isolates the
    manifest machinery the probe is about);
  - ``doc_bytes``    — size of the commit's manifest document on disk
    (pre-r10 this was the FULL file list: ~145 B/file → ~14.5 MB at
    10⁵ files, ~145 MB at 10⁶; post-r10 it is O(4 files));
  - ``resolve_ms``   — cold `_load_manifest(head)` on a fresh
    instance (nearest checkpoint base + tail deltas);
  - ``ckpt_bytes``   — size of the newest checkpoint (the O(files)
    cost that remains, paid once per ``checkpoint_interval`` commits
    instead of on every commit).

The table is grown with 100-file synthetic appends (`_commit_append`
with fabricated paths + empty stats) — manifest costs depend only on
the file COUNT, so this sweeps 10⁵ files in seconds instead of hours
of parquet writes.  A separate end-to-end block appends real data and
re-reads it, so the probe also witnesses the format working against
actual parquet.

Run: python scripts/scale_delta_manifests.py
Prints one JSON document.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from datum_spark.session import get_session  # noqa: E402
from datum_spark.sources.snapshots import SnapshotTable  # noqa: E402


def _grow_to(t: SnapshotTable, n_files: int, batch: int = 100) -> None:
    have = t._load_manifest(t.current_version())["n_files"]
    i = have
    while i < n_files:
        k = min(batch, n_files - i)
        paths = [os.path.join(t._data, f"synth-{i + j:09d}.parquet")
                 for j in range(k)]
        t._commit_append(paths, None, {p: {} for p in paths})
        i += k


def main() -> None:
    spark = get_session()
    out: dict = {"metric": "delta_manifest_sweep", "unit": "ms",
                 "sweep": []}

    root = tempfile.mkdtemp(prefix="delta-mf-")
    try:
        path = os.path.join(root, "t")
        t = SnapshotTable.create(spark, path)   # default interval 100
        for target in (100, 1_000, 10_000, 100_000):
            _grow_to(t, target)
            # marginal commit: 4 new files onto a `target`-file table
            paths = [os.path.join(t._data, f"marg-{target}-{j}.parquet")
                     for j in range(4)]
            t0 = time.perf_counter()
            v = t._commit_append(paths, None, {p: {} for p in paths})
            commit_ms = (time.perf_counter() - t0) * 1e3
            doc_bytes = os.path.getsize(t._manifest_path(v))
            cold = SnapshotTable(spark, path)
            t0 = time.perf_counter()
            m = cold._load_manifest(cold.current_version())
            resolve_ms = (time.perf_counter() - t0) * 1e3
            cks = sorted(n for n in os.listdir(t._manifests)
                         if n.startswith("ckpt-v"))
            ckpt_bytes = (os.path.getsize(
                os.path.join(t._manifests, cks[-1])) if cks else 0)
            out["sweep"].append({
                "n_files": m["n_files"],
                "commit_ms": round(commit_ms, 2),
                "doc_bytes": doc_bytes,
                "resolve_ms": round(resolve_ms, 2),
                "ckpt_bytes": ckpt_bytes,
            })

        # end-to-end witness: real parquet through the same format
        e2e = os.path.join(root, "e2e")
        te = SnapshotTable.create(spark, e2e)
        for lo in range(0, 40, 10):
            te.append(spark.range(lo, lo + 10)
                      .select(F.col("id").alias("v")))
        t0 = time.perf_counter()
        n = SnapshotTable(spark, e2e).read().count()
        out["e2e_rows"] = int(n)
        out["e2e_read_ms"] = round((time.perf_counter() - t0) * 1e3, 2)
        ch = te.changes(3, 4).count()
        out["e2e_changes_v3_v4"] = int(ch)
    finally:
        shutil.rmtree(root, ignore_errors=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
