"""Scale probe: segmented checkpoints (SCALE.md §26).

Sweeps the TABLE FILE COUNT (10² → 10⁵) and measures, at each size,
the IO cost of ONE periodic checkpoint under the r11 segmented format
(vs r10's embedded full file list, which was ~118 B/file — 11.8 MB at
10⁵ files, every ``checkpoint_interval`` commits):

  - ``ckpt_doc_bytes``   — the checkpoint document itself (now a
    manifest-list of segment names, O(n_buckets));
  - ``new_seg_bytes``    — bytes of segments actually WRITTEN for this
    checkpoint (content-addressed reuse skips unchanged buckets);
  - ``new_segs``         — how many of the buckets rewrote;
  - ``total_seg_bytes``  — the full segment tree (context: what a
    cold resolve reads, equal to the old embedded list's payload);
  - ``ckpt_ms``          — wall of the `_write_checkpoint` call.

The table grows with synthetic 100-file appends (`_commit_append`
with fabricated paths — manifest machinery only, no parquet IO); at
each decade a marginal 4-file append is committed and a checkpoint is
forced at its version, measuring the steady-state per-checkpoint cost.

Run: python scripts/scale_segmented_checkpoint.py
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


def _seg_listing(manifests: str) -> dict[str, int]:
    return {n: os.path.getsize(os.path.join(manifests, n))
            for n in os.listdir(manifests) if n.startswith("seg-")}


def main() -> None:
    spark = get_session()
    out: dict = {"metric": "segmented_checkpoint_sweep", "unit": "bytes",
                 "sweep": []}
    root = tempfile.mkdtemp(prefix="seg-ckpt-")
    try:
        path = os.path.join(root, "t")
        # interval 0: checkpoints only when forced, so each decade
        # measures exactly one marginal checkpoint
        t = SnapshotTable.create(spark, path, checkpoint_interval=0)
        for target in (100, 1_000, 10_000, 100_000):
            _grow_to(t, target)
            # a baseline checkpoint so the marginal one can reuse
            t._write_checkpoint(t.current_version())
            before = _seg_listing(t._manifests)
            paths = [os.path.join(t._data, f"marg-{target}-{j}.parquet")
                     for j in range(4)]
            v = t._commit_append(paths, None, {p: {} for p in paths})
            t0 = time.perf_counter()
            t._write_checkpoint(v)
            ckpt_ms = (time.perf_counter() - t0) * 1e3
            after = _seg_listing(t._manifests)
            new = {n: b for n, b in after.items() if n not in before}
            out["sweep"].append({
                "n_files": target + 4,
                "ckpt_doc_bytes": os.path.getsize(t._checkpoint_path(v)),
                "new_seg_bytes": sum(new.values()),
                "new_segs": len(new),
                "total_seg_bytes": sum(after.values()),
                "ckpt_ms": round(ckpt_ms, 2),
            })
    finally:
        shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
