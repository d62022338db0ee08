"""Scale probe for the snapshot-table commit protocol (SCALE.md §12).

Simulates a streaming-ingest day: N small commits (micro-batch sized)
into one `SnapshotTable`, then measures what actually grows —

  - commit latency at version 1 vs version N (the optimistic publish is
    O(1); append re-reads ONE parent manifest, whose size is O(files));
  - manifest size and file count at the head;
  - head-read planning+count wall before vs after `compact` (the
    small-files tax and its cure);
  - vacuum reclaim count.

Run: python scripts/scale_snapshots.py [n_commits]
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


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    spark = get_session(app_name="scale_snapshots")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="snap_scale_")
    try:
        t = SnapshotTable.create(spark, os.path.join(root, "t"))
        lat = []
        for i in range(n):
            df = (spark.range(i * 100, (i + 1) * 100)
                  .select(F.col("id").alias("v")).coalesce(2))
            t0 = time.perf_counter()
            t.append(df)
            lat.append(time.perf_counter() - t0)
        head = t.current_version()
        m = t._load_manifest(head)
        manifest_kb = os.path.getsize(t._manifest_path(head)) / 1024

        t0 = time.perf_counter()
        rows_head = t.read().count()
        read_small_files = time.perf_counter() - t0

        t.compact(target_files=8)
        t0 = time.perf_counter()
        rows_compacted = t.read().count()
        read_compacted = time.perf_counter() - t0
        assert rows_head == rows_compacted == n * 100

        # stats-pruned COW: a keyed delete touching ONE key range must
        # rewrite only the files whose stats overlap it (round 8) —
        # measured as bytes written by the delete commit vs table bytes
        def table_bytes(version):
            return sum(os.path.getsize(f)
                       for f in t._load_manifest(version)["files"])

        before_v = t.current_version()
        before_files = set(t._load_manifest(before_v)["files"])
        v = t.delete_where(f"v >= {n * 100 - 50}")
        after = t._load_manifest(v)
        kept_by_ref = len(set(after["files"]) & before_files)
        rewritten = [f for f in after["files"] if f not in before_files]
        rewrite_bytes = sum(os.path.getsize(f) for f in rewritten)

        removed = t.vacuum(keep_last=2, min_age_seconds=0)
        out = {
            "n_commits": n,
            "rows": rows_head,
            "commit_latency_first_s": round(lat[0], 4),
            "commit_latency_last_s": round(lat[-1], 4),
            "commit_latency_median_s": round(sorted(lat)[len(lat) // 2], 4),
            "head_files": m["n_files"],
            "head_manifest_kb": round(manifest_kb, 1),
            "read_count_small_files_s": round(read_small_files, 3),
            "read_count_after_compact_s": round(read_compacted, 3),
            "delete_kept_files_by_ref": kept_by_ref,
            "delete_rewritten_files": len(rewritten),
            "delete_rewrite_bytes": rewrite_bytes,
            "table_bytes_at_delete": table_bytes(v),
            "vacuum_removed_paths": len(removed),
        }
        print(json.dumps(out, indent=1))
        return 0
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
