"""Scale probe: copy-on-write vs merge-on-read deletes (SCALE.md §15).

Builds two identical clustered snapshot tables (N rows, 16 files,
disjoint key ranges), runs the SAME selective delete (one key stripe)
against each — COW on one, MOR on the other — and measures what each
mode actually pays:

  - wall time of the delete commit;
  - bytes written by the commit (rewritten data vs position refs);
  - head-read wall after the delete (the MOR anti-join amplification);
  - head-read wall after `compact` (the cure).

Run: python scripts/scale_mor_deletes.py [n_rows]
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


def _tree_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def _build(spark, path: str, n: int) -> SnapshotTable:
    t = SnapshotTable.create(spark, path)
    df = (spark.range(n)
          .select(F.col("id").alias("k"),
                  (F.col("id") % 97).alias("grp"),
                  F.md5(F.col("id").cast("string")).alias("payload")))
    t.append(df)
    t.compact(target_files=16, cluster_by=["k"])
    t.vacuum(keep_last=1, min_age_seconds=0.0)
    return t


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    spark = get_session(app_name="scale_mor")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="mor_scale_")
    out: dict = {"n_rows": n}
    try:
        # the delete hits one 16th of the key space -> stats prune to ~1
        # of the 16 clustered files in BOTH modes
        lo, hi = n // 16, n // 8

        cow = _build(spark, os.path.join(root, "cow"), n)
        before = _tree_bytes(cow.path)
        t0 = time.perf_counter()
        cow.delete_where(f"k >= {lo} AND k < {hi}", mode="cow")
        out["cow_delete_s"] = round(time.perf_counter() - t0, 3)
        out["cow_bytes_written"] = _tree_bytes(cow.path) - before
        m = cow._load_manifest(cow.current_version())
        out["cow_files_head"] = len(m["files"])
        t0 = time.perf_counter()
        out["rows_after_cow"] = cow.read().count()
        out["cow_read_s"] = round(time.perf_counter() - t0, 3)

        mor = _build(spark, os.path.join(root, "mor"), n)
        before = _tree_bytes(mor.path)
        t0 = time.perf_counter()
        mor.delete_where(f"k >= {lo} AND k < {hi}", mode="mor")
        out["mor_delete_s"] = round(time.perf_counter() - t0, 3)
        out["mor_bytes_written"] = _tree_bytes(mor.path) - before
        m = mor._load_manifest(mor.current_version())
        out["mor_files_head"] = len(m["files"])
        out["mor_ref_files"] = len(m.get("delete_files") or [])
        t0 = time.perf_counter()
        out["rows_after_mor"] = mor.read().count()
        out["mor_read_s"] = round(time.perf_counter() - t0, 3)

        t0 = time.perf_counter()
        mor.compact(target_files=16, cluster_by=["k"])
        out["mor_compact_s"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        rows_c = mor.read().count()
        out["mor_read_after_compact_s"] = round(time.perf_counter() - t0, 3)

        assert out["rows_after_cow"] == out["rows_after_mor"] == rows_c
        out["bytes_ratio_cow_over_mor"] = round(
            out["cow_bytes_written"] / max(1, out["mor_bytes_written"]), 1)
        print(json.dumps(out))
        return 0
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
