"""Scale probe for SnapshotTable txn checkpoints (SCALE.md §20).

The claim under test: with periodic checkpoints the
``append_once`` idempotence walk (`_last_txn_version`) is
O(checkpoint_interval) even for a producer the table has NEVER seen,
while without them it degrades O(versions) — and head READ planning is
O(1) in version count either way (every manifest carries the full file
list).

Sweep: 1,000 manifest-layer commits per configuration (txn-tagged
appends through the real `_commit_append` path with empty file lists —
the probe measures the METADATA layer; Spark data writes would just
add a constant).  At every 100 commits, measure:

  - wall of `_last_txn_version("never-seen-<v>")` — the worst-case
    walk a fresh producer's first `append_once` performs TWICE
    (pre-check + commit precondition);
  - wall of a real `append_once` of a 3-row DataFrame under a fresh
    txn_id (the end-to-end number: Spark write + 2 walks + publish);
  - head read-planning wall: `read().count()` on the constant data.

Two configurations: checkpoint_interval=100 (default) vs disabled
(interval > sweep).  Run: python scripts/scale_snapshot_checkpoint.py
[n_commits].  Prints one JSON document.
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


def sweep(spark, n_commits: int, interval: int) -> list[dict]:
    root = tempfile.mkdtemp(prefix=f"ckpt_{interval}_")
    try:
        t = SnapshotTable.create(spark, os.path.join(root, "t"),
                                 checkpoint_interval=interval)
        df = spark.range(3).select(F.col("id").alias("v"))
        t.append(df)                       # real data so read() works
        steps = []
        for v in range(1, n_commits + 1):
            t._commit_append(
                [], None, {},
                extra={"txn_id": f"p{v % 7}", "txn_version": v})
            if v % 100 == 0:
                t0 = time.time()
                for r in range(20):        # amortize clock noise
                    assert t._last_txn_version(f"never-{v}-{r}") == -1
                walk_ms = (time.time() - t0) / 20 * 1000
                t0 = time.time()
                t.append_once(df, txn_id=f"fresh-{interval}-{v}",
                              txn_version=1)
                once_s = time.time() - t0
                t0 = time.time()
                n = t.read().count()
                read_s = time.time() - t0
                steps.append({"commits": v + 2,  # + data commits
                              "walk_ms": round(walk_ms, 2),
                              "append_once_s": round(once_s, 2),
                              "read_count_s": round(read_s, 2),
                              "rows": n})
                print(json.dumps({"interval": interval, **steps[-1]}),
                      file=sys.stderr)
        return steps
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    spark = get_session()
    out = {"probe": "snapshot_txn_checkpoint", "n_commits": n,
           "checkpointed": sweep(spark, n, 100),
           "uncheckpointed": sweep(spark, n, 10 ** 9)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
