"""Scale probe for the incremental change feed (SCALE.md §17).

Builds a snapshot table from N_BASE rows across many commits (so the
head references many files), then measures the cost of consuming ONE
new micro-batch through `changes(head-1, head)` versus the naive
full-table diff a consumer without a feed would run
(read(head) exceptAll read(head-1) both ways).  The claim under test:
the feed's cost rides the CHANGED files only — flat as the table
grows — while the naive diff pays O(table) twice.

Also measures a keyed-merge feed (touched-file reads + multiset
cancel) and verifies both feeds' row counts against the expected
delta.

Run: python scripts/scale_changes.py [n_base_rows] [n_commits]
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


def main(n_base: int, n_commits: int) -> None:
    spark = get_session()
    d = tempfile.mkdtemp(prefix="cdc_probe_")
    try:
        t = SnapshotTable.create(spark, os.path.join(d, "t"))
        per = n_base // n_commits
        for i in range(n_commits):
            t.append(spark.range(i * per, (i + 1) * per)
                     .select(F.col("id").alias("k"),
                             (F.col("id") * 2.0).alias("v")))
        head0 = t.current_version()

        # one micro-batch lands
        t.append(spark.range(n_base, n_base + 10_000)
                 .select(F.col("id").alias("k"),
                         (F.col("id") * 2.0).alias("v")))
        head1 = t.current_version()

        t0 = time.time()
        feed_rows = t.changes(head0, head1).count()
        feed_sec = time.time() - t0

        t0 = time.time()
        a, b = t.read(version=head1), t.read(version=head0)
        naive_rows = (a.exceptAll(b).count() + b.exceptAll(a).count())
        naive_sec = time.time() - t0

        # keyed merge touching 1% of keys
        upd = (spark.range(0, n_base, 100)
               .select(F.col("id").alias("k"), F.lit(-1.0).alias("v")))
        t.merge(upd, keys=["k"])
        head2 = t.current_version()
        t0 = time.time()
        merge_feed = t.changes(head1, head2).count()
        merge_feed_sec = time.time() - t0

        print(json.dumps({
            "n_base_rows": n_base, "n_commits": n_commits,
            "append_feed_rows": int(feed_rows),
            "append_feed_sec": round(feed_sec, 2),
            "naive_diff_rows": int(naive_rows),
            "naive_diff_sec": round(naive_sec, 2),
            "speedup_vs_naive": round(naive_sec / max(feed_sec, 1e-9), 1),
            "feed_correct": bool(feed_rows == naive_rows == 10_000),
            "merge_feed_rows": int(merge_feed),
            "merge_feed_sec": round(merge_feed_sec, 2),
            "merge_expected_rows": 2 * (n_base // 100),
        }))
    finally:
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000,
         int(sys.argv[2]) if len(sys.argv) > 2 else 50)
