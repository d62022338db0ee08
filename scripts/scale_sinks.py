"""Scale probe for the seeded-fold streaming sinks (SCALE.md §34
evidence).

The claim under test: `ewma_sink`'s per-batch cost is (batch size +
state size) work with CONSTANT per-key state — a key's whole history
never re-folds (that is the point of seeding the fold from state), so
batch wall stays flat as the accumulated stream grows and scales only
with the key universe.

Fixture: md5-deterministic values; B batches of K keys x P points
each, driven through the sink's foreachBatch closure directly (no
streaming machinery — the cost under test is the fold + state
overwrite).

Run: python scripts/scale_sinks.py [keys_csv] [batches]
(default 2000,8000,32000 keys; 6 batches of 8 points/key).
Prints one JSON document.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from datum_spark.session import get_session  # noqa: E402
from datum_spark.sources.snapshots import SnapshotTable  # noqa: E402
from datum_spark.streaming.stateful import ewma_sink  # noqa: E402


class _Capture:
    def __init__(self):
        self.writeStream = self
        self.fn = None

    def foreachBatch(self, fn):
        self.fn = fn
        return self

    def option(self, *a):
        return self

    def outputMode(self, *a):
        return self

    def start(self):
        return None


def batch_df(spark, keys: int, points: int, batch_no: int):
    base = (spark.range(keys * points)
            .select((F.col("id") % keys).alias("user_id"),
                    (F.col("id") / keys).cast("long").alias("i")))
    u = (F.conv(F.substring(F.md5(F.concat_ws(
            "-", F.lit("sink"), F.col("user_id"),
            F.lit(batch_no), F.col("i"))), 1, 8), 16, 10)
          .cast("double") / F.lit(4294967296.0))
    off = batch_no * points
    return base.select(
        "user_id",
        F.timestamp_seconds(F.lit(1704067200)
                            + (F.col("i") + off) * 60).alias("ts"),
        (F.col("i") + off).alias("event_id"),
        (u * 10.0).alias("value"))


def run(spark, keys: int, batches: int, points: int):
    tmp = tempfile.mkdtemp()
    state = SnapshotTable.create(spark, os.path.join(tmp, "state"))
    cap = _Capture()
    ewma_sink(cap, state, "", "user_id", "ts", "value", alpha=0.3)
    walls = []
    for b in range(batches):
        df = batch_df(spark, keys, points, b).persist()
        df.count()
        t0 = time.time()
        cap.fn(df, b)
        walls.append(round(time.time() - t0, 2))
        df.unpersist()
    n = state.read().count()
    return {"keys": keys, "points_per_batch": keys * points,
            "batch_walls_s": walls, "state_rows": n}


def main():
    key_sizes = [int(x) for x in
                 (sys.argv[1] if len(sys.argv) > 1
                  else "2000,8000,32000").split(",")]
    batches = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    spark = get_session(app_name="scale_sinks")
    out = [run(spark, k, batches, 8) for k in key_sizes]
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
