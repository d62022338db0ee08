"""Scale probe for the time-series folds (SCALE.md §32 evidence).

The claim under test: `ewma_summary` / `cusum_summary` cost ONE hash
shuffle on the series key plus an O(n)-per-key JVM fold — wall should
grow ~linearly in total points whether the growth comes from MORE KEYS
(the 100 TB axis: entities partition freely) or LONGER SERIES (the
per-key memory bound: a key's points must fit one task, the same
contract as sessionization), with no pair blowup and no Python stage.

Fixture: K keys x L points of md5-deterministic values with
per-key-phase-shifted level jumps (so CUSUM has real work to do);
reruns are bit-identical.

Run: python scripts/scale_timeseries.py [keys_csv] [len_csv]
(defaults 2000,8000,32000 keys at L=64, and 64,256,1024 points at
K=2000).  Prints one JSON document.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from datum_spark.operators.timeseries import (  # noqa: E402
    cusum_summary,
    ewma_summary,
)
from datum_spark.session import get_session  # noqa: E402


def series(spark, keys: int, length: int):
    """keys x length synthetic points: value = md5-uniform noise plus
    a +8 level shift after each key's (key % length) position."""
    base = (spark.range(keys * length)
            .select((F.col("id") % keys).alias("k"),
                    (F.col("id") / keys).cast("long").alias("i")))
    u = (F.conv(F.substring(F.md5(F.concat_ws(
            "-", F.lit("tscale"), F.col("k"), F.col("i"))), 1, 8),
            16, 10).cast("double") / F.lit(4294967296.0))
    shift = F.when(F.col("i") > (F.col("k") % length), F.lit(8.0)) \
             .otherwise(F.lit(0.0))
    return base.select(
        "k",
        F.timestamp_seconds(F.lit(1704067200) + F.col("i") * 60)
         .alias("ts"),
        F.col("i").alias("event_id"),
        (u * 4.0 + shift).alias("value"))


def run(spark, keys: int, length: int):
    df = series(spark, keys, length).persist()
    df.count()
    t0 = time.time()
    e = ewma_summary(df, "k", "ts", "value")
    ne = e.count()
    t1 = time.time()
    c = cusum_summary(df, "k", "ts", "value")
    alarms = c.agg(F.sum("n_alarms")).first()[0]
    t2 = time.time()
    df.unpersist()
    return {"keys": keys, "len": length, "points": keys * length,
            "ewma_sec": round(t1 - t0, 2), "ewma_rows": ne,
            "cusum_sec": round(t2 - t1, 2), "alarms": int(alarms)}


def main():
    key_sizes = [int(x) for x in
                 (sys.argv[1] if len(sys.argv) > 1
                  else "2000,8000,32000").split(",")]
    lens = [int(x) for x in
            (sys.argv[2] if len(sys.argv) > 2
             else "64,256,1024").split(",")]
    spark = get_session(app_name="scale_timeseries")
    out = {"more_keys_L64": [run(spark, k, 64) for k in key_sizes],
           "longer_series_K2000": [run(spark, 2000, n) for n in lens]}
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
