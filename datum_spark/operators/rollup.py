"""Hypertable-style multi-resolution time rollups.

The continuous-aggregate pattern (TimescaleDB hypertables, Druid rollup):
aggregate the raw stream ONCE at the finest grain, then derive each coarser
level from the next finer one — so a day-level rollup over 100 TB of events
costs one scan plus re-aggregation of tiny intermediate tables, not three
scans.  Works because count/sum/min/max are decomposable (re-aggregable);
avg is derived as sum/count at read time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: supported grains, finest → coarsest, with their date_trunc unit
_GRAIN_TRUNC = {"minute": "minute", "hour": "hour", "day": "day"}


def time_rollup_cascade(events: DataFrame, ts_col: str = "ts",
                        value_col: str = "value",
                        grains: list[str] = ("minute", "hour", "day"),
                        group_cols: list[str] = ("event_type",),
                        ) -> DataFrame:
    """Stacked rollup: one row per (grain, bucket, *group_cols) with
    ``n`` (count) and ``sv`` (sum of ``value_col``).

    The finest grain aggregates the raw input; every coarser grain
    aggregates the previous LEVEL's output (sum of counts, sum of sums) —
    the cascade that makes day-level rollups at 100 TB one-scan cheap.
    """
    for g in grains:
        if g not in _GRAIN_TRUNC:
            raise ValueError(f"unsupported grain: {g!r}")
    gcols = list(group_cols)

    finest = (events
              .groupBy(F.date_trunc(_GRAIN_TRUNC[grains[0]], F.col(ts_col))
                       .alias("bucket"), *gcols)
              .agg(F.count(F.lit(1)).alias("n"),
                   F.sum(value_col).alias("sv")))
    levels = [finest.withColumn("grain", F.lit(grains[0]))]
    prev = finest
    for g in grains[1:]:
        cur = (prev
               .groupBy(F.date_trunc(_GRAIN_TRUNC[g], F.col("bucket"))
                        .alias("bucket"), *gcols)
               .agg(F.sum("n").alias("n"), F.sum("sv").alias("sv")))
        levels.append(cur.withColumn("grain", F.lit(g)))
        prev = cur
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out.select("grain", "bucket", *gcols, "n", "sv")
