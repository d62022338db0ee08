"""Interval overlap join without a nested loop.

A naive `a.s <= b.e AND b.s <= a.e` join has no equi-key, so Spark plans
BroadcastNestedLoopJoin — O(|A|·|B|) and a driver OOM the moment neither
side fits in a broadcast. The classic fix (used by range-join frameworks
and by every time-series store): chop time into fixed buckets, explode
each interval into the buckets it covers, hash-join on the bucket, then
re-check the exact predicate.

Duplicate elimination is free: a pair overlapping k common buckets is
emitted ONLY in the canonical bucket containing `greatest(a.start,
b.start)` (the first instant both intervals are live), so no `distinct`
— and therefore no second shuffle — is needed.

Scale posture: one equi-shuffle on the bucket id; replication factor is
`interval_length / bucket` per side, so pick `bucket_us` near the median
interval length. Hot buckets (rush hour) are plain join skew — AQE's
skew-join split applies because this IS an equi-join.

Part of the "beyond the reference" pipeline surface (the reference
delegates any such predicate to its RDBMS: /root/reference/datum/
postgis/table.py assembles WHERE strings only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_overlap_join(a: DataFrame, b: DataFrame,
                          a_start: str, a_end: str,
                          b_start: str, b_end: str,
                          bucket_us: int = 3_600_000_000) -> DataFrame:
    """Join rows of ``a`` and ``b`` whose closed integer intervals
    [start, end] (microseconds, but any integer unit works) overlap.
    All four column names must be distinct. Returns each overlapping
    pair exactly once, with all columns of both inputs.

    Input contract: every interval must satisfy start <= end — Spark's
    ``sequence`` generates DESCENDING buckets for an inverted interval,
    which would silently probe the wrong buckets; validate upstream
    (e.g. via operators/expectations.py) if inversions are possible.
    """
    names = {a_start, a_end, b_start, b_end}
    if len(names) != 4:
        raise ValueError("interval column names must be distinct across "
                         f"both sides, got {sorted(names)}")
    L = F.lit(int(bucket_us))
    ab = a.withColumn("__bkt", F.explode(F.sequence(
        F.floor(F.col(a_start) / L), F.floor(F.col(a_end) / L))))
    bb = b.withColumn("__bkt", F.explode(F.sequence(
        F.floor(F.col(b_start) / L), F.floor(F.col(b_end) / L))))
    overlap = ((F.col(a_start) <= F.col(b_end))
               & (F.col(b_start) <= F.col(a_end)))
    canonical = (F.col("__bkt")
                 == F.floor(F.greatest(F.col(a_start), F.col(b_start)) / L))
    return ab.join(bb, "__bkt").filter(overlap & canonical).drop("__bkt")
