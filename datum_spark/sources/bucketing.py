"""Bucketed tables: pre-shuffled storage for co-located joins.

At 100 TB the dominant cost of a repeated fact⋈fact join is the shuffle;
bucketing pays that shuffle ONCE at write time (rows hash-partitioned into
a fixed bucket count, sorted within buckets) so every later equi-join or
aggregation on the bucket keys runs exchange-free — Spark's sort-merge join
reads matching buckets pairwise.  Both sides must share bucket count and
keys; the catalog records the layout, which is why this goes through
``saveAsTable`` (path-only Parquet has nowhere to persist bucket metadata).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, keys: list[str] | str,
                   buckets: int = 32, path: str | None = None,
                   sort: bool = True, mode: str = "overwrite") -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) catalog table.

    ``path`` makes it an external table at that location; otherwise it
    lands in the session warehouse dir.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    writer = df.write.mode(mode).bucketBy(buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  on: list[str] | str, how: str = "inner") -> DataFrame:
    """Join two co-bucketed catalog tables (exchange-free when bucket
    layouts match)."""
    on = [on] if isinstance(on, str) else list(on)
    return spark.table(left_table).join(spark.table(right_table), on, how)
