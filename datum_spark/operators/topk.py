"""Top-k operators.

Global top-k maps to ``orderBy().limit(k)`` — Spark plans this as
``TakeOrderedAndProject`` (per-partition heap + driver merge: no full sort,
no shuffle of the full table), which is exactly the 100 TB-safe strategy.

Per-group top-k uses a ranking window; the single shuffle is on the group
key, and AQE handles skewed groups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def top_k(df: DataFrame, order_by, k: int) -> DataFrame:
    """Global top-k rows. ``order_by``: Column / list of Columns."""
    cols = order_by if isinstance(order_by, (list, tuple)) else [order_by]
    return df.orderBy(*cols).limit(k)


def top_k_per_group(df: DataFrame, group_by, order_by, k: int,
                    rank_col: str = "rnk", keep_rank: bool = True) -> DataFrame:
    """Top-k rows per group via ``row_number`` over a partitioned window."""
    group = group_by if isinstance(group_by, (list, tuple)) else [group_by]
    order = order_by if isinstance(order_by, (list, tuple)) else [order_by]
    w = Window.partitionBy(*group).orderBy(*order)
    out = (df.withColumn(rank_col, F.row_number().over(w))
             .filter(F.col(rank_col) <= k))
    return out if keep_rank else out.drop(rank_col)
