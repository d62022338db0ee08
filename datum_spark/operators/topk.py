"""Top-k operators.

Global top-k maps to ``orderBy().limit(k)`` — Spark plans this as
``TakeOrderedAndProject`` (per-partition heap + driver merge: no full sort,
no shuffle of the full table), which is exactly the 100 TB-safe strategy.

Per-group top-k prunes each scan partition to its LOCAL top-k per group
first (a partition-local window on ``spark_partition_id`` — no exchange),
so the one shuffle on the group key carries at most ``k × partitions``
rows per group instead of whole groups.  With low-cardinality group keys
(5 market segments, 20 sources) the naive group-partitioned window funnels
1/|groups| of the table through one task; after pruning, that task sees
``k × partitions`` rows regardless of data size — the same
"never let a task's input grow with the table" rule as the distributed
prefix-sum rank rewrites.  Lossless: every row of the true global top-k
is by definition inside its own partition's local top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def top_k(df: DataFrame, order_by, k: int) -> DataFrame:
    """Global top-k rows. ``order_by``: Column / list of Columns."""
    cols = order_by if isinstance(order_by, (list, tuple)) else [order_by]
    return df.orderBy(*cols).limit(k)


def top_k_per_group(df: DataFrame, group_by, order_by, k: int,
                    rank_col: str = "rnk", keep_rank: bool = True,
                    local_prune: bool = True) -> DataFrame:
    """Top-k rows per group: partition-local prune, then one ranking
    window on the group key (see module docstring for why the prune is
    both lossless and the thing that makes low-cardinality groups safe
    at scale).  ``local_prune=False`` skips the prune (marginally less
    work when groups are known to be high-cardinality and small)."""
    group = group_by if isinstance(group_by, (list, tuple)) else [group_by]
    order = order_by if isinstance(order_by, (list, tuple)) else [order_by]
    if local_prune:
        wl = (Window.partitionBy(F.spark_partition_id(),
                                 *[F.col(g) if isinstance(g, str) else g
                                   for g in group])
                    .orderBy(*order))
        df = (df.withColumn("__lrn", F.row_number().over(wl))
                .filter(F.col("__lrn") <= k).drop("__lrn"))
    w = Window.partitionBy(*group).orderBy(*order)
    out = (df.withColumn(rank_col, F.row_number().over(w))
             .filter(F.col(rank_col) <= k))
    return out if keep_rank else out.drop(rank_col)
