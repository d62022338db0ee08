"""Corpus-ordering operators: the "what order does the model see the data"
half of a training pipeline (the sampling half lives in ``sampling.py``).

All four operators are deterministic pure functions of the data — rerunning
on a different cluster size, partitioning, or day reproduces the same epoch
byte-for-byte, which is what makes training runs comparable.  Ordering keys
come from :func:`datum_spark.operators.sampling.md5_bucket`, so membership
and position are re-derivable by any md5-capable engine (the oracle checks
do exactly that in SQL).

Scale posture (100 TB): global positions use the same **distributed prefix
sum** as ``packing.py`` — range-partition on the order key, cumulate the
tiny per-partition counts driver-side, add the offset to a within-partition
``row_number`` — never a single-partition ``Window.orderBy``.
``token_budget_sample`` and ``quality_percentile_filter`` are one hash
exchange on the group key + a window.  In production the ordered epoch is
written straight to parquet, never collected.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .sampling import md5_bucket


def _global_position(df: DataFrame, order_cols: list[Column],
                     out_col: str,
                     num_partitions: int | None = None,
                     size_col: str | None = None) -> DataFrame:
    """0-based global rank by ``order_cols`` (must be a total order) as a
    distributed prefix sum: range partition → per-partition counts (one row
    each, the only driver-side data) → offset + local row_number.

    ``size_col`` attaches the total row count (already known from the
    offsets pass — saves consumers a separate ``count()`` job for
    percent-rank-style denominators)."""
    from ..session import default_parallelism
    from ..util import retain_cache

    n = num_partitions or default_parallelism()
    d = retain_cache(df.repartitionByRange(n, *order_cols)
                       .withColumn("__pid", F.spark_partition_id()))
    counts = {r["__pid"]: r["c"]
              for r in d.groupBy("__pid").agg(F.count(F.lit(1)).alias("c"))
                        .collect()}
    rows, acc = [], 0
    for pid in sorted(counts):
        rows.append((pid, acc))
        acc += counts[pid]
    # broadcast-join the offsets rather than compiling a per-partition
    # when-chain: at cluster scale (10k partitions) the chain becomes a
    # 10k-deep expression tree; the join is O(1) plan size
    spark = df.sparkSession
    offsets = F.broadcast(spark.createDataFrame(
        rows or [(0, 0)], "__pid int, __off long"))
    w = Window.partitionBy("__pid").orderBy(*order_cols)
    out = (d.join(offsets, "__pid", "left")
            .withColumn(out_col,
                        (F.row_number().over(w) - F.lit(1)
                         + F.coalesce(F.col("__off"), F.lit(0)))
                        .cast("long"))
            .drop("__pid", "__off"))
    if size_col is not None:
        out = out.withColumn(size_col, F.lit(acc).cast("long"))
    return out


def grouped_global_position(df: DataFrame, group_cols: list[str],
                            order_cols: list[Column], out_col: str,
                            size_col: str | None = None,
                            num_partitions: int | None = None) -> DataFrame:
    """0-based rank of each row WITHIN its group by ``order_cols``, without
    funneling whole groups through single window tasks.

    ``Window.partitionBy(group)`` is scale-safe only when groups are small;
    for LOW-cardinality groups (a handful of segments over billions of
    rows) each group becomes one task.  This spelling range-partitions on
    ``(group, order)``, collects the per-(partition, group) counts (bounded
    by partitions + groups — small exactly when this path is needed),
    broadcast-joins the cumulative offsets back, and adds a
    within-partition row_number.  High-cardinality groups should keep
    using ``Window.partitionBy``.

    ``order_cols`` must be a total order within each group.  If
    ``size_col`` is given, the group's total row count is attached too
    (for ntile/percentile math downstream).
    """
    from ..session import default_parallelism
    from ..util import retain_cache

    n = num_partitions or default_parallelism()
    gcols = [F.col(c) for c in group_cols]
    d = retain_cache(df.repartitionByRange(n, *gcols, *order_cols)
                       .withColumn("__pid", F.spark_partition_id()))
    pairs = (d.groupBy("__pid", *group_cols)
              .agg(F.count(F.lit(1)).alias("__c")).collect())
    by_group: dict[tuple, list] = {}
    for r in pairs:
        key = tuple(r[c] for c in group_cols)
        by_group.setdefault(key, []).append((r["__pid"], r["__c"]))
    rows = []
    for key, lst in by_group.items():
        total = sum(c for _, c in lst)
        acc = 0
        for pid, c in sorted(lst):
            rows.append((*key, pid, acc, total))
            acc += c
    spark = df.sparkSession
    off_schema = (d.select(*group_cols).schema.add("__pid", "integer")
                   .add("__off", "long").add("__gn", "long"))
    odf = spark.createDataFrame(rows, off_schema)
    # null-safe join keys: a plain equi-join would silently drop rows
    # whose group value is NULL (NULL never equals NULL), so rename the
    # offset side and join with eqNullSafe per group column
    renamed = {c: f"__og{i}" for i, c in enumerate(group_cols)}
    for c, rc in renamed.items():
        odf = odf.withColumnRenamed(c, rc)
    offsets = F.broadcast(odf.withColumnRenamed("__pid", "__opid"))
    cond = F.col("__pid") == F.col("__opid")
    for c, rc in renamed.items():
        cond = cond & F.col(c).eqNullSafe(F.col(rc))
    w = Window.partitionBy("__pid", *group_cols).orderBy(*order_cols)
    out = (d.join(offsets, cond)
            .withColumn(out_col,
                        (F.row_number().over(w) - F.lit(1)
                         + F.col("__off")).cast("long")))
    if size_col is not None:
        out = out.withColumn(size_col, F.col("__gn"))
    return out.drop("__pid", "__opid", "__off", "__gn", *renamed.values())


def epoch_shuffle(df: DataFrame, key_col: str, epoch: int = 0,
                  out_col: str = "position") -> DataFrame:
    """Deterministic global shuffle for one training epoch.

    Every row gets a position ``0..n-1`` ordered by
    ``md5(epoch-<epoch>-<key>)`` (ties broken by the key itself, so the
    order is total even on bucket collisions).  Different ``epoch`` values
    give independent permutations; the same epoch always gives the same one.
    """
    b = md5_bucket(F.col(key_col), salt=f"epoch-{epoch}").alias("__b")
    d = df.withColumn("__b", b)
    out = _global_position(d, [F.col("__b"), F.col(key_col)], out_col)
    return out.drop("__b")


def interleave_sources(df: DataFrame, source_col: str = "source",
                       key_col: str = "doc_id", epoch: int = 0,
                       out_col: str = "position") -> DataFrame:
    """Round-robin interleaving across sources: the k-th document of each
    source lands in the k-th block of the epoch, so a training stream never
    sees a long run of one source even when source sizes are skewed.

    Within a source, order is the deterministic per-epoch shuffle of
    :func:`epoch_shuffle`; globally, position sorts by (round, source).
    """
    b = md5_bucket(F.col(key_col), salt=f"epoch-{epoch}")
    per_src = Window.partitionBy(source_col).orderBy(b, F.col(key_col))
    rounds = df.withColumn("__round", F.row_number().over(per_src))
    out = _global_position(
        rounds, [F.col("__round"), F.col(source_col), F.col(key_col)],
        out_col)
    return out.drop("__round")


def token_budget_sample(df: DataFrame, budget: int,
                        token_col: str = "n_tokens",
                        group_col: str = "source",
                        key_col: str = "doc_id",
                        salt: str = "budget") -> DataFrame:
    """Keep a deterministic prefix of each group worth at most ``budget``
    tokens: documents are ordered by their md5 bucket (an unbiased sample
    of the group) and taken while the running token total stays within
    budget.  The standard "N billion tokens per domain" selection, as a
    pure function of the data.

    Adds ``cum_tokens`` (running total including the row itself).
    """
    b = md5_bucket(F.col(key_col), salt=salt)
    w = (Window.partitionBy(group_col).orderBy(b, F.col(key_col))
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    out = df.withColumn("cum_tokens", F.sum(token_col).over(w))
    return out.filter(F.col("cum_tokens") <= budget)


def quality_percentile_filter(df: DataFrame, metric_col: str,
                              keep_top: float = 0.5,
                              group_col: str = "lang",
                              key_col: str = "doc_id") -> DataFrame:
    """Keep the top ``keep_top`` fraction of each group by a quality
    metric — per-group percentile cutoffs rather than one global threshold,
    so low-resource languages are not wiped out by a cutoff tuned on the
    dominant one.

    Rank is ``percent_rank`` over (metric DESC, key) — the key tie-break
    makes the kept set deterministic when metric values repeat.  Adds
    ``pctile`` (0 = best in group).
    """
    if not 0.0 < keep_top <= 1.0:
        raise ValueError("keep_top must be in (0, 1]")
    w = Window.partitionBy(group_col).orderBy(F.col(metric_col).desc(),
                                              F.col(key_col))
    out = df.withColumn("pctile", F.percent_rank().over(w))
    return out.filter(F.col("pctile") <= keep_top)
