"""Column profiling — one-pass dataset statistics (row/null/distinct
counts, min/max, numeric mean) stacked into one row per column, the
"what is in this table" step that precedes any corpus or warehouse job.

Not in the reference (its introspection stops at column names/types,
``datum/postgis/table.py`` metadata queries); north-star extension per
SURVEY §2-C (training-data pipeline operators).

Scale: a single aggregation pass computes every statistic; the stack to
long form happens on the one-row aggregate, so the data is scanned once
and the shuffle carries one row per (partition × 1).  The exact
``COUNT(DISTINCT)`` for C columns expands the shuffle C-fold (Spark's
Expand); pass ``approx=True`` to swap in ``approx_count_distinct`` (HLL,
no expand) — the right default at 100 TB where a ±2% distinct count is
always acceptable for profiling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
            T.FloatType, T.DoubleType, T.DecimalType)


def profile_columns(df: DataFrame, cols: list[str] | None = None,
                    approx: bool = False) -> DataFrame:
    """Profile ``cols`` (default: all) into one row per column:
    ``(column, n_rows, n_nulls, n_distinct, min_str, max_str, avg_num)``.

    ``min_str``/``max_str`` are the extrema cast to string AFTER
    aggregation (min of the native type, then cast — not min of the
    string cast, which would order numbers lexically); ``avg_num`` is
    NULL for non-numeric columns.
    """
    cols = list(cols) if cols is not None else list(df.columns)
    by_name = {f.name: f.dataType for f in df.schema.fields}
    missing = [c for c in cols if c not in by_name]
    if missing:
        raise ValueError(f"unknown columns: {missing}")
    distinct = (F.approx_count_distinct if approx else F.count_distinct)

    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.count(c).alias(f"__nn_{c}"),
            distinct(F.col(c)).alias(f"__nd_{c}"),
            F.min(c).cast("string").alias(f"__min_{c}"),
            F.max(c).cast("string").alias(f"__max_{c}"),
            (F.avg(c) if isinstance(by_name[c], _NUMERIC)
             else F.lit(None).cast("double")).alias(f"__avg_{c}"),
        ]
    one = df.agg(*aggs)

    # stack the single aggregate row to long form (no data re-scan)
    parts = ", ".join(
        f"'{c}', __n - __nn_{c}, __nd_{c}, __min_{c}, __max_{c}, __avg_{c}"
        for c in cols)
    return one.selectExpr(
        "__n as n_rows",
        f"stack({len(cols)}, {parts}) as "
        "(column, n_nulls, n_distinct, min_str, max_str, avg_num)"
    ).select("column", "n_rows", "n_nulls", "n_distinct",
             "min_str", "max_str", "avg_num")


def distribution_psi(df: DataFrame, value_col: str, group_col: str,
                     group_a: str, group_b: str,
                     lo: float = 0.0, hi: float = 1000.0,
                     buckets: int = 10) -> DataFrame:
    """Population Stability Index between two slices of one column — the
    standard drift monitor between corpus snapshots / sources / train-vs-
    serve populations (PSI < 0.1 stable, 0.1–0.25 drifting, > 0.25
    shifted).

    Fixed-width ``width_bucket`` bins over ``[lo, hi)`` with clamped end
    buckets (0 and ``buckets``+1), exactly the x93 histogram contract —
    fixed bounds keep the binning identical across engines, runs and
    data scales, which a quantile-derived binning cannot.  Laplace
    smoothing (+0.5 per bin) keeps ``ln`` finite for empty bins without
    disturbing well-populated ones.

    Returns one row per bucket: both shares (``pa``, ``pb``) and the
    bucket's PSI contribution; ``SUM(psi)`` over the result is the
    index.  Plan: one map-side bucket expression, one partial-aggregated
    groupBy of ≤ ``buckets``+2 × 2 rows per task, a tiny pivot — nothing
    data-proportional leaves the mappers, so it runs unchanged at 100 TB.
    """
    g = F.col(group_col)
    counts = (df.filter(g.isin([group_a, group_b]))
                .select(psi_bucket(value_col, lo, hi, buckets)
                         .alias("bucket"), g.alias("__g"))
                .groupBy("bucket")
                .agg(F.sum(F.when(F.col("__g") == group_a, 1).otherwise(0))
                      .alias("__ca"),
                     F.sum(F.when(F.col("__g") == group_b, 1).otherwise(0))
                      .alias("__cb")))
    return psi_from_bucket_counts(counts, lo, hi, buckets)


def psi_bucket(value_col, lo: float, hi: float, buckets: int):
    """The fixed-width PSI bucket expression (clamped end buckets 0 and
    ``buckets``+1) — shared by :func:`distribution_psi`, the streaming
    ``psi_sink`` and any consumer that pre-aggregates counts, so every
    path bins identically."""
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    return (F.when(v < lo, 0)
             .when(v >= hi, buckets + 1)
             .otherwise(F.width_bucket(v, F.lit(lo), F.lit(hi),
                                       F.lit(buckets))))


def psi_from_bucket_counts(counts: DataFrame, lo: float, hi: float,
                           buckets: int) -> DataFrame:
    """The PSI formula over an already-aggregated bucket count table
    ``(bucket, __ca, __cb)`` — extracted so batch
    (:func:`distribution_psi`) and streaming (``stateful.psi_sink``)
    compute the IDENTICAL smoothed index from the same integer counts
    (structural parity, the ingest-gate discipline).  Totals run over
    the ≤ ``buckets``+2-row table — bounded input, so the single-task
    window is safe at any data scale."""
    width = (hi - lo) / buckets
    ta = F.sum("__ca").over(Window.partitionBy())
    tb = F.sum("__cb").over(Window.partitionBy())
    nb = F.lit(float(buckets + 2))
    pa = (F.col("__ca") + 0.5) / (ta + 0.5 * nb)
    pb = (F.col("__cb") + 0.5) / (tb + 0.5 * nb)
    return (counts
            .withColumn("pa", pa).withColumn("pb", pb)
            .withColumn("psi", (F.col("pa") - F.col("pb"))
                               * F.log(F.col("pa") / F.col("pb")))
            .select("bucket",
                    (F.lit(lo) + (F.col("bucket") - 1) * width).alias("lo"),
                    (F.lit(lo) + F.col("bucket") * width).alias("hi"),
                    "__ca", "__cb", "pa", "pb", "psi"))
