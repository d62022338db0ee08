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

from pyspark.sql import DataFrame
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
