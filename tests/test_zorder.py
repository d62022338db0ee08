"""Z-order clustering (functions/zorder.py + Table.optimize(zorder=True)):
every clustered column must get tight per-file statistics, not just the
first one."""

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from datum_spark.functions.zorder import zorder_value


def test_zorder_value_locality(spark):
    """Morton property: rows close in z-value are close in BOTH columns —
    quartering the z-range must quarter each column's spread."""
    df = (spark.range(4096)
          .select((F.col("id") % 64).alias("a"),
                  (F.col("id") / 64).cast("long").alias("b")))
    z = zorder_value(df, ["a", "b"], bits_per_col=6)
    rows = z.orderBy("__z").collect()
    q = len(rows) // 4
    first_quarter = rows[:q]
    a_span = max(r["a"] for r in first_quarter) - min(r["a"]
                                                      for r in first_quarter)
    b_span = max(r["b"] for r in first_quarter) - min(r["b"]
                                                      for r in first_quarter)
    # lexicographic order would give a_span=63 (full) for any prefix;
    # z-order keeps both spans near sqrt(1/4)=1/2 of the domain
    assert a_span <= 33 and b_span <= 33


def test_zorder_validates(spark):
    df = spark.range(10).select(F.col("id").alias("a"))
    with pytest.raises(ValueError):
        zorder_value(df, ["a"])
    with pytest.raises(ValueError):
        zorder_value(df.withColumn("b", F.col("a")), ["a", "nope"])


def _file_spans(path, col_name):
    spans = []
    for f in glob.glob(path + "/part-*.parquet"):
        pf = pq.ParquetFile(f)
        col_idx = pf.schema_arrow.names.index(col_name)
        md = pf.metadata
        mn = min(md.row_group(i).column(col_idx).statistics.min
                 for i in range(md.num_row_groups))
        mx = max(md.row_group(i).column(col_idx).statistics.max
                 for i in range(md.num_row_groups))
        spans.append(mx - mn)
    return spans


def test_optimize_zorder_tightens_both_columns(tmp_db, spark):
    """After optimize(zorder=True), per-file spans must be a small
    fraction of the domain for BOTH columns (lexicographic clustering
    leaves the second column's spans at ~full domain)."""
    df = (spark.range(65536)
          .select((F.col("id") % 256).cast("double").alias("a"),
                  (F.col("id") / 256).cast("long").cast("double").alias("b")))
    tmp_db.create_table("zt", [{"name": "a", "type": "num"},
                               {"name": "b", "type": "num"}])
    tmp_db["zt"].write(df)
    tmp_db["zt"].optimize(["a", "b"], target_partitions=16, zorder=True)
    path = tmp_db._table_path("zt")
    for col in ("a", "b"):
        spans = _file_spans(path, col)
        # 16 z-files over a 256x256 grid → each file ~1/4 of each axis
        assert sum(spans) / len(spans) <= 0.55 * 255, (col, spans)
    assert tmp_db["zt"].count == 65536
