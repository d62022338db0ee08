"""The diff harness must catch representation-level (dtype) mismatches that
value normalization erases — the x28 class of bug, where every value matched
but DuckDB's HUGEINT sum type broke the driver's hash."""

import duckdb

from tests.diff_runner import duckdb_dtype_cats, spark_dtype_cats


def test_hugeint_sum_flagged(spark):
    """SUM(BIGINT) in DuckDB is HUGEINT ('h'); a Spark BIGINT is 'i' —
    the seeded mismatch must surface as differing categories."""
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT 1::BIGINT AS v")
    d = duckdb_dtype_cats(con, "SELECT SUM(v) AS n FROM t")
    assert d["n"] == "h"
    s = spark_dtype_cats(spark.range(3).selectExpr("sum(id) AS n").schema)
    assert s["n"] == "i"
    assert s["n"] != d["n"]


def test_matching_cast_passes(spark):
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT 1::BIGINT AS v")
    d = duckdb_dtype_cats(
        con, "SELECT CAST(SUM(v) AS BIGINT) AS n FROM t")
    s = spark_dtype_cats(spark.range(3).selectExpr("sum(id) AS n").schema)
    assert s["n"] == d["n"] == "i"


def test_timestamptz_flagged(spark):
    """DuckDB's to_timestamp() yields TIMESTAMP WITH TIME ZONE ('z'); Spark
    window starts are plain TIMESTAMP ('t') — the x16/x19 class of bug must
    surface locally, not only in the driver's exact schema check."""
    con = duckdb.connect()
    d = duckdb_dtype_cats(con, "SELECT to_timestamp(300) AS w_start")
    assert d["w_start"] == "z"
    s = spark_dtype_cats(
        spark.sql("SELECT timestamp_seconds(300) AS w_start").schema)
    assert s["w_start"] == "t"
    assert s["w_start"] != d["w_start"]


def test_timestamptz_cast_passes(spark):
    con = duckdb.connect()
    d = duckdb_dtype_cats(
        con, "SELECT CAST(to_timestamp(300) AS TIMESTAMP) AS w_start")
    assert d["w_start"] == "t"


def test_common_categories_align(spark):
    con = duckdb.connect()
    d = duckdb_dtype_cats(con, """
        SELECT 1::INTEGER AS i, 1.5::DOUBLE AS f, 'x' AS s,
               DATE '2024-01-01' AS dt, TIMESTAMP '2024-01-01' AS ts,
               TRUE AS b, [1, 2] AS arr""")
    sdf = spark.sql("""
        SELECT CAST(1 AS INT) AS i, CAST(1.5 AS DOUBLE) AS f, 'x' AS s,
               DATE '2024-01-01' AS dt, TIMESTAMP '2024-01-01' AS ts,
               TRUE AS b, array(1, 2) AS arr""")
    s = spark_dtype_cats(sdf.schema)
    assert s == d
