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


def test_complex_typed_output_flagged(spark):
    """Seeded instance of the r5 blind spot: a query returning an
    array<string> column passed diff_runner (whose _norm stringifies
    lists) while the DRIVER's pandas canonicalizer crashed on the
    unhashable cells (x100).  The schema-level guard must flag any
    array/map/struct output column."""
    from tests.diff_runner import complex_typed_columns

    sdf = spark.sql("""
        SELECT 1 AS k, array('a', 'b') AS sources,
               map('a', 1) AS m, named_struct('f', 1) AS st""")
    assert complex_typed_columns(sdf.schema) == ["sources", "m", "st"]
    # the scalar projection every query must apply (x100's fix):
    fixed = sdf.selectExpr("k", "array_join(sources, ',') AS sources")
    assert complex_typed_columns(fixed.schema) == []


def test_all_declared_queries_scalar_typed(spark):
    """No queries() entry may return a complex-typed column — build every
    plan (no execution) and check output schemas.  This is the fleet-wide
    version of the seeded test above: it would have caught x100 in r5."""
    import __spark_entry__ as entry_mod
    from tests.diff_runner import complex_typed_columns

    sf = "/root/testdata/sf0.001"
    bad = {}
    for name, fn in entry_mod.queries().items():
        cols = complex_typed_columns(fn(spark, sf).schema)
        if cols:
            bad[name] = cols
    assert bad == {}


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
