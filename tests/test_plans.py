"""Physical-plan hygiene: the properties that decide whether a plan
survives a 100× scale-up, asserted mechanically via plans/inspect.py.

- filters reach the Parquet scan (PushedFilters)
- scans read only projected columns (ReadSchema)
- small dimension tables broadcast in the star join (no full shuffle)
- expression-heavy operators stay in whole-stage codegen
"""

from datum_spark import tierb
from datum_spark.plans.inspect import (
    assert_pushed_filters,
    explain_str,
    scan_columns,
)

SF = "/root/testdata/sf0.001"


def test_read_pushes_filter_to_scan(smoke_db):
    df = smoke_db["lineitem"].query(
        fields=["l_orderkey", "l_quantity"], where="l_quantity > 30")
    assert_pushed_filters(df, "l_quantity")


def test_read_prunes_columns(smoke_db):
    df = smoke_db["lineitem"].query(fields=["l_orderkey", "l_quantity"])
    cols = scan_columns(df)
    assert set(cols) == {"l_orderkey", "l_quantity"}, cols


def test_q03_predicates_pushed(spark):
    df = tierb.QUERIES["q03_predicates"][0](spark, SF)
    assert_pushed_filters(df, "l_quantity", "l_shipdate", "l_tax")


def test_q10_star_join_broadcasts_dims(spark):
    """TPC-H Q5 skeleton: nation/region (and customer at this SF) must come
    in as broadcast joins, not shuffle exchanges on the fact table."""
    plan = explain_str(tierb.QUERIES["q10_star_join"][0](spark, SF))
    assert "BroadcastHashJoin" in plan, plan[:2000]


def test_q12_agg_partial_then_final(spark):
    """TPC-H Q1: hash aggregate must be partial+final (map-side combine),
    visible as two HashAggregate nodes around the exchange."""
    plan = explain_str(tierb.QUERIES["q12_groupby_agg"][0](spark, SF))
    assert plan.count("HashAggregate") >= 2, plan[:2000]


def test_q12_stays_in_codegen(spark):
    # AQE finalizes the physical plan only at execution; run the query, then
    # read the final adaptive plan
    df = tierb.QUERIES["q12_groupby_agg"][0](spark, SF)
    df.collect()
    plan = explain_str(df, mode="simple")
    # codegen'd operators carry the *(n) stage marker in simple mode
    import re
    assert "isFinalPlan=true" in plan and re.search(r"\*\(\d+\)", plan), \
        plan[:2000]


def test_count_prunes_to_zero_columns(smoke_db):
    """count() should not read data columns at all (metadata/row-group
    counts): ReadSchema is struct<>."""
    df = smoke_db["lineitem"].df().groupBy().count()
    assert scan_columns(df) == [], scan_columns(df)
