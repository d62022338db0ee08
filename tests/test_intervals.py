"""interval_overlap_join: bucketized equi-join == naive theta join."""

import pytest
from pyspark.sql import functions as F

from datum_spark.operators.intervals import interval_overlap_join


@pytest.fixture(scope="module")
def frames(spark):
    a = spark.createDataFrame(
        [(1, 0, 100), (2, 50, 60), (3, 200, 300), (4, 1000, 5000)],
        "aid int, a_s long, a_e long")
    b = spark.createDataFrame(
        [(10, 90, 210), (11, 55, 58), (12, 400, 999), (13, 5000, 5001)],
        "bid int, b_s long, b_e long")
    return a, b


def _naive(a, b):
    return a.crossJoin(b).filter(
        (F.col("a_s") <= F.col("b_e")) & (F.col("b_s") <= F.col("a_e")))


@pytest.mark.parametrize("bucket", [7, 50, 100, 10_000])
def test_matches_naive_cross_join(spark, frames, bucket):
    a, b = frames
    got = sorted((r.aid, r.bid) for r in
                 interval_overlap_join(a, b, "a_s", "a_e", "b_s", "b_e",
                                       bucket_us=bucket).collect())
    want = sorted((r.aid, r.bid) for r in _naive(a, b).collect())
    assert got == want
    # each pair exactly once even when it shares many buckets
    assert len(got) == len(set(got))


def test_touching_endpoints_overlap(spark):
    a = spark.createDataFrame([(1, 0, 10)], "aid int, a_s long, a_e long")
    b = spark.createDataFrame([(2, 10, 20)], "bid int, b_s long, b_e long")
    out = interval_overlap_join(a, b, "a_s", "a_e", "b_s", "b_e",
                                bucket_us=4).collect()
    assert [(r.aid, r.bid) for r in out] == [(1, 2)]


def test_rejects_colliding_column_names(spark, frames):
    a, _ = frames
    with pytest.raises(ValueError):
        interval_overlap_join(a, a, "a_s", "a_e", "a_s", "a_e")


def test_plan_is_equi_join_not_nested_loop(frames):
    a, b = frames
    plan = (interval_overlap_join(a, b, "a_s", "a_e", "b_s", "b_e")
            ._jdf.queryExecution().executedPlan().toString())
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
