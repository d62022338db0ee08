"""Data-quality expectations (operators/expectations.py)."""

import pytest

from datum_spark.operators.expectations import (
    check_expectations,
    enforce_expectations,
)

RULES = {
    "id_not_null": "id IS NOT NULL",
    "v_positive": "v > 0",
    "s_nonempty": "length(s) > 0",
}


@pytest.fixture(scope="module")
def data(spark):
    rows = [(1, 2.0, "a"), (2, -1.0, "b"), (None, 3.0, "c"),
            (4, 5.0, ""), (5, None, "e")]
    return spark.createDataFrame(rows, "id long, v double, s string")


def test_check_counts_violations(data):
    got = {r["rule"]: (r["n_violations"], r["violation_rate"])
           for r in check_expectations(data, RULES).collect()}
    assert got["id_not_null"] == (1, 0.2)
    assert got["v_positive"] == (2, 0.4)      # -1 and the NULL v
    assert got["s_nonempty"] == (1, 0.2)


def test_check_single_pass_plan(data):
    """N rules must evaluate in ONE aggregation over one scan."""
    plan = check_expectations(data, RULES)._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("Scan ") <= 1


def test_enforce_filters(data):
    good = enforce_expectations(data, RULES)
    assert sorted(r["id"] for r in good.collect()) == [1]


def test_enforce_quarantine_names_rules(data):
    good, bad = enforce_expectations(data, RULES, quarantine=True)
    assert good.count() + bad.count() == data.count()
    by_id = {r["id"]: sorted(r["failed_rules"]) for r in bad.collect()}
    assert by_id[2] == ["v_positive"]
    assert by_id[4] == ["s_nonempty"]
    assert by_id[5] == ["v_positive"]
    assert by_id[None] == ["id_not_null"]


def test_empty_rules_rejected(data):
    with pytest.raises(ValueError):
        check_expectations(data, {})
    with pytest.raises(ValueError):
        enforce_expectations(data, {})
