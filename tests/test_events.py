"""Event-analytics operators (operators/events.py): user features, funnel
conversion, cohort retention.  Oracle parity for the wired queries lives in
x70–x72; these tests pin semantics on hand-computable fixtures.
"""

import datetime

import pytest

from datum_spark.operators import events as events_mod

T0 = datetime.datetime(2024, 1, 1, 0, 0, 0)


def _ev(uid, minutes, etype, value=1.0):
    return (uid, T0 + datetime.timedelta(minutes=minutes), etype, value)


@pytest.fixture(scope="module")
def ev(spark):
    rows = [
        # user 1: signup then purchase 10 min later (converts)
        _ev(1, 0, "signup"), _ev(1, 10, "purchase", 5.0),
        _ev(1, 20, "view"),
        # user 2: signup, purchase too late (2h > 1h window)
        _ev(2, 0, "signup"), _ev(2, 120, "purchase", 9.0),
        # user 3: purchase BEFORE signup only → no conversion
        _ev(3, 0, "purchase", 2.0), _ev(3, 30, "signup"),
        # user 4: never signs up
        _ev(4, 5, "view"),
        # user 5: two signups; funnel anchors on the FIRST, converts at +50
        _ev(5, 0, "signup"), _ev(5, 40, "signup"),
        _ev(5, 50, "purchase", 1.5),
    ]
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, value double")


def test_user_features(ev):
    out = {r["user_id"]: r for r in events_mod.user_features(ev).collect()}
    assert out[1]["n_events"] == 3
    assert out[1]["n_types"] == 3
    assert out[1]["sum_value"] == 7.0
    assert out[1]["span_s"] == 20 * 60
    assert out[4]["n_events"] == 1
    assert out[4]["span_s"] == 0


def test_funnel_conversions(ev):
    out = {r["user_id"]: r
           for r in events_mod.funnel(ev, "signup", "purchase",
                                      within_s=3600).collect()}
    # only users who reached step A appear
    assert set(out) == {1, 2, 3, 5}
    assert out[1]["converted"] == 1 and out[1]["delay_s"] == 600
    assert out[2]["converted"] == 0 and out[2]["delay_s"] is None
    assert out[3]["converted"] == 0  # purchase preceded signup
    assert out[5]["converted"] == 1 and out[5]["delay_s"] == 3000


def test_funnel_one_row_per_user(ev):
    out = events_mod.funnel(ev, "signup", "purchase", within_s=3600)
    assert out.count() == out.select("user_id").distinct().count()


def test_retention_cohorts(spark):
    def day(uid, d):
        return (uid, T0 + datetime.timedelta(days=d), "view", 1.0)

    rows = [day(1, 0), day(1, 1), day(1, 3),
            day(2, 0), day(2, 1),
            day(3, 1), day(3, 2),
            # two events same user same day → one distinct (user, day)
            day(3, 2)]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, value double")
    out = {(str(r["cohort_day"]), r["day_offset"]): r["n_users"]
           for r in events_mod.retention_cohorts(df).collect()}
    assert out[("2024-01-01", 0)] == 2   # users 1, 2
    assert out[("2024-01-01", 1)] == 2   # both return next day
    assert out[("2024-01-01", 3)] == 1   # only user 1
    assert out[("2024-01-02", 0)] == 1   # user 3's cohort
    assert out[("2024-01-02", 1)] == 1
    assert ("2024-01-01", 2) not in out  # nobody from day-1 cohort on day 3


def test_retention_offset_cap(spark):
    rows = [(1, T0, "view", 1.0),
            (1, T0 + datetime.timedelta(days=30), "view", 1.0)]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, value double")
    out = events_mod.retention_cohorts(df, max_offset_days=14).collect()
    assert max(r["day_offset"] for r in out) == 0


def test_cuped_reduces_variance_and_recovers_effect(spark):
    """CUPED sanity on a planted experiment: y = 0.8*x + effect*arm +
    noise with a strongly predictive pre-period covariate — theta
    lands near 0.8, the variance-reduction readout is large, and
    diff_cuped is closer to the true effect than diff_raw."""
    import numpy as np
    import pandas as pd

    from datum_spark.operators.events import cuped_summary

    rng = np.random.RandomState(11)
    rows = []
    t0 = pd.Timestamp("2024-01-10")
    t1 = pd.Timestamp("2024-01-20")   # >= cut -> experiment period
    # md5 arm of each user is deterministic; compute it like the op
    import hashlib
    arm = {u: int(hashlib.md5(f"cuped-{u}".encode()).hexdigest()[:8],
                  16) % 2 for u in range(400)}
    effect = 5.0
    for u in range(400):
        x = float(rng.uniform(10, 100))
        y = 0.8 * x + effect * arm[u] + float(rng.randn())
        rows.append((u, t0, 2 * u, x))
        rows.append((u, t1, 2 * u + 1, y))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["user_id", "ts", "event_id",
                                    "value"]))
    r = cuped_summary(df, "2024-01-16 00:00:00").collect()[0]
    assert r["n_users"] == 400
    assert r["n_treat"] == sum(arm.values())
    assert 0.7 < r["theta"] < 0.9
    assert r["var_reduction_pct"] > 90.0
    assert abs(r["diff_cuped"] - effect) < abs(r["diff_raw"] - effect)
    assert abs(r["diff_cuped"] - effect) < 0.5


def test_cuped_degenerate_covariate_nulls(spark):
    """Constant pre-period covariate: var(X)=0 -> theta and
    diff_cuped NULL, raw diff still reported."""
    import pandas as pd

    from datum_spark.operators.events import cuped_summary

    t0, t1 = pd.Timestamp("2024-01-10"), pd.Timestamp("2024-01-20")
    rows = []
    for u in range(40):
        rows.append((u, t0, 2 * u, 3.0))            # constant X
        rows.append((u, t1, 2 * u + 1, float(u)))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["user_id", "ts", "event_id",
                                    "value"]))
    r = cuped_summary(df, "2024-01-16 00:00:00").collect()[0]
    assert r["theta"] is None and r["diff_cuped"] is None
    assert r["diff_raw"] is not None
