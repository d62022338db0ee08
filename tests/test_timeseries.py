"""Unit tests for operators/timeseries.py: EWMA folds (pandas
ewm(adjust=False) parity), CUSUM changepoint screen (hand-replayed
trajectory), degenerate-series guards, and the single-shuffle/no-
Python plan shape."""

import numpy as np
import pandas as pd
import pytest

from datum_spark.operators import timeseries as ts


@pytest.fixture(scope="module")
def series_df(spark):
    rows = []
    rng = np.random.RandomState(7)
    for uid in (1, 2, 3):
        base = 10.0 * uid
        for i in range(40):
            v = base + rng.randn()
            if uid == 2 and i >= 25:
                v += 8.0                      # injected level shift
            rows.append((uid,
                         pd.Timestamp("2024-01-01")
                         + pd.Timedelta(minutes=i), i, float(v)))
    rows.append((4, pd.Timestamp("2024-01-01"), 0, 5.0))   # single point
    rows += [(5, pd.Timestamp("2024-01-01") + pd.Timedelta(minutes=i),
              i, 7.0) for i in range(5)]                   # constant
    rows.append((1, pd.Timestamp("2024-01-02"), 99, None))  # null value
    pdf = pd.DataFrame(rows,
                       columns=["user_id", "ts", "event_id", "value"])
    return pdf, spark.createDataFrame(pdf)


def _pandas_ewm(pdf, uid, alpha=0.3):
    s = (pdf[(pdf.user_id == uid) & pdf.value.notnull()]
         .sort_values(["ts", "event_id"]).value)
    return s.values, s.ewm(alpha=alpha, adjust=False).mean().values


def test_ewma_summary_matches_pandas(series_df):
    pdf, df = series_df
    out = (ts.ewma_summary(df, "user_id", "ts", "value", alpha=0.3)
             .toPandas().set_index("user_id"))
    for uid in (1, 2, 3):
        x, e = _pandas_ewm(pdf, uid)
        assert out.loc[uid, "n_events"] == len(x)
        assert out.loc[uid, "ewma_last"] == pytest.approx(e[-1], abs=1e-6)
        mae = np.abs(x[1:] - e[:-1]).mean()
        assert out.loc[uid, "mae_1step"] == pytest.approx(mae, abs=1e-6)


def test_ewma_summary_single_point_null_mae(series_df):
    _, df = series_df
    out = (ts.ewma_summary(df, "user_id", "ts", "value")
             .toPandas().set_index("user_id"))
    assert out.loc[4, "n_events"] == 1
    assert out.loc[4, "ewma_last"] == 5.0
    assert pd.isna(out.loc[4, "mae_1step"])


def test_ewma_per_row_matches_pandas(series_df):
    pdf, df = series_df
    p = (ts.ewma(df, "user_id", "ts", "value", alpha=0.3)
           .filter("user_id = 2").orderBy("ts").toPandas())
    x, e = _pandas_ewm(pdf, 2)
    assert len(p) == len(x)
    assert np.allclose(p["value"].values, x)
    assert np.allclose(p["ewma"].values, e)


def test_ewma_drops_null_values(series_df):
    pdf, df = series_df
    out = (ts.ewma_summary(df, "user_id", "ts", "value")
             .toPandas().set_index("user_id"))
    # user 1 has one NULL point; it must not count or perturb the fold
    assert out.loc[1, "n_events"] == 40


def test_cusum_matches_reference_trajectory(series_df):
    pdf, df = series_df
    out = (ts.cusum_summary(df, "user_id", "ts", "value")
             .toPandas().set_index("user_id"))
    x = (pdf[(pdf.user_id == 2) & pdf.value.notnull()]
         .sort_values(["ts", "event_id"]).value.values)
    mu, sd = x.mean(), x.std(ddof=1)
    g, al, fi, gm = 0.0, 0, 0, 0.0
    for i, v in enumerate(x, 1):
        g = max(0.0, g + (v - mu) / sd - 0.5)
        if g > 4.0:
            al += 1
            if fi == 0:
                fi = i
        gm = max(gm, g)
    assert out.loc[2, "n_alarms"] == al and al > 0
    assert out.loc[2, "first_alarm"] == fi
    assert out.loc[2, "g_max"] == pytest.approx(gm, abs=1e-6)


def test_cusum_stable_series_no_alarms(series_df):
    _, df = series_df
    out = (ts.cusum_summary(df, "user_id", "ts", "value")
             .toPandas().set_index("user_id"))
    for uid in (1, 3):
        assert out.loc[uid, "n_alarms"] == 0
        assert pd.isna(out.loc[uid, "first_alarm"])


def test_cusum_degenerate_series_guarded(series_df):
    _, df = series_df
    out = (ts.cusum_summary(df, "user_id", "ts", "value")
             .toPandas().set_index("user_id"))
    for uid in (4, 5):                      # n=1 and sigma=0
        assert out.loc[uid, "n_alarms"] == 0
        assert pd.isna(out.loc[uid, "first_alarm"])
        assert pd.isna(out.loc[uid, "g_max"])


def test_plan_single_shuffle_no_python(series_df):
    _, df = series_df
    for frame in (ts.ewma_summary(df, "user_id", "ts", "value"),
                  ts.cusum_summary(df, "user_id", "ts", "value")):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        # one hash-partition exchange for the key groupBy (plus the
        # display orderBy's range exchange); never a Python eval
        assert "PythonUDF" not in plan and "BatchEvalPython" not in plan
        assert plan.count("Exchange hashpartitioning") == 1
