"""Sessionization and rolling-window semantics (operators/timeseries.py)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from datawarehousefinal_spark.operators.timeseries import (
    rolling_daily_stats,
    session_stats,
    sessionize,
)


def _ts(minute: int, second: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute, second)


def test_sessionize_gap_semantics(spark):
    # Gaps: 60 s (in), exactly 120 s (in — boundary stays in-session),
    # 121 s (out — strict >).
    rows = [
        ("u1", _ts(0, 0), 1),
        ("u1", _ts(1, 0), 2),      # +60 s      -> session 1
        ("u1", _ts(3, 0), 3),      # +120 s ==  -> session 1
        ("u1", _ts(5, 1), 4),      # +121 s >   -> session 2
        ("u2", _ts(0, 0), 5),      # other entity, own numbering
    ]
    df = spark.createDataFrame(rows, "user string, ts timestamp, eid long")
    out = sessionize(df, "user", "ts", gap_seconds=120, order_cols=("eid",))
    got = {r["eid"]: r["session_seq"] for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 2, 5: 1}


def test_sessionize_tie_break_deterministic(spark):
    # Two events at the identical timestamp: order_cols decides the order,
    # and both land in the same session regardless.
    rows = [("u", _ts(0), 2), ("u", _ts(0), 1), ("u", _ts(10), 3)]
    df = spark.createDataFrame(rows, "user string, ts timestamp, eid long")
    out = sessionize(df, "user", "ts", gap_seconds=60, order_cols=("eid",))
    got = {r["eid"]: r["session_seq"] for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 2}


def test_session_stats_rollup(spark):
    rows = [
        ("u1", _ts(0, 0), 1),
        ("u1", _ts(1, 30), 2),
        ("u1", _ts(30, 0), 3),  # new session
    ]
    df = spark.createDataFrame(rows, "user string, ts timestamp, eid long")
    out = session_stats(df, "user", "ts", gap_seconds=120, order_cols=("eid",))
    got = {r["session_seq"]: r for r in out.collect()}
    assert got[1]["n_events"] == 2
    assert got[1]["duration_secs"] == 90.0
    assert got[1]["session_start"] == _ts(0, 0)
    assert got[1]["session_end"] == _ts(1, 30)
    assert got[2]["n_events"] == 1
    assert got[2]["duration_secs"] == 0.0


def test_rolling_daily_no_phantom_zeros(spark):
    # Days 1, 2, 10: the gap must NOT pull day 1/2 into day 10's 7-day
    # frame, and absent days contribute nothing (standard RANGE semantics).
    rows = [
        ("a", dt.datetime(2024, 1, 1, 12)),
        ("a", dt.datetime(2024, 1, 1, 13)),
        ("a", dt.datetime(2024, 1, 2, 12)),
        ("a", dt.datetime(2024, 1, 10, 12)),
    ]
    df = spark.createDataFrame(rows, "g string, ts timestamp")
    out = rolling_daily_stats(df, "g", "ts", window_days=7)
    got = {r["day"].isoformat(): (r["n"], r["rolling_sum"], r["rolling_avg"])
           for r in out.collect()}
    assert got == {
        "2024-01-01": (2, 2, 2.0),
        "2024-01-02": (1, 3, 1.5),
        "2024-01-10": (1, 1, 1.0),
    }


def test_session_stats_single_shuffle_plan(spark, sf_dir):
    """The window partitioning is reused by the groupBy: exactly one
    Exchange in the whole plan (the 100 TB contract of the operator)."""
    from datawarehousefinal_spark.sources.testdata import load_table

    events = load_table(spark, sf_dir, "events")
    out = session_stats(
        events, "user_id", "ts", gap_seconds=21_600, order_cols=("event_id",)
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def test_rolling_daily_aggregates_before_window(spark, sf_dir):
    """The window input must be the aggregated daily frame, not raw events:
    the plan's HashAggregate sits below the Window node."""
    from datawarehousefinal_spark.sources.testdata import load_table

    events = load_table(spark, sf_dir, "events")
    out = rolling_daily_stats(events, "event_type", "ts", window_days=7)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan and "HashAggregate" in plan
    assert plan.index("Window") < plan.index("HashAggregate"), plan


def test_gap_fill_interpolate_edges_and_midpoints(spark):
    from datawarehousefinal_spark.operators.timeseries import gap_fill_interpolate
    import datetime as dt

    rows = [
        ("a", dt.date(2024, 1, 1), 10.0),
        ("a", dt.date(2024, 1, 5), 30.0),   # 4-day gap: 15, 20, 25
        ("a", dt.date(2024, 1, 7), 10.0),   # 2-day gap: 20
        ("b", dt.date(2024, 2, 1), 7.0),    # single observation: no spine growth
    ]
    df = spark.createDataFrame(rows, "g string, d date, v double")
    out = {
        (r["g"], r["d"]): (r["v"], r["was_observed"])
        for r in gap_fill_interpolate(df, "g", "d", "v").collect()
    }
    assert len(out) == 7 + 1  # a: 7 consecutive days, b: 1 day
    assert out[("a", dt.date(2024, 1, 2))] == (15.0, False)
    assert out[("a", dt.date(2024, 1, 3))] == (20.0, False)
    assert out[("a", dt.date(2024, 1, 4))] == (25.0, False)
    assert out[("a", dt.date(2024, 1, 6))] == (20.0, False)
    assert out[("a", dt.date(2024, 1, 5))] == (30.0, True)
    assert out[("b", dt.date(2024, 2, 1))] == (7.0, True)


def test_gap_fill_single_shuffle_per_side(spark):
    """Spine build, join, and window all share the group hash
    partitioning — no cartesian, no extra exchanges beyond the
    group-key shuffles."""
    from datawarehousefinal_spark.operators.timeseries import gap_fill_interpolate
    from datawarehousefinal_spark.plans.audit import physical_plan
    import datetime as dt

    df = spark.createDataFrame(
        [("a", dt.date(2024, 1, 1), 1.0)], "g string, d date, v double"
    )
    plan = physical_plan(gap_fill_interpolate(df, "g", "d", "v"))
    assert "CartesianProduct" not in plan


def test_correlation_matrix_matches_numpy(spark):
    import numpy as np
    from datawarehousefinal_spark.operators.profile import correlation_matrix

    rng = np.random.default_rng(7)
    X = rng.normal(size=(200, 3))
    X[:, 1] = X[:, 0] * 0.5 + X[:, 1] * 0.1  # strong correlation
    df = spark.createDataFrame(
        [(float(a), float(b), float(c)) for a, b, c in X], "x double, y double, z double"
    )
    got = {
        (r["col_a"], r["col_b"]): r["corr"]
        for r in correlation_matrix(df, ["x", "y", "z"]).collect()
    }
    assert set(got) == {("x", "y"), ("x", "z"), ("y", "z")}
    ref = np.corrcoef(X.T)
    assert abs(got[("x", "y")] - ref[0, 1]) < 1e-9
    assert abs(got[("y", "z")] - ref[1, 2]) < 1e-9


def test_correlation_matrix_rejects_single_column(spark):
    import pytest
    from datawarehousefinal_spark.operators.profile import correlation_matrix

    df = spark.createDataFrame([(1.0,)], "x double")
    with pytest.raises(ValueError):
        correlation_matrix(df, ["x"])


def test_ewma_daily_matches_reference_formula(spark):
    from datawarehousefinal_spark.operators.timeseries import ewma_daily
    from datetime import datetime

    rows = [
        ("g", datetime(2024, 1, 1, 5), 10.0),
        ("g", datetime(2024, 1, 1, 9), 20.0),   # day1 total 30
        ("g", datetime(2024, 1, 3, 1), 6.0),    # gap day: Jan 2 missing
        ("g", datetime(2024, 1, 4, 1), 8.0),
    ]
    df = spark.createDataFrame(rows, "g string, ts timestamp, value double")
    out = {
        r["day"].isoformat(): (r["v"], r["ewma"])
        for r in ewma_daily(df, "g", "ts", "value", alpha=0.5, window_days=30).collect()
    }
    # weights 0.5^age over PRESENT days only
    assert out["2024-01-01"] == (30.0, 30.0)
    # Jan 3: days present: Jan1 (age 2, w .25), Jan3 (age 0, w 1)
    exp3 = (30 * 0.25 + 6 * 1.0) / 1.25
    assert abs(out["2024-01-03"][1] - exp3) < 1e-9
    # Jan 4: Jan1 w .125, Jan3 w .5, Jan4 w 1
    exp4 = (30 * 0.125 + 6 * 0.5 + 8 * 1.0) / 1.625
    assert abs(out["2024-01-04"][1] - exp4) < 1e-9


def test_ewma_daily_truncates_outside_window(spark):
    from datawarehousefinal_spark.operators.timeseries import ewma_daily
    from datetime import datetime

    rows = [
        ("g", datetime(2024, 1, 1), 100.0),
        ("g", datetime(2024, 3, 1), 4.0),  # 60 days later: outside 30d band
    ]
    df = spark.createDataFrame(rows, "g string, ts timestamp, value double")
    out = {r["day"].isoformat(): r["ewma"] for r in
           ewma_daily(df, "g", "ts", "value", 0.5, 30).collect()}
    assert out["2024-03-01"] == 4.0


def test_rolling_anomaly_report_flags_spike_not_baseline(spark):
    from datawarehousefinal_spark.operators.timeseries import (
        rolling_anomaly_report,
    )
    from datetime import datetime

    rows = []
    # 20 quiet days: 10 events/day with mild alternation, then a 100-event spike
    for d in range(1, 21):
        for i in range(10 + (d % 2)):
            rows.append(("g", datetime(2024, 1, d, i % 24)))
    for i in range(100):
        rows.append(("g", datetime(2024, 1, 21, i % 24)))
    df = spark.createDataFrame(rows, "g string, ts timestamp")
    out = rolling_anomaly_report(df, "g", "ts", threshold=3.0, baseline_days=14)
    got = out.collect()
    days = {r["day"].isoformat() for r in got}
    assert "2024-01-21" in days
    assert all(d == "2024-01-21" for d in days), days
    spike = [r for r in got if r["day"].isoformat() == "2024-01-21"][0]
    assert spike["n"] == 100 and spike["z"] > 3


def test_seasonal_dow_forecast_values_and_horizon(spark):
    import datetime as dt

    from datawarehousefinal_spark.operators.timeseries import (
        seasonal_dow_forecast,
    )

    # two Mondays with 2 and 4 events -> Monday mean 3; one Tuesday with 1
    base = dt.datetime(2024, 1, 1, 12, 0)  # a Monday
    rows = (
        [("a", base)] * 2
        + [("a", base + dt.timedelta(days=7))] * 4
        + [("a", base + dt.timedelta(days=1))] * 1
    )
    df = spark.createDataFrame(rows, ["event_type", "ts"])
    out = seasonal_dow_forecast(df, "ts", ["event_type"], horizon_days=14)
    got = {(r["day"], r["isodow"]): r["predicted"] for r in out.collect()}
    # anchor = 2024-01-08; horizon = 01-09..01-22: two Mondays, two Tuesdays
    assert got[(dt.date(2024, 1, 15), 1)] == 3.0
    assert got[(dt.date(2024, 1, 22), 1)] == 3.0
    assert got[(dt.date(2024, 1, 9), 2)] == 1.0
    assert got[(dt.date(2024, 1, 16), 2)] == 1.0
    # never-observed weekdays emit nothing
    assert len(got) == 4


def test_cusum_change_point_localizes_shift(spark):
    import datetime as dt

    from datawarehousefinal_spark.operators.timeseries import (
        cusum_change_point,
    )

    # group 'a': 5 days at 2/day then 5 days at 10/day -> change after
    # day 5. Build raw events (n per day) the operator aggregates.
    d0 = dt.datetime(2024, 3, 1, 9, 0, 0)
    rows = []
    for day in range(10):
        n = 2 if day < 5 else 10
        for i in range(n):
            rows.append(("a", d0 + dt.timedelta(days=day, minutes=i)))
    # group 'b': single day -> no split possible, emits nothing
    rows.append(("b", d0))
    df = spark.createDataFrame(rows, ["g", "ts"])
    out = {r["g"]: r for r in cusum_change_point(df, "g", "ts").collect()}
    assert set(out) == {"a"}
    a = out["a"]
    assert a["change_day"] == dt.date(2024, 3, 5)
    assert a["n_days"] == 10
    assert a["mean_before"] == 2.0 and a["mean_after"] == 10.0
    # S at the peak: 10 - 5*6 = -20 (below-mean regime first)
    assert a["cusum_peak"] == -20.0
