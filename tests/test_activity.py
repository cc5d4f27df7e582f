"""Unit tests for activity analytics (cumulative users, new-vs-returning)
and the sliding-window streaming aggregation."""

from __future__ import annotations

from datetime import datetime

from datawarehousefinal_spark.operators.analytics import (
    cumulative_new_users,
    new_vs_returning_daily,
)


def _events(spark):
    rows = [
        # user, ts: u1 active d1+d2, u2 active d1, u3 first seen d2,
        # u3 again d3, u1 twice on d1 (dup activity same day)
        (1, datetime(2024, 1, 1, 9)),
        (1, datetime(2024, 1, 1, 17)),
        (2, datetime(2024, 1, 1, 12)),
        (1, datetime(2024, 1, 2, 8)),
        (3, datetime(2024, 1, 2, 9)),
        (3, datetime(2024, 1, 3, 9)),
    ]
    return spark.createDataFrame(rows, ["user_id", "ts"])


def test_cumulative_new_users(spark):
    out = {
        str(r["day"]): r
        for r in cumulative_new_users(_events(spark), "user_id", "ts").collect()
    }
    assert out["2024-01-01"]["n_new_users"] == 2
    assert out["2024-01-01"]["cum_users"] == 2
    assert out["2024-01-02"]["n_new_users"] == 1
    assert out["2024-01-02"]["cum_users"] == 3
    assert "2024-01-03" not in out  # no first-time users that day


def test_new_vs_returning_daily(spark):
    out = {
        str(r["day"]): r
        for r in new_vs_returning_daily(_events(spark), "user_id", "ts").collect()
    }
    # d1: u1, u2 both new (dup same-day activity counted once)
    assert out["2024-01-01"]["n_new_users"] == 2
    assert out["2024-01-01"]["n_returning_users"] == 0
    # d2: u3 new, u1 returning
    assert out["2024-01-02"]["n_new_users"] == 1
    assert out["2024-01-02"]["n_returning_users"] == 1
    # d3: u3 returning
    assert out["2024-01-03"]["n_new_users"] == 0
    assert out["2024-01-03"]["n_returning_users"] == 1


def test_sliding_window_counts_overlap(spark, tmp_path):
    from datawarehousefinal_spark.streaming.pipeline import (
        read_parquet_stream,
        run_to_memory,
        sliding_window_counts,
    )

    df = _events(spark)
    src = str(tmp_path / "src")
    df.repartition(2).write.parquet(src)
    stream = read_parquet_stream(spark, src, df.schema)
    counts = sliding_window_counts(
        stream, "ts", "2 days", "1 day", watermark="36500 days"
    )
    run_to_memory(counts, "t_sliding_unit", "complete")
    rows = {str(r["w_start"]): r for r in spark.table("t_sliding_unit").collect()}
    # every event is in two windows; window starting 2024-01-01 covers d1+d2
    assert rows["2024-01-01"]["n_events"] == 5
    # window starting 2023-12-31 covers only d1
    assert rows["2023-12-31"]["n_events"] == 3
    # w_end is always start + 2 days
    for r in rows.values():
        assert (r["w_end"] - r["w_start"]).days == 2
