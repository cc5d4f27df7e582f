"""Event-time operators: gap-based sessionization and rolling-window
daily statistics.

Beyond-reference LLM-pipeline operators (SURVEY.md §7 P7): clickstream /
telemetry feature engineering at corpus scale needs sessionization (the
canonical "assign a session id when the user pauses > N minutes" op) and
calendar-window rolling aggregates. Both are classic exactly-one-shuffle
window jobs:

* ``sessionize`` shuffles once on the entity key; every window runs
  inside that entity's partition, so skew is bounded by the busiest
  single entity (a web-scale corpus has millions of entities, each tiny).
* ``rolling_daily_stats`` aggregates to one row per (group, day) FIRST
  (map-side-combined count) and only then applies a RANGE window over the
  aggregated frame — the window input is |groups| x |days| rows, not the
  raw event stream.

Everything is codegen'd column arithmetic (lag/sum/avg over windows — no
Python UDFs) and exactly SQL-replayable for the DuckDB oracle. Gap
comparisons run on integer epoch-MICROseconds (``unix_micros`` ≙ DuckDB
``epoch_us``): double seconds would round near the boundary and the two
engines could disagree on whether a pause equals the gap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    gap_seconds: int = 1800,
    order_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Assign a per-entity session sequence number (1-based).

    A new session starts at the entity's first event and whenever the
    pause since the previous event exceeds ``gap_seconds`` (strictly: a
    pause of exactly ``gap_seconds`` stays in-session). Pass tie-breaker
    ``order_cols`` (e.g. an event id) so equal timestamps order
    deterministically — required for oracle-exact replay.

    Single shuffle on ``entity_col``; the lag and the running sum share
    one window sort.
    """
    order = [F.col(ts_col), *[F.col(c) for c in order_cols]]
    w = Window.partitionBy(entity_col).orderBy(*order)
    us = F.unix_micros(F.col(ts_col))
    prev_us = F.lag(us).over(w)
    new_session = F.when(
        prev_us.isNull() | (us - prev_us > gap_seconds * 1_000_000), 1
    ).otherwise(0)
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(
        "session_seq", F.sum(new_session).over(running).cast("long")
    )


def session_stats(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    gap_seconds: int = 1800,
    order_cols: tuple[str, ...] = (),
) -> DataFrame:
    """One row per (entity, session): event count, start/end timestamps,
    duration in seconds.

    The groupBy keys are a refinement of the sessionize window's
    partitioning (entity ⊂ (entity, session_seq)), so the aggregation
    after the window is map-side only — the plan carries ONE exchange.

    Output: ``entity_col, session_seq, n_events, session_start,
    session_end, duration_secs``.
    """
    s = sessionize(df, entity_col, ts_col, gap_seconds, order_cols)
    return s.groupBy(entity_col, "session_seq").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        (
            (F.unix_micros(F.max(ts_col)) - F.unix_micros(F.min(ts_col)))
            / F.lit(1_000_000.0)
        ).alias("duration_secs"),
    )


def rolling_daily_stats(
    df: DataFrame,
    group_col: str,
    ts_col: str,
    window_days: int = 7,
) -> DataFrame:
    """Per-group daily event counts with a trailing ``window_days``-day
    rolling sum and average (calendar RANGE window — days with no events
    do NOT contribute phantom zeros, the standard SQL semantics).

    Aggregate first (map-side-combined count to |groups|x|days| rows),
    window second: the RANGE frame orders on integer epoch-day so the
    frame bounds are exact day arithmetic on both engines. At 100 TB the
    window input is still only |groups| x |days| rows.

    Output: ``group_col, day, n, rolling_sum, rolling_avg``.
    """
    daily = df.groupBy(
        F.col(group_col), F.to_date(F.col(ts_col)).alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    epoch_day = F.datediff(F.col("day"), F.lit("1970-01-01").cast("date"))
    w = (
        Window.partitionBy(group_col)
        .orderBy(epoch_day)
        .rangeBetween(-(window_days - 1), Window.currentRow)
    )
    return daily.select(
        F.col(group_col),
        F.col("day"),
        F.col("n"),
        F.sum("n").over(w).cast("long").alias("rolling_sum"),
        F.avg("n").over(w).alias("rolling_avg"),
    )
