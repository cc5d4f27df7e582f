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


def gap_fill_interpolate(
    df: DataFrame,
    group_col: str,
    date_col: str,
    value_col: str,
    filled_flag_col: str = "was_observed",
) -> DataFrame:
    """Densify a sparse per-group daily series and linearly interpolate
    the missing values — the standard warehouse "resample + interpolate"
    (sensor/metric series with holes; a model-training feature pipeline
    needs a value for EVERY day).

    Mechanics, all codegen and exactly SQL-replayable:

    1. spine: per-group ``sequence(min(date), max(date))`` exploded — the
       only rows created are the group's own calendar range, so a group
       observed for a week can't inflate a year-long spine;
    2. observations left-join the spine on (group, date) — one shuffle
       each side, both already keyed by group;
    3. one window sort per group supplies the four interpolation inputs
       (previous/next observed value and date via ``last``/``first`` with
       ``ignorenulls``), and the fill is pure column arithmetic:
       ``prev + (next-prev) * days_since_prev / days_between``. Edges
       (before the first / after the last observation) take the nearest
       observed value (ffill/bfill).

    Scale shape: |groups| × |days-in-range| rows after the spine — for
    daily grain this is ~365 rows/group/year, dwarfed by the event data
    that produced the dailies; the window runs inside the same group
    partitioning the join already established.

    Output: ``group_col, date_col, value_col`` (filled) and a boolean
    ``filled_flag_col`` marking real observations.
    """
    bounds = df.groupBy(group_col).agg(
        F.min(date_col).alias("__d0"), F.max(date_col).alias("__d1")
    )
    spine = bounds.select(
        group_col,
        F.explode(F.expr("sequence(__d0, __d1, interval 1 day)")).alias(date_col),
    )
    joined = spine.join(df, [group_col, date_col], "left")
    w = Window.partitionBy(group_col).orderBy(date_col)
    wp = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wn = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    observed_date = F.when(F.col(value_col).isNotNull(), F.col(date_col))
    pv = F.last(value_col, ignorenulls=True).over(wp)
    pdt = F.last(observed_date, ignorenulls=True).over(wp)
    nv = F.first(value_col, ignorenulls=True).over(wn)
    ndt = F.first(observed_date, ignorenulls=True).over(wn)
    frac = F.datediff(F.col(date_col), pdt) / F.datediff(ndt, pdt)
    filled = (
        F.when(F.col(value_col).isNotNull(), F.col(value_col))
        .when(pv.isNull(), nv)   # before first observation: backfill
        .when(nv.isNull(), pv)   # after last observation: forward fill
        .otherwise(pv + (nv - pv) * frac)
    )
    return joined.select(
        F.col(group_col),
        F.col(date_col),
        filled.alias(value_col),
        F.col(value_col).isNotNull().alias(filled_flag_col),
    )


def ewma_daily(
    df: DataFrame,
    group_col: str,
    ts_col: str,
    value_col: str,
    alpha: float = 0.3,
    window_days: int = 30,
) -> DataFrame:
    """Per-group daily value totals with a truncated exponentially-
    weighted moving average: weight ``(1-alpha)^age_days`` over the
    trailing ``window_days`` calendar days, normalized by the weights
    actually present (missing days contribute nothing, the standard
    irregular-series EWMA).

    Shape: aggregate first (|groups| x |days| rows, map-side combined),
    then a banded self-join on (group, day-range) — equality on the
    group key drives the join, the 30-day band is a residual predicate.
    The truncation is what keeps this scale-safe AND numeric-safe: the
    untruncated prefix trick needs ``(1-alpha)^(-day_index)`` which
    overflows doubles within a year, while the band caps every exponent
    at ``window_days``. The daily frame is small by construction
    (calendar grain), so AQE broadcasts one side; at 10 years x 1M
    groups it is still only ~3.6B short rows keyed by group — shuffled
    once, never the raw events.

    Output: ``group_col, day, v, ewma``.
    """
    daily = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(F.col(group_col), F.to_date(F.col(ts_col)).alias("day"))
        .agg(F.sum(value_col).alias("v"))
    )
    a, b = daily.alias("a"), daily.alias("b")
    j = a.join(
        b,
        (F.col(f"a.{group_col}") == F.col(f"b.{group_col}"))
        & (F.col("b.day") <= F.col("a.day"))
        & (F.col("b.day") >= F.date_sub(F.col("a.day"), window_days - 1)),
    )
    w = F.pow(F.lit(1.0 - alpha), F.datediff(F.col("a.day"), F.col("b.day")))
    return (
        j.groupBy(F.col(f"a.{group_col}").alias(group_col), F.col("a.day").alias("day"))
        .agg(
            F.max(
                F.when(F.col("b.day") == F.col("a.day"), F.col("b.v"))
            ).alias("v"),
            (F.sum(w * F.col("b.v")) / F.sum(w)).alias("ewma"),
        )
    )


def rolling_anomaly_report(
    df: DataFrame,
    group_col: str,
    ts_col: str,
    threshold: float = 2.0,
    baseline_days: int = 14,
) -> DataFrame:
    """Time-local anomaly detection on daily counts: flag days whose
    count deviates more than ``threshold`` sample standard deviations
    from the TRAILING ``baseline_days``-day baseline (current day
    excluded, so a spike can't mask itself). The time-local complement
    of the global-moments z-score report — a regime change early in the
    series is invisible to global moments but flagged here.

    Same scale shape as ``rolling_daily_stats``: aggregate to
    |groups| x |days| first, one calendar RANGE window over that tiny
    frame. Days with fewer than 3 baseline days or zero spread emit
    nothing (no division by zero, no cold-start noise).

    Output: ``group_col, day, n, baseline_avg, baseline_std, z``.
    """
    daily = df.groupBy(
        F.col(group_col), F.to_date(F.col(ts_col)).alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    epoch_day = F.datediff(F.col("day"), F.lit("1970-01-01").cast("date"))
    w = (
        Window.partitionBy(group_col)
        .orderBy(epoch_day)
        .rangeBetween(-baseline_days, -1)
    )
    stats = daily.select(
        F.col(group_col),
        F.col("day"),
        F.col("n"),
        F.avg("n").over(w).alias("baseline_avg"),
        F.stddev_samp("n").over(w).alias("baseline_std"),
        F.count("n").over(w).alias("__nb"),
    )
    z = (F.col("n") - F.col("baseline_avg")) / F.col("baseline_std")
    return (
        stats.filter(
            (F.col("__nb") >= 3)
            & (F.col("baseline_std") > 0)
            & (F.abs(z) > threshold)
        )
        .select(
            group_col, "day", "n", "baseline_avg", "baseline_std",
            z.alias("z"),
        )
    )


def seasonal_dow_forecast(
    df: DataFrame,
    ts_col: str,
    group_cols: list[str],
    horizon_days: int = 14,
) -> DataFrame:
    """Seasonal-naive forecast of daily event counts: the prediction for
    a future day is the group's historical mean for that ISO day-of-week
    — the standard strong baseline for weekly-seasonal volume series
    (and the seasonal complement of the linear trend forecaster, which
    extrapolates level but is blind to weekday shape).

    Means are over OBSERVED days only (a day with zero events for a
    group is absent from history, not a zero sample); a (group, weekday)
    never observed emits no forecast row — both choices replay exactly
    in SQL. The horizon anchors at the GLOBAL max day so all groups
    forecast the same calendar window.

    Scale shape: raw events collapse to |groups| x |days| via one
    map-side-combined aggregate, weekday means collapse that to
    |groups| x 7, and the horizon frame (``horizon_days`` rows, built by
    exploding a sequence against the 1-row global max — never a driver
    round-trip) broadcast-joins in. Nothing after the first aggregate
    touches event volume.

    Output: ``group_cols..., day, isodow, predicted``.
    """
    daily = df.groupBy(
        *group_cols, F.to_date(ts_col).alias("__day")
    ).agg(F.count(F.lit(1)).alias("__n"))
    isodow = (F.weekday("__day") + 1).cast("int")
    means = daily.groupBy(*group_cols, isodow.alias("isodow")).agg(
        F.avg("__n").alias("predicted")
    )
    future = (
        daily.agg(F.max("__day").alias("__anchor"))
        .select(
            F.explode(
                F.sequence(F.lit(1), F.lit(int(horizon_days)))
            ).alias("__h"),
            "__anchor",
        )
        .select(
            F.date_add(F.col("__anchor"), F.col("__h")).alias("day")
        )
        .withColumn("isodow", (F.weekday("day") + 1).cast("int"))
    )
    return F.broadcast(future).join(means, "isodow").select(
        *group_cols, "day", "isodow", "predicted"
    )


def cusum_change_point(
    df: DataFrame,
    group_col: str,
    ts_col: str,
) -> DataFrame:
    """CUSUM mean-shift localization on daily counts (Page 1954): for
    each group, the day where the cumulative sum of deviations from the
    group mean peaks in magnitude — the classic single-change-point
    estimate. The structural complement of the time-local z-score
    report (:func:`rolling_anomaly_report` flags WHICH days are odd;
    this says WHERE the regime changed).

    Scale shape: the corpus collapses to |groups| × |days| daily counts
    first; everything after runs on that tiny frame (one ordered window
    for the CUSUM walk, one rank, one count-split aggregate). The CUSUM
    statistic is ``S_d = cum_n(d) − rank(d) · mean`` with ``cum_n`` an
    exact integer running sum and ``mean = total/days`` one fixed
    double — no reassociating float accumulation anywhere, so the walk
    replays identically in external engines and under repartitioning.

    Output, one row per group: ``group_col, change_day (last day of
    the 'before' regime), cusum_peak (double, signed S at the peak),
    n_days (long), mean_before, mean_after (double)`` — groups with
    fewer than 2 days emit nothing (no regime to split).
    """
    daily = df.groupBy(
        F.col(group_col), F.to_date(F.col(ts_col)).alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    wo = Window.partitionBy(group_col).orderBy("day")
    run = wo.rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy(group_col)
    walk = (
        daily.withColumn("__rk", F.row_number().over(wo))
        .withColumn("__cum", F.sum("n").over(run))
        .withColumn("__tot", F.sum("n").over(wall))
        .withColumn("__days", F.count(F.lit(1)).over(wall))
        .withColumn(
            "__s",
            F.col("__cum").cast("double")
            - F.col("__rk") * (F.col("__tot").cast("double") / F.col("__days")),
        )
    )
    # Peak |S| with (|S| desc, day asc) tie-break; the peak day closes
    # the 'before' regime. Exclude the last day: S there is ~0 by
    # construction and a "change after everything" is no change.
    peak = (
        walk.filter(F.col("__rk") < F.col("__days"))
        .withColumn(
            "__pk",
            F.row_number().over(
                Window.partitionBy(group_col).orderBy(
                    F.abs(F.col("__s")).desc(), F.col("day")
                )
            ),
        )
        .filter(F.col("__pk") == 1)
        .select(
            F.col(group_col),
            F.col("day").alias("change_day"),
            F.col("__s").alias("cusum_peak"),
            F.col("__days").cast("long").alias("n_days"),
            (F.col("__cum").cast("double") / F.col("__rk")).alias(
                "mean_before"
            ),
            (
                (F.col("__tot") - F.col("__cum")).cast("double")
                / (F.col("__days") - F.col("__rk"))
            ).alias("mean_after"),
        )
    )
    return peak


def max_drawdown(
    df: DataFrame,
    group_col: str,
    order_col: str,
    value_col: str,
) -> DataFrame:
    """Maximum drawdown per group: the largest peak-to-trough fall of a
    running series (finance's risk staple, equally useful for "how far
    did daily volume collapse from its high" ops reporting).

    drawdown(t) = running_max(value) − value(t); the report returns each
    group's worst one plus the peak it fell from. One window pass per
    group ordered by ``order_col`` — input is the (group, period)
    aggregate series (e.g. daily totals), so window partitions are
    |periods in the group|, bounded and parallel across groups. All
    arithmetic is subtraction of exact (integer/decimal-sourced)
    values — deterministic, SQL-replayable.

    Output: group, peak_value, max_drawdown.
    """
    w = (
        Window.partitionBy(group_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    run = df.withColumn("__peak", F.max(value_col).over(w))
    return (
        run.withColumn("__dd", F.col("__peak") - F.col(value_col))
        .groupBy(F.col(group_col).alias("group"))
        .agg(
            F.max("__peak").alias("peak_value"),
            F.max("__dd").alias("max_drawdown"),
        )
    )


def concurrent_intervals_daily(
    df: DataFrame,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Sweep-line concurrency counting: for every day, how many
    intervals [start, end] are open — capacity/backlog analysis
    ("orders awaiting shipment", "rooms occupied", "jobs in flight").

    The scalable shape is the sweep, NOT per-day fan-out (an interval
    spanning a year would fan 365×; a sweep emits exactly two deltas
    per interval regardless of span): +1 at start, −1 at end+1, summed
    per day (map-side combined), then a prefix sum over the per-day
    delta frame. The delta frame is CALENDAR-BOUNDED — one row per
    distinct boundary day, ≤ ~7,300 rows for a 20-year fact at any
    byte scale — so the prefix sum is a plain ordered window over a
    provably tiny frame (the two-phase distributed cumsum's boundary
    sample + offset broadcast-join would triple the stage count to
    parallelize thousands of rows). Exact integers.

    Output: day, n_open — one row per day from each interval's start
    to its end (days with zero deltas between events carry forward and
    are emitted only when some interval's boundary lands on them; join
    against a calendar for gap-free reporting).
    """
    from pyspark.sql import Window

    starts = df.select(
        F.col(start_col).alias("day"), F.lit(1).cast("bigint").alias("__d")
    )
    ends = df.select(
        F.date_add(F.col(end_col), 1).alias("day"),
        F.lit(-1).cast("bigint").alias("__d"),
    )
    deltas = (
        starts.unionByName(ends)
        .groupBy("day")
        .agg(F.sum("__d").alias("__delta"))
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    swept = deltas.withColumn("n_open", F.sum("__delta").over(w))
    return swept.filter(F.col("n_open") > 0).select(
        "day", F.col("n_open").cast("long").alias("n_open")
    )
