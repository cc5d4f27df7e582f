"""Event-behavior analytics — ordered funnels and cohort retention.

The two staple clickstream analyses a warehouse serves (every product
analytics stack — Mondrian dashboards included — ends up asking them):
"how many users completed signup → click → purchase, in order?" and
"of the users first seen in week W, how many were active k weeks later?"

Scale shapes:

* ``event_funnel``: every per-step timestamp is a conditional ``min``
  window over the SAME ``partitionBy(user)`` — k steps = k Window
  expressions over ONE exchange (step k's min is conditioned on being
  after step k-1's min, which is a plain column by then). The report is
  then one small aggregate. No joins, no k passes over the events.
* ``cohort_retention``: one distinct over (user, period) — the only
  shuffle carrying event-volume data — then a min-window for the cohort
  and a count per (cohort, offset). |users|×|periods| rows after the
  distinct, tiny at any scale.

Both are pure codegen and exactly SQL-replayable (oracled in
queries.py). Period arithmetic uses integer epoch-days / 7 so both
engines agree on week boundaries (no locale-dependent ``weekofyear``).

Reference scope: beyond-reference analytics in the A-section family
(SURVEY.md §2.5's value-counts / daily-counts generalized to ordered
behavior).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def event_funnel(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    max_gap_hours: int | None = None,
) -> DataFrame:
    """Ordered-funnel report: for each step prefix, how many users
    completed it IN ORDER (step i's event strictly after the user's
    first step-(i-1) event).

    ``max_gap_hours`` adds the CONVERSION-WINDOW variant every product
    analytics tool ships: step i must also land within that many hours
    of the user's first step-(i-1) event. Semantics are the standard
    greedy-from-first-occurrence scan (a user whose early signup missed
    the window does not get credit for a later signup that would have
    made it) — deterministic, one window pass, and exactly what the
    SQL oracle replays.

    Output: ``step (int, 1-based), step_name, n_users`` — n_users is
    non-increasing by construction.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    w = Window.partitionBy(user_col)
    cur = df.select(user_col, ts_col, type_col)
    prev_t = None
    t_cols = []
    for i, s in enumerate(steps):
        cond = F.col(type_col) == F.lit(s)
        if prev_t is not None:
            cond = cond & F.col(prev_t).isNotNull() & (
                F.col(ts_col) > F.col(prev_t)
            )
            if max_gap_hours is not None:
                cond = cond & (
                    F.col(ts_col)
                    <= F.col(prev_t)
                    + F.expr(f"INTERVAL {int(max_gap_hours)} HOURS")
                )
        t = f"__t{i}"
        cur = cur.withColumn(t, F.min(F.when(cond, F.col(ts_col))).over(w))
        prev_t = t
        t_cols.append(t)
    per_user = cur.groupBy(user_col).agg(
        *[F.max(t).alias(t) for t in t_cols]
    )
    counts = per_user.agg(
        *[F.count(F.col(t)).cast("long").alias(f"__n{i}") for i, t in enumerate(t_cols)]
    )
    from datawarehousefinal_spark.operators.unpivot import unpivot_single_row

    return unpivot_single_row(
        counts,
        [(i + 1, s, F.col(f"__n{i}")) for i, s in enumerate(steps)],
        ["step", "step_name", "n_users"],
    )


def cohort_retention(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    period_days: int = 7,
) -> DataFrame:
    """Cohort retention triangle: users bucketed by their first-activity
    period, counted in every later period they were active.

    Output: ``cohort_period (int, epoch-day / period_days), offset
    (periods since cohort), n_users`` — ``offset 0`` row is the cohort
    size.
    """
    # floor division (not cast-truncation) so the Spark and SQL replicas
    # agree sign-independently; epoch-day // 7 = ISO-agnostic week index.
    period = F.floor(
        F.datediff(F.to_date(F.col(ts_col)), F.lit("1970-01-01").cast("date"))
        / period_days
    ).cast("int")
    active = df.select(
        F.col(user_col), period.alias("__p")
    ).distinct()
    w = Window.partitionBy(user_col)
    with_cohort = active.withColumn("__c", F.min("__p").over(w))
    return (
        with_cohort.groupBy(
            F.col("__c").alias("cohort_period"),
            (F.col("__p") - F.col("__c")).alias("offset"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )
