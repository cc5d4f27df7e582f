"""As-of (point-in-time) join — a custom operator Spark lacks natively.

For each left row, attach the most recent right row with the same key
whose timestamp is <= (backward) or >= (forward) the left timestamp —
the standard time-series enrichment (latest snapshot / last-known-value
join). Semantics match pandas ``merge_asof`` and DuckDB ``ASOF JOIN``
(the oracle).

Implementation: ``cogroup().applyInPandas`` — both sides hash-shuffle
ONCE on the key, each co-group runs a local Arrow-batched
``pd.merge_asof`` after an in-group sort. This is the documented scale
shape for an operator the built-in DataFrame algebra can't express: the
shuffle is the same one an equi-join would pay, the per-group work is
O(n log n) in group size, and no state crosses groups. Skewed keys are
the caveat (one pandas group per key) — pre-split hot keys or bucket the
time range for those corpora.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    ts_col: str,
    direction: str = "backward",
    right_value_cols: list[str] | None = None,
    tolerance: pd.Timedelta | None = None,
) -> DataFrame:
    """As-of join ``left`` to ``right`` on ``key_cols`` at ``ts_col``.

    Left rows always survive (left-join semantics); unmatched rows carry
    NULLs. Right timestamps must be unique per key (pre-aggregate
    duplicates — with equal timestamps "most recent" is ill-defined and
    engines disagree on the tie-break).

    Output schema: every left column, then ``right_value_cols`` (default:
    every non-key, non-ts right column).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward/forward, got {direction!r}")
    if right_value_cols is None:
        right_value_cols = [
            c for c in right.columns if c not in key_cols and c != ts_col
        ]
    clash = set(right_value_cols) & set(left.columns)
    if clash:
        raise ValueError(
            f"right value columns collide with left columns: {sorted(clash)}; "
            f"rename before joining"
        )
    r = right.select(*key_cols, ts_col, *right_value_cols)

    out_fields = list(left.schema.fields) + [
        r.schema[c] for c in right_value_cols
    ]
    out_schema = StructType(out_fields)
    left_cols = list(left.columns)

    def merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        lpdf = lpdf.sort_values(ts_col, kind="mergesort")
        if rpdf.empty:
            out = lpdf.copy()
            for c in right_value_cols:
                out[c] = None
            return out[left_cols + right_value_cols]
        rpdf = rpdf[[ts_col] + right_value_cols].sort_values(
            ts_col, kind="mergesort"
        )
        merged = pd.merge_asof(
            lpdf,
            rpdf,
            on=ts_col,
            direction=direction,
            tolerance=tolerance,
            suffixes=("", "__r"),
        )
        return merged[left_cols + right_value_cols]

    return (
        left.groupBy(*key_cols)
        .cogroup(r.groupBy(*key_cols))
        .applyInPandas(lambda l, r_: merge(l, r_), out_schema)
    )


def latest_snapshot_per_key(
    right: DataFrame, key_cols: list[str], ts_col: str
) -> DataFrame:
    """Helper: collapse a snapshot table to one (latest) row per key —
    the degenerate as-of join where every left timestamp is 'now'."""
    from pyspark.sql import Window

    w = Window.partitionBy(*key_cols).orderBy(F.desc(ts_col))
    return (
        right.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
