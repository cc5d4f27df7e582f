"""Literal-safe single-row unpivot — the report-shaping step every
single-pass profiler/report operator ends with.

``profile_table`` / ``correlation_matrix`` / ``row_rule_report`` /
``event_funnel`` all aggregate into ONE wide row and unpivot it into the
canonical long format. Building that unpivot as a string-interpolated
``stack(...)`` ``selectExpr`` is a parse-error (and injection) hazard: a
rule name, funnel step, or column label containing a quote breaks the
generated SQL. Here the labels enter the plan as ``F.lit`` values inside
an exploded array of structs — no SQL text is ever assembled, any label
is safe, and the physical plan is the same single-row explode (the
unpivot runs on one row; its cost is irrelevant either way).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def melt(
    df: DataFrame,
    id_cols: Sequence[str],
    value_cols: Sequence[str],
    var_name: str = "measure",
    value_name: str = "value",
) -> DataFrame:
    """General wide→long melt over a REAL (multi-row) table — the
    measure-normalization step that turns k measure columns into
    (measure, value) pairs so downstream operators handle "a measure"
    generically (the long-format twin of the pivot report).

    Delegates to Spark's native ``DataFrame.unpivot``: ONE Expand node
    replicates each row k times map-side — no shuffle, no UDF, no
    generated SQL text (column names pass as identifiers, so arbitrary
    labels are safe). Value columns are cast to double up front: unpivot
    requires one common value type, and doing the cast explicitly keeps
    the output schema independent of the input's decimal/int mix.
    """
    casted = df.select(
        *id_cols, *[F.col(c).cast("double").alias(c) for c in value_cols]
    )
    return casted.unpivot(
        list(id_cols), list(value_cols), var_name, value_name
    )


def unpivot_single_row(
    wide: DataFrame,
    rows: Sequence[Sequence],
    names: Sequence[str],
    keep_cols: Sequence[str] = (),
) -> DataFrame:
    """Explode the single-row frame ``wide`` into ``len(rows)`` output
    rows with columns ``names`` (plus ``keep_cols`` carried through).

    Each entry of ``rows`` is a tuple aligned with ``names``; plain
    Python values become ``F.lit`` literals, ``Column`` values reference
    the wide row's aggregates. All rows must be type-consistent per
    field (they share one struct type).
    """
    if not rows:
        raise ValueError("unpivot_single_row needs at least one row")
    arr = F.array(
        *[
            F.struct(
                *[
                    (v if isinstance(v, Column) else F.lit(v)).alias(n)
                    for v, n in zip(row, names)
                ]
            )
            for row in rows
        ]
    )
    return wide.select(*keep_cols, F.explode(arr).alias("__e")).select(
        *keep_cols, *[F.col(f"__e.{n}").alias(n) for n in names]
    )
