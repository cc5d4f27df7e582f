"""Fuzzy matching (SURVEY.md §2.3 J5, §2.7 F14).

The reference declares a Levenshtein closest-value FuzzyMatch step (unwired
experiment, etl_final.ktr:3608-3645). Implemented properly here: for each
left row, the minimum-distance right value, with deterministic tie-breaks.

Scale shape: the right side of a fuzzy lookup is a (small) reference list →
broadcast nested-loop against it, then a per-left-row min. The left side
never shuffles. For big×big fuzzy joins, pre-bucket by a cheap blocking key
(length band, first char, or n-gram LSH from operators/dedup.py) first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def fuzzy_closest(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_distance: int | None = None,
) -> DataFrame:
    """J5: per left row, the closest right value by Levenshtein distance.

    Output: left columns + ``match`` (closest right value) + ``distance``.
    Ties break on the match value ascending so results are deterministic.
    Each INPUT ROW yields one output row — the min window partitions on a
    synthetic row id, so identical left rows are matched independently
    rather than collapsed into one.
    """
    with_id = left.withColumn("__rid", F.monotonically_increasing_id())
    candidates = with_id.crossJoin(F.broadcast(right.select(right_col).distinct()))
    scored = candidates.withColumn(
        "distance", F.levenshtein(F.col(left_col), F.col(right_col))
    )
    if max_distance is not None:
        scored = scored.filter(F.col("distance") <= max_distance)
    w = Window.partitionBy("__rid").orderBy("distance", right_col)
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__rid")
        .withColumnRenamed(right_col, "match")
    )
