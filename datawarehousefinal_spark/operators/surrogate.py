"""Batch surrogate-key machinery — the Spark-first replacement for Kettle's
CombinationLookup (SURVEY.md §2.3 J4, §7.1).

The reference assigns dimension surrogate keys row-at-a-time: per incoming
row, look the natural-key combo up in Postgres (9999-entry cache), INSERT
with ``max(id)+1`` on miss, commit every 100 rows (etl_final.ktr:2747-3009).
That is inherently sequential and makes key *values* depend on arrival
order.

Batch design (deterministic, shuffle-minimal):

1. **build**: ``distinct`` natural keys → ``row_number`` over a
   deterministic natural-key ordering → dense keys 1..n. One shuffle on the
   natural keys (the distinct), one single-partition pass for the global
   row_number — acceptable because dimension *distinct* cardinality is tiny
   relative to fact volume even at 100 TB (dims are the small side of a
   star by definition). For a genuinely huge dimension use
   ``monotonically_increasing_id`` + zipWithIndex-style block arithmetic
   instead (provided as ``assign_keys_distributed``).
2. **merge**: incremental loads take only the *new* combos
   (``left_anti`` against the existing dim) and extend from ``max(id)``.
3. **attach**: facts get their FK via broadcast join on the natural keys —
   the fact side never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def build_dimension(src: DataFrame, natural_keys: list[str], id_col: str) -> DataFrame:
    """J4 phase 1: distinct natural-key combos with dense surrogate keys.

    Keys are ordered by the natural keys (NULLS FIRST to match SQL
    row_number default) so repeated runs over the same data produce the
    same ids — unlike the reference's arrival-order keys (SURVEY.md §7.1).
    """
    distinct = src.select(*natural_keys).distinct()
    order = [F.col(k).asc_nulls_first() for k in natural_keys]
    w = Window.orderBy(*order)
    return distinct.withColumn(id_col, F.row_number().over(w).cast("long")).select(
        id_col, *natural_keys
    )


def assign_keys_distributed(distinct: DataFrame, id_col: str, start: int = 1) -> DataFrame:
    """Scale path for huge dimensions: dense ids without a single-partition
    window. Per-partition counts are collected (one tiny row per partition)
    and turned into offsets; ids are then offset + intra-partition rank.
    No global sort, no single-reducer stage."""
    rdd = distinct.rdd.zipWithIndex()
    schema = distinct.schema
    out = rdd.map(lambda pair: (*pair[0], pair[1] + start))
    from pyspark.sql.types import LongType, StructField, StructType

    new_schema = StructType(list(schema.fields) + [StructField(id_col, LongType(), False)])
    return distinct.sparkSession.createDataFrame(out, new_schema).select(
        id_col, *[f.name for f in schema.fields]
    )


def merge_dimension(
    existing: DataFrame, src: DataFrame, natural_keys: list[str], id_col: str
) -> DataFrame:
    """J4 incremental merge: append only unseen natural-key combos,
    numbering from max(existing id) — batch equivalent of the reference's
    insert-on-miss, minus the per-row round trips."""
    new_keys = (
        src.select(*natural_keys).distinct().join(existing, natural_keys, "left_anti")
    )
    max_id = existing.agg(F.coalesce(F.max(id_col), F.lit(0)).alias("m"))
    order = [F.col(k).asc_nulls_first() for k in natural_keys]
    numbered = new_keys.withColumn(
        "__rn", F.row_number().over(Window.orderBy(*order)).cast("long")
    )
    appended = numbered.crossJoin(F.broadcast(max_id)).select(
        (F.col("__rn") + F.col("m")).alias(id_col), *natural_keys
    )
    return existing.select(id_col, *natural_keys).unionByName(appended)


def attach_surrogate_key(
    fact: DataFrame, dim: DataFrame, natural_keys: list[str], id_col: str
) -> DataFrame:
    """J4 phase 2: put the FK onto the fact rows via broadcast left join on
    the natural keys. The (huge) fact side stays in place."""
    return fact.join(F.broadcast(dim.select(id_col, *natural_keys)), natural_keys, "left")
