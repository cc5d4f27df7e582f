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

from functools import reduce
from operator import and_

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
    window and without leaving the JVM.

    ``monotonically_increasing_id`` is ``partition_id << 33 | local_row``
    where ``local_row`` is consecutive from 0 within each partition — so it
    already encodes (partition, dense local offset). Per-partition counts
    are a tiny aggregate (one row per partition); a cumulative sum over
    that micro-frame yields each partition's global offset, broadcast back
    onto the rows. The data rows themselves never shuffle, nothing crosses
    the Python boundary, and ids come out dense ``start..start+n-1``.

    Ids are deterministic for a fixed partitioning of ``distinct`` (like
    any parallel assigner); use ``build_dimension`` when run-to-run stable
    key VALUES are required.
    """
    tagged = distinct.withColumn("__mid", F.monotonically_increasing_id())
    tagged = tagged.withColumn(
        "__pid", F.shiftrightunsigned("__mid", 33)
    ).withColumn("__local", F.col("__mid").bitwiseAND(F.lit((1 << 33) - 1)))
    counts = tagged.groupBy("__pid").agg(F.count(F.lit(1)).alias("__cnt"))
    w = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn(
        "__off", F.coalesce(F.sum("__cnt").over(w), F.lit(0)).cast("long")
    ).select("__pid", "__off")
    return (
        tagged.join(F.broadcast(offsets), "__pid")
        .withColumn(id_col, (F.col("__off") + F.col("__local") + F.lit(start)).cast("long"))
        .drop("__mid", "__pid", "__local", "__off")
        .select(id_col, *distinct.columns)
    )


def merge_dimension(
    existing: DataFrame, src: DataFrame, natural_keys: list[str], id_col: str
) -> DataFrame:
    """J4 incremental merge: append only unseen natural-key combos,
    numbering from max(existing id) — batch equivalent of the reference's
    insert-on-miss, minus the per-row round trips.

    The anti-join is NULL-SAFE (``eqNullSafe`` per key): ``build_dimension``
    deliberately keys NULL-bearing combos, and Kettle's CombinationLookup
    matches NULL as a value — a plain column-list anti-join would treat
    such combos as forever-unseen and append a duplicate with a fresh id
    on every incremental run."""
    src_keys = src.select(*natural_keys).distinct().alias("__src")
    ex = existing.alias("__ex")
    null_safe = reduce(
        and_,
        [F.col(f"__src.{k}").eqNullSafe(F.col(f"__ex.{k}")) for k in natural_keys],
    )
    new_keys = src_keys.join(ex, null_safe, "left_anti").select(*natural_keys)
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
    the natural keys. The (huge) fact side stays in place.

    NULL-SAFE like the rest of the dimension contract: ``build_dimension``
    deliberately keys NULL-bearing combos, so the lookup matches NULL as a
    value (``eqNullSafe`` keys still hash-join) — a plain column-list join
    would leave every such fact row with an orphan NULL FK."""
    d = F.broadcast(dim.select(id_col, *natural_keys)).alias("__dim")
    f = fact.alias("__fact")
    cond = reduce(
        and_,
        [
            F.col(f"__fact.{k}").eqNullSafe(F.col(f"__dim.{k}"))
            for k in natural_keys
        ],
    )
    return f.join(d, cond, "left").select(
        "__fact.*", F.col(f"__dim.{id_col}").alias(id_col)
    )
