"""Date handling (SURVEY.md §2.7 F9-F12).

The reference builds ``fecha_completa`` as a **non-zero-padded** `'Y/M/D'`
string (ConcatFields, etl_final.ktr:2513,2581-2585; sample `2018/6/27`),
parses it back only when the forecast path needs real dates
(machineLearning.py:589), and derives proleptic-ordinal/month/day features
(machineLearning.py:603-605,633-635). Non-padded round-tripping is a parity
trap (SURVEY.md §7.3): always use 'y/M/d' patterns.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

NONPADDED_DATE_FMT = "y/M/d"


def concat_date_nonpadded(anio: Column | str, mes: Column | str, dia: Column | str) -> Column:
    """F9: `concat_ws('/', anio, mes, dia)` — non-padded, fields kept."""
    return F.concat_ws("/", anio, mes, dia)


def parse_date_nonpadded(col: Column | str) -> Column:
    """F10: parse the reference's `'2018/6/27'`-style strings."""
    c = F.col(col) if isinstance(col, str) else col
    return F.to_date(c, NONPADDED_DATE_FMT)


def proleptic_ordinal(col: Column | str) -> Column:
    """F11: Python `date.toordinal()` equivalent — days since 0001-01-01
    plus one (machineLearning.py:603). Pure datediff, codegen'd."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.datediff(c, F.lit("0001-01-01")) + 1).cast("long")


def future_dates(spark, last_date_df, days: int = 365):
    """F12: generate the forecast horizon — `days` consecutive dates after
    the max date (machineLearning.py:630-635). Stays distributed: sequence +
    explode on the one-row max, no driver round-trip."""
    return last_date_df.select(
        F.explode(
            F.sequence(
                F.date_add(F.col("last_date"), 1),
                F.date_add(F.col("last_date"), days),
            )
        ).alias("fecha")
    )


def build_date_dimension(spark, start: str, end: str):
    """The reference's dim_fecha as a GENERATED calendar dimension
    (etl_final.ktr:2747-2805 builds it lazily from arriving facts; a
    warehouse normally pre-generates the calendar so every date joins,
    observed or not): one row per day in [start, end], with the
    drill-path attributes the Fecha hierarchy uses (anio > mes > dia,
    Schema_Trabajo_Final.xml:69-72) plus the standard calendar flags.
    ``nombre_mes`` comes from the SAME Spanish month constants as the
    F7 parser (functions.cleaning.SPANISH_MONTHS), so the dimension and
    the month-name parser can never drift.

    Pure sequence+explode on a literal range — distributed, no driver
    loop, ~36.5k rows per century (a broadcast-sized dim at any scale).

    Output: ``fecha, anio, mes, dia, trimestre, isodow, is_weekend,
    nombre_mes, fecha_completa`` (the reference's non-padded string).
    """
    from datawarehousefinal_spark.functions.cleaning import SPANISH_MONTHS

    month_expr = None
    for name, num in SPANISH_MONTHS.items():
        cond = F.col("mes") == num
        month_expr = (
            F.when(cond, name)
            if month_expr is None
            else month_expr.when(cond, name)
        )
    days = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(start).cast("date"),
                F.lit(end).cast("date"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("fecha")
    )
    return (
        days.select(
            "fecha",
            F.year("fecha").cast("int").alias("anio"),
            F.month("fecha").cast("int").alias("mes"),
            F.dayofmonth("fecha").cast("int").alias("dia"),
            F.quarter("fecha").cast("int").alias("trimestre"),
            (F.weekday("fecha") + 1).cast("int").alias("isodow"),
        )
        .withColumn("is_weekend", F.col("isodow") >= 6)
        .withColumn("nombre_mes", month_expr)
        .withColumn(
            "fecha_completa",
            concat_date_nonpadded(
                F.col("anio"), F.col("mes"), F.col("dia")
            ),
        )
    )
