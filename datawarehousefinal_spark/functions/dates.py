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
