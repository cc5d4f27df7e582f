"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Queries map SURVEY.md §2's operator inventory onto the TPC-H-ish testdata
per FIXTURES.md §2's stand-in table (migration facts ≙ orders/lineitem,
dims ≙ customer/nation/region/supplier/part, edad ≙ l_quantity, the
Anio>Mes>Dia hierarchy ≙ o_orderdate parts, …).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from datawarehousefinal_spark import queries as Q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: movement count + avg measure by year over the star join
    (the reference's A1/A2 cube measures, Schema_Trabajo_Final.xml:69-72)."""
    return Q.movements_by_year(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(Q.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(Q.ORACLES)
