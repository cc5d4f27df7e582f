"""Registry of driver-checkable queries (one per SURVEY.md §2 operator).

Each entry pairs a Spark implementation ``(spark, sf_dir) -> DataFrame``
with a DuckDB oracle SQL string over the same parquet tables. Column names
AND types are aligned on both sides (the driver hashes values after sorting
columns by name), so every computed column is explicitly aliased and cast.

Queries with no SQL-expressible oracle (minhash, streaming, ML) register
with ``oracle=None`` → the driver records a weaker rows-only check; their
real verification lives in tests/.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datawarehousefinal_spark.operators import olap
from datawarehousefinal_spark.sources.testdata import load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a query implementation and (optionally) its DuckDB oracle."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------------------
# Flagship + OLAP measures (SURVEY.md §2.5 A1-A3, §2.3 J1/J3)
# ---------------------------------------------------------------------------

@query(
    "movements_by_year",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INTEGER) AS anio,
           count(*) AS cantidad_movimientos,
           avg(o_totalprice) AS promedio_medida
    FROM orders
    GROUP BY 1
    ORDER BY anio
    """,
)
def movements_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A2 cube measures by the top level of the Fecha hierarchy
    (count + avg per year — Schema_Trabajo_Final.xml:69-72,87-90)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.year("o_orderdate").alias("anio"))
        .agg(
            F.count(F.lit(1)).alias("cantidad_movimientos"),
            F.avg("o_totalprice").alias("promedio_medida"),
        )
        .orderBy("anio")
    )


@query(
    "cube_measures_by_dims",
    oracle="""
    SELECT n.n_name AS nacionalidad,
           c.c_mktsegment AS segmento,
           count(o.o_custkey) AS cantidad_movimientos,
           avg(o.o_totalprice) AS promedio_medida
    FROM orders o
    LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY 1, 2
    """,
)
def cube_measures_by_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A2 over a 2-dim slice of the star join (J3 Mondrian slice/dice).

    Counts the fact FK like Mondrian's count(id_persona). Dims broadcast;
    the fact table shuffles once, on the grouping keys.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    star = orders.join(
        F.broadcast(customer), orders.o_custkey == customer.c_custkey, "left"
    ).join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey, "left")
    return olap.cube_measures(
        star.select(
            F.col("n_name").alias("nacionalidad"),
            F.col("c_mktsegment").alias("segmento"),
            F.col("o_custkey"),
            F.col("o_totalprice"),
        ),
        group_cols=["nacionalidad", "segmento"],
        count_col="o_custkey",
        avg_col="o_totalprice",
    ).withColumnsRenamed({"promedio_edades": "promedio_medida"})
