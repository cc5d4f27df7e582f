"""Round-11 query faces.

The round-10 verdict's MDX direction (next-round items #5 and stretch
#7): hierarchy-aware member keys on the MDX front door. Mondrian keys a
child level's members by their ancestor chain — a client drilling
``[Fecha].[Mes].Members`` expects (Anio, Mes) cells, not bare months
that merge January 1997 with January 1998 — and the reference's Fecha
hierarchy is 3-deep (Anio > Mes > Dia, Schema_Trabajo_Final.xml:2-13).
``CubeDef.hierarchies`` now declares that order and the translator
groups by the chain (operators/mdx.py:level_chain); these faces prove
it at the query-language level against multi-column SQL oracles:

- ``mdx_month_drilldown`` — the first thing a real cube user hits
  after year grain: month members keyed (anio, mes).
- ``mdx_day_drilldown`` — the full 3-level climb to Dia on the second
  (lineitem-fact Envios) cube: day members keyed (anio, mes, dia),
  proving the chain logic is depth- and cube-generic.

Registered into the same ``QUERIES``/``ORACLES`` registry as
:mod:`datawarehousefinal_spark.queries` (imported from its tail, before
the driver-window reorder — these land after the frozen round-11 window
and enter the rotation next round).

Hash-stability discipline (module contract, same as queries_r8/r9/r10):
counts are exact BIGINT; the avg measure is a single division of an
order-invariant double sum by an exact count, the same serve shape the
driver-green ``mdx_cube_query`` uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from datawarehousefinal_spark.queries import query

# ---------------------------------------------------------------------------
# MDX hierarchy drilldowns
# ---------------------------------------------------------------------------

_MDX_MONTH_STATEMENT = """
SELECT {[Measures].[Cantidad Movimientos], [Measures].[Promedio Medida]}
       ON COLUMNS,
       NON EMPTY {[Fecha].[Mes].Members} ON ROWS
FROM [Movimientos]
WHERE ([Cliente].[Segmento].[BUILDING])
"""


@query(
    "mdx_month_drilldown",
    oracle="""
    SELECT CAST(year(o.o_orderdate) AS INTEGER) AS anio,
           CAST(month(o.o_orderdate) AS INTEGER) AS mes,
           count(o.o_custkey) AS cantidad_movimientos,
           avg(o.o_totalprice) AS promedio_medida
    FROM orders o
    LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY 1, 2
    """,
)
def mdx_month_drilldown_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MDX month drilldown with HIERARCHY-AWARE member keys (round-10
    verdict #5): ``[Fecha].[Mes].Members`` on the Movimientos cube
    groups by the ancestor chain (anio, mes) — the Mondrian semantics
    of drilling one level below year on the reference's 3-deep Fecha
    hierarchy (Schema_Trabajo_Final.xml:2-13) — never by the bare
    month column, which would merge same-named months across years.
    The oracle is the equivalent multi-column SQL; hash equality
    proves the chain expansion, slicer included. 100 TB shape:
    identical to every cube face — the slicer pushes through the
    broadcast star, one shuffle on (anio, mes), map-side partial
    aggregation."""
    from datawarehousefinal_spark.operators.mdx import mdx_query
    from datawarehousefinal_spark.queries_r10 import _movimientos_cube

    return mdx_query(
        _movimientos_cube(spark, sf_dir), _MDX_MONTH_STATEMENT
    )


_MDX_DAY_STATEMENT = """
SELECT {[Measures].[Cantidad Movimientos]} ON COLUMNS,
       NON EMPTY {[Fecha].[Dia].Members} ON ROWS
FROM [Envios]
WHERE ([Pieza].[Marca].[Brand#1])
"""


@query(
    "mdx_day_drilldown",
    oracle="""
    SELECT CAST(year(l.l_shipdate) AS INTEGER) AS anio,
           CAST(month(l.l_shipdate) AS INTEGER) AS mes,
           CAST(day(l.l_shipdate) AS INTEGER) AS dia,
           count(l.l_orderkey) AS cantidad_movimientos
    FROM lineitem l
    LEFT JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand = 'Brand#1'
    GROUP BY 1, 2, 3
    """,
)
def mdx_day_drilldown_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full 3-level Fecha climb (round-10 verdict stretch #7):
    ``[Fecha].[Dia].Members`` on the SECOND (lineitem-fact Envios)
    cube groups by the complete ancestor chain (anio, mes, dia),
    proving ``CubeDef.level_chain`` is depth-generic and
    cube-generic — day grain is the leaf of the reference's Mondrian
    time dimension (Schema_Trabajo_Final.xml:2-13). Count-only
    measure: the day-grain hash is pure exact integers. Same scale
    shape: slicer through the broadcast star, one shuffle on the
    chain."""
    from datawarehousefinal_spark.operators.mdx import mdx_query
    from datawarehousefinal_spark.queries_r10 import _envios_cube

    return mdx_query(_envios_cube(spark, sf_dir), _MDX_DAY_STATEMENT)
