"""MDX front-door tests: parser subset, error loudness, and semantic
equivalence of the translated plan against hand-written aggregations."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datawarehousefinal_spark.operators.mdx import (
    CubeDef,
    MdxError,
    mdx_query,
    parse_mdx,
)


def _toy_cube(spark):
    def star_builder():
        return spark.createDataFrame(
            [
                (2024, 1, "AR", "A", 10.0),
                (2024, 1, "BR", "A", 30.0),
                (2024, 2, "AR", "B", 20.0),
                (2025, 1, "AR", "A", 40.0),
                (2025, 2, "CL", "B", 50.0),
            ],
            "anio int, mes int, pais string, seg string, medida double",
        )

    return CubeDef(
        name="Toy",
        star_builder=star_builder,
        levels={
            "Fecha.Anio": "anio",
            "Fecha.Mes": "mes",
            "Persona.Pais": "pais",
            "Cliente.Seg": "seg",
        },
        measures={
            "Cantidad": ("count", "medida", "n"),
            "Promedio": ("avg", "medida", "avg_medida"),
            "Total": ("sum", "medida", "sum_medida"),
        },
    )


def test_parse_members_crossjoin_slicer(spark):
    cube = _toy_cube(spark)
    measures, group_cols, member_f, slicer_f, gsets = parse_mdx(
        """
        SELECT {[Measures].[Cantidad], [Measures].[Total]} ON COLUMNS,
               NON EMPTY CROSSJOIN({[Fecha].[Anio].Members},
                                   {[Persona].[Pais].[AR],
                                    [Persona].[Pais].[BR]}) ON ROWS
        FROM [Toy]
        WHERE ([Cliente].[Seg].[A])
        """,
        cube,
    )
    assert measures == ["Cantidad", "Total"]
    assert group_cols == ["anio", "pais"]
    assert member_f == {"pais": ["AR", "BR"]}
    assert slicer_f == {"seg": ["A"]}
    assert gsets == [["anio", "pais"]]


def test_mdx_query_matches_hand_written(spark):
    cube = _toy_cube(spark)
    got = mdx_query(
        cube,
        """
        SELECT {[Measures].[Cantidad], [Measures].[Promedio]} ON COLUMNS,
               {[Fecha].[Anio].Members} ON ROWS
        FROM [Toy]
        """,
    )
    expect = (
        cube.star_builder()
        .groupBy("anio")
        .agg(
            F.count("medida").alias("n"),
            F.avg("medida").alias("avg_medida"),
        )
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, expect.collect())
    )


def test_mdx_member_dice_and_slicer_semantics(spark):
    cube = _toy_cube(spark)
    rows = mdx_query(
        cube,
        """
        SELECT {[Measures].[Total]} ON COLUMNS,
               CROSSJOIN({[Fecha].[Anio].Members},
                         {[Persona].[Pais].[AR]}) ON ROWS
        FROM [Toy] WHERE ([Cliente].[Seg].[A])
        """,
    ).collect()
    # AR+A rows: (2024, 10.0) and (2025, 40.0)
    assert sorted((r["anio"], r["pais"], r["sum_medida"]) for r in rows) == [
        (2024, "AR", 10.0),
        (2025, "AR", 40.0),
    ]


def test_mdx_multi_level_same_set(spark):
    cube = _toy_cube(spark)
    rows = mdx_query(
        cube,
        """
        SELECT {[Measures].[Cantidad]} ON COLUMNS,
               CROSSJOIN({[Fecha].[Anio].Members},
                         {[Fecha].[Mes].Members}) ON ROWS
        FROM [Toy]
        """,
    ).collect()
    assert {(r["anio"], r["mes"]) for r in rows} == {
        (2024, 1), (2024, 2), (2025, 1), (2025, 2),
    }


@pytest.mark.parametrize(
    "bad",
    [
        "SELECT {[Measures].[Nope]} ON COLUMNS, {[Fecha].[Anio].Members} ON ROWS FROM [Toy]",
        "SELECT {[Measures].[Cantidad]} ON COLUMNS, {[Fecha].[Quarter].Members} ON ROWS FROM [Toy]",
        "SELECT {[Measures].[Cantidad]} ON COLUMNS, {[Fecha].[Anio].Members} ON ROWS FROM [OtherCube]",
        "SELECT {[Fecha].[Anio].Members} ON COLUMNS, {[Fecha].[Anio].Members} ON ROWS FROM [Toy]",
        "SELECT {[Measures].[Cantidad]} ON COLUMNS, {[Fecha].[Anio].Members} ON ROWS FROM [Toy] WHERE ([Cliente].[Seg].Members)",
        "SELECT {[Measures].[Cantidad]} ON COLUMNS, {[Fecha].[Anio].Members} ON ROWS FROM [Toy] trailing",
    ],
)
def test_mdx_errors_are_loud(spark, bad):
    with pytest.raises(MdxError):
        parse_mdx(bad, _toy_cube(spark))


def test_mdx_face_registered():
    import __spark_entry__ as m

    qs, os_ = m.queries(), m.oracle_sql()
    assert "mdx_cube_query" in qs and "mdx_cube_query" in os_


def test_mdx_all_member_expands_to_grouping_sets(spark):
    cube = _toy_cube(spark)
    rows = mdx_query(
        cube,
        """
        SELECT {[Measures].[Total]} ON COLUMNS,
               {[Fecha].[(All)], [Fecha].[Anio].Members} ON ROWS
        FROM [Toy]
        """,
    ).collect()
    got = {(r["anio"], r["sum_medida"]) for r in rows}
    # per-year cells plus the hasAll grand total (NULL year)
    assert got == {(2024, 60.0), (2025, 90.0), (None, 150.0)}


def test_mdx_crossjoined_all_lattice(spark):
    cube = _toy_cube(spark)
    rows = mdx_query(
        cube,
        """
        SELECT {[Measures].[Cantidad]} ON COLUMNS,
               CROSSJOIN({[Fecha].[(All)], [Fecha].[Anio].Members},
                         {[Persona].[Pais].[(All)],
                          [Persona].[Pais].Members}) ON ROWS
        FROM [Toy]
        """,
    ).collect()
    cells = {(r["anio"], r["pais"]): r["n"] for r in rows}
    # full 2x2 grouping-set lattice: (anio,pais), (anio), (pais), ()
    assert cells[(None, None)] == 5          # grand total
    assert cells[(2024, None)] == 3          # year subtotal
    assert cells[(None, "AR")] == 3          # country subtotal
    assert cells[(2024, "AR")] == 2          # leaf cell


def test_mdx_all_only_set_is_grand_total(spark):
    cube = _toy_cube(spark)
    rows = mdx_query(
        cube,
        """
        SELECT {[Measures].[Cantidad]} ON COLUMNS,
               {[Fecha].[(All)]} ON ROWS
        FROM [Toy]
        """,
    ).collect()
    assert len(rows) == 1 and rows[0]["n"] == 5


def test_mdx_all_respects_slicer_visual_totals(spark):
    cube = _toy_cube(spark)
    rows = mdx_query(
        cube,
        """
        SELECT {[Measures].[Total]} ON COLUMNS,
               {[Fecha].[(All)], [Fecha].[Anio].Members} ON ROWS
        FROM [Toy] WHERE ([Cliente].[Seg].[A])
        """,
    ).collect()
    got = {(r["anio"], r["sum_medida"]) for r in rows}
    # seg=A rows: (2024, 10+30), (2025, 40); All totals the slice
    assert got == {(2024, 40.0), (2025, 40.0), (None, 80.0)}


def test_mdx_members_absorbs_explicit_member_of_same_level(spark):
    # a set is a UNION: .Members + an explicit member of the same level
    # must NOT collapse to a dice on the explicit member
    cube = _toy_cube(spark)
    rows = mdx_query(
        cube,
        """
        SELECT {[Measures].[Cantidad]} ON COLUMNS,
               {[Fecha].[Anio].Members, [Fecha].[Anio].[2024]} ON ROWS
        FROM [Toy]
        """,
    ).collect()
    assert {r["anio"] for r in rows} == {2024, 2025}


def test_mdx_duplicate_level_across_sets_is_loud(spark):
    with pytest.raises(MdxError):
        parse_mdx(
            """
            SELECT {[Measures].[Cantidad]} ON COLUMNS,
                   CROSSJOIN({[Fecha].[(All)], [Fecha].[Anio].Members},
                             {[Fecha].[Anio].[2024]}) ON ROWS
            FROM [Toy]
            """,
            _toy_cube(spark),
        )


def test_mdx_unknown_dimension_all_is_loud(spark):
    with pytest.raises(MdxError):
        parse_mdx(
            """
            SELECT {[Measures].[Cantidad]} ON COLUMNS,
                   {[Tyop].[(All)], [Fecha].[Anio].Members} ON ROWS
            FROM [Toy]
            """,
            _toy_cube(spark),
        )


def test_mdx_duplicate_measure_is_loud(spark):
    with pytest.raises(MdxError):
        parse_mdx(
            """
            SELECT {[Measures].[Cantidad], [Measures].[Cantidad]}
                   ON COLUMNS,
                   {[Fecha].[Anio].Members} ON ROWS
            FROM [Toy]
            """,
            _toy_cube(spark),
        )
