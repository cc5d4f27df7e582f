"""Seeded differential fuzz for the MDX translator.

The per-face oracles exercise fixed statements; the drift risk is in the
COMBINATIONS — a wrapper over a crossjoin over a diced hierarchy under a
slicer. This suite generates seeded random query specs, renders each
spec TWICE — as MDX text through the full parse/translate/execute path,
and as DuckDB SQL written directly from the spec (an independent
implementation of the intended semantics, never derived from the
parser's output) — and requires row-set agreement. A translator bug in
filter placement, hierarchy keying, grouping, wrapper ordering, or
calculated-member arithmetic cannot hide behind the fixed fixtures.

Seeded (not hypothesis): each example spins Spark jobs, so the suite
pins a deterministic battery instead of shrinking adversarially — the
repo convention for engine-involving fuzz (see test_fuzz_differential).
"""

from __future__ import annotations

import math
import random

import duckdb
import pandas as pd
import pytest

from datawarehousefinal_spark.operators.mdx import CubeDef, mdx_query

# -- fixed seeded star --------------------------------------------------------

_RNG = random.Random(20260816)
_ROWS = [
    (
        _RNG.choice([2023, 2024, 2025]),
        _RNG.choice([1, 2, 3, 4]),
        _RNG.choice(["A", "B", "C"]),
        _RNG.choice(["X", "Y"]),
        round(_RNG.uniform(1, 100), 1),
    )
    for _ in range(40)
]
_PDF = pd.DataFrame(_ROWS, columns=["anio", "mes", "pais", "seg", "medida"])

_MEASURES = {
    "Cantidad": ("count", "medida", "n"),
    "Total": ("sum", "medida", "sum_medida"),
    "Promedio": ("avg", "medida", "avg_medida"),
    "Minimo": ("min", "medida", "min_medida"),
    "Maximo": ("max", "medida", "max_medida"),
}
_SQL_AGG = {
    "Cantidad": "count(medida)",
    "Total": "sum(medida)",
    "Promedio": "avg(medida)",
    "Minimo": "min(medida)",
    "Maximo": "max(medida)",
}

# rows-axis shapes: (mdx set, group cols, extra where-clauses)
_SHAPES = [
    ("{[Fecha].[Anio].Members}", ["anio"], []),
    ("{[Fecha].[Mes].Members}", ["anio", "mes"], []),
    (
        "CROSSJOIN({[Fecha].[Anio].Members}, {[Persona].[Pais].Members})",
        ["anio", "pais"],
        [],
    ),
    (
        "CROSSJOIN({[Fecha].[Anio].Members}, "
        "{[Persona].[Pais].[A], [Persona].[Pais].[B]})",
        ["anio", "pais"],
        ["pais IN ('A', 'B')"],
    ),
    (
        "{[Fecha].[Anio].[2023]:[Fecha].[Anio].[2024]}",
        ["anio"],
        ["anio BETWEEN 2023 AND 2024"],
    ),
    ("{[Persona].[Pais].Members}", ["pais"], []),
    ("{[Fecha].[Mes].[2]}", ["anio", "mes"], ["mes = 2"]),
]


def _cube(spark):
    return CubeDef(
        name="Fuzz",
        star_builder=lambda: spark.createDataFrame(_PDF),
        levels={
            "Fecha.Anio": "anio",
            "Fecha.Mes": "mes",
            "Persona.Pais": "pais",
            "Cliente.Seg": "seg",
        },
        measures=dict(_MEASURES),
        hierarchies={"Fecha": ["Anio", "Mes"]},
        period_lengths={"Fecha.Mes": 12},
    )


def _gen_spec(seed: int) -> dict:
    rng = random.Random(seed)
    measures = rng.sample(sorted(_MEASURES), rng.randint(1, 3))
    calc = None
    if rng.random() < 0.5:
        a, b = rng.sample(sorted(_MEASURES), 2)
        op = rng.choice(["+", "-", "*"])
        calc = (a, op, b)
    shape = rng.choice(_SHAPES)
    slicer = rng.choice([None, "X", "Y"])
    wrapper = None
    if rng.random() < 0.5:
        kind = rng.choice(["topcount", "bottomcount", "head", "tail", "filter"])
        if kind in ("topcount", "bottomcount"):
            wrapper = (kind, rng.randint(1, 4), rng.choice(measures))
        elif kind in ("head", "tail"):
            wrapper = (kind, rng.randint(1, 4))
        else:
            wrapper = ("filter", rng.choice(measures), rng.choice([10, 40, 60]))
    return {
        "measures": measures,
        "calc": calc,
        "shape": shape,
        "slicer": slicer,
        "wrapper": wrapper,
    }


def _render_mdx(spec: dict) -> str:
    cols = [f"[Measures].[{m}]" for m in spec["measures"]]
    with_clause = ""
    if spec["calc"]:
        a, op, b = spec["calc"]
        with_clause = (
            f"WITH MEMBER [Measures].[Extra] AS "
            f"'[Measures].[{a}] {op} [Measures].[{b}]' "
        )
        cols.append("[Measures].[Extra]")
    rows = spec["shape"][0]
    w = spec["wrapper"]
    if w:
        if w[0] in ("topcount", "bottomcount"):
            rows = f"{w[0].upper()}({rows}, {w[1]}, [Measures].[{w[2]}])"
        elif w[0] in ("head", "tail"):
            rows = f"{w[0].upper()}({rows}, {w[1]})"
        else:
            rows = f"FILTER({rows}, [Measures].[{w[1]}] > {w[2]})"
    q = (
        f"{with_clause}SELECT {{{', '.join(cols)}}} ON COLUMNS, "
        f"{rows} ON ROWS FROM [Fuzz]"
    )
    if spec["slicer"]:
        q += f" WHERE ([Cliente].[Seg].[{spec['slicer']}])"
    return q


def _render_sql(spec: dict) -> str:
    """The INDEPENDENT rendering: intended semantics straight from the
    spec. Dices and slicers filter BEFORE aggregation; wrappers act on
    the aggregated cells; hierarchy levels group by their chain."""
    _set, gcols, dices = spec["shape"]
    where = list(dices)
    if spec["slicer"]:
        where.append(f"seg = '{spec['slicer']}'")
    sel = list(gcols)
    for m in spec["measures"]:
        sel.append(f"{_SQL_AGG[m]} AS {_MEASURES[m][2]}")
    if spec["calc"]:
        a, op, b = spec["calc"]
        sel.append(f"({_SQL_AGG[a]}) {op} ({_SQL_AGG[b]}) AS extra")
    sql = f"SELECT {', '.join(sel)} FROM star"
    if where:
        sql += " WHERE " + " AND ".join(where)
    sql += f" GROUP BY {', '.join(gcols)}"
    w = spec["wrapper"]
    if w:
        if w[0] == "filter":
            sql += f" HAVING {_SQL_AGG[w[1]]} > {w[2]}"
        elif w[0] in ("topcount", "bottomcount"):
            d = "DESC" if w[0] == "topcount" else "ASC"
            keys = ", ".join(gcols)
            sql += f" ORDER BY {_SQL_AGG[w[2]]} {d}, {keys} LIMIT {w[1]}"
        else:
            d = "ASC" if w[0] == "head" else "DESC"
            keys = ", ".join(f"{c} {d}" for c in gcols)
            sql += f" ORDER BY {keys} LIMIT {w[1]}"
    return sql


def _norm(rows) -> list:
    out = []
    for r in rows:
        t = []
        for v in r:
            if isinstance(v, float):
                t.append(round(v, 6) if math.isfinite(v) else repr(v))
            else:
                t.append(v)
        out.append(tuple(t))
    return sorted(out, key=repr)


@pytest.mark.parametrize("seed", range(100, 140))
def test_mdx_translator_agrees_with_independent_sql(spark, seed):
    spec = _gen_spec(seed)
    mdx = _render_mdx(spec)
    sql = _render_sql(spec)

    got_df = mdx_query(_cube(spark), mdx)
    got = _norm([tuple(r) for r in got_df.collect()])

    con = duckdb.connect()
    try:
        con.register("star", _PDF)
        want = _norm(con.execute(sql).fetchall())
    finally:
        con.close()

    assert got == want, (
        f"seed {seed}\nMDX: {mdx}\nSQL: {sql}\ngot {got}\nwant {want}"
    )
