"""MDX front door for the Mondrian cube surface (SURVEY §3.3).

The reference exposes its two cubes to BI clients through Mondrian,
whose query language is MDX (Schema_Trabajo_Final.xml:56-91 declares
the cubes; clients send ``SELECT ... ON COLUMNS, ... ON ROWS FROM
[Cube] WHERE (...)``). The engine's OLAP surface re-expressed those
cubes as DataFrame/SQL plans (operators/olap.py); this module closes
the last front-door gap by translating the MDX subset those cubes
actually serve into the same plans — so a Mondrian client's query text
runs unchanged.

Supported subset (the shapes the reference schema can answer):

- ``SELECT {<measures>} ON COLUMNS, <set> ON ROWS FROM [Cube]``
- measure references ``[Measures].[Name]``
- level member sets ``{[Dim].[Level].Members}`` (drill to a level).
  HIERARCHY-AWARE: when the cube declares a level hierarchy for the
  dimension (``CubeDef.hierarchies``, e.g. Fecha = Anio > Mes > Dia,
  Schema_Trabajo_Final.xml:2-13), members of a child level are keyed
  by their full ancestor chain — ``[Fecha].[Mes].Members`` yields
  (Anio, Mes) cells, exactly as a Mondrian client drilling past year
  grain expects (January 1997 is a DIFFERENT member than January
  1998). Dimensions without a declared hierarchy keep single-column
  keys.
- explicit member sets ``{[Dim].[Level].[v1], [Dim].[Level].[v2]}``
  (a dice: group by the level — ancestor-chain-keyed when a hierarchy
  is declared — keep the named members)
- ``CROSSJOIN(<set>, <set>)`` / nested crossjoins (multi-dim rows axis)
- the grand-total member ``[Dim].[(All)]`` (every reference hierarchy
  declares ``hasAll="true"``): a set mixing ``(All)`` with a level
  drilldown — ``{[Fecha].[(All)], [Fecha].[Anio].Members}`` — expands
  to GROUPING SETS (the level cells plus the all-member cell, NULL in
  the level column, Spark rollup convention); crossjoined All sets
  multiply into the grouping-set lattice, all in ONE Expand +
  HashAggregate pass (never a per-level re-scan)
- ``NON EMPTY`` on the rows axis — a DOCUMENTED no-op: groupBy only
  materializes non-empty cells, and for hasAll grouping-set lattices
  Spark's Expand + HashAggregate emits ZERO rows on empty input (the
  ``()`` grouping set is still a keyed group, unlike a global
  aggregate, so no fabricated All cell ever appears). NON EMPTY and
  its absence therefore coincide on every plan this translator can
  emit; pinned by tests/test_mdx.py::test_mdx_empty_input_emits_no_all_cell
- slicer tuple ``WHERE ([Dim].[Level].[member], ...)`` (equality
  filters applied BEFORE aggregation, Mondrian slicer semantics).
  Member dices on the rows axis also filter before aggregation, so an
  All cell over a diced set totals the VISIBLE members (MDX
  ``VisualTotals`` semantics) — documented, deterministic, oracled.

Deliberately out of scope (the schema never exercises them): calculated
members, named sets, ``PARALLELPERIOD``/time intelligence, member
properties, sub-selects.

Execution model: the cube definition supplies a DENORMALIZED star
builder (broadcast dim joins — the same star the SQL serving path
registers) plus level→column and measure→aggregate mappings; the
translated query is one ``groupBy(levels).agg(measures)`` over the
slicer-filtered star. At 100 TB that is exactly the hand-written plan:
slicer predicates push through the star's dim joins, the fact shuffles
once on the grouping keys, aggregates partially combine map-side.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class MdxError(ValueError):
    """Raised for MDX text outside the supported subset, or references
    to cubes/levels/measures/members the cube definition doesn't
    declare — loud, never a silent wrong answer."""


@dataclass
class CubeDef:
    """A Mondrian-style cube declaration, Spark-side.

    ``levels`` maps ``"Dim.Level"`` (case-insensitive) to the star
    column that carries it; ``measures`` maps a measure name to an
    ``(aggregator, column, output_alias)`` triple with aggregator in
    {count, sum, avg, min, max} — the Mondrian ``aggregator=`` set the
    reference schema uses (count/avg) plus the obvious siblings.

    ``hierarchies`` (optional) maps a dimension name to its ordered
    level-name list, top grain first (Mondrian ``<Hierarchy>`` order —
    the reference's Fecha declares Anio > Mes > Dia,
    Schema_Trabajo_Final.xml:2-13). When declared, a member of a child
    level is keyed by its ANCESTOR CHAIN: drilling ``[Fecha].[Mes]``
    groups by (anio_col, mes_col), never by the bare month (which
    would merge January 1997 with January 1998). A dimension absent
    from ``hierarchies`` keeps single-column member keys.
    """

    name: str
    star_builder: Callable[..., DataFrame]
    levels: dict[str, str] = field(default_factory=dict)
    measures: dict[str, tuple[str, str, str]] = field(default_factory=dict)
    hierarchies: dict[str, list[str]] = field(default_factory=dict)

    def level_column(self, dim: str, level: str) -> str:
        key = f"{dim}.{level}".lower()
        for k, v in self.levels.items():
            if k.lower() == key:
                return v
        raise MdxError(
            f"unknown level [{dim}].[{level}] on cube [{self.name}]"
        )

    def level_chain(self, dim: str, level: str) -> list[str]:
        """Star columns keying a member of ``[dim].[level]``: the
        declared ancestor levels' columns (top grain first) plus the
        level's own column; just the level's column when the dimension
        declares no hierarchy. Loud on a level missing from its
        dimension's declared hierarchy — a cube-definition bug, never
        a silent single-column fallback."""
        for hdim, hlevels in self.hierarchies.items():
            if hdim.lower() != dim.lower():
                continue
            for i, lvl in enumerate(hlevels):
                if lvl.lower() == level.lower():
                    return [
                        self.level_column(dim, anc)
                        for anc in hlevels[: i + 1]
                    ]
            raise MdxError(
                f"level [{dim}].[{level}] is not in the declared "
                f"hierarchy {hlevels} on cube [{self.name}]"
            )
        return [self.level_column(dim, level)]

    def measure_agg(self, name: str):
        for k, (agg, col, alias) in self.measures.items():
            if k.lower() == name.lower():
                if agg == "count":
                    return F.count(col).alias(alias)
                if agg == "sum":
                    return F.sum(col).alias(alias)
                if agg == "avg":
                    return F.avg(col).alias(alias)
                if agg == "min":
                    return F.min(col).alias(alias)
                if agg == "max":
                    return F.max(col).alias(alias)
                raise MdxError(f"unsupported aggregator {agg!r}")
        raise MdxError(
            f"unknown measure [Measures].[{name}] on cube [{self.name}]"
        )


# -- tokenizer ---------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<seg>\[[^\]]*\])       # [bracketed segment]
      | (?P<word>[A-Za-z_][A-Za-z_0-9]*)
      | (?P<punct>[{}(),.])
    )""",
    re.VERBOSE,
)


def _tokenize(text: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m:
            if text[pos:].strip():
                raise MdxError(f"unexpected character at: {text[pos:pos+20]!r}")
            break
        if m.group("seg") is not None:
            out.append(("seg", m.group("seg")[1:-1]))
        elif m.group("word") is not None:
            out.append(("word", m.group("word")))
        else:
            out.append(("punct", m.group("punct")))
        pos = m.end()
    return out


class _Parser:
    def __init__(self, tokens: list[tuple[str, str]]):
        self.toks = tokens
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else ("eof", "")

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def expect_word(self, word: str):
        kind, val = self.next()
        if kind != "word" or val.upper() != word.upper():
            raise MdxError(f"expected {word!r}, got {val!r}")

    def expect_punct(self, p: str):
        kind, val = self.next()
        if kind != "punct" or val != p:
            raise MdxError(f"expected {p!r}, got {val!r}")

    # member path: [Seg].[Seg](.[Seg] | .Members)*
    def member_path(self):
        kind, val = self.next()
        if kind != "seg":
            raise MdxError(f"expected [segment], got {val!r}")
        segs, members = [val], False
        while self.peek() == ("punct", "."):
            self.next()
            kind, val = self.next()
            if kind == "seg":
                segs.append(val)
            elif kind == "word" and val.upper() == "MEMBERS":
                members = True
                break
            else:
                raise MdxError(f"expected [segment] or Members, got {val!r}")
        return segs, members

    # set := '{' path (',' path)* '}' | CROSSJOIN '(' set ',' set ')'
    def parse_set(self):
        kind, val = self.peek()
        if kind == "word" and val.upper() == "CROSSJOIN":
            self.next()
            self.expect_punct("(")
            left = self.parse_set()
            self.expect_punct(",")
            right = self.parse_set()
            self.expect_punct(")")
            return [("crossjoin", left, right)]
        self.expect_punct("{")
        items = [self.member_path()]
        while self.peek() == ("punct", ","):
            self.next()
            items.append(self.member_path())
        self.expect_punct("}")
        return [("set", items)]


def _rows_axis(node_list, cube: CubeDef):
    """Flatten the rows-axis AST into (group_columns, member_filters,
    grouping_alternatives): every crossjoin branch and set item
    contributes its level's column; explicit member sets additionally
    contribute an IN filter; an ``[Dim].[(All)]`` item makes the set's
    columns OPTIONAL — each set yields its list of grouping
    alternatives ([cols] alone, or [cols] plus [] when All is present),
    and the crossjoin product of alternatives is the grouping-set
    lattice the query answers."""
    group_cols: list[str] = []
    filters: dict[str, list[str]] = {}
    alternatives: list[list[list[str]]] = []

    def walk(nodes):
        for node in nodes:
            if node[0] == "crossjoin":
                walk(node[1])
                walk(node[2])
                continue
            _, items = node
            # per level: explicit members plus whether .Members appeared
            # (a set is a UNION — .Members absorbs any explicit member of
            # the same level, so the dice filter must then be dropped)
            by_level: dict[tuple[str, str], dict] = {}
            has_all = False
            for segs, is_members in items:
                # the hasAll grand-total member, hierarchy-qualified
                # ([Dim].[(All)]) or level-qualified ([Dim].[Level].[(All)])
                if not is_members and segs[-1].lower() == "(all)" and (
                    len(segs) in (2, 3)
                ):
                    if len(segs) == 3:
                        cube.level_column(segs[0], segs[1])  # validate
                    else:
                        dim_key = segs[0].lower() + "."
                        if not any(
                            k.lower().startswith(dim_key)
                            for k in cube.levels
                        ):
                            raise MdxError(
                                f"unknown dimension [{segs[0]}] on cube "
                                f"[{cube.name}]"
                            )
                    has_all = True
                elif len(segs) == 2 and is_members:
                    by_level.setdefault(
                        (segs[0], segs[1]), {"all_members": False, "vals": []}
                    )["all_members"] = True
                elif len(segs) == 3 and not is_members:
                    by_level.setdefault(
                        (segs[0], segs[1]), {"all_members": False, "vals": []}
                    )["vals"].append(segs[2])
                else:
                    raise MdxError(
                        "rows axis items must be [Dim].[Level].Members, "
                        f"[Dim].[Level].[member] or [Dim].[(All)], got {segs}"
                    )
            set_cols: list[str] = []
            for (dim, level), sel in by_level.items():
                # hierarchy-aware member key: the level's ancestor-chain
                # columns (single column when no hierarchy is declared)
                chain = cube.level_chain(dim, level)
                for col in chain:
                    if col in group_cols:
                        # the same Mondrian error: a hierarchy may appear
                        # in only one axis set — a duplicate (including a
                        # child level whose ancestor chain overlaps a
                        # level already selected) would emit duplicated
                        # grouping columns (doubled rows)
                        raise MdxError(
                            f"level [{dim}].[{level}] (chain {chain}) "
                            "overlaps a level already on the rows axis"
                        )
                    set_cols.append(col)
                    group_cols.append(col)
                if sel["vals"] and not sel["all_members"]:
                    # the dice filters on the level's OWN column; its
                    # ancestors stay grouping-only (visual totals per
                    # ancestor cell)
                    filters.setdefault(chain[-1], []).extend(sel["vals"])
            opts = [set_cols]
            if has_all and set_cols:
                opts.append([])
            alternatives.append(opts)

    walk(node_list)
    return group_cols, filters, alternatives


def parse_mdx(text: str, cube: CubeDef):
    """Parse an MDX SELECT against ``cube``; returns
    (measure_names, group_cols, member_filters, slicer_filters)."""
    p = _Parser(_tokenize(text))
    p.expect_word("SELECT")

    # COLUMNS axis: measures
    cols_set = p.parse_set()
    p.expect_word("ON")
    p.expect_word("COLUMNS")
    if len(cols_set) != 1 or cols_set[0][0] != "set":
        raise MdxError("COLUMNS axis must be a {measure, ...} set")
    measure_names = []
    for segs, is_members in cols_set[0][1]:
        if len(segs) != 2 or segs[0].lower() != "measures" or is_members:
            raise MdxError(
                f"COLUMNS axis items must be [Measures].[Name], got {segs}"
            )
        if segs[1].lower() not in {k.lower() for k in cube.measures}:
            raise MdxError(
                f"unknown measure [Measures].[{segs[1]}] on cube "
                f"[{cube.name}]"
            )
        if segs[1].lower() in {m.lower() for m in measure_names}:
            raise MdxError(
                f"measure [Measures].[{segs[1]}] appears twice on the "
                "COLUMNS axis"
            )
        measure_names.append(segs[1])

    p.expect_punct(",")
    # optional NON EMPTY
    kind, val = p.peek()
    if kind == "word" and val.upper() == "NON":
        p.next()
        p.expect_word("EMPTY")
    rows_set = p.parse_set()
    p.expect_word("ON")
    p.expect_word("ROWS")
    group_cols, member_filters, alternatives = _rows_axis(rows_set, cube)
    if not alternatives:
        raise MdxError("ROWS axis selected no levels")
    # crossjoin product of each set's grouping alternatives = the
    # grouping-set lattice; a single full-column set degenerates to a
    # plain GROUP BY (kept distinct so the simple case keeps the
    # simple plan).
    from itertools import product as _product

    grouping_sets, _seen = [], set()
    for combo in _product(*alternatives):
        gs = [c for opt in combo for c in opt]
        key = tuple(gs)
        if key not in _seen:
            _seen.add(key)
            grouping_sets.append(gs)

    p.expect_word("FROM")
    kind, val = p.next()
    if kind != "seg":
        raise MdxError(f"expected [CubeName], got {val!r}")
    if val.lower() != cube.name.lower():
        raise MdxError(f"query addresses cube [{val}], not [{cube.name}]")

    slicer_filters: dict[str, list[str]] = {}
    kind, val = p.peek()
    if kind == "word" and val.upper() == "WHERE":
        p.next()
        p.expect_punct("(")
        while True:
            segs, is_members = p.member_path()
            if len(segs) != 3 or is_members:
                raise MdxError(
                    f"slicer members must be [Dim].[Level].[member], "
                    f"got {segs}"
                )
            col = cube.level_column(segs[0], segs[1])
            slicer_filters.setdefault(col, []).append(segs[2])
            if p.peek() == ("punct", ","):
                p.next()
                continue
            break
        p.expect_punct(")")
    if p.peek()[0] != "eof":
        raise MdxError(f"trailing tokens from {p.peek()[1]!r}")
    return (
        measure_names,
        group_cols,
        member_filters,
        slicer_filters,
        grouping_sets,
    )


def mdx_query(cube: CubeDef, mdx: str, *star_args) -> DataFrame:
    """Run an MDX SELECT against a cube: build the star, apply slicer
    and rows-axis member filters (both BEFORE aggregation — they reach
    the scans through the star's broadcast joins), group by the rows-
    axis level columns, aggregate the COLUMNS-axis measures. A rows
    axis without ``(All)`` members is a plain groupBy; with them, the
    grouping-set lattice runs as ONE Expand + HashAggregate (All cells
    carry NULL in their level columns, the Spark rollup convention).
    Either way: one shuffle, partial aggregation, no driver-side
    evaluation."""
    measures, group_cols, member_f, slicer_f, gsets = parse_mdx(mdx, cube)
    star = cube.star_builder(*star_args)
    for col, vals in (*slicer_f.items(), *member_f.items()):
        star = star.filter(F.col(col).isin(vals))
    aggs = [cube.measure_agg(m) for m in measures]
    if len(gsets) == 1:
        return star.groupBy(*gsets[0]).agg(*aggs)
    return star.groupingSets(gsets, *group_cols).agg(*aggs)
