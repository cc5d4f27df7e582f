"""Declarative data-quality expectations — the accept/reject gate an
ingest pipeline runs before publishing a batch.

The reference's quality checks are ad-hoc prints (unmapped categories,
class distributions); the general warehouse form (Deequ / dbt tests /
Great Expectations) is a RULE LIST evaluated into a violations report.
Three rule shapes, each with its natural plan:

- **row rules** (not-null, range, regex, set membership): ALL of them
  evaluate in ONE aggregation pass — each rule is a
  ``sum(when(violated, 1))`` expression in a single ``df.agg``, so a
  hundred rules still cost exactly one scan (the profiler's single-pass
  discipline).
- **uniqueness**: one groupBy per key set counting groups with >1 row —
  the only shape that genuinely needs a shuffle on the key.
- **referential integrity**: a left-anti join against the dimension —
  broadcast when the dim is small, the same join the FK attach itself
  uses, so the check costs what the load costs.

The report is a LAZY union of single-row aggregates (the curation-funnel
pattern — no driver-side counts), so the whole gate is one job when the
caller actions it.

All three shapes are exactly SQL-replayable; the registered
``dq_violations`` query is oracled.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def row_rule_report(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Evaluate row-level rules (each a boolean Column that is TRUE when
    the row VIOLATES the rule) in one aggregation pass.

    Output: ``check, n_violations`` — one row per rule, all from a
    single scan regardless of rule count.
    """
    if not rules:
        raise ValueError("row_rule_report needs at least one rule")
    names = sorted(rules)
    wide = df.agg(
        *[
            F.sum(F.when(rules[n], 1).otherwise(0)).cast("long").alias(f"__v{i}")
            for i, n in enumerate(names)
        ]
    )
    from datawarehousefinal_spark.operators.unpivot import unpivot_single_row

    return unpivot_single_row(
        wide,
        [(n, F.col(f"__v{i}")) for i, n in enumerate(names)],
        ["check", "n_violations"],
    )


def unique_report(
    df: DataFrame, name: str, key_cols: list[str]
) -> DataFrame:
    """Duplicate-key violations: number of EXTRA rows beyond one per
    distinct key (0 ⇔ the key is unique). One map-side-combined groupBy
    on the key."""
    return (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("__n"))
        .agg(
            F.lit(name).alias("check"),
            F.coalesce(F.sum(F.col("__n") - 1), F.lit(0))
            .cast("long")
            .alias("n_violations"),
        )
    )


def foreign_key_report(
    fact: DataFrame,
    name: str,
    fk_col: str,
    dim: DataFrame,
    dim_col: str,
) -> DataFrame:
    """Orphaned-FK violations: fact rows (with non-null keys) whose key
    has no dimension row. Left-anti join — broadcast for small dims,
    exactly the join shape the FK attach pays anyway."""
    orphans = (
        fact.select(F.col(fk_col)).filter(F.col(fk_col).isNotNull())
        .join(
            dim.select(F.col(dim_col).alias(fk_col)).distinct(),
            fk_col,
            "left_anti",
        )
    )
    return orphans.agg(
        F.lit(name).alias("check"),
        F.count(F.lit(1)).cast("long").alias("n_violations"),
    )


def dq_report(
    df: DataFrame,
    row_rules: dict[str, Column] | None = None,
    unique_keys: dict[str, list[str]] | None = None,
    foreign_keys: dict[str, tuple[str, DataFrame, str]] | None = None,
) -> DataFrame:
    """Full expectations report: ``check, n_violations``, one row per
    rule, built as a lazy union (one Spark job when actioned; the row
    rules share one scan)."""
    parts: list[DataFrame] = []
    if row_rules:
        parts.append(row_rule_report(df, row_rules))
    for name, keys in sorted((unique_keys or {}).items()):
        parts.append(unique_report(df, name, keys))
    for name, (fk_col, dim, dim_col) in sorted((foreign_keys or {}).items()):
        parts.append(foreign_key_report(df, name, fk_col, dim, dim_col))
    if not parts:
        raise ValueError("dq_report needs at least one rule")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
