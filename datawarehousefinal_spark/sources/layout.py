"""Z-order clustered data layout — multi-dimensional file-skipping.

The scale problem: parquet scan pruning works off per-file (and per-row-
group) min/max statistics, and a table can only be SORTED on one
dimension — a layout clustered by ``custkey`` prunes nothing for a
``totalprice`` predicate. Z-ordering (Morton order — the technique behind
Delta Lake's ``OPTIMIZE ZORDER BY`` and ClickHouse/DuckDB space-filling-
curve layouts) interleaves the bits of several normalized columns into
one key and range-partitions + sorts the data by that key: every output
file then covers a small HYPER-RECTANGLE of the combined key space, so
min/max stats prune files for predicates on ANY of the z-columns (at
mild cost to each individually vs a dedicated single-column sort).

Spark mapping: normalization is one tiny min/max aggregate (driver-side
scalars), the z-key is pure codegen bit arithmetic, and the layout move
is ``repartitionByRange(z) + sortWithinPartitions(z)`` — exactly one
range shuffle, the same cost as any clustered write. Nothing here is
driver-bound: the sampled range boundaries are Spark's own
repartitionByRange machinery.

Normalization is uniform (``width_bucket`` over the column's min/max).
For heavily skewed columns, pre-transform to a more uniform space (e.g.
``log`` for heavy-tailed amounts, or rank-bucket via ``ntile`` at ETL
time) before z-ordering — interleaving wants roughly equal-information
bits from each dimension. File-skipping effectiveness is asserted
empirically in tests/test_layout.py by reading parquet footer stats.

Reference scope: beyond-reference scale machinery; the reference's only
layout control is a Kettle parquet sink (SURVEY.md §2.1 S8).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(
    df: DataFrame, cols: list[str], bits: int = 8
) -> Column:
    """Morton (Z-curve) key over ``cols``: each column is bucketed to
    ``bits`` bits uniformly between its min and max (one small aggregate,
    collected — 2×len(cols) scalars), then the bit-planes interleave:
    bit ``i`` of column ``c`` lands at position ``i*len(cols)+c``. Total
    key width ``bits*len(cols)`` must fit a long (≤ 63)."""
    if not cols or len(cols) * bits > 63:
        raise ValueError(f"{len(cols)} cols × {bits} bits must be in (0, 63]")
    stats = df.agg(
        *[F.min(c).cast("double").alias(f"__mn_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"__mx_{c}") for c in cols],
    ).first()
    n_buckets = 1 << bits
    planes = []
    for ci, c in enumerate(cols):
        lo, hi = stats[f"__mn_{c}"], stats[f"__mx_{c}"]
        if lo is None or hi is None or hi <= lo:
            bucket = F.lit(0).cast("long")  # constant/empty column: no info
        else:
            # width_bucket yields 1..n_buckets+1 (inclusive upper edge in
            # the overflow bucket); shift to 0..n_buckets-1.
            bucket = (
                F.least(
                    F.width_bucket(
                        F.col(c).cast("double"),
                        F.lit(float(lo)),
                        F.lit(float(hi)),
                        F.lit(n_buckets),
                    ),
                    F.lit(n_buckets),
                )
                - 1
            ).cast("long")
            # NULLs order first (bucket 0), matching NULLS FIRST sorts.
            bucket = F.coalesce(bucket, F.lit(0).cast("long"))
        planes.append((ci, bucket))
    ncols = len(cols)

    def interleaved(acc: Column, term: tuple[int, int]) -> Column:
        i, ci = term
        bit = F.shiftrightunsigned(planes[ci][1], i).bitwiseAND(F.lit(1))
        return acc.bitwiseOR(F.shiftleft(bit, i * ncols + ci))

    terms = [(i, ci) for i in range(bits) for ci in range(ncols)]
    return reduce(interleaved, terms, F.lit(0).cast("long"))


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 8,
    num_files: int = 16,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet clustered along the Z-curve of ``cols``:
    one range shuffle on the z-key, in-file sort, key dropped before
    write. Every output file covers a compact z-range ⇒ a small box in
    (col₁, …) space ⇒ footer min/max stats prune files for predicates on
    any z-column."""
    keyed = df.withColumn("__z", zorder_key(df, cols, bits))
    (
        keyed.repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )
