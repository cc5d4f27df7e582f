"""Bucketed-table sink and co-located join support.

At 100 TB the single most expensive repeated cost is re-shuffling a fact
table for every keyed join or aggregation. Bucketing pays that shuffle
ONCE at write time: ``bucketBy(n, key)`` hash-partitions rows into a
fixed number of files per partition, and Spark's bucketed scan then
exposes the layout as ``HashPartitioning`` — a join or groupBy on the
bucket key of two co-bucketed tables plans with NO Exchange on either
side (asserted in tests/test_bucketing.py). ``sortBy`` additionally
pre-orders within buckets so sort-merge joins skip their sorts.

Bucketed output must go through ``saveAsTable`` (the bucket metadata
lives in the catalog); pass ``path`` to keep the data external at a
location you control.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed (optionally bucket-sorted) parquet table.

    Co-bucket related tables with the SAME ``num_buckets`` and key so
    joins between them are shuffle-free. Choose ``num_buckets`` so one
    bucket ≈ one task's worth of data at the target scale (buckets are
    per directory-partition files; too few ⇒ giant tasks, too many ⇒
    small-file pressure).
    """
    writer = df.write.mode(mode).format("parquet").bucketBy(
        num_buckets, *bucket_cols
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read — bucketed layout is picked up automatically when
    ``spark.sql.sources.bucketing.enabled`` (default true)."""
    return spark.table(table)
