"""Sinks (SURVEY.md §2.1 S6-S9).

The reference writes batched JDBC inserts (etl_final.ktr:3011-3145), snappy
parquet caches (machineLearning.py:167-171) and CSV outputs
(Datos/preprocessing.py:142-143). At 100 TB the parquet sink is the one that
matters: partitioned, snappy, with writer-side control of file sizing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    compression: str = "snappy",
) -> None:
    """S8: parquet sink. ``partition_by`` low-cardinality columns (e.g. year)
    so downstream reads get partition pruning."""
    writer = df.write.mode(mode).option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", header: bool = True) -> None:
    """S9: CSV sink (processed CSV out, Datos/preprocessing.py:142-143)."""
    df.write.mode(mode).option("header", header).csv(path)


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batchsize: int = 1000,
    properties: dict[str, str] | None = None,
) -> None:
    """S6: batched JDBC sink (TableOutput commit-1000/batch semantics,
    etl_final.ktr:3024,3027)."""
    writer = (
        df.write.format("jdbc")
        .mode(mode)
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", batchsize)
    )
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.save()
