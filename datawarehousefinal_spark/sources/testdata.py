"""Loaders for the driver-generated TPC-H-ish parquet tables (TESTDATA.md).

One parquet file per table under ``/root/testdata/sf{0.001,0.01,0.1}``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Tables small enough to broadcast in a star join at ANY scale factor
# (region/nation are fixed-size; the others grow with sf but stay dim-sized
# relative to the facts orders/lineitem).
DIM_TABLES = ("region", "nation", "customer", "supplier", "part")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # events.ts is parquet TIMESTAMP(NANOS); Spark reads it as long
        # nanos (spark.sql.legacy.parquet.nanosAsLong) — truncate to micros,
        # the same thing DuckDB's TIMESTAMP_NS → TIMESTAMP cast does.
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros((F.col("ts") / 1000).cast("long")))
    return df


def load_tables(spark: SparkSession, sf_dir: str, names=TABLES) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(spark: SparkSession, sf_dir: str, names=TABLES) -> None:
    """Register each table as a temp view so ``spark.sql`` can be used."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
