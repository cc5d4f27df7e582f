"""Spark ML analytics layer (SURVEY.md §2.9 M1-M12) — see pipelines.py."""

from datawarehousefinal_spark.ml import pipelines  # noqa: F401
