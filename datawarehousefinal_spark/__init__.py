"""datawarehousefinal_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capability surface of the reference
warehouse stack (oscariolo/DatawarehouseFinal: Pentaho-Kettle ETL + Postgres
star schema + Mondrian OLAP + sklearn/PyTorch analytics — see SURVEY.md) as an
idiomatic Spark DataFrame/SQL engine, plus the large-scale training-data
pipeline operators (dedup, similarity search, text analysis, multimodal
plumbing) such an engine needs at 100 TB.

Design principles
-----------------
- Declarative first: every operator builds a DataFrame logical plan and lets
  Catalyst/Tungsten pick the physical strategy (predicate pushdown, column
  pruning, broadcast joins, AQE skew handling come for free).
- JVM-side hot path: `pyspark.sql.functions` column expressions everywhere;
  Arrow-batched pandas UDFs only where built-ins genuinely can't express the
  semantics (none are needed for the reference surface).
- Shuffle-aware: small dimensions broadcast, aggregations partial-agg
  map-side, wide fan-out ops (minhash bands, shingles) keyed to avoid
  re-shuffles.
"""

from datawarehousefinal_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
