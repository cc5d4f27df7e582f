"""Local replica of the driver's DuckDB-oracle comparison.

Runs a Spark query and its oracle SQL side by side, then compares row count,
column names/types (normalized), and an order-insensitive value hash — the
same gate the driver applies, so mismatches surface in pytest before a round
ends.
"""

from __future__ import annotations

import hashlib
import math
from datetime import date, datetime

import duckdb

from datawarehousefinal_spark.sources.testdata import TABLES


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_value(v) -> str:
    """Normalize a cell so Spark and DuckDB renderings hash identically."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # FULL precision (shortest round-trip repr): the driver hashes
        # full-precision doubles, and the former ".6g" rounding masked a
        # one-ulp divergence exactly once too often (the r12
        # incremental_aggregate_rollup red shipped local-green). A face
        # whose float math legitimately re-associates must carry an
        # explicit serve-boundary contract (exact decimal states, or
        # ROUND on BOTH sides) — the harness no longer forgives it.
        return repr(v)
    if isinstance(v, datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_value(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def _norm_type(t: str) -> str:
    """Map Spark simpleString / DuckDB type names onto one vocabulary so the
    local compare reproduces the driver's schema gate (INT vs BIGINT trap)."""
    t = t.strip().lower()
    # array types first: spark array<float> / duckdb float[]
    if t.startswith("array<") and t.endswith(">"):
        return f"array<{_norm_type(t[6:-1])}>"
    if t.endswith("[]"):
        return f"array<{_norm_type(t[:-2])}>"
    aliases = {
        # NO "hugeint" alias: a HUGEINT-serving oracle must FAIL the local
        # schema gate (the driver's pandas fetch renders HUGEINT as float64
        # and the value hash diverges — the partition_overwrite_roundtrip
        # four-round red). tests/test_oracle_types.py sweeps the registry.
        "bigint": "long",
        "long": "long",
        "integer": "int",
        "int": "int",
        "smallint": "int",
        "tinyint": "int",
        "varchar": "string",
        "string": "string",
        "text": "string",
        "double": "double",
        "real": "float",
        "float": "float",
        "boolean": "boolean",
        "bool": "boolean",
        "date": "date",
        "timestamp": "timestamp",
        "timestamp_ns": "timestamp",
        "blob": "binary",
        "binary": "binary",
    }
    return aliases.get(t, t)  # decimal(p,s) etc. pass through


def _hash_rows(columns: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    lines = sorted(
        "\x1f".join(_norm_value(row[i]) for i in order) for row in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def compare(spark, sf_dir: str, spark_fn, oracle_sql: str) -> dict:
    sdf = spark_fn(spark, sf_dir)
    spark_cols = sdf.columns
    spark_types = dict(sdf.dtypes)
    spark_rows = [tuple(r) for r in sdf.collect()]

    con = duckdb_connect(sf_dir)
    try:
        res = con.execute(oracle_sql)
        duck_cols = [d[0] for d in res.description]
        duck_rows = res.fetchall()
        # DB-API description collapses types to 'NUMBER'/'STRING'; DESCRIBE
        # gives the real ones (BIGINT vs INTEGER — the driver's schema gate).
        duck_types = {
            r[0]: r[1] for r in con.execute(f"DESCRIBE {oracle_sql}").fetchall()
        }
    finally:
        con.close()

    out = {
        "rows_spark": len(spark_rows),
        "rows_oracle": len(duck_rows),
        "cols_spark": sorted(f"{c}:{_norm_type(spark_types[c])}" for c in spark_cols),
        "cols_oracle": sorted(f"{c}:{_norm_type(duck_types[c])}" for c in duck_cols),
        "hash_spark": _hash_rows(spark_cols, spark_rows),
        "hash_oracle": _hash_rows(duck_cols, duck_rows),
    }
    out["rows_match"] = out["rows_spark"] == out["rows_oracle"]
    out["cols_match"] = out["cols_spark"] == out["cols_oracle"]
    out["hash_match"] = out["hash_spark"] == out["hash_oracle"]
    out["ok"] = out["rows_match"] and out["cols_match"] and out["hash_match"]
    return out
