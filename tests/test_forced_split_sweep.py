"""Forced-split oracle sweep — the systematic flush of the float
re-association class.

Double addition is not associative, so a face whose float aggregation
re-associates WITHOUT a serve-boundary contract (tests/oracle_harness
hashes full precision) diverges from its scan-order DuckDB oracle only
when a scan happens to fan out — which at test scale is a
once-per-N-sweeps flake (chi2_independence_report, domain_reweight_mix
in round 13). Setting the file-split sizes tiny makes EVERY scan fan
out to 32+ partitions, so any uncontracted re-association diverges
DETERMINISTICALLY: one run of this sweep equals many ordinary sweeps.

Opt-in (≈15 min for the full registry): run with

    SPARK_GRAFT_FORCED_SPLIT=1 python -m pytest tests/test_forced_split_sweep.py

Round-13 baseline: all 301 oracled faces green under forced split.
"""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entrymod
from tests.oracle_harness import compare

pytestmark = pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_FORCED_SPLIT"),
    reason="forced-split sweep is opt-in: SPARK_GRAFT_FORCED_SPLIT=1",
)


@pytest.fixture(scope="module")
def split_spark(spark):
    old_max = spark.conf.get("spark.sql.files.maxPartitionBytes")
    old_open = spark.conf.get("spark.sql.files.openCostInBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "32768")
    spark.conf.set("spark.sql.files.openCostInBytes", "0")
    yield spark
    spark.conf.set("spark.sql.files.maxPartitionBytes", old_max)
    spark.conf.set("spark.sql.files.openCostInBytes", old_open)


def _oracle_cases():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    return sorted(o.keys() & q.keys())


@pytest.mark.parametrize("name", _oracle_cases())
def test_face_is_partitioning_independent(split_spark, sf_dir, name):
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    result = compare(split_spark, sf_dir, q, sql)
    assert result["ok"], f"{name} diverges under forced splits: {result}"
