"""Oracle-differential tests: every registered query with an oracle must
hash-match DuckDB at sf0.001 (fast) — the driver repeats this at sf0.01."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.oracle_harness import compare


def _oracle_cases():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    return sorted(o.keys() & q.keys())


@pytest.mark.parametrize("name", _oracle_cases())
def test_query_matches_oracle(spark, sf_dir, name):
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    result = compare(spark, sf_dir, q, sql)
    assert result["ok"], f"{name}: {result}"


def test_all_queries_have_entries():
    q = entrymod.queries()
    assert q, "queries() must not be empty"
    for name, fn in q.items():
        assert callable(fn), name


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.schema is not None
