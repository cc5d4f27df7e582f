"""Partitioning-invariance sweep: the driver-stability property behind
the r05/r06 sink-roundtrip hash flakes, promoted to a pytest gate.

A query's driver hash (order-insensitive, 6-significant-digit floats —
oracle_harness._hash_rows) must not depend on HOW Spark partitions the
work: different `spark.sql.shuffle.partitions` and AQE settings change
partial-aggregate merge orders, which reassociates double sums and
flips last ulps. Queries whose outputs cross the 6-digit rounding
boundary under re-partitioning are exactly the ones that flake on the
round driver (VERDICT r6 "What's wrong #1").

The sweep runs each selected query twice at sf0.001 — (shuffle=3, AQE
off) vs (shuffle=17, AQE on) — and asserts identical hashes. Selection
targets the risk surface: double sums/moments/variance, window ranks
over float keys, waterfilling, cosine math; pure-integer queries are
invariant by construction and stay out to keep the sweep fast.
"""

from __future__ import annotations

import pytest

from datawarehousefinal_spark import queries as Q
from tests.oracle_harness import _hash_rows

SF_DIR = "/root/testdata/sf0.001"

SWEEP = [
    # r6 flake class (decimal-hardened in r7) + moment folding
    "incremental_cube_moments",
    "json_repair_roundtrip",
    "cube_all_measures",
    "winsorized_stats",
    # double-sum scoring paths
    "bigram_lm_perplexity",
    "dsir_importance_weights",
    "grouped_trend_fits",
    # float-ranked windows / distributed rank
    "quantile_rank_normalize",
    # cosine + argmin assignment + per-cluster rank (new r7)
    "prototypicality_prune_keep",
    # waterfilling level algebra (new r7)
    "unimax_lang_mix",
    # integer-vote contract (new r7): invariant BY DESIGN — pin it
    "knn_label_propagation",
    # lag + running-sum session windows over float-free micro gaps
    "session_stats",
    # r10 battery risk surface, pinned before its r11 driver window:
    # conditional decimal sums feeding a double-division share
    "market_share_report",
    # decimal max-equality join (the Q15 cross-engine tie trap)
    "top_supplier_per_quarter",
    # per-row decimal difference folded into one sum (Q9 profit)
    "product_profit_report",
    # cross-multiplied scalar-broadcast threshold compares
    "dormant_rich_customers",
    "important_parts_revenue",
    # KLL fold order varies with partitioning — the rank-envelope
    # booleans must absorb it; CM rollup is integer-invariant, pin it
    "kll_week_quantiles",
    "cm_week_rollup",
    # avg(double) measures over the grouping-set lattice via MDX
    "mdx_rollup_query",
]

_CONFS = [
    ("3", "false"),
    ("17", "true"),
]


def _run_hashed(spark, name: str) -> tuple[int, str]:
    df = Q.QUERIES[name](spark, SF_DIR)
    rows = [tuple(r) for r in df.collect()]
    return len(rows), _hash_rows(df.columns, rows)


@pytest.mark.parametrize("name", SWEEP)
def test_hash_invariant_under_repartitioning(spark, name):
    results = []
    orig_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    orig_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        for shuffle, aqe in _CONFS:
            spark.conf.set("spark.sql.shuffle.partitions", shuffle)
            spark.conf.set("spark.sql.adaptive.enabled", aqe)
            results.append(_run_hashed(spark, name))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig_shuffle)
        spark.conf.set("spark.sql.adaptive.enabled", orig_aqe)
    (n1, h1), (n2, h2) = results
    assert n1 == n2, f"{name}: row count changed with partitioning"
    assert h1 == h2, (
        f"{name}: driver hash depends on partitioning "
        f"(shuffle=3/AQE-off vs shuffle=17/AQE-on) — merge-order-sensitive "
        f"float math; harden with decimal accumulation or integer outputs"
    )
