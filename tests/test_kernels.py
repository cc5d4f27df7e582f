"""Arrow signature-kernel parity (operators/kernels.py) and the direct
dropped-id simhash formulation (dedup.simhash_dropped_ids).

The kernels keep shingling + base hashing in the JVM and move only the
per-document reduction into Arrow numpy, so signatures must be
BIT-IDENTICAL to the HOF path — asserted row-for-row here, including the
short-text (whole-text shingle) and NULL-text (no row) edges.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datawarehousefinal_spark.operators.dedup import (
    minhash_signature,
    simhash,
    simhash_dropped_ids,
    simhash_near_dupes_from_fingerprints,
)
from datawarehousefinal_spark.plans.audit import physical_plan
from datawarehousefinal_spark.sources.testdata import load_table


def _docs(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    edge = spark.createDataFrame(
        [(900001, "ab"), (900002, None), (900003, "aaaaaa")],
        "doc_id long, text string",
    )
    return docs.unionByName(edge)


def test_minhash_arrow_parity_both_hash_modes(spark, sf_dir):
    p = _docs(spark, sf_dir)
    for mode in ("xxhash64", "md5"):
        arrow = minhash_signature(
            p, "doc_id", "text", 16, 5, mode, kernel="arrow"
        ).orderBy("doc_id").collect()
        hof = minhash_signature(
            p, "doc_id", "text", 16, 5, mode, kernel="hof"
        ).orderBy("doc_id").collect()
        assert arrow == hof
        assert len(arrow) > 0
        # NULL text produces no signature row on either kernel
        assert all(r["doc_id"] != 900002 for r in arrow)


def test_simhash_arrow_parity(spark, sf_dir):
    p = _docs(spark, sf_dir)
    arrow = simhash(p, "doc_id", "text", 5, kernel="arrow").orderBy("doc_id").collect()
    hof = simhash(p, "doc_id", "text", 5, kernel="hof").orderBy("doc_id").collect()
    assert arrow == hof
    assert len(arrow) > 0


def test_auto_kernels_are_arrow(spark, sf_dir):
    """Defaults follow the measurements documented in the docstrings:
    BOTH minhash and simhash auto → Arrow (round-7 re-measurement:
    arrow 0.8 s vs hof 1.8 s for simhash at sf0.1, both shingle
    widths), and both are Arrow-batched MapInPandas, never
    row-at-a-time Python."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    mh = physical_plan(minhash_signature(docs, "doc_id", "text", 16, 5))
    assert "MapInPandas" in mh
    assert "BatchEvalPython" not in mh  # Arrow-batched, not row-at-a-time
    sh = physical_plan(simhash(docs, "doc_id", "text", 5))
    assert "MapInPandas" in sh
    assert "BatchEvalPython" not in sh
    # the JVM-only escape hatch stays available
    sh_hof = physical_plan(simhash(docs, "doc_id", "text", 5, kernel="hof"))
    assert "MapInPandas" not in sh_hof


def test_simhash_dropped_ids_matches_pair_derivation(spark, sf_dir):
    """The direct formulation must drop EXACTLY the ids the greedy
    contract derives from the pair list: non-min ids of identical-
    fingerprint groups plus ids exceeding a banded neighbor group's min.
    Run uncapped (exact_pair_cap high) so the pair list is the full
    ground truth."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    fp = simhash(docs, "doc_id", "text", 5).persist()
    try:
        pairs = simhash_near_dupes_from_fingerprints(
            fp, "doc_id", max_hamming=8, combo_size=2,
            exact_pair_cap=10**6, max_dropped_frac=None,
        )
        expected = {r["id_b"] for r in pairs.select("id_b").distinct().collect()}
        got = {
            r["doc_id"]
            for r in simhash_dropped_ids(
                fp, "doc_id", max_hamming=8, combo_size=2, max_dropped_frac=None
            ).collect()
        }
        assert expected, "fixture should contain planted near-dups"
        assert got == expected
    finally:
        fp.unpersist()


def test_simhash_dropped_ids_loud_drop_guard(spark):
    """max_dropped_frac wiring is shared with the pair path: force a
    narrow key space (combo over 64 one-bit... not expressible — instead
    force max_bucket=0 so EVERY bucket is over-full) and expect the loud
    RuntimeError rather than a silent empty result."""
    import pytest

    rows = [(i, f"document number {i} with shared boilerplate text") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fp = simhash(df, "doc_id", "text", 5)
    with pytest.raises(RuntimeError, match="skew guard"):
        simhash_dropped_ids(
            fp, "doc_id", max_hamming=3, combo_size=2,
            max_bucket=0, max_dropped_frac=0.05,
        ).collect()
