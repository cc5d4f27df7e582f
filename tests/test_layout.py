"""Z-order layout (sources/layout.py): Morton-key bit math and MEASURED
file-skipping off real parquet footer statistics."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from datawarehousefinal_spark.sources.layout import zorder_key, zorder_write
from datawarehousefinal_spark.sources.testdata import load_table


def test_zorder_key_interleaves_bits(spark):
    # two columns, 2 bits each over [0, 3]: value == bucket, so the key
    # is the textbook Morton interleave of (x, y)
    rows = [(x, y) for x in range(4) for y in range(4)]
    df = spark.createDataFrame(rows, "x int, y int")
    out = {
        (r["x"], r["y"]): r["z"]
        for r in df.withColumn("z", zorder_key(df, ["x", "y"], bits=2)).collect()
    }
    def morton(x, y):
        z = 0
        for i in range(2):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z
    # width_bucket maps [min,max] uniformly: with ints 0..3 and 4 buckets
    # the bucket equals the value except the max lands in the top bucket.
    assert out[(0, 0)] == morton(0, 0) == 0
    assert out[(1, 0)] == morton(1, 0) == 1
    assert out[(0, 1)] == morton(0, 1) == 2
    assert out[(1, 1)] == morton(1, 1) == 3
    # monotone locality: nearby points share high bits
    assert out[(3, 3)] == max(out.values())


def test_zorder_key_rejects_wide_keys(spark):
    df = spark.createDataFrame([(1, 2)], "x int, y int")
    with pytest.raises(ValueError):
        zorder_key(df, ["x", "y"], bits=32)


def _files_hit(path, col, lo, hi):
    """Count parquet files whose footer [min,max] for col intersects
    [lo, hi] — exactly the pruning decision a stats-based scan makes."""
    hit = total = 0
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        fmin = fmax = None
        for rg in range(md.num_row_groups):
            for i in range(md.num_columns):
                c = md.row_group(rg).column(i)
                if c.path_in_schema == col and c.statistics is not None:
                    s = c.statistics
                    fmin = s.min if fmin is None else min(fmin, s.min)
                    fmax = s.max if fmax is None else max(fmax, s.max)
        total += 1
        if fmin is not None and not (fmax < lo or fmin > hi):
            hit += 1
    return hit, total


def test_zorder_write_prunes_both_dimensions(spark, sf_dir, tmp_path):
    """The measured point: a custkey-sorted layout cannot prune a
    totalprice predicate (every file spans the full price range), while
    the z-ordered layout prunes files for BOTH dimensions."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    zpath = str(tmp_path / "zorder")
    lpath = str(tmp_path / "linear")
    zorder_write(orders, zpath, ["o_custkey", "o_totalprice"], bits=8, num_files=16)
    (
        orders.repartitionByRange(16, "o_custkey")
        .sortWithinPartitions("o_custkey")
        .write.mode("overwrite")
        .parquet(lpath)
    )
    stats = orders.agg(
        F.min("o_totalprice"), F.max("o_totalprice"), F.min("o_custkey"), F.max("o_custkey")
    ).first()
    plo, phi, clo, chi = stats
    band = (phi - plo) * 0.10
    z_hit, z_total = _files_hit(zpath, "o_totalprice", plo, plo + band)
    l_hit, l_total = _files_hit(lpath, "o_totalprice", plo, plo + band)
    assert z_total >= 8 and l_total >= 8
    # custkey-sorted layout: totalprice is uniform per file -> ~no pruning
    assert l_hit == l_total
    # z-order: a 10% price band must skip a material fraction of files
    assert z_hit <= z_total * 0.7, f"z-order pruned nothing: {z_hit}/{z_total}"
    # and the clustered dimension still prunes too
    cband = (chi - clo) * 0.10
    zc_hit, _ = _files_hit(zpath, "o_custkey", clo, clo + cband)
    assert zc_hit <= z_total * 0.7, f"custkey pruning lost: {zc_hit}/{z_total}"


def test_zorder_write_roundtrip_preserves_rows(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    path = str(tmp_path / "rt")
    zorder_write(orders, path, ["o_custkey", "o_totalprice"], num_files=4)
    back = spark.read.parquet(path)
    assert back.count() == orders.count()
    assert set(back.columns) == {"o_orderkey", "o_custkey", "o_totalprice"}
    assert back.join(orders, "o_orderkey", "left_anti").count() == 0
