

def test_drift_report_identity_and_shift(spark):
    from pyspark.sql import functions as F

    from datawarehousefinal_spark.operators.profile import drift_report

    base = spark.range(0, 2000).select(
        (F.col("id") % 100).cast("double").alias("v"),
        F.when(F.col("id") % 10 < 7, "a").otherwise("b").alias("c"),
    )
    # identical snapshots: psi == 0 exactly (smoothing never kicks in on
    # matching non-empty buckets)
    same = {r["col_name"]: r for r in drift_report(
        base, base, numeric_cols=["v"], categorical_cols=["c"]
    ).collect()}
    assert abs(same["v"]["psi"]) < 1e-12
    assert abs(same["c"]["psi"]) < 1e-12
    assert same["v"]["n_old"] == same["v"]["n_new"] == 2000
    # shifted numeric + flipped category mix: both PSIs cross the
    # major-shift threshold
    shifted = spark.range(0, 2000).select(
        (F.col("id") % 100 + 60).cast("double").alias("v"),
        F.when(F.col("id") % 10 < 2, "a").otherwise("b").alias("c"),
    )
    moved = {r["col_name"]: r for r in drift_report(
        base, shifted, numeric_cols=["v"], categorical_cols=["c"]
    ).collect()}
    assert moved["v"]["psi"] > 0.25
    assert moved["c"]["psi"] > 0.25
    # a category present only in the NEW snapshot still yields finite psi
    novel = spark.range(0, 2000).select(
        (F.col("id") % 100).cast("double").alias("v"),
        F.lit("z").alias("c"),
    )
    import math
    nv = {r["col_name"]: r for r in drift_report(
        base, novel, numeric_cols=["v"], categorical_cols=["c"]
    ).collect()}
    assert math.isfinite(nv["c"]["psi"]) and nv["c"]["psi"] > 1.0
