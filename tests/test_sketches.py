"""Sketch-store tests: HLL estimate accuracy, append-equals-rebuild
exactness, rollup merging, and KLL rank-error tolerance."""

from __future__ import annotations

from pyspark.sql import functions as F

from datawarehousefinal_spark.operators.sketches import (
    hll_append,
    hll_build_store,
    hll_rollup,
    kll_build_store,
    kll_quantiles,
)


def _events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id", "value", F.to_date("ts").alias("day")
    )


def test_hll_store_estimates_within_error_bound(spark, sf_dir):
    ev = _events(spark, sf_dir)
    store = hll_build_store(ev, "user_id", ["day"], lgk=12)
    exact = {
        r["day"]: r["d"]
        for r in ev.groupBy("day")
        .agg(F.countDistinct("user_id").alias("d"))
        .collect()
    }
    for r in store.collect():
        assert abs(r["distinct_est"] - exact[r["day"]]) <= max(
            3, 0.05 * exact[r["day"]]
        ), f"day {r['day']}: est {r['distinct_est']} vs exact {exact[r['day']]}"


def test_hll_append_equals_rebuild_exactly(spark, sf_dir):
    ev = _events(spark, sf_dir)
    old = ev.filter(F.dayofmonth("day") <= 15)
    new = ev.filter(F.dayofmonth("day") > 15)
    appended = hll_append(
        hll_build_store(old, "user_id", ["day"]),
        hll_build_store(new, "user_id", ["day"]),
        ["day"],
    )
    rebuilt = hll_build_store(ev, "user_id", ["day"])
    a = {r["day"]: (r["distinct_est"], r["n_rows"]) for r in appended.collect()}
    b = {r["day"]: (r["distinct_est"], r["n_rows"]) for r in rebuilt.collect()}
    assert a == b


def test_hll_rollup_matches_global_estimate(spark, sf_dir):
    ev = _events(spark, sf_dir)
    store = hll_build_store(ev, "user_id", ["day"])
    rolled = hll_rollup(store, []).collect()[0]
    direct = (
        ev.agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).cast("long"))
        .collect()[0][0]
    )
    assert rolled["distinct_est"] == direct
    exact = ev.select("user_id").distinct().count()
    assert abs(rolled["distinct_est"] - exact) <= max(3, 0.05 * exact)


def test_kll_quantiles_within_rank_error(spark, sf_dir):
    ev = _events(spark, sf_dir)
    store = kll_build_store(ev, "value", ["day"])
    q = kll_quantiles(store, [0.5, 0.99]).collect()[0]
    vals = sorted(
        r["value"] for r in ev.select("value").collect() if r["value"] is not None
    )

    def rank(v):
        import bisect

        return bisect.bisect_left(vals, v) / len(vals)

    assert abs(rank(q["q_50"]) - 0.5) < 0.05
    assert abs(rank(q["q_99"]) - 0.99) < 0.05
    assert q["n_rows"] == len(vals)


def test_kll_store_merge_stable_under_split(spark, sf_dir):
    ev = _events(spark, sf_dir)
    whole = kll_quantiles(kll_build_store(ev, "value", ["day"]), [0.5]).collect()[0]
    # partition the SAME rows differently: by day-half instead of day
    halves = ev.withColumn("h", (F.dayofmonth("day") <= 15).cast("int"))
    other = kll_quantiles(kll_build_store(halves, "value", ["h"]), [0.5]).collect()[0]
    vals = sorted(
        r["value"] for r in ev.select("value").collect() if r["value"] is not None
    )
    import bisect

    for est in (whole["q_50"], other["q_50"]):
        assert abs(bisect.bisect_left(vals, est) / len(vals) - 0.5) < 0.05
