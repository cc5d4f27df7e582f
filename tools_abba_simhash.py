"""Interleaved ABBA for VERDICT r13 item 1: old (explode+reproject Column
loop, pre-0b4284a) vs new (single inline SQL string, 0b4284a) builds of
``dedup.simhash_combo_keys``, measured on the full ``simhash_near_dupes``
face (noop sink, alternating O,N,O,N,... — min over passes per variant).

Usage: python tools_abba_simhash.py [--passes=3] [--sf=DIR]
Prints one JSON line {"old": [...], "new": [...], "old_min": s, "new_min": s}.
"""

from __future__ import annotations

import json
import os
import sys
import time
from itertools import combinations

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    passes = 3
    sf_dir = "/root/testdata/sf0.1"
    for a in sys.argv[1:]:
        if a.startswith("--passes="):
            passes = int(a.split("=", 1)[1])
        if a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import DataFrame
    from pyspark.sql import functions as F

    from datawarehousefinal_spark import queries as Q
    from datawarehousefinal_spark.operators import dedup, incremental
    from datawarehousefinal_spark.operators.dedup import _block_bounds
    from datawarehousefinal_spark.session import get_spark

    new_impl = dedup.simhash_combo_keys

    def old_impl(fp_df: DataFrame, num_blocks: int, combo_size: int) -> DataFrame:
        # Verbatim pre-0b4284a body (git show 0b4284a~1), the Column-loop
        # explode+reproject formulation.
        bounds = _block_bounds(num_blocks)
        block_cols = [
            F.shiftrightunsigned("simhash", start).bitwiseAND(
                F.lit((1 << width) - 1)
            )
            for start, width in bounds
        ]
        entries = []
        for t, combo in enumerate(combinations(range(num_blocks), combo_size)):
            key = F.lit(0).cast("long")
            for b in combo:
                key = F.shiftleft(key, bounds[b][1]).bitwiseOR(block_cols[b])
            entries.append(F.struct(F.lit(t).alias("table"), key.alias("key")))
        return fp_df.select(
            "simhash", F.explode(F.array(*entries)).alias("__t")
        ).select(
            "simhash", F.col("__t.table").alias("table"), F.col("__t.key").alias("key")
        )

    spark = get_spark(app_name="abba-simhash")
    spark.sparkContext.setLogLevel("ERROR")

    def run(name: str) -> float:
        # Time construction + execution, exactly like bench.py: the face
        # does its heavy work (persists, sizing probe, eager checkpoint
        # of the verified pairs) during CONSTRUCTION.
        spark.sparkContext.setJobDescription(name)
        t0 = time.perf_counter()
        df = Q.QUERIES["simhash_near_dupes"](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        spark.catalog.clearCache()
        return round(dt, 4)

    def set_impl(fn) -> None:
        dedup.simhash_combo_keys = fn
        incremental.simhash_combo_keys = fn

    # warm both variants once (JIT, listing)
    set_impl(old_impl)
    run("warm-old")
    set_impl(new_impl)
    run("warm-new")

    old_ts: list[float] = []
    new_ts: list[float] = []
    for i in range(passes):
        set_impl(old_impl)
        old_ts.append(run(f"old-{i}"))
        set_impl(new_impl)
        new_ts.append(run(f"new-{i}"))
    set_impl(new_impl)
    print(
        json.dumps(
            {
                "cpus": os.environ.get("SPARK_GRAFT_CPUS"),
                "old": old_ts,
                "new": new_ts,
                "old_min": min(old_ts),
                "new_min": min(new_ts),
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
