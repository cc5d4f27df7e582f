"""Micro-bench a subset of registered faces with bench.py's methodology
(warm-up pass + min over N timed passes, noop sink, untimed cache clear).

Usage: python tools_bench_subset.py face1 face2 ... [--passes N] [--sf DIR]
Prints one JSON line {name: min_seconds}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    passes = 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for a in sys.argv[1:]:
        if a.startswith("--passes="):
            passes = int(a.split("=", 1)[1])
        if a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

    from datawarehousefinal_spark import queries as Q
    from datawarehousefinal_spark.session import get_spark

    spark = get_spark(app_name="dwf-bench-subset")
    spark.sparkContext.setLogLevel("ERROR")

    def execute(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    names = args or sorted(Q.QUERIES)
    missing = [n for n in names if n not in Q.QUERIES]
    if missing:
        print(f"unknown faces: {missing}", file=sys.stderr)
        sys.exit(2)

    for name in names:
        spark.sparkContext.setJobDescription(f"warmup:{name}")
        execute(Q.QUERIES[name](spark, sf_dir))
        spark.catalog.clearCache()
    timings: dict[str, float] = {}
    for _ in range(passes):
        for name in names:
            spark.sparkContext.setJobDescription(f"timed:{name}")
            start = time.perf_counter()
            execute(Q.QUERIES[name](spark, sf_dir))
            elapsed = round(time.perf_counter() - start, 4)
            timings[name] = min(timings.get(name, float("inf")), elapsed)
            spark.catalog.clearCache()
    spark.stop()
    print(json.dumps(timings), flush=True)


if __name__ == "__main__":
    main()
