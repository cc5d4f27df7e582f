"""Deterministic per-face cost metrics: py4j round-trips during
construction + execution, and Spark job count per execution.

Usage: python tools_count_calls.py face1 face2 ... [--sf=DIR]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = "/root/testdata/sf0.1"
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

    import py4j.clientserver as cs

    counter = {"n": 0}
    orig = cs.ClientServerConnection.send_command

    def counting(self, *a, **kw):
        counter["n"] += 1
        return orig(self, *a, **kw)

    cs.ClientServerConnection.send_command = counting

    from datawarehousefinal_spark import queries as Q
    from datawarehousefinal_spark.session import get_spark

    spark = get_spark(app_name="dwf-count")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    for name in names:
        # warmup (lazy imports, JIT)
        df = Q.QUERIES[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()

        tracker = sc.statusTracker()
        jobs0 = len(tracker.getJobIdsForGroup(None) or [])
        c0 = counter["n"]
        df = Q.QUERIES[name](spark, sf_dir)
        c1 = counter["n"]
        df.write.format("noop").mode("overwrite").save()
        c2 = counter["n"]
        # job ids are global/increasing; count via allJobs
        jobs1 = len(tracker.getJobIdsForGroup(None) or [])
        print(
            f"{name}: py4j construct={c1 - c0} execute={c2 - c1} "
            f"jobs~={jobs1 - jobs0}",
            flush=True,
        )
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
