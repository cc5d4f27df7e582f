"""Census: for EVERY face, count py4j round-trips and Spark jobs during
construction (constructs each face twice, counts the second — first call
absorbs lazy imports). Writes /tmp/census.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = "/root/testdata/sf0.1"
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

    spark = get_spark(app_name="dwf-census")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    out = {}
    names = sorted(Q.QUERIES)
    for name in names:
        try:
            Q.QUERIES[name](spark, sf_dir)
            spark.catalog.clearCache()
            j0 = len(tracker.getJobIdsForGroup(None) or [])
            c0 = counter["n"]
            t0 = time.perf_counter()
            Q.QUERIES[name](spark, sf_dir)
            el = time.perf_counter() - t0
            c1 = counter["n"]
            j1 = len(tracker.getJobIdsForGroup(None) or [])
            out[name] = {
                "py4j": c1 - c0,
                "jobs": j1 - j0,
                "construct_s": round(el, 3),
            }
            print(f"{name}: {out[name]}", flush=True)
            spark.catalog.clearCache()
        except Exception as e:  # noqa: BLE001
            out[name] = {"error": str(e)[:200]}
            print(f"{name}: ERROR {e}", flush=True)
    with open("/tmp/census.json", "w") as fh:
        json.dump(out, fh)
    spark.stop()


if __name__ == "__main__":
    main()
