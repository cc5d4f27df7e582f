"""Split each face's wall time into (construction, execution) — the
construction half is Python/py4j plan building + any eager probes; the
execution half is the noop write.

Usage: python tools_split_time.py face1 face2 ... [--sf=DIR]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = "/root/testdata/sf0.1"
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

    from datawarehousefinal_spark import queries as Q
    from datawarehousefinal_spark.session import get_spark

    spark = get_spark(app_name="dwf-split")
    spark.sparkContext.setLogLevel("ERROR")

    if not names:
        names = sorted(Q.QUERIES)

    out = {}
    for name in names:
        # warmup
        df = Q.QUERIES[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        best = (float("inf"), 0.0, 0.0)
        for _ in range(2):
            t0 = time.perf_counter()
            df = Q.QUERIES[name](spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            if t2 - t0 < best[0]:
                best = (t2 - t0, t1 - t0, t2 - t1)
            spark.catalog.clearCache()
        out[name] = {
            "total": round(best[0], 3),
            "construct": round(best[1], 3),
            "execute": round(best[2], 3),
        }
        print(
            f"{name}: total={best[0]:.2f} construct={best[1]:.2f} "
            f"execute={best[2]:.2f}",
            flush=True,
        )
    spark.stop()
    with open("/tmp/split_times.json", "w") as fh:
        json.dump(out, fh)


if __name__ == "__main__":
    main()
