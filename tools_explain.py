"""Dump .explain("formatted") for faces to plans/$SPARK_GRAFT_PLANS_DIR
(default r14)/<face>_<tag>.txt.

Usage: python tools_explain.py tag face1 face2 ...
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

    from datawarehousefinal_spark import queries as Q
    from datawarehousefinal_spark.session import get_spark

    spark = get_spark(app_name="dwf-explain")
    spark.sparkContext.setLogLevel("ERROR")
    outdir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "plans",
        os.environ.get("SPARK_GRAFT_PLANS_DIR", "r14"),
    )
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = Q.QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        txt = buf.getvalue()
        n_ex = txt.count("Exchange")
        print(f"{name}: {len(txt)} bytes, Exchange x{n_ex} -> {path}")
    spark.stop()


if __name__ == "__main__":
    main()
