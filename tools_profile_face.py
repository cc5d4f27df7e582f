"""Profile one face: run with event log on, then summarize per-job wall,
task time, shuffle bytes, and Python-boundary nodes from the plans.

Usage: python tools_profile_face.py face [--sf=DIR]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    name = sys.argv[1]
    sf_dir = "/root/testdata/sf0.1"
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    import shutil

    evdir = "/tmp/spark-events"
    shutil.rmtree(evdir, ignore_errors=True)
    os.makedirs(evdir, exist_ok=True)

    from datawarehousefinal_spark import queries as Q
    from datawarehousefinal_spark.session import get_spark

    spark = get_spark(
        app_name=f"profile-{name}",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{evdir}",
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    def execute() -> float:
        df = Q.QUERIES[name](spark, sf_dir)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # warmup (build + run once), then timed run
    t_warm_0 = time.perf_counter()
    execute()
    warm = time.perf_counter() - t_warm_0
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    t_exec = execute()
    wall = time.perf_counter() - t0
    spark.stop()

    # parse event log (v1 file or v2 directory layout)
    ev = []
    for root, _dirs, files in os.walk(evdir):
        for f in files:
            if "appstatus" not in f:
                ev.append(os.path.join(root, f))
    jobs: dict[int, dict] = {}
    stages: dict[int, dict] = {}
    for path in ev:
        with open(path) as fh:
            for line in fh:
                try:
                    e = json.loads(line)
                except ValueError:
                    continue
                t = e.get("Event")
                if t == "SparkListenerJobStart":
                    jobs[e["Job ID"]] = {
                        "t0": e["Submission Time"],
                        "desc": e.get("Properties", {}).get(
                            "spark.job.description", ""
                        ),
                        "stages": [s["Stage ID"] for s in e["Stage Infos"]],
                    }
                elif t == "SparkListenerJobEnd":
                    if e["Job ID"] in jobs:
                        jobs[e["Job ID"]]["t1"] = e["Completion Time"]
                elif t == "SparkListenerStageCompleted":
                    si = e["Stage Info"]
                    stages[si["Stage ID"]] = {
                        "name": si["Stage Name"],
                        "tasks": si["Number of Tasks"],
                        "ms": si.get("Completion Time", 0)
                        - si.get("Submission Time", 0),
                    }
                elif t == "SparkListenerTaskEnd":
                    sid = e["Stage ID"]
                    m = e.get("Task Metrics") or {}
                    s = stages.setdefault(sid, {})
                    s["task_ms"] = s.get("task_ms", 0) + m.get(
                        "Executor Run Time", 0
                    )
                    s["deser_ms"] = s.get("deser_ms", 0) + m.get(
                        "Executor Deserialize Time", 0
                    )
                    sr = m.get("Shuffle Read Metrics") or {}
                    sw = m.get("Shuffle Write Metrics") or {}
                    s["shuf_r"] = s.get("shuf_r", 0) + sr.get(
                        "Remote Bytes Read", 0
                    ) + sr.get("Local Bytes Read", 0)
                    s["shuf_w"] = s.get("shuf_w", 0) + sw.get(
                        "Shuffle Bytes Written", 0
                    )
                    pyt = m.get("Updated Blocks")  # ignore

    njobs = len(jobs)
    job_wall = sum(j.get("t1", j["t0"]) - j["t0"] for j in jobs.values())
    nstages = len([s for s in stages.values() if "ms" in s])
    ntasks = sum(s.get("tasks", 0) for s in stages.values())
    print(f"face={name} warm_run={warm:.2f}s timed_run={wall:.2f}s")
    print(
        f"jobs={njobs} job_wall_sum={job_wall/1000:.2f}s "
        f"stages={nstages} tasks={ntasks}"
    )
    big = sorted(
        stages.items(), key=lambda kv: -(kv[1].get("ms") or 0)
    )[:15]
    for sid, s in big:
        if not s.get("ms"):
            continue
        print(
            f"  stage {sid}: {s.get('ms',0)}ms tasks={s.get('tasks')} "
            f"taskms={s.get('task_ms',0)} shufR={s.get('shuf_r',0)//1024}K "
            f"shufW={s.get('shuf_w',0)//1024}K  {s.get('name','')[:80]}"
        )


if __name__ == "__main__":
    main()
