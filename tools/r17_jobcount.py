#!/usr/bin/env python
"""Count the Spark JOBS one declared query launches (and their stages).

The sub-second lifecycle marts are job-latency-bound at sf0.1
(~0.2-0.35 s fixed cost per sequential job — r16 verdict), so the
optimization target for them is the JOB COUNT, not per-stage compute.
This tool pins that number: runs the query under a job group and lists
every job with its stage/task counts via the status tracker.

Usage: python tools/r17_jobcount.py <query> [n_warm]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from portfolio_data_pipelines_spark.queries import all_queries  # noqa: E402
from portfolio_data_pipelines_spark.session import get_spark  # noqa: E402


def main() -> None:
    name = sys.argv[1]
    n_warm = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4))
    os.environ["PYTHONPATH"] = (
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        + os.pathsep + os.environ.get("PYTHONPATH", "")
    )
    spark = get_spark(
        app_name=f"r17-jobcount-{name}",
        master=f"local[{cpus}]",
        extra_conf={"spark.ui.enabled": "false"},
    )
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")
    fn = all_queries()[name]

    def run() -> float:
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    for i in range(n_warm):
        print(f"warm {i}: {run():.3f}s")

    sc.setJobGroup("r17prof", name)
    t = run()
    sc.setJobGroup("", "")
    tracker = sc.statusTracker()
    jids = sorted(tracker.getJobIdsForGroup("r17prof"))
    print(f"profiled run: {t:.3f}s — {len(jids)} jobs")
    for jid in jids:
        ji = tracker.getJobInfo(jid)
        stages = []
        ntasks = 0
        names = []
        for sid in sorted(ji.stageIds):
            si = tracker.getStageInfo(sid)
            if si is not None:
                stages.append(f"s{sid}:{si.numTasks}t")
                ntasks += si.numTasks
                names.append(si.name.split(" at ")[-1][-52:])
        print(f"  job {jid}: {len(ji.stageIds)} stages, {ntasks} tasks "
              f"[{' '.join(stages)}] {names}")
    spark.stop()


if __name__ == "__main__":
    main()
