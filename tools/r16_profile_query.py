#!/usr/bin/env python
"""Profile one declared query's driver-side execution with cProfile.

Shows where driver wall-clock goes (py4j round trips, pyarrow footer
reads, JSON log replay) vs executor time — guide §1/§5 measurement for
the lifecycle marts whose cost is commit machinery, not plan shape.

Usage: python tools/r16_profile_query.py <query> [n_warm]
"""
from __future__ import annotations

import cProfile
import os
import pstats
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
        app_name=f"r16-profile-{name}",
        master=f"local[{cpus}]",
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    fn = all_queries()[name]

    def run() -> float:
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    for i in range(n_warm):
        print(f"warm {i}: {run():.3f}s")
    pr = cProfile.Profile()
    pr.enable()
    t = run()
    pr.disable()
    print(f"profiled run: {t:.3f}s")
    st = pstats.Stats(pr)
    st.sort_stats("cumulative").print_stats(45)
    spark.stop()


if __name__ == "__main__":
    main()
