#!/usr/bin/env python
"""Benchmark harness: run the declared-query suite and print ONE JSON line.

Runs every registered query at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]``, timing each
end-to-end (plan + execute) with a ``noop``-format write so the full
result is computed without driver-side collection overhead.

Output: ``{"metric": "...", "value": <total sec>, "unit": "sec",
"queries": {name: sec, ...}, "sf": <float>}``
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from portfolio_data_pipelines_spark.queries import all_queries  # noqa: E402
from portfolio_data_pipelines_spark.session import get_spark  # noqa: E402
from portfolio_data_pipelines_spark.sources.parquet import scan_table  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4)))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark(
        app_name="pdp-spark-bench",
        master=f"local[{cpus}]",
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM/codegen paths so per-query numbers measure the engine,
    # not first-touch class loading.
    scan_table(spark, sf_dir, "events").count()

    timings: dict[str, float] = {}
    families: dict[str, float] = {}
    for name, fn in sorted(all_queries().items()):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 4)
        fam = fn.__module__.rsplit(".", 1)[-1]
        families[fam] = round(families.get(fam, 0.0) + timings[name], 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "declared-query suite wall-clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "families": families,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
