#!/usr/bin/env python
"""Benchmark harness: run the declared-query suite and print ONE JSON line.

Runs every registered query at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]``, timing each
end-to-end (plan + execute) with a ``noop``-format write so the full
result is computed without driver-side collection overhead.

Output (stdout): ONE compact JSON line — total, per-family subtotals and
the flagship timing only, so the driver's tail capture never truncates it
(r1's full per-query line overflowed the capture window → "parsed": null).
The full per-query map is written to ``BENCH_FULL.json`` next to this file.
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

    def run_once(fn) -> float:
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # Per-query timing = the SECOND of two executions: the first run pays
    # first-touch codegen compilation / broadcast build / file-listing
    # costs that previously landed on whichever queries sorted early,
    # making round-over-round per-query comparison order-sensitive (r2
    # showed 4x phantom regressions on sub-second queries). The warmed
    # number measures the engine; cold_total preserves the end-to-end
    # including-warm-up wall-clock for transparency.
    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    families: dict[str, float] = {}
    families_cold: dict[str, float] = {}
    for name, fn in sorted(all_queries().items()):
        cold[name] = round(run_once(fn), 4)
        timings[name] = round(run_once(fn), 4)
        fam = fn.__module__.rsplit(".", 1)[-1]
        families[fam] = round(families.get(fam, 0.0) + timings[name], 4)
        families_cold[fam] = round(families_cold.get(fam, 0.0) + cold[name], 4)

    total = round(sum(timings.values()), 4)
    cold_total = round(sum(cold.values()), 4)
    full = {
        "metric": "declared-query suite wall-clock",
        "value": total,
        "unit": "sec",
        "timing": "second-of-2 per query (plan warmed)",
        "queries": timings,
        "queries_cold": cold,
        "cold_total": cold_total,
        "families": families,
        "families_cold": families_cold,
        "sf": sf,
        "n_queries": len(timings),
    }
    sidecar = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_FULL.json")
    with open(sidecar, "w") as f:
        json.dump(full, f, indent=1, sort_keys=True)
    # Compact stdout line (~300 B): family subtotals at 1 dp, no per-query map.
    print(
        json.dumps(
            {
                "metric": "declared-query suite wall-clock",
                "value": total,
                "unit": "sec",
                "queries": {"daily_events_mart": timings.get("daily_events_mart")},
                # warm AND cold side by side so round-over-round comparison
                # never conflates timing methodology with regression
                "cold_total": cold_total,
                "families": {k: round(v, 1) for k, v in sorted(families.items())},
                "families_cold": {k: round(v, 1) for k, v in sorted(families_cold.items())},
                "sf": sf,
                "n_queries": len(timings),
                "detail": "BENCH_FULL.json",
            },
            separators=(",", ":"),
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
