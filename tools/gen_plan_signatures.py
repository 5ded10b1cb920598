"""Regenerate the golden plan-shape signatures for all declared queries.

Run after an INTENTIONAL plan change and commit the updated golden file
together with the change:

    PYTHONPATH=/root/repo python tools/gen_plan_signatures.py

Writes tests/golden/plan_signatures.json (sorted, one query per key).
Uses the same session shape as the test suite (local[4], 4 shuffle
partitions) so signatures are comparable.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from portfolio_data_pipelines_spark.plans.signature import (
    plan_shape_signature,
    plan_shape_signature_reduced,
)
from portfolio_data_pipelines_spark.queries import all_queries
from portfolio_data_pipelines_spark.queries.lakehouse import LIFECYCLE_QUERIES
from portfolio_data_pipelines_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "golden", "plan_signatures.json",
)


def main() -> None:
    spark = get_spark(
        app_name="gen-plan-signatures",
        master="local[4]",
        extra_conf={
            "spark.sql.shuffle.partitions": "4",
            "spark.ui.enabled": "false",
            "spark.driver.memory": "4g",
        },
    )
    from portfolio_data_pipelines_spark.operators.dedup import (
        clear_shared_plans,
    )

    sigs: dict[str, list[str]] = {}
    for name, fn in sorted(all_queries().items()):
        try:
            # canonical COLD plan: the dedup family's shared-artifact
            # cache would otherwise make a query's shape depend on which
            # queries ran earlier in the session
            clear_shared_plans()
            df = fn(spark, SF_DIR)
            # lifecycle queries mutate their own Delta table; the FULL
            # node sequence varies with per-commit file counts, so they
            # pin the REDUCED (count-level) signature instead (r16 —
            # previously excluded entirely)
            if name in LIFECYCLE_QUERIES:
                sigs[name] = plan_shape_signature_reduced(df)
            else:
                sigs[name] = plan_shape_signature(df)
        except Exception as exc:  # pragma: no cover - generator diagnostics
            print(f"SKIP {name}: {exc}", file=sys.stderr)
            raise
        print(f"{name}: {len(sigs[name])} nodes")
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(sigs, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {OUT} ({len(sigs)} queries)")


if __name__ == "__main__":
    main()
