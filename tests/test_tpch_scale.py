"""TPC-H scale-sensitivity: run tools/tpch_scale_harness.py (facts
replicated 10× with disjoint order keys; supplier inflated past the
broadcast threshold) and assert:

- warm-time growth of the 5 heaviest topologies is far below quadratic
  (10× data, quadratic ≈ 100× time);
- the stats-driven join planner actually FLIPS the supplier build side
  (broadcast → sort-merge) for Q9 and Q21 once the dim's bytes cross
  the threshold — the decision operators/cbo.py makes from write-time
  stats rather than Spark's scan heuristic;
- Q9's results are invariant under the inflated dim (the padding
  suppliers match no fact rows), so the flip is purely a plan change.

The sf0.1 × 10 run is recorded in SCALE.md; this test uses sf0.01 to
keep suite time sane — ratios and plan shapes, not absolute times, are
the contract.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_tpch_growth_subquadratic_and_build_side_flips():
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "tpch_scale_harness.py"),
            "--base", "/root/testdata/sf0.01",
            "--replicas", "10",
            "--fat-dim-copies", "2000",
        ],
        capture_output=True,
        text=True,
        timeout=560,
        env={**os.environ, "SPARK_GRAFT_HEAP": "12g"},
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    result = json.loads(proc.stdout.strip().splitlines()[-1])

    # growth: wide noise margin around linear; quadratic would be ~100x
    for q, ratio in result["ratios"].items():
        assert ratio <= 25.0, (q, result["ratios"])

    # the inflated dim really crossed the broadcast threshold
    assert result["fat_supplier_bytes"] > 10 * 1024 * 1024

    # stats_join flipped the supplier join: one broadcast became a
    # sort-merge in both topologies, with everything else intact
    for q in ("product_profit_q9", "waiting_suppliers_q21"):
        flip = result["build_side_flip"][q]
        assert flip["flipped"], (q, flip)
        assert flip["fat"]["smj"] == flip["base"]["smj"] + 1, (q, flip)
        assert flip["fat"]["bhj"] == flip["base"]["bhj"] - 1, (q, flip)

    # plan change only — the padded suppliers alter no results
    assert result["q9_invariant_under_fat_dims"]
