"""Scale-sensitivity: run tools/scale_harness.py (1× vs 10× synthetic
corpus, id-offset + rotated-alphabet replicas) and assert the capped
dedup / decontam family grows ~linearly — candidate pairs, verified
pairs, and warm runtimes. Quadratic growth would show as ~100× ratios;
the bounds below allow generous noise around the expected ~10×.

The full-size run (sf0.1 × 10) is recorded in SCALE.md; this test runs
the identical harness at sf0.01 × 10 to keep suite time sane — the
ratios, not the absolute times, are the contract.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_capped_family_grows_linearly_not_quadratically():
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "scale_harness.py"),
            "--base", "/root/testdata/sf0.01",
            "--replicas", "10",
        ],
        capture_output=True,
        text=True,
        timeout=540,
        env={**os.environ, "SPARK_GRAFT_HEAP": "12g"},
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    result = json.loads(proc.stdout.strip().splitlines()[-1])

    r = result["ratios"]
    # Workload (candidate pairs of the capped inverted index) and output
    # (verified near-dup pairs) must track data volume, not its square.
    for key in ("jaccard_candidates", "jaccard_pairs", "lsh_pairs"):
        assert 3.0 <= r[key] <= 30.0, (key, r)
    # Broadcast-index decontamination: a fixed benchmark matches the same
    # docs no matter how much unrelated corpus surrounds them.
    assert result["contam_invariant"], result
    # Warm runtimes: linear-ish with wide noise margin (machine jitter on
    # sub-10s timings); quadratic work would blow far past this.
    for key in ("t_candidates", "t_jaccard", "t_lsh", "t_contam"):
        assert r[key] <= 30.0, (key, r)
