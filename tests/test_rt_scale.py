"""Row-tracking scale harness smoke: the twin-table measurement runs
green end to end (id uniqueness, stability through an identical MERGE,
and row parity are asserted INSIDE the harness)."""

from __future__ import annotations

import json
import subprocess
import sys

import pytest


@pytest.mark.slow
def test_rt_overhead_harness_runs_and_ids_stay_stable():
    out = subprocess.run(
        [
            sys.executable, "tools/rt_scale_harness.py",
            "--base", "/root/testdata/sf0.001", "--cpus", "4",
        ],
        capture_output=True, text=True, timeout=900, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    assert rec["ids_stable_through_merge"] is True
    assert rec["rows"] > 0
