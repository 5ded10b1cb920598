"""Slow-marked scale regression for the row-level CDF family: a
day-sized MERGE against a table with 5x the history must not scan or
cost 5x — discovery is stats-pruned to the overlapping files, the
one-commit CDF reads only the commit's files, APPLY CHANGES only the
affected ones. See tools/cdf_scale_harness.py for the methodology and
SCALE.md for the recorded sf0.01 10x table.

The timing-ratio asserts compare measurements taken minutes apart, so
a host-load shift mid-harness can flip them spuriously (observed once
under a full-suite run; the same harness passes in isolation). One
retry absorbs a load spike while a genuine quadratic regression still
fails both attempts — the FILE-COUNT asserts (the real scale
invariants) are never retried leniently: they are deterministic.
"""

from __future__ import annotations

import json
import subprocess
import sys

import pytest


def _run_harness():
    out = subprocess.run(
        [
            sys.executable, "tools/cdf_scale_harness.py",
            "--base", "/root/testdata/sf0.001",
            "--replicas", "5", "--cpus", "4",
        ],
        capture_output=True, text=True, timeout=900, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


@pytest.mark.slow
def test_cdf_costs_track_changes_not_table():
    last = None
    for attempt in (1, 2):
        d = _run_harness()
        g = d["growth"]
        # deterministic invariants: never retried away
        assert g["table_files"] >= 4.5  # the table really got deeper
        # discovery stays pinned to the overlapping files, not the table
        assert g["discovery_files_scanned"] <= 1.5
        for k in ("1x", "5x"):
            assert d[k]["cdf_rows"] == d["1x"]["cdf_rows"]
        c = d["cdc_vs_recon"]
        assert c["cdc_rows"] == c["recon_rows"] > 0
        assert c["cdc_after_cleanup_rows"] == c["cdc_rows"]
        assert c["recon_after_cleanup"].startswith("raises")
        try:
            # change-sized operations stay ~flat (generous 2x noise
            # bound against a 5x table; quadratic-ish would be >4x)
            assert g["merge_s"] < 2.0, g
            assert g["cdf_one_commit_s"] < 2.0, g
            assert g["apply_s"] < 2.0, g
            # write-side cdc no slower than keyed reconstruction
            assert c["cdc_window_s"] < c["recon_window_s"] * 1.5, c
            return
        except AssertionError as e:
            last = e
    raise last
