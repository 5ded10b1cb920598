"""TRUE multi-process Delta commit races (r10 verdict #9).

The in-process conflict tests (tests/test_delta_log.py) simulate
interleavings by hand; here two INDEPENDENT Spark sessions — separate
JVMs, separate driver processes, no shared state but the filesystem —
race real appends (plus one state-dependent DML) against one table, so
the optimistic-retry surface is exercised under genuine concurrency:

- every append must land EXACTLY ONCE (the blind-retry property: an
  append references no prior live state, so losing the version race is
  always recoverable by re-committing at the next version);
- the log must hold a gapless version chain with no duplicate or
  orphaned commit files;
- a DELETE racing the appends either commits its exact semantics or
  surfaces a clean conflict error — never a half-applied state.

Local-FS rename is atomic (the same guarantee HDFS/ABFS give), which is
exactly the regime ``_write_commit``'s exclusive-create contract
assumes — see delta_log.py's module docstring on object stores.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

from portfolio_data_pipelines_spark.operators.delta_log import (
    read_delta,
    write_delta,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Each racer is its own driver process: fresh JVM, local[2], appends
# `n_appends` single-row batches tagged (writer, i), then (writer 0
# only) deletes the seed rows (id < 0) — a state-dependent DML racing
# the other writer's appends.
_RACER = """
import sys, time, random
sys.path.insert(0, {repo!r})
from portfolio_data_pipelines_spark.session import get_spark
from portfolio_data_pipelines_spark.operators.delta_log import (
    delete_where, write_delta,
)

writer, seed, path, n_appends = (
    int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], int(sys.argv[4])
)
rng = random.Random(seed * 1000 + writer)
spark = get_spark(
    app_name=f"race-w{{writer}}",
    master="local[2]",
    extra_conf={{
        "spark.ui.enabled": "false",
        "spark.sql.shuffle.partitions": "2",
    }},
)
deleted = "skipped"
for i in range(n_appends):
    df = spark.createDataFrame(
        [(writer * 1000 + i, f"w{{writer}}")], "id bigint, src string"
    )
    write_delta(spark, df, path)
    time.sleep(rng.uniform(0.0, 0.05))
    if writer == 0 and i == n_appends // 2:
        try:
            delete_where(spark, path, "id < 0")
            deleted = "ok"
        except Exception as e:  # noqa: BLE001 — report, parent asserts
            deleted = f"conflict: {{e}}"
print("DELETED::" + deleted)
spark.stop()
"""


@pytest.mark.slow
@pytest.mark.parametrize("seed", [1, 2, 3])
def test_two_process_append_race_lands_every_commit(
    spark, tmp_path, seed
):
    path = str(tmp_path / f"t_race_{seed}")
    # seed rows (id < 0) — the DELETE's target, disjoint from appends
    write_delta(
        spark,
        spark.createDataFrame(
            [(-1, "seed"), (-2, "seed")], "id bigint, src string"
        ),
        path,
    )
    n_appends = 5
    script = _RACER.format(repo=REPO)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", script, str(w), str(seed), path,
             str(n_appends)],
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
            text=True,
        )
        for w in (0, 1)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    assert all(p.returncode == 0 for p in procs), outs
    deleted = next(
        ln.split("::", 1)[1]
        for ln in outs[0].splitlines()
        if ln.startswith("DELETED::")
    )

    # every append landed exactly once; seed rows reflect the DELETE's
    # reported outcome — committed fully or not at all
    rows = {(r["id"], r["src"]) for r in read_delta(spark, path).collect()}
    expect = {
        (w * 1000 + i, f"w{w}") for w in (0, 1) for i in range(n_appends)
    }
    if deleted != "ok":
        expect |= {(-1, "seed"), (-2, "seed")}
    assert rows == expect, (deleted, rows ^ expect)

    # gapless version chain, each version's NDJSON parseable, and the
    # add-file set free of duplicates (no commit double-landed)
    log = os.path.join(path, "_delta_log")
    versions = sorted(
        int(f[:20]) for f in os.listdir(log)
        if f.endswith(".json") and f[:20].isdigit()
    )
    assert versions == list(range(len(versions))), versions
    added = []
    for v in versions:
        with open(os.path.join(log, f"{v:020d}.json")) as f:
            for line in f:
                if line.strip():
                    a = json.loads(line)
                    if "add" in a:
                        added.append(a["add"]["path"])
    assert len(added) == len(set(added)), "duplicate add paths"
