"""Lifecycle conformance fuzz: a SEEDED random walk over the whole
mutation surface (append / overwrite / replaceWhere / merge / both
DELETE forms / UPDATE / OPTIMIZE / PURGE / checkpoint / RESTORE),
holding a plain-python model of the table's logical rows, and after
EVERY commit comparing the model against BOTH readers — the engine's
Spark read and the independent spec-only pyarrow reader. Any wire-
format drift (a descriptor mispaired, a tombstone misapplied, a
checkpoint field dropped, a restore missing DV state) surfaces as a
three-way mismatch at the exact step that introduced it, with the
seed and op trace in the failure message.

Deterministic seeds rather than hypothesis: each step costs Spark
jobs, so shrinking is impractical — reproducibility comes from the
printed trace instead.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from portfolio_data_pipelines_spark.operators.delta_log import (
    checkpoint_delta,
    delete_where,
    delete_where_dv,
    merge_delta,
    optimize_delta,
    purge_delta,
    read_delta,
    restore_delta,
    update_where,
    write_delta,
)
from portfolio_data_pipelines_spark.operators.delta_reader import (
    read_delta_external,
)

COLS = ("id", "grp", "val")


def _frame(spark, rows):
    return spark.createDataFrame(
        [(i, g, v) for i, (g, v) in sorted(rows.items())],
        "id long, grp string, val long",
    )


def _fresh_rows(rng, next_id, n):
    rows = {}
    for _ in range(n):
        rows[next_id] = (str(next_id % 3), rng.randrange(0, 1000))
        next_id += 1
    return rows, next_id


def _check(spark, path, model, trace):
    got = sorted(
        (r["id"], r["grp"], r["val"])
        for r in read_delta(spark, path).collect()
    )
    want = sorted((i, g, v) for i, (g, v) in model.items())
    assert got == want, f"spark reader diverged after {trace}"
    names, rows = read_delta_external(path)
    idx = [names.index(c) for c in COLS]
    ext = sorted((r[idx[0]], r[idx[1]], r[idx[2]]) for r in rows)
    assert ext == want, f"external reader diverged after {trace}"


def _walk(spark, tmp_path, seed, n_ops):
    rng = random.Random(seed)
    path = str(tmp_path / f"fuzz_{seed}")
    model, next_id = _fresh_rows(rng, 0, 30)
    write_delta(spark, _frame(spark, model), path, partition_col="grp")
    version = 0
    snapshots = {0: dict(model)}
    trace = [f"seed={seed}", "create(30)"]

    ops = [
        "append", "merge", "delete", "delete_dv", "update",
        "replace", "optimize", "purge", "checkpoint", "restore",
    ]
    for step in range(n_ops):
        op = rng.choice(ops)
        trace.append(f"{step}:{op}")
        if op == "append":
            fresh, next_id = _fresh_rows(rng, next_id, rng.randrange(3, 9))
            version = write_delta(
                spark, _frame(spark, fresh), path, partition_col="grp"
            )
            model.update(fresh)
        elif op == "merge":
            upd = {
                i: (model[i][0], model[i][1] + 1000)
                for i in rng.sample(sorted(model), min(4, len(model)))
            }
            fresh, next_id = _fresh_rows(rng, next_id, 2)
            src = {**upd, **fresh}
            version = merge_delta(
                spark, path, _frame(spark, src), key_cols=["id"]
            )
            model.update(src)
        elif op in ("delete", "delete_dv"):
            k, r = rng.choice([(5, 0), (7, 2), (4, 1)])
            fn = delete_where if op == "delete" else delete_where_dv
            v = fn(spark, path, f"id % {k} = {r}")
            doomed = [i for i in model if i % k == r]
            if v is None:
                assert not doomed, f"matched rows but no commit: {trace}"
                trace[-1] += "(noop)"
                continue
            version = v
            for i in doomed:
                del model[i]
        elif op == "update":
            k, r = rng.choice([(6, 3), (5, 4)])
            v = update_where(
                spark, path, f"id % {k} = {r}", {"val": "val + 7"}
            )
            hit = [i for i in model if i % k == r]
            if v is None:
                assert not hit, f"matched rows but no commit: {trace}"
                trace[-1] += "(noop)"
                continue
            version = v
            for i in hit:
                model[i] = (model[i][0], model[i][1] + 7)
        elif op == "replace":
            grp = str(rng.randrange(0, 3))
            fresh, next_id = _fresh_rows(rng, next_id, 5)
            repl = {
                i: (grp, v) for i, (_g, v) in fresh.items()
            }
            version = write_delta(
                spark, _frame(spark, repl), path, partition_col="grp",
                mode="overwrite", replace_partitions=[grp],
            )
            model = {i: gv for i, gv in model.items() if gv[0] != grp}
            model.update(repl)
        elif op == "optimize":
            v = optimize_delta(spark, path)
            if v is None:
                trace[-1] += "(noop)"
                continue
            version = v
        elif op == "purge":
            v = purge_delta(spark, path)
            if v is None:
                trace[-1] += "(noop)"
                continue
            version = v
        elif op == "checkpoint":
            checkpoint_delta(spark, path, version)
            trace[-1] += f"@{version}"
            continue  # no commit, no model change
        elif op == "restore":
            candidates = [v for v in snapshots if v < version]
            if not candidates:
                trace[-1] += "(noop)"
                continue
            target = rng.choice(candidates)
            version = restore_delta(spark, path, target)
            model = dict(snapshots[target])
            trace[-1] += f"->{target}"
        snapshots[version] = dict(model)
        _check(spark, path, model, " ".join(trace))
    _check(spark, path, model, " ".join(trace) + " END")


def test_lifecycle_fuzz_seed_1(spark, tmp_path):
    _walk(spark, tmp_path, seed=1, n_ops=12)


def test_lifecycle_fuzz_seed_42(spark, tmp_path):
    _walk(spark, tmp_path, seed=42, n_ops=12)


def test_lifecycle_fuzz_seed_7(spark, tmp_path):
    _walk(spark, tmp_path, seed=7, n_ops=16)


def test_lifecycle_fuzz_seed_2024(spark, tmp_path):
    _walk(spark, tmp_path, seed=2024, n_ops=16)


def _walk_with_cdf_replica(spark, tmp_path, seed, n_ops):
    """The same walk on a CDF-ENABLED source, with a REPLICA table
    maintained purely from the change feed after every commit — the
    replication loop (source → read_delta_cdf → apply_changes_delta)
    must converge to the model through arbitrary op interleavings,
    including DV deletes (cdc-staged), replaceWhere overwrites and
    keyed restores."""
    from portfolio_data_pipelines_spark.operators.delta_log import (
        apply_changes_delta,
        read_delta_cdf,
    )

    rng = random.Random(seed)
    path = str(tmp_path / f"fuzz_cdf_{seed}")
    rep = str(tmp_path / f"fuzz_rep_{seed}")
    model, next_id = _fresh_rows(rng, 0, 24)
    write_delta(
        spark, _frame(spark, model), path, partition_col="grp",
        configuration={"delta.enableChangeDataFeed": "true"},
    )
    write_delta(  # empty replica, same shape
        spark,
        spark.createDataFrame([], "id long, grp string, val long"),
        rep,
    )
    version = 0
    applied = -1  # replica has consumed changes through this version
    snapshots = {0: dict(model)}
    trace = [f"cdf-seed={seed}", "create(24)"]

    def sync():
        nonlocal applied
        changes = read_delta_cdf(
            spark, path, applied, key_cols=["id"], to_version=version
        )
        apply_changes_delta(spark, rep, changes, key_cols=["id"])
        applied = version
        got = sorted(
            (r["id"], r["grp"], r["val"])
            for r in read_delta(spark, rep).collect()
        )
        want = sorted((i, g, v) for i, (g, v) in model.items())
        assert got == want, f"replica diverged after {' '.join(trace)}"

    sync()
    ops = ["append", "merge", "delete", "delete_dv", "update",
           "replace", "optimize", "restore"]
    for step in range(n_ops):
        op = rng.choice(ops)
        trace.append(f"{step}:{op}")
        if op == "append":
            fresh, next_id = _fresh_rows(rng, next_id, rng.randrange(2, 6))
            version = write_delta(
                spark, _frame(spark, fresh), path, partition_col="grp"
            )
            model.update(fresh)
        elif op == "merge":
            upd = {
                i: (model[i][0], model[i][1] + 1000)
                for i in rng.sample(sorted(model), min(3, len(model)))
            }
            fresh, next_id = _fresh_rows(rng, next_id, 2)
            src = {**upd, **fresh}
            version = merge_delta(
                spark, path, _frame(spark, src), key_cols=["id"]
            )
            model.update(src)
        elif op in ("delete", "delete_dv"):
            k, r = rng.choice([(5, 0), (7, 2)])
            fn = delete_where if op == "delete" else delete_where_dv
            v = fn(spark, path, f"id % {k} = {r}")
            if v is None:
                trace[-1] += "(noop)"
                continue
            version = v
            for i in [i for i in model if i % k == r]:
                del model[i]
        elif op == "update":
            v = update_where(
                spark, path, "id % 6 = 3", {"val": "val + 7"}
            )
            if v is None:
                trace[-1] += "(noop)"
                continue
            version = v
            for i in [i for i in model if i % 6 == 3]:
                model[i] = (model[i][0], model[i][1] + 7)
        elif op == "replace":
            grp = str(rng.randrange(0, 3))
            fresh, next_id = _fresh_rows(rng, next_id, 4)
            repl = {i: (grp, v) for i, (_g, v) in fresh.items()}
            version = write_delta(
                spark, _frame(spark, repl), path, partition_col="grp",
                mode="overwrite", replace_partitions=[grp],
                cdf_key_cols=["id"],
            )
            model = {i: gv for i, gv in model.items() if gv[0] != grp}
            model.update(repl)
        elif op == "optimize":
            v = optimize_delta(spark, path)
            if v is None:
                trace[-1] += "(noop)"
                continue
            version = v
        elif op == "restore":
            candidates = [v for v in snapshots if v < version]
            if not candidates:
                trace[-1] += "(noop)"
                continue
            target = rng.choice(candidates)
            version = restore_delta(
                spark, path, target, cdf_key_cols=["id"]
            )
            model = dict(snapshots[target])
            trace[-1] += f"->{target}"
        snapshots[version] = dict(model)
        _check(spark, path, model, " ".join(trace))
        sync()


def test_lifecycle_fuzz_cdf_replica_seed_3(spark, tmp_path):
    _walk_with_cdf_replica(spark, tmp_path, seed=3, n_ops=10)


def test_lifecycle_fuzz_cdf_replica_seed_99(spark, tmp_path):
    _walk_with_cdf_replica(spark, tmp_path, seed=99, n_ops=10)
