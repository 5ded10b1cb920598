"""SCD type-2 merge operator (operators/scd.py): dbt-snapshot semantics."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from portfolio_data_pipelines_spark.operators.scd import scd2_init, scd2_merge

KEY = ["user_id"]
TRACKED = ["plan"]


def _ts(day: int, hour: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, day, hour)


def _obs(spark, rows):
    return spark.createDataFrame(rows, "user_id bigint, plan string, seen_at timestamp")


def _hist(df):
    return sorted(
        (r.user_id, r.plan, r.valid_from, r.valid_to, r.is_current)
        for r in df.collect()
    )


def test_init_builds_open_rows_and_collapses_duplicates(spark):
    obs = _obs(
        spark,
        [
            (1, "free", _ts(1)),
            (1, "free", _ts(2)),  # unchanged → collapses
            (1, "pro", _ts(3)),
            (2, "pro", _ts(1)),
        ],
    )
    hist = _hist(scd2_init(obs, KEY, TRACKED, "seen_at"))
    assert hist == [
        (1, "free", _ts(1), _ts(3), False),
        (1, "pro", _ts(3), None, True),
        (2, "pro", _ts(1), None, True),
    ]


def test_merge_closes_changed_open_rows_and_keeps_unchanged(spark):
    current = scd2_init(
        _obs(spark, [(1, "free", _ts(1)), (2, "pro", _ts(1))]), KEY, TRACKED, "seen_at"
    )
    batch = _obs(
        spark,
        [
            (1, "pro", _ts(5)),  # change → close + open
            (2, "pro", _ts(5)),  # unchanged → no new row
            (3, "free", _ts(5)),  # new key
        ],
    )
    hist = _hist(scd2_merge(current, batch, KEY, TRACKED, "seen_at"))
    assert hist == [
        (1, "free", _ts(1), _ts(5), False),
        (1, "pro", _ts(5), None, True),
        (2, "pro", _ts(1), None, True),
        (3, "free", _ts(5), None, True),
    ]


def test_merge_is_idempotent(spark):
    current = scd2_init(_obs(spark, [(1, "free", _ts(1))]), KEY, TRACKED, "seen_at")
    batch = _obs(spark, [(1, "pro", _ts(5)), (4, "free", _ts(6))])
    once = scd2_merge(current, batch, KEY, TRACKED, "seen_at")
    twice = scd2_merge(once, batch, KEY, TRACKED, "seen_at")
    assert _hist(once) == _hist(twice)


def test_multiple_changes_in_one_batch_produce_ordered_intervals(spark):
    current = scd2_init(_obs(spark, [(1, "free", _ts(1))]), KEY, TRACKED, "seen_at")
    batch = _obs(
        spark,
        [
            (1, "pro", _ts(3)),
            (1, "enterprise", _ts(7)),
            (1, "enterprise", _ts(8)),  # collapse
        ],
    )
    hist = _hist(scd2_merge(current, batch, KEY, TRACKED, "seen_at"))
    assert hist == [
        (1, "enterprise", _ts(7), None, True),
        (1, "free", _ts(1), _ts(3), False),
        (1, "pro", _ts(3), _ts(7), False),
    ]


def test_late_observations_are_dropped(spark):
    current = scd2_merge(
        scd2_init(_obs(spark, [(1, "free", _ts(1))]), KEY, TRACKED, "seen_at"),
        _obs(spark, [(1, "pro", _ts(5))]),
        KEY,
        TRACKED,
        "seen_at",
    )
    # An observation before (or at) the open row's valid_from must not
    # rewrite closed history.
    late = _obs(spark, [(1, "basic", _ts(2)), (1, "basic", _ts(5))])
    hist = _hist(scd2_merge(current, late, KEY, TRACKED, "seen_at"))
    assert hist == [
        (1, "free", _ts(1), _ts(5), False),
        (1, "pro", _ts(5), None, True),
    ]


def test_matches_changelog_query_semantics(spark):
    """scd2_init over the events fixture == the scd2_user_type_history
    declared query (the full-changelog formulation) when observation
    ties are broken identically."""
    from portfolio_data_pipelines_spark.queries.temporal import scd2_user_type_history
    from portfolio_data_pipelines_spark.sources.parquet import scan_table

    sf = "/root/testdata/sf0.001"
    events = scan_table(spark, sf, "events").select(
        "user_id", "event_type", F.col("ts").alias("seen_at"), "event_id"
    )
    got = scd2_merge(
        None,
        events,
        ["user_id"],
        ["event_type"],
        "seen_at",
        tiebreak_cols=["event_id"],
    )
    want = scd2_user_type_history(spark, sf).select(
        "user_id",
        F.col("event_type"),
        "valid_from",
        "valid_to",
        "is_current",
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
