"""Unit semantics for as-of join and band join (operators/temporal.py)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from portfolio_data_pipelines_spark.operators.temporal import asof_join, band_join


def _t(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


def _frames(spark):
    left = spark.createDataFrame(
        [(1, 1, _t(10)), (2, 1, _t(12)), (3, 2, _t(9)), (4, 3, _t(11))],
        "id bigint, k bigint, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, _t(9), 10.0), (1, _t(11), 20.0), (2, _t(9), 30.0)],
        "k bigint, ts timestamp, v double",
    )
    return left, right


def test_asof_backward_inclusive(spark):
    left, right = _frames(spark)
    got = {r["id"]: r["asof_v"] for r in asof_join(left, right, on="k", value_cols=("v",)).collect()}
    assert got == {
        1: 10.0,  # 10:00 → rate from 09:00
        2: 20.0,  # 12:00 → rate from 11:00 (not 09:00)
        3: 30.0,  # exact-timestamp match is inclusive
        4: None,  # key 3 has no right rows → NULL, row preserved
    }


def test_asof_tolerance_drops_stale(spark):
    left, right = _frames(spark)
    got = {
        r["id"]: r["asof_v"]
        for r in asof_join(
            left, right, on="k", value_cols=("v",), tolerance_seconds=3600
        ).collect()
    }
    # id=1 matched a rate 1h old (kept, boundary-inclusive); id=2's match
    # is 1h old too; make a stricter window to see the drop.
    assert got[1] == 10.0
    strict = {
        r["id"]: r["asof_v"]
        for r in asof_join(
            left, right, on="k", value_cols=("v",), tolerance_seconds=1800
        ).collect()
    }
    assert strict == {1: None, 2: None, 3: 30.0, 4: None}


def test_asof_preserves_left_row_count(spark):
    left, right = _frames(spark)
    assert asof_join(left, right, on="k", value_cols=("v",)).count() == left.count()


def test_band_join_half_open_intervals(spark):
    fact = spark.createDataFrame(
        [(1, 0.0), (2, 49.9), (3, 50.0), (4, 199.9), (5, 200.0)],
        "id bigint, value double",
    )
    bands = spark.createDataFrame(
        [("low", 0.0, 50.0), ("mid", 50.0, 200.0), ("high", 200.0, 1e9)],
        "band string, lo double, hi double",
    )
    got = {r["id"]: r["band"] for r in band_join(fact, bands, "value").collect()}
    # [lo, hi): boundary value belongs to the upper band.
    assert got == {1: "low", 2: "low", 3: "mid", 4: "mid", 5: "high"}


def test_band_join_is_broadcast(spark):
    fact = spark.createDataFrame([(1, 10.0)], "id bigint, value double")
    bands = spark.createDataFrame([("low", 0.0, 50.0)], "band string, lo double, hi double")
    plan = band_join(fact, bands, "value")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan


def test_salted_join_equals_plain_join(spark):
    from portfolio_data_pipelines_spark.operators.skew import salted_join

    left = spark.createDataFrame(
        [(1, "x"), (1, "y"), (2, "z"), (3, "w")], "k bigint, lv string"
    )
    right = spark.createDataFrame([(1, 10), (2, 20)], "k bigint, rv int")
    got = sorted(tuple(r) for r in salted_join(left, right, on="k", n_salts=4).collect())
    want = sorted(tuple(r) for r in left.join(right, "k").collect())
    assert got == want


def test_salted_join_spreads_key_over_salts(spark):
    from portfolio_data_pipelines_spark.operators.skew import salted_join
    from pyspark.sql import functions as F

    # One hot key on the left; right replicated across all 4 salts.
    left = spark.createDataFrame([(1, i) for i in range(100)], "k bigint, i int")
    right = spark.createDataFrame([(1, 10)], "k bigint, rv int")
    assert salted_join(left, right, on="k", n_salts=4).count() == 100


def test_asof_join_matches_bruteforce_on_random_data(spark):
    """Property check: union+window as-of == brute-force per-row max."""
    import random

    rnd = random.Random(7)
    left = [(i, rnd.randint(1, 5), _t(rnd.randint(0, 23), rnd.choice([0, 30])))
            for i in range(60)]
    right = [(rnd.randint(1, 5), _t(rnd.randint(0, 23), rnd.choice([0, 30])), float(j))
             for j in range(40)]
    # as-of contract requires a unique right row per (key, ts): keep max value.
    dedup = {}
    for k, ts, v in right:
        dedup[(k, ts)] = max(v, dedup.get((k, ts), float("-inf")))
    right = [(k, ts, v) for (k, ts), v in dedup.items()]

    ldf = spark.createDataFrame(left, "id bigint, k bigint, ts timestamp")
    rdf = spark.createDataFrame(right, "k bigint, ts timestamp, v double")
    got = {r["id"]: r["asof_v"] for r in asof_join(ldf, rdf, on="k", value_cols=("v",)).collect()}

    for i, k, lts in left:
        candidates = [(rts, v) for rk, rts, v in right if rk == k and rts <= lts]
        want = max(candidates)[1] if candidates else None
        assert got[i] == want, (i, k, lts, got[i], want)


def test_asof_join_multi_value_cols_carry_one_whole_row(spark):
    """A NULL in one value column of the LATEST right row must come
    through as that NULL — not be backfilled from an older right row
    (whole-row as-of semantics; per-column carry would mix rows)."""
    ldf = spark.createDataFrame([(1, 1, _t(12, 0))], "id bigint, k bigint, ts timestamp")
    rdf = spark.createDataFrame(
        [(1, _t(10, 0), 10.0, "old"), (1, _t(11, 0), 20.0, None)],
        "k bigint, ts timestamp, v double, label string",
    )
    row = asof_join(ldf, rdf, on="k", value_cols=("v", "label")).first()
    assert row["asof_v"] == 20.0
    assert row["asof_label"] is None  # from the 11:00 row, NOT "old"


def test_salted_join_rejects_right_preserving_how(spark):
    import pytest

    from portfolio_data_pipelines_spark.operators.skew import salted_join

    left = spark.createDataFrame([(1, 1)], "k bigint, i int")
    right = spark.createDataFrame([(1, 2)], "k bigint, rv int")
    for how in ("right", "full", "full_outer", "right_outer"):
        with pytest.raises(ValueError, match="left-preserving"):
            salted_join(left, right, on="k", how=how)
    # left-preserving variants still work
    assert salted_join(left, right, on="k", how="left_semi").count() == 1
