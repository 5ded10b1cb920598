"""Accuracy contracts for the approximate aggregates (queries/stats.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from portfolio_data_pipelines_spark.queries.stats import (
    approx_distinct_users_daily,
    approx_distinct_users_daily_raw,
    approx_price_percentiles,
    approx_price_percentiles_raw,
)
from portfolio_data_pipelines_spark.sources.parquet import scan_table


def test_approx_distinct_within_5pct_of_exact(spark, sf_dir):
    approx = {
        r["date_utc"]: r["approx_users"]
        for r in approx_distinct_users_daily_raw(spark, sf_dir).collect()
    }
    exact = {
        r["date_utc"]: r["n"]
        for r in scan_table(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("date_utc"))
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert approx.keys() == exact.keys()
    for d, n in exact.items():
        assert abs(approx[d] - n) <= max(1, 0.05 * n), (d, approx[d], n)


def test_approx_percentiles_bracket_exact(spark, sf_dir):
    approx = {r["l_returnflag"]: r for r in approx_price_percentiles_raw(spark, sf_dir).collect()}
    exact = {
        r["l_returnflag"]: r
        for r in scan_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_extendedprice, 0.5)").alias("p50"),
            F.expr("percentile(l_extendedprice, 0.95)").alias("p95"),
        )
        .collect()
    }
    for rf, ex in exact.items():
        assert abs(approx[rf]["p50_price"] - ex["p50"]) / ex["p50"] < 0.02
        assert abs(approx[rf]["p95_price"] - ex["p95"]) / ex["p95"] < 0.02


SF_ORACLE = "/root/testdata/sf0.01"


def test_hll_error_within_published_bound_vs_duckdb(spark, duck):
    """Hard accuracy bound for the HLL sketch: per-day relative error vs
    DuckDB's exact COUNT(DISTINCT) must sit within 3x the configured rsd
    (rsd IS the published HLL++ standard error 1.04/sqrt(m); the data and
    hash are deterministic, so this is a pin, not a flaky tolerance)."""
    approx = {
        r["date_utc"]: r["approx_users"]
        for r in approx_distinct_users_daily_raw(spark, SF_ORACLE).collect()
    }
    exact = dict(
        duck.sql(
            "SELECT CAST(ts AS DATE) AS d, COUNT(DISTINCT user_id) "
            "FROM events GROUP BY 1 ORDER BY 1"
        ).fetchall()
    )
    assert set(approx) == set(exact)
    rsd = 0.02  # the rsd configured in approx_distinct_users_daily
    for d, n in exact.items():
        rel_err = abs(approx[d] - n) / n
        assert rel_err <= 3 * rsd, (d, approx[d], n, rel_err)


def test_approx_percentile_rank_error_within_accuracy_vs_duckdb(spark, duck):
    """Hard accuracy bound for the percentile sketch: approx_percentile's
    contract is rank error <= 1/accuracy. For each group and each p, the
    returned value's rank window in the exact (DuckDB) data must
    intersect [(p - eps) * N, (p + eps) * N]. Also pins that the sketch
    returns a real data value, not an interpolation."""
    eps = 1.0 / 10000  # the accuracy configured in approx_price_percentiles
    for r in approx_price_percentiles_raw(spark, SF_ORACLE).collect():
        rf = r["l_returnflag"]
        for p, colname in ((0.5, "p50_price"), (0.95, "p95_price"), (0.99, "p99_price")):
            v = r[colname]
            n, lo, hi, present = duck.sql(
                f"""
                SELECT COUNT(*),
                       SUM(CASE WHEN l_extendedprice <  {v} THEN 1 ELSE 0 END),
                       SUM(CASE WHEN l_extendedprice <= {v} THEN 1 ELSE 0 END),
                       MAX(CASE WHEN l_extendedprice =  {v} THEN 1 ELSE 0 END)
                FROM lineitem WHERE l_returnflag = '{rf}'
                """
            ).fetchone()
            assert present == 1, (rf, p, v, "not a data value")
            # rank window [lo+1, hi] (1-based) must intersect the allowed
            # rank band; +/-1 absorbs the discrete-rank boundary.
            assert lo <= (p + eps) * n + 1, (rf, p, v, lo, n)
            assert hi >= (p - eps) * n - 1, (rf, p, v, hi, n)


def test_contract_form_queries_report_within_bound(spark, sf_dir):
    """The DECLARED sketch queries are the oracle-checkable contract
    form: exact answer (hash-matched vs DuckDB by the parity suite)
    plus a computed within_bound flag. Here: the flag must come out
    True for every group — i.e. the sketches actually satisfy their
    published error bounds on real data — and the exact arms carry the
    agreed column names."""
    hll = approx_distinct_users_daily(spark, sf_dir).collect()
    assert hll and all(r["within_bound"] for r in hll)
    assert {"date_utc", "exact_users", "n_events", "within_bound"} == set(
        hll[0].asDict()
    )
    pct = approx_price_percentiles(spark, sf_dir).collect()
    assert pct and all(r["within_bound"] for r in pct)
    assert {
        "l_returnflag", "p50_exact", "p95_exact", "p99_exact", "within_bound"
    } == set(pct[0].asDict())


def test_exact_quantiles_by_rank_bit_identical(spark, sf_dir):
    """The rank-based exact arm (two-phase prefix sum, bounded memory)
    must be BIT-identical to the in-memory percentile() aggregate it
    replaced — same interpolation expression, evaluated from the two
    bracketing order statistics instead of a buffered group."""
    from pyspark.sql import functions as F

    from portfolio_data_pipelines_spark.operators.pipeline import (
        exact_quantiles_by_rank,
    )
    from portfolio_data_pipelines_spark.sources.parquet import scan_table

    li = scan_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    qs = [0.5, 0.95, 0.99]
    got = {
        (r["l_returnflag"], r["_q"]): r["_quantile"]
        for r in exact_quantiles_by_rank(
            li, ["l_returnflag"], "l_extendedprice", qs
        ).collect()
    }
    ref = {}
    for r in li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, array(0.5, 0.95, 0.99))").alias("p")
    ).collect():
        for q, v in zip(qs, r["p"]):
            ref[(r["l_returnflag"], q)] = v
    assert got == ref  # exact equality, not approx


def test_exact_quantiles_by_rank_edges(spark):
    """NULLs ignored, single-value groups, integral ranks (q=0/1), and
    interpolation between adjacent distinct values."""
    from portfolio_data_pipelines_spark.operators.pipeline import (
        exact_quantiles_by_rank,
    )

    df = spark.createDataFrame(
        [("a", 1.0), ("a", None), ("a", 3.0), ("b", 5.0),
         ("c", 2.0), ("c", 2.0), ("c", 4.0)],
        "g string, v double",
    )
    got = {
        (r["g"], r["_q"]): r["_quantile"]
        for r in exact_quantiles_by_rank(df, ["g"], "v", [0.0, 0.5, 1.0]).collect()
    }
    assert got[("a", 0.0)] == 1.0
    assert got[("a", 0.5)] == 2.0  # interpolated between 1 and 3
    assert got[("a", 1.0)] == 3.0
    assert got[("b", 0.0)] == got[("b", 0.5)] == got[("b", 1.0)] == 5.0
    assert got[("c", 0.5)] == 2.0  # duplicate values collapse into counts
    assert got[("c", 1.0)] == 4.0
