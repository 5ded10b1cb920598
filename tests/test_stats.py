"""Accuracy contracts for the approximate aggregates (queries/stats.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from portfolio_data_pipelines_spark.queries.stats import (
    approx_distinct_users_daily,
    approx_price_percentiles,
)
from portfolio_data_pipelines_spark.sources.parquet import scan_table


def test_approx_distinct_within_5pct_of_exact(spark, sf_dir):
    approx = {
        r["date_utc"]: r["approx_users"]
        for r in approx_distinct_users_daily(spark, sf_dir).collect()
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
    approx = {r["l_returnflag"]: r for r in approx_price_percentiles(spark, sf_dir).collect()}
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
