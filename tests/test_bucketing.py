"""Bucketed-join plumbing: the write-once-shuffle-never contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from portfolio_data_pipelines_spark.operators.bucketing import bucketed_join, write_bucketed
from portfolio_data_pipelines_spark.sources.parquet import scan_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    orders = scan_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    lineitem = scan_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    write_bucketed(orders, "b_orders", "o_orderkey", n_buckets=4, sort_cols="o_orderkey")
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem", "o_orderkey", n_buckets=4, sort_cols="o_orderkey",
    )
    yield "b_orders", "b_lineitem"
    for t in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    lt, rt = bucketed_tables
    plan = (
        bucketed_join(spark, lt, rt, on="o_orderkey")
        ._jdf.queryExecution().executedPlan().toString()
    )
    # The whole point of bucketing: a sort-merge join with no shuffle.
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning" not in plan
    assert "Bucketed: true" in plan


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed_tables):
    lt, rt = bucketed_tables
    got = bucketed_join(spark, lt, rt, on="o_orderkey").count()
    orders = scan_table(spark, sf_dir, "orders")
    lineitem = scan_table(spark, sf_dir, "lineitem")
    want = orders.join(
        lineitem, orders.o_orderkey == lineitem.l_orderkey
    ).count()
    assert got == want


def test_bucketed_agg_on_key_has_no_exchange(spark, bucketed_tables):
    lt, _ = bucketed_tables
    plan = (
        spark.table(lt)
        .groupBy("o_orderkey")
        .agg(F.sum("o_totalprice"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # bucketing satisfies the agg's distribution too
