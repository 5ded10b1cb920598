"""Physical-plan hygiene: the scale properties the engine is designed
around, asserted so they cannot silently regress.

Each check reads the executed/optimized plan text of a declared query:
filters must reach the parquet scan (PushedFilters), projection must
narrow the scan (ReadSchema), dimension joins must broadcast (no
sort-merge exchange of the fact), and ORDER BY+LIMIT must compile to
TakeOrderedAndProject (per-partition top-k, no full sort).
"""

from __future__ import annotations

from portfolio_data_pipelines_spark.queries import EXTRA_REGISTRY, REGISTRY, _load_all

_load_all()

SF = "/root/testdata/sf0.01"
ALL = {**REGISTRY, **EXTRA_REGISTRY}


def _plan(spark, name: str) -> str:
    df = ALL[name].fn(spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_reaches_parquet_scan(spark):
    plan = _plan(spark, "pricing_summary")
    assert "PushedFilters: [" in plan
    assert "l_shipdate" in plan.split("PushedFilters:")[1].split("]")[0]


def test_projection_narrows_scan_schema(spark):
    plan = _plan(spark, "stg_events_projection")
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "event_id" in read_schema and "value" in read_schema
    # Unused wide columns must not reach the scan.
    assert "props" not in read_schema and "user_id" not in read_schema


def test_star_join_broadcasts_all_dims(spark):
    plan = _plan(spark, "revenue_by_region")
    assert plan.count("BroadcastHashJoin") == 3
    assert "SortMergeJoin" not in plan  # the fact side never shuffles for joins


def test_topk_compiles_to_take_ordered(spark):
    plan = _plan(spark, "topk_events")
    assert "TakeOrderedAndProject" in plan
    assert "Sort [" not in plan  # no global sort stage


def test_bucketed_join_no_exchange_is_asserted_elsewhere():
    # The zero-Exchange property of the bucketed join is asserted in
    # tests/test_bucketing.py against freshly written bucketed tables.
    assert "bucketed_orders_lineitem_join" in REGISTRY


def test_asof_join_is_linear_not_crossproduct(spark):
    # The as-of join must be the union+window form: no join operator at
    # all in the plan (a theta-join form would show BroadcastNestedLoop
    # or a range-condition SortMergeJoin and blow up on hot keys).
    plan = _plan(spark, "asof_purchase_last_click")
    assert "Window" in plan
    for node in ("NestedLoop", "CartesianProduct"):
        assert node not in plan, node


def test_capped_jaccard_pairs_are_join_free(spark):
    """The capped pair path must generate pairs map-side from posting
    lists (Generate over the collected ids array), never via a shingle
    self-join — no SortMergeJoin anywhere, and the only non-broadcast
    exchanges are aggregations/repartitions."""
    plan = _plan(spark, "ngram_jaccard_dups_capped")
    assert "SortMergeJoin" not in plan
    assert "collect_list" in plan  # the posting-list index build
    assert "explode(flatten(transform" in plan  # map-side pair explosion


def test_posting_index_build_filters_before_collect(spark):
    """The stop-shingle frequency filter must be applied BEFORE the
    posting-list collect (broadcast semi shape), so no aggregation
    buffer can exceed the cap — the order the 100 TB safety argument
    rests on."""
    plan = _plan(spark, "ngram_jaccard_dups_capped")
    collect_pos = plan.index("partial_collect_list")
    freq_broadcast = plan.index("BroadcastExchange", collect_pos)
    # The freq-keep broadcast feeds the join below (deeper in the tree
    # than) the partial collect — i.e. the filter precedes collection.
    assert "freq" in plan[freq_broadcast : freq_broadcast + 2000]


def test_semdedup_pair_join_is_hash_equi_on_cluster(spark):
    """The within-cell pair join must be a hash EQUI-join keyed on the
    cluster id — never a cartesian over the corpus. Nested-loop joins
    may appear ONLY as 1-row identity broadcasts (the centroid-array
    attach that makes assignment map-side); every HashedRelation
    broadcast must be keyed (an equi-join)."""
    plan = _plan(spark, "semdedup_pairs")
    assert "CartesianProduct" not in plan
    # Each BroadcastNestedLoopJoin must sit on an IdentityBroadcastMode
    # (1-row attach), not a HashedRelation of corpus rows.
    assert plan.count("IdentityBroadcastMode") >= plan.count("BroadcastNestedLoopJoin")
    assert "HashedRelationBroadcastMode" in plan or "SortMergeJoin" in plan
    assert "cluster_id" in plan


def test_budget_selection_has_no_global_single_task_window(spark):
    """token_budget_corpus must cumsum via the two-phase prefix sum:
    the only SinglePartition exchange feeds the |partitions|-row
    base-offset window, and the row-level cumsum window is keyed by the
    range-partition id."""
    plan = _plan(spark, "token_budget_corpus")
    assert "_pid" in plan  # per-partition local cumsum window
    assert "RangePartitioning" in plan or "rangepartitioning" in plan.lower()


def test_q3_shape_broadcasts_dims_and_take_ordered(spark):
    plan = _plan(spark, "shipping_priority_top10")
    assert "TakeOrderedAndProject" in plan  # top-10, no global sort
    assert "BroadcastHashJoin" in plan  # customer broadcasts
    # The date filters push into the parquet scans.
    pushed = [seg.split("]")[0] for seg in plan.split("PushedFilters: [")[1:]]
    assert any("l_shipdate" in s for s in pushed)
    assert any("o_orderdate" in s for s in pushed)


def test_bm25_term_filter_lands_before_shuffle(spark):
    plan = _plan(spark, "bm25_topk_docs")
    assert "TakeOrderedAndProject" in plan
    # df (3 rows) and the scalar row broadcast; the corpus never joins
    # through a nested loop.
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan or "IdentityBroadcastMode" in plan


def test_rolling_range_frame_is_specified_range(spark):
    plan = _plan(spark, "rolling_7d_user_value")
    # One user_id exchange, one window node with a RANGE specifiedwindowframe.
    assert plan.lower().count("exchange hashpartitioning(user_id") == 1
    assert "specifiedwindowframe(RangeFrame" in plan


def test_deterministic_shuffle_has_no_single_task_window(spark):
    plan = _plan(spark, "deterministic_corpus_shuffle")
    # Global rank comes from the two-phase prefix count (the range
    # shuffle + per-partition cumsum sit behind running_total's
    # localCheckpoint; this plan joins the broadcast base offsets) —
    # never a global single-task row_number window over the corpus.
    assert "_pid" in plan and "_local_end" in plan
    assert "row_number" not in plan.lower()


def test_scd2_merge_single_key_shuffle(spark):
    from pyspark.sql import functions as F

    from portfolio_data_pipelines_spark.operators.scd import scd2_init
    from portfolio_data_pipelines_spark.sources.parquet import scan_table

    events = scan_table(spark, SF, "events").select(
        "user_id", "event_type", F.col("ts").alias("seen_at"), "event_id"
    )
    df = scd2_init(events, ["user_id"], ["event_type"], "seen_at")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # Both window passes ride ONE user_id exchange; no join in the
    # init path.
    assert plan.lower().count("exchange hashpartitioning(user_id") == 1
    assert "SortMergeJoin" not in plan


def test_observe_write_collects_metrics_in_one_pass(spark, tmp_path):
    """Quality counters ride the write's own scan: values must match
    independently computed answers, and the write must land the data."""
    from pyspark.sql import functions as F

    from portfolio_data_pipelines_spark.plans.quality import (
        m_null_count,
        m_out_of_range,
        m_row_count,
        observe_write,
    )

    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 200.0), (4, 55.0)], "id bigint, temp double"
    )
    out = str(tmp_path / "observed")
    got = observe_write(
        df,
        out,
        [m_row_count(), m_null_count("temp"), m_out_of_range("temp", -80.0, 60.0)],
    )
    assert got == {"n_rows": 4, "nulls_temp": 1, "oor_temp": 1}
    back = spark.read.parquet(out)
    assert back.count() == 4
    assert back.filter(F.col("temp").isNull()).count() == 1


def test_observe_write_rejects_empty_metrics(spark, tmp_path):
    import pytest as _pytest

    from portfolio_data_pipelines_spark.plans.quality import observe_write

    df = spark.createDataFrame([(1,)], "id bigint")
    with _pytest.raises(ValueError, match="at least one metric"):
        observe_write(df, str(tmp_path / "x"), [])


def test_q14_shape_single_agg_pass_with_pushed_window(spark):
    plan = _plan(spark, "promo_revenue_share_1997")
    assert "BroadcastHashJoin" in plan  # part is the broadcast dim
    pushed = [seg.split("]")[0] for seg in plan.split("PushedFilters: [")[1:]]
    assert any("l_shipdate" in s for s in pushed)  # window reaches the scan
    # numerator + denominator from ONE aggregate (no second scan of lineitem)
    assert plan.count("FileScan parquet") <= 2  # lineitem + part, once each


def test_q5_dim_dim_constraint_rides_broadcast_join(spark):
    plan = _plan(spark, "local_supplier_volume")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    pushed = [seg.split("]")[0] for seg in plan.split("PushedFilters: [")[1:]]
    assert any("o_orderdate" in s for s in pushed)
    # the c_nationkey = s_nationkey constraint is a join condition, not a
    # post-join filter over a wider result
    assert "BroadcastHashJoin" in plan


def test_q4_exists_is_left_semi_without_cartesian(spark):
    plan = _plan(spark, "late_shipment_priority_counts")
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    pushed = [seg.split("]")[0] for seg in plan.split("PushedFilters: [")[1:]]
    assert any("o_orderdate" in s for s in pushed)


def test_q6_all_predicates_reach_lineitem_scan(spark):
    plan = _plan(spark, "forecast_revenue_q6")
    assert "FileScan parquet" in plan and plan.count("FileScan parquet") == 1
    pushed = plan.split("PushedFilters: [")[1].split("]")[0]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, f"{col} not pushed: {pushed}"
    assert "Exchange" not in plan.replace("Exchange SinglePartition", "")


def test_q19_disjunction_is_single_join_not_union(spark):
    plan = _plan(spark, "disjunctive_revenue_q19")
    # one scan per table — not the naive union-of-three-joins plan
    assert plan.count("FileScan parquet") == 2
    assert "Union" not in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_q21_self_joins_are_semi_and_anti_without_cartesian(spark):
    plan = _plan(spark, "waiting_suppliers_q21")
    assert "LeftSemi" in plan and "LeftAnti" in plan
    assert "CartesianProduct" not in plan
    # the suppkey inequality rides the orderkey equi-join as a residual
    pushed = [seg.split("]")[0] for seg in plan.split("PushedFilters: [")[1:]]
    assert any("o_orderstatus" in s for s in pushed)


def test_q17_decorrelated_avg_broadcasts_back(spark):
    plan = _plan(spark, "small_qty_revenue_q17")
    # the per-part average frame joins back via broadcast, not a shuffle
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_q15_max_threshold_is_one_row_broadcast(spark):
    plan = _plan(spark, "top_supplier_q15")
    # Catalyst rewrites the crossJoin + equality filter into a broadcast
    # HASH join keyed on the revenue value itself (the 1-row max side is
    # the build) — strictly better than a nested loop, and never a
    # data-sized cartesian
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_q18_having_keys_drive_left_semi(spark):
    plan = _plan(spark, "large_volume_customers_q18")
    assert "LeftSemi" in plan
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_q7_one_fact_shuffle_among_broadcast_dims(spark):
    plan = _plan(spark, "volume_shipping_q7")
    # lineitem->orders is the only data-sized hash exchange; every dim
    # (supplier, customer, both nation copies) broadcasts
    assert plan.count("Exchange hashpartitioning") <= 2  # agg + at most one join
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_q8_seven_way_join_stays_broadcast_star(spark):
    plan = _plan(spark, "market_share_q8")
    assert plan.count("BroadcastHashJoin") >= 6
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    pushed = [seg.split("]")[0] for seg in plan.split("PushedFilters: [")[1:]]
    assert any("p_type" in s for s in pushed)  # part filter reaches its scan


def test_q20_nested_aggregates_broadcast_the_key_list(spark):
    plan = _plan(spark, "excess_suppliers_q20")
    # the supplier-bounded qualifying set broadcasts into the left-semi
    assert "LeftSemi, BuildRight" in plan or (
        "LeftSemi" in plan and "BroadcastExchange" in plan
    )
    assert "CartesianProduct" not in plan


def test_q11_q22_scalar_thresholds_are_one_row_nested_loops(spark):
    for name in ("important_value_q11", "sales_opportunity_q22"):
        plan = _plan(spark, name)
        # the global-aggregate threshold rides a broadcast nested loop of
        # a 1-row frame; the data-sized joins are all hash joins
        assert "BroadcastNestedLoopJoin" in plan, name
        assert "CartesianProduct" not in plan, name


def test_q2_correlated_min_join_back_no_cartesian(spark):
    plan = _plan(spark, "min_cost_supplier_q2")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "TakeOrderedAndProject" in plan
