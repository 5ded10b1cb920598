"""Relational declared queries (SURVEY §2.3-§2.7, §7 M2).

Each query names the §2 operator(s) it exercises. Spark side is pure
DataFrame API (Catalyst plans joins/aggs; explicit ``broadcast`` on
dimension tables); oracle side is ANSI SQL for DuckDB over the same
parquet. Scale notes inline where a choice matters at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import davg, davg_sql, dsum, dsum_sql
from ..operators.cbo import stats_join
from ..sources.parquet import scan_table
from . import extra_query, query


# ---------------------------------------------------------------------------
# The weather-vertical shapes, transposed onto the events table (A2/W1/P5/P6)
# ---------------------------------------------------------------------------


@query(
    "daily_events_mart",
    oracle=f"""
    SELECT CAST(ts AS DATE) AS date_utc,
           {davg_sql('value')} AS avg_value,
           MAX(value)          AS max_value,
           MIN(value)          AS min_value,
           COUNT(*)            AS n_events
    FROM events
    GROUP BY 1
    ORDER BY 1
    """,
)
def daily_events_mart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: the reference's daily mart (weather_daily.sql:4-12 — A2
    grouped agg + W1 ordering) on the events time-series. One shuffle on
    the date key; partial aggregation is map-side so the shuffle carries
    one row per (partition, day)."""
    return (
        scan_table(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("date_utc"))
        .agg(
            davg("value").alias("avg_value"),
            F.max("value").alias("max_value"),
            F.min("value").alias("min_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("date_utc")
    )


@extra_query(
    "stg_events_projection",
    oracle="""
    SELECT event_id,
           ts AS time_utc,
           CAST(ts AS DATE) AS date_utc,
           event_type,
           value
    FROM events
    """,
)
def stg_events_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staging-view shape (stg_weather_hourly.sql:3-8 — P5 rename + P6
    derived date bucket). Pure projection: no shuffle; column pruning
    reaches the parquet scan."""
    e = scan_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.col("ts").alias("time_utc"),
        F.to_date("ts").alias("date_utc"),
        "event_type",
        "value",
    )


@extra_query(
    "events_filter_range",
    oracle="""
    SELECT event_id, user_id, value
    FROM events
    WHERE event_type = 'purchase' AND value BETWEEN 100 AND 200
    """,
)
def events_filter_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row filter (the WHERE surface; SURVEY §2.3 note). Predicates are
    pushed to the parquet scan (PushedFilters in .explain)."""
    return (
        scan_table(spark, sf_dir, "events")
        .filter((F.col("event_type") == "purchase") & F.col("value").between(100, 200))
        .select("event_id", "user_id", "value")
    )


@extra_query(
    "batch_min_date",
    oracle="SELECT CAST(MIN(CAST(ts AS DATE)) AS DATE) AS batch_date FROM events",
)
def batch_min_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-min partition date (A1 — weather_hourly_pipeline.py:67,89):
    the single value the reference uses for file name, S3 key, and the
    idempotent delete predicate."""
    return (
        scan_table(spark, sf_dir, "events")
        .agg(F.min(F.to_date("ts")).alias("batch_date"))
    )


@extra_query(
    "topk_events",
    oracle="""
    SELECT event_id, user_id, value
    FROM events
    ORDER BY value DESC, event_id ASC
    LIMIT 10
    """,
)
def topk_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + LIMIT top-k (W2 — README.md:156-158). Spark plans
    TakeOrderedAndProject: per-partition top-k then a single-driver merge
    — no full sort, no full shuffle, scales to any row count."""
    return (
        scan_table(spark, sf_dir, "events")
        .orderBy(F.desc("value"), F.asc("event_id"))
        .limit(10)
        .select("event_id", "user_id", "value")
    )


@extra_query(
    "topk_per_day_events",
    oracle="""
    SELECT date_utc, event_id, value, rk
    FROM (
        SELECT CAST(ts AS DATE) AS date_utc, event_id, value,
               ROW_NUMBER() OVER (
                   PARTITION BY CAST(ts AS DATE)
                   ORDER BY value DESC, event_id ASC
               ) AS rk
        FROM events
    )
    WHERE rk <= 3
    """,
)
def topk_per_day_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group (W3 — the fx_top10_daily semantic the reference
    named but never shipped). row_number window with deterministic
    tie-break. Scale: one shuffle on the partition key; with AQE a skewed
    day splits into multiple tasks."""
    w = Window.partitionBy("date_utc").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        scan_table(spark, sf_dir, "events")
        .select(F.to_date("ts").alias("date_utc"), "event_id", "value")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
    )


# ---------------------------------------------------------------------------
# Aggregation / scan basics (P8, A3)
# ---------------------------------------------------------------------------


@extra_query("count_lineitem", oracle="SELECT COUNT(*) AS n_rows FROM lineitem")
def count_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row count (P8/A3 — the reference's smoke check, README.md:74)."""
    return scan_table(spark, sf_dir, "lineitem").agg(F.count(F.lit(1)).alias("n_rows"))


# Exact-decimal product expressions, valid verbatim in BOTH Spark SQL and
# DuckDB. Casting the FACTORS (2-decimal doubles → exact decimals) and
# multiplying in decimal avoids the double-product tie problem: a
# 2dp×2dp×2dp product has exactly 6 true decimals, so casting the double
# product at scale 4 hits `…50` rounding ties on ~10% of rows and the two
# engines disagree per row. Factor-cast precisions are sized so Spark's
# result precision stays ≤38 (no precision-loss rounding): (12,2)×(9,2)
# →(22,4), ×(9,2)→(32,6).
_DISC_PRICE_DEC = (
    "(CAST(l_extendedprice AS DECIMAL(12,2))"
    " * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(8,2))))"
)
_CHARGE_DEC = f"({_DISC_PRICE_DEC} * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(8,2))))"


@extra_query(
    "pricing_summary",
    oracle=f"""
    SELECT l_returnflag,
           l_linestatus,
           {dsum_sql('l_quantity')}                          AS sum_qty,
           {dsum_sql('l_extendedprice')}                     AS sum_base_price,
           CAST(SUM({_DISC_PRICE_DEC}) AS DOUBLE)            AS sum_disc_price,
           CAST(SUM({_CHARGE_DEC}) AS DOUBLE)                AS sum_charge,
           {davg_sql('l_quantity')}                          AS avg_qty,
           {davg_sql('l_extendedprice')}                     AS avg_price,
           {davg_sql('l_discount')}                          AS avg_disc,
           COUNT(*)                                          AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: the canonical scan→filter→groupBy→multi-agg.
    8 aggregates over a filtered fact scan; group key has 6 distinct
    values, so the post-shuffle reduce is trivial and the work is the
    map-side partial agg — exactly how it should look at 100 TB."""
    l = scan_table(spark, sf_dir, "lineitem")
    return (
        l.filter(F.col("l_shipdate") <= F.lit("2000-12-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            F.expr(f"CAST(SUM({_DISC_PRICE_DEC}) AS DOUBLE)").alias("sum_disc_price"),
            F.expr(f"CAST(SUM({_CHARGE_DEC}) AS DOUBLE)").alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@extra_query(
    "orders_monthly",
    oracle=f"""
    SELECT CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month_start,
           COUNT(*) AS n_orders,
           {dsum_sql('o_totalprice')} AS total_revenue
    FROM orders
    GROUP BY 1
    ORDER BY 1
    """,
)
def orders_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date bucketing to month grain (F2 family): date_trunc + grouped agg."""
    return (
        scan_table(spark, sf_dir, "orders")
        # trunc() returns DateType (date_trunc returns timestamp).
        .groupBy(F.trunc("o_orderdate", "month").alias("month_start"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("total_revenue"),
        )
        .orderBy("month_start")
    )


@extra_query(
    "conditional_agg_daily",
    oracle=f"""
    SELECT CAST(ts AS DATE) AS date_utc,
           COUNT(*) FILTER (WHERE event_type = 'click')    AS clicks,
           COUNT(*) FILTER (WHERE event_type = 'view')     AS views,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchases,
           {dsum_sql("CASE WHEN event_type = 'purchase' THEN value ELSE 0 END")} AS purchase_value
    FROM events
    GROUP BY 1
    ORDER BY 1
    """,
)
def conditional_agg_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation (pivot-style CASE WHEN counts): one pass,
    no joins — the idiomatic way to fan one scan into many metrics."""
    e = scan_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.to_date("ts").alias("date_utc"))
        .agg(
            F.count(F.when(F.col("event_type") == "click", 1)).alias("clicks"),
            F.count(F.when(F.col("event_type") == "view", 1)).alias("views"),
            F.count(F.when(F.col("event_type") == "purchase", 1)).alias("purchases"),
            dsum(
                F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(F.lit(0.0))
            ).alias("purchase_value"),
        )
        .orderBy("date_utc")
    )


@extra_query(
    "distinct_stats",
    oracle="""
    SELECT COUNT(DISTINCT o_custkey)     AS n_customers_with_orders,
           COUNT(DISTINCT o_orderstatus) AS n_statuses,
           COUNT(*)                      AS n_orders
    FROM orders
    """,
)
def distinct_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregation (SURVEY §2.4 'not present' extension).
    Spark expands distinct aggs to a two-stage plan; at scale prefer
    approx_count_distinct (see `approx_distinct_users`, rows-only)."""
    o = scan_table(spark, sf_dir, "orders")
    return o.agg(
        F.countDistinct("o_custkey").alias("n_customers_with_orders"),
        F.countDistinct("o_orderstatus").alias("n_statuses"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@extra_query(
    "having_big_spenders",
    oracle=f"""
    SELECT o_custkey, COUNT(*) AS n_orders, {dsum_sql('o_totalprice')} AS total_spend
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) >= 15
    ORDER BY o_custkey
    """,
)
def having_big_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY + HAVING (post-aggregation filter)."""
    return (
        scan_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice").alias("total_spend"))
        .filter(F.col("n_orders") >= 15)
        .orderBy("o_custkey")
    )


# ---------------------------------------------------------------------------
# Joins (SURVEY §2.5 — target surface; none exist in the reference)
# ---------------------------------------------------------------------------


@extra_query(
    "orders_by_segment",
    oracle=f"""
    SELECT c.c_mktsegment AS mktsegment,
           COUNT(*) AS n_orders,
           {dsum_sql('o.o_totalprice')} AS total_revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1
    ORDER BY 1
    """,
)
def orders_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⋈dim equi-join + grouped agg. The dimension side is explicitly
    broadcast: at 100 TB the orders fact never shuffles for this join —
    each task streams its scan against a hashed copy of customer."""
    o = scan_table(spark, sf_dir, "orders")
    c = scan_table(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("mktsegment"))
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice").alias("total_revenue"))
        .orderBy("mktsegment")
    )


@extra_query(
    "revenue_by_region",
    oracle=f"""
    SELECT r.r_name AS region_name,
           COUNT(*) AS n_orders,
           {dsum_sql('o.o_totalprice')} AS total_revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY 1
    ORDER BY 1
    """,
)
def revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiway star join (orders→customer→nation→region). Join strategy
    comes from the mini-CBO (operators/cbo.py): each dim's footer stats
    are probed once (cached) and every side under the broadcast
    threshold is broadcast — at sf scales that reproduces the
    hand-hinted all-dims-broadcast plan (pinned in tests/test_cbo.py),
    while an oversized dim would automatically fall back to a shuffle
    join instead of OOMing the build side. The plan is a single
    pipelined scan of the fact with three hash-probe stages — zero fact
    shuffles before the final 5-group agg."""
    from ..operators.cbo import stats_for_parquet, stats_join

    o = scan_table(spark, sf_dir, "orders")
    c = scan_table(spark, sf_dir, "customer")
    n = scan_table(spark, sf_dir, "nation")
    r = scan_table(spark, sf_dir, "region")
    st = {t: stats_for_parquet(spark, f"{sf_dir}/{t}.parquet")
          for t in ("customer", "nation", "region")}
    # The fact chain's intermediate size is unknown (left_stats=None →
    # never broadcast left); each dim side is judged by its own stats.
    j = stats_join(o, c, o.o_custkey == c.c_custkey, right_stats=st["customer"])
    j = stats_join(j, n, c.c_nationkey == n.n_nationkey, right_stats=st["nation"])
    return (
        stats_join(j, r, n.n_regionkey == r.r_regionkey, right_stats=st["region"])
        .groupBy(F.col("r_name").alias("region_name"))
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice").alias("total_revenue"))
        .orderBy("region_name")
    )


@query(
    "bucketed_orders_lineitem_join",
    oracle=f"""
    SELECT o.o_orderpriority AS orderpriority,
           COUNT(*) AS n_items,
           {dsum_sql('l.l_extendedprice')} AS total_price
    FROM orders o
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY 1
    ORDER BY 1
    """,
)
def bucketed_orders_lineitem_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exchange-free fact-to-fact join via bucketed tables (§2.5; the
    co-partitioning the reference's roadmap delegates to Postgres,
    README.md:207). Both facts are written ``bucketBy(8, orderkey)``
    once, then the join reads co-located buckets with ZERO shuffle
    Exchange (asserted in tests/test_bucketing.py) — at 100 TB this is
    the only join strategy for two unbroadcastable sides that doesn't
    re-shuffle both per query. The write is the one-time cost the
    bucketed layout amortizes across every subsequent orderkey join.

    The bucketed tables live in a dedicated database with an explicit
    tmp location, so the query works regardless of the harness CWD
    (the default warehouse dir is CWD-relative and may not be
    writable). Both the database name and its location are keyed by the
    session's applicationId AND the sf_dir: two concurrent runs on the
    same host (or two scale factors in one session) get disjoint
    catalogs and directories, so one run's DROP TABLE + filesystem
    cleanup can never remove the other's bucketed tables mid-query.

    Repeated calls in one session REUSE the layout (the point of
    bucketing: the write is paid once, every later orderkey join rides
    it shuffle-free) — so a warm timing of this query measures the
    JOIN, not the sink (r10 verdict #6; bench.py pre-builds the layout
    outside its timed loop and reports the write separately)."""
    import os
    import re
    import tempfile

    from ..operators.bucketing import bucketed_join, write_bucketed

    app_id = re.sub(r"[^A-Za-z0-9]", "_", spark.sparkContext.applicationId)
    sf_tok = re.sub(r"[^A-Za-z0-9]", "_", os.path.basename(
        os.path.normpath(sf_dir)))
    db = f"bkt_{app_id}_{sf_tok}"
    db_loc = os.path.join(
        tempfile.gettempdir(), f"pdp_bucketed_db_{app_id}_{sf_tok}")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db} LOCATION '{db_loc}'")
    if not spark.catalog.tableExists(f"{db}.bkt_lineitem"):
        write_bucketed(
            scan_table(spark, sf_dir, "orders").select(
                "o_orderkey", "o_orderpriority"
            ),
            f"{db}.bkt_orders", "o_orderkey", n_buckets=8,
            sort_cols="o_orderkey",
        )
        write_bucketed(
            scan_table(spark, sf_dir, "lineitem").select(
                F.col("l_orderkey").alias("o_orderkey"), "l_extendedprice"
            ),
            f"{db}.bkt_lineitem", "o_orderkey", n_buckets=8,
            sort_cols="o_orderkey",
        )
    return (
        bucketed_join(spark, f"{db}.bkt_orders", f"{db}.bkt_lineitem", on="o_orderkey")
        .groupBy(F.col("o_orderpriority").alias("orderpriority"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum("l_extendedprice").alias("total_price"),
        )
        .orderBy("orderpriority")
    )


@extra_query(
    "customers_with_orders_semi",
    oracle="""
    SELECT n.n_name AS nation_name, COUNT(*) AS n_customers
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE c.c_custkey IN (SELECT o_custkey FROM orders)
    GROUP BY 1
    ORDER BY 1
    """,
)
def customers_with_orders_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (IN-subquery semantics): customers having ≥1 order,
    counted per nation. Semi joins never duplicate the left side, so no
    post-join distinct is needed."""
    c = scan_table(spark, sf_dir, "customer")
    o = scan_table(spark, sf_dir, "orders")
    n = scan_table(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("nation_name")
    )


@extra_query(
    "customers_without_orders_anti",
    oracle="""
    SELECT c_mktsegment AS mktsegment, COUNT(*) AS n_customers
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY 1
    ORDER BY 1
    """,
)
def customers_without_orders_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS): customers with no orders."""
    c = scan_table(spark, sf_dir, "customer")
    o = scan_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy(F.col("c_mktsegment").alias("mktsegment"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("mktsegment")
    )


@extra_query(
    "order_count_distribution",
    oracle="""
    SELECT n_orders, COUNT(*) AS n_customers
    FROM (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
        FROM customer c
        LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY c.c_custkey
    )
    GROUP BY n_orders
    ORDER BY n_orders
    """,
)
def order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-outer join + two-level aggregation: the classic customer
    order-count histogram (zero-order customers included via the outer
    join; COUNT(col) skips the NULL produced for them)."""
    c = scan_table(spark, sf_dir, "customer")
    o = scan_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count(o.o_orderkey).alias("n_orders"))
    )
    return (
        per_cust.groupBy("n_orders")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("n_orders")
    )


@extra_query(
    "priority_with_heavy_items",
    oracle="""
    SELECT o.o_orderpriority AS orderpriority, COUNT(*) AS n_orders
    FROM orders o
    WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45
    )
    GROUP BY 1
    ORDER BY 1
    """,
)
def priority_with_heavy_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS-correlated-subquery shape (TPC-H Q4 skeleton) as a semi
    join against a pre-filtered fact — the filter runs before the join,
    shrinking the build side."""
    o = scan_table(spark, sf_dir, "orders")
    heavy = scan_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return (
        o.join(heavy, o.o_orderkey == heavy.l_orderkey, "left_semi")
        .groupBy(F.col("o_orderpriority").alias("orderpriority"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("orderpriority")
    )


@extra_query(
    "above_avg_orders",
    oracle="""
    SELECT COUNT(*) AS n_above_avg
    FROM orders
    WHERE o_totalprice > (
        SELECT CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,4))) AS DOUBLE)
                    / COUNT(o_totalprice) AS DOUBLE)
        FROM orders
    )
    """,
)
def above_avg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery: orders above the global mean price. The mean is
    computed once (exact decimal), broadcast as a literal predicate."""
    o = scan_table(spark, sf_dir, "orders")
    avg_df = o.agg(davg("o_totalprice").alias("avg_price"))
    return (
        o.join(F.broadcast(avg_df))
        .filter(F.col("o_totalprice") > F.col("avg_price"))
        .agg(F.count(F.lit(1)).alias("n_above_avg"))
    )


@extra_query(
    "top_customer_per_nation",
    oracle=f"""
    SELECT nation_name, c_custkey, total_spend
    FROM (
        SELECT n.n_name AS nation_name,
               c.c_custkey,
               {dsum_sql('o.o_totalprice')} AS total_spend,
               ROW_NUMBER() OVER (
                   PARTITION BY n.n_name
                   ORDER BY {dsum_sql('o.o_totalprice')} DESC, c.c_custkey ASC
               ) AS rk  -- rank on the exact decimal sum: tie-break deterministic
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name, c.c_custkey
    )
    WHERE rk = 1
    """,
)
def top_customer_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join → aggregate → window rank: the highest-spending customer per
    nation with a deterministic tie-break."""
    o = scan_table(spark, sf_dir, "orders")
    c = scan_table(spark, sf_dir, "customer")
    n = scan_table(spark, sf_dir, "nation")
    spend = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation_name"), "c_custkey")
        .agg(dsum("o_totalprice").alias("total_spend"))
    )
    w = Window.partitionBy("nation_name").orderBy(F.desc("total_spend"), F.asc("c_custkey"))
    return (
        spend.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("nation_name", "c_custkey", "total_spend")
    )


# ---------------------------------------------------------------------------
# Set operations / grouping sets (SURVEY §2.6 extensions)
# ---------------------------------------------------------------------------


@extra_query(
    "status_set_ops",
    oracle="""
    SELECT
      (SELECT COUNT(*) FROM (
          SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'
          INTERSECT
          SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'
      )) AS both_statuses,
      (SELECT COUNT(*) FROM (
          SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'
          EXCEPT
          SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'
      )) AS only_f
    """,
)
def status_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT set operations on customer key sets."""
    o = scan_table(spark, sf_dir, "orders")
    f_keys = o.filter(F.col("o_orderstatus") == "F").select("o_custkey").distinct()
    o_keys = o.filter(F.col("o_orderstatus") == "O").select("o_custkey").distinct()
    both = f_keys.intersect(o_keys).agg(F.count(F.lit(1)).alias("both_statuses"))
    only_f = f_keys.subtract(o_keys).agg(F.count(F.lit(1)).alias("only_f"))
    return both.crossJoin(only_f)


@extra_query(
    "events_union_fanin",
    oracle="""
    SELECT CAST(ts AS DATE) AS date_utc, COUNT(*) AS n_engagements
    FROM (
        SELECT * FROM events WHERE event_type = 'click'
        UNION ALL
        SELECT * FROM events WHERE event_type = 'purchase'
    )
    GROUP BY 1
    ORDER BY 1
    """,
)
def events_union_fanin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL fan-in (the multi-location roadmap shape,
    README.md:213 → unionByName): combine homogeneous slices then
    aggregate once. Union is a no-shuffle plan node."""
    e = scan_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click")
    purchases = e.filter(F.col("event_type") == "purchase")
    return (
        clicks.unionByName(purchases)
        .groupBy(F.to_date("ts").alias("date_utc"))
        .agg(F.count(F.lit(1)).alias("n_engagements"))
        .orderBy("date_utc")
    )


@extra_query(
    "rollup_returnflag_status",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_items,
           {dsum_sql('l_quantity')} AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
)
def rollup_returnflag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (SURVEY §2.4 extension): per (flag,status),
    per flag, and grand total in one pass."""
    return (
        scan_table(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n_items"), dsum("l_quantity").alias("sum_qty"))
        .orderBy(F.asc_nulls_first("l_returnflag"), F.asc_nulls_first("l_linestatus"))
    )


@extra_query(
    "cube_segment_status",
    oracle="""
    SELECT c.c_mktsegment AS mktsegment, o.o_orderstatus AS orderstatus,
           COUNT(*) AS n_orders
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY CUBE(c.c_mktsegment, o.o_orderstatus)
    ORDER BY mktsegment NULLS FIRST, orderstatus NULLS FIRST
    """,
)
def cube_segment_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over a join: all marginals of (segment × status)."""
    o = scan_table(spark, sf_dir, "orders")
    c = scan_table(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .cube(F.col("c_mktsegment").alias("mktsegment"), F.col("o_orderstatus").alias("orderstatus"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.asc_nulls_first("mktsegment"), F.asc_nulls_first("orderstatus"))
    )


# ---------------------------------------------------------------------------
# Analytic windows / strings / JSON (SURVEY §2.6-§2.7 extensions)
# ---------------------------------------------------------------------------


@extra_query(
    "user_running_value",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(30,4))) OVER (
               PARTITION BY user_id ORDER BY ts ASC, event_id ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_value
    FROM events
    """,
)
def user_running_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative analytic window per user (frame spec ROWS UNBOUNDED
    PRECEDING..CURRENT). Decimal accumulation keeps the running sum
    bit-identical across engines and partition orders."""
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        scan_table(spark, sf_dir, "events")
        .select(
            "event_id",
            "user_id",
            F.sum(F.col("value").cast("decimal(30,4)")).over(w).cast("double").alias("running_value"),
        )
    )


@extra_query(
    "part_brand_stats",
    oracle="""
    SELECT p_brand AS brand,
           COUNT(*) AS n_parts,
           COUNT(*) FILTER (WHERE p_name LIKE '%green%') AS n_green,
           CAST(CAST(SUM(LENGTH(p_name)) AS DOUBLE) / COUNT(*) AS DOUBLE) AS avg_name_len,
           MAX(UPPER(p_type)) AS max_type_upper
    FROM part
    GROUP BY 1
    ORDER BY 1
    """,
)
def part_brand_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function surface (SURVEY §2.7 extension): LIKE, LENGTH,
    UPPER inside a grouped agg — all JVM-side codegen, no UDFs."""
    p = scan_table(spark, sf_dir, "part")
    return (
        p.groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.count(F.when(F.col("p_name").like("%green%"), 1)).alias("n_green"),
            (F.sum(F.length("p_name")).cast("double") / F.count(F.lit(1)))
            .cast("double")
            .alias("avg_name_len"),
            F.max(F.upper("p_type")).alias("max_type_upper"),
        )
        .orderBy("brand")
    )


@query(
    "props_json_extract",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
           COUNT(*) AS n_events
    FROM events
    GROUP BY 1
    ORDER BY 1
    """,
)
def props_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction (F6 — the reference round-trips JSON payloads):
    parse the props document, bucket by key. get_json_object is JVM-side;
    for hot paths prefer from_json with an explicit schema."""
    e = scan_table(spark, sf_dir, "events")
    return (
        e.select((F.get_json_object("props", "$.k").cast("bigint") % 10).alias("k_bucket"))
        .groupBy("k_bucket")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .orderBy("k_bucket")
    )


@extra_query(
    "try_parse_timestamps",
    oracle="""
    WITH s AS (
      SELECT event_id,
             CASE WHEN event_id % 7 = 0 THEN 'not-a-time'
                  ELSE strftime(ts, '%Y-%m-%d %H:%M:%S') END AS raw
      FROM events
    )
    SELECT event_id, raw,
           try_strptime(raw, '%Y-%m-%d %H:%M:%S') AS parsed
    FROM s
    """,
)
def try_parse_timestamps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-strict timestamp parsing (F1 — SURVEY §4 hard part #2): the
    reference parses with Polars ``strict=False`` (weather_transform.py:
    32,35), where malformed inputs become NULL instead of failing the
    job. Spark parity is ``try_to_timestamp``: strings are fabricated
    from events.ts with every 7th row corrupted; those rows must parse
    to NULL, the rest round-trip exactly."""
    e = scan_table(spark, sf_dir, "events")
    raw = F.when(F.col("event_id") % 7 == 0, F.lit("not-a-time")).otherwise(
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss")
    )
    return e.select(
        "event_id",
        raw.alias("raw"),
        F.try_to_timestamp(raw, F.lit("yyyy-MM-dd HH:mm:ss")).alias("parsed"),
    )


@extra_query(
    "user_event_deltas",
    oracle="""
    SELECT event_id, user_id, ts,
           value - LAG(value) OVER w AS delta_prev,
           LEAD(event_type) OVER w AS next_type,
           CAST(SUM(CAST(value AS DECIMAL(30,4))) OVER (
               PARTITION BY user_id ORDER BY ts ASC, event_id ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_value,
           NTILE(4) OVER (PARTITION BY user_id ORDER BY value, event_id) AS value_quartile
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def user_event_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window breadth (W-surface): lag delta, lead lookahead,
    cumulative decimal running sum (frame ROWS UNBOUNDED
    PRECEDING..CURRENT), and ntile bucketing per user. One shuffle on
    user_id serves all four windows (same partitioning); deterministic
    via the event_id ordering tie-break and decimal accumulation."""
    e = scan_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wv = Window.partitionBy("user_id").orderBy("value", "event_id")
    return e.select(
        "event_id",
        "user_id",
        "ts",
        (F.col("value") - F.lag("value").over(w)).alias("delta_prev"),
        F.lead("event_type").over(w).alias("next_type"),
        F.sum(F.col("value").cast("decimal(30,4)")).over(wrun).cast("double").alias("running_value"),
        F.ntile(4).over(wv).alias("value_quartile"),
    )


@extra_query(
    "unpivot_daily_mart",
    oracle=f"""
    WITH mart AS (
      SELECT CAST(ts AS DATE) AS date_utc,
             {davg_sql('value')} AS avg_value,
             MAX(value) AS max_value,
             MIN(value) AS min_value
      FROM events GROUP BY 1
    )
    SELECT date_utc, metric, value FROM (
      SELECT date_utc, 'avg_value' AS metric, avg_value AS value FROM mart
      UNION ALL
      SELECT date_utc, 'max_value', max_value FROM mart
      UNION ALL
      SELECT date_utc, 'min_value', min_value FROM mart
    )
    ORDER BY date_utc, metric
    """,
)
def unpivot_daily_mart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide→long reshape): the daily mart's three metric columns
    melt into (date, metric, value) rows — the tidy form downstream
    chart/ML consumers want. Spark's ``unpivot`` is a zero-shuffle
    Expand over the aggregated (already tiny) mart."""
    mart = (
        scan_table(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("date_utc"))
        .agg(
            davg("value").alias("avg_value"),
            F.max("value").alias("max_value"),
            F.min("value").alias("min_value"),
        )
    )
    return mart.unpivot(
        "date_utc", ["avg_value", "max_value", "min_value"], "metric", "value"
    ).orderBy("date_utc", "metric")


@extra_query(
    "hierarchical_rollup_daily",
    oracle=f"""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS hour_utc,
             COUNT(*) AS n_events,
             {dsum_sql('value')} AS sum_value,
             MAX(value) AS max_value
      FROM events
      GROUP BY 1
    )
    SELECT CAST(hour_utc AS DATE) AS date_utc,
           CAST(SUM(n_events) AS BIGINT) AS n_events,
           {dsum_sql('sum_value')} AS sum_value,
           MAX(max_value) AS max_value
    FROM hourly
    GROUP BY 1
    ORDER BY 1
    """,
)
def hierarchical_rollup_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical (two-level) rollup: daily totals computed FROM the
    hourly pre-aggregate, not from raw events — the incremental-mart
    pattern where the second level aggregates ~24 rows/day instead of
    re-scanning the fact table. Decimal sums re-aggregate exactly
    (sum-of-sums == sum). At 100 TB the hourly layer is what you
    materialize; every coarser grain derives from it."""
    e = scan_table(spark, sf_dir, "events")
    hourly = e.groupBy(F.date_trunc("hour", "ts").alias("hour_utc")).agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum("value").alias("sum_value"),
        F.max("value").alias("max_value"),
    )
    return (
        hourly.groupBy(F.to_date("hour_utc").alias("date_utc"))
        .agg(
            F.sum("n_events").cast("bigint").alias("n_events"),
            dsum("sum_value").alias("sum_value"),
            F.max("max_value").alias("max_value"),
        )
        .orderBy("date_utc")
    )


@extra_query(
    "event_value_ranks",
    oracle="""
    SELECT event_id, event_type, value,
           RANK()         OVER wv AS rnk,
           DENSE_RANK()   OVER wv AS drnk,
           PERCENT_RANK() OVER wv AS prank,
           CUME_DIST()    OVER wv AS cdist,
           NTILE(4)       OVER wt AS quartile
    FROM events
    WINDOW wv AS (PARTITION BY event_type ORDER BY value ASC),
           wt AS (PARTITION BY event_type ORDER BY value ASC, event_id ASC)
    """,
)
def event_value_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-function breadth (§2.6): rank / dense_rank /
    percent_rank / cume_dist over a tie-bearing order (all four are
    tie-stable by definition — equal values share rank, and the
    percent/cume ratios are single IEEE divisions of identical integer
    counts) plus ntile(4) over the tie-broken total order (ntile is
    row-positional, so determinism REQUIRES the unique tiebreak — the
    same total-order contract as running_total). One shuffle on the
    partition key; rank evaluation is a sorted single pass per
    partition."""
    ev = scan_table(spark, sf_dir, "events")
    wv = Window.partitionBy("event_type").orderBy(F.asc("value"))
    wt = Window.partitionBy("event_type").orderBy(F.asc("value"), F.asc("event_id"))
    return ev.select(
        "event_id",
        "event_type",
        "value",
        F.rank().over(wv).alias("rnk"),
        F.dense_rank().over(wv).alias("drnk"),
        F.percent_rank().over(wv).alias("prank"),
        F.cume_dist().over(wv).alias("cdist"),
        F.ntile(4).over(wt).alias("quartile"),
    ).orderBy("event_id")


@extra_query(
    "customer_order_full_outer_recon",
    oracle=f"""
    WITH oagg AS (
      SELECT o_custkey, COUNT(*) AS n_orders,
             {dsum_sql('o_totalprice')} AS spend
      FROM orders GROUP BY o_custkey
    )
    SELECT CASE WHEN c.c_custkey IS NULL THEN 'order_only'
                WHEN oagg.o_custkey IS NULL THEN 'customer_only'
                ELSE 'both' END AS presence,
           COUNT(*) AS n_keys,
           -- driver-contract cast: SUM(BIGINT) is HUGEINT, float64
           -- through the driver's .df() fetch (r16 rotation gate)
           CAST(COALESCE(SUM(oagg.n_orders), 0) AS BIGINT) AS n_orders,
           CAST(COALESCE(SUM(CAST(oagg.spend AS DECIMAL(30,4))), 0) AS DOUBLE)
             AS total_spend
    FROM customer c
    FULL OUTER JOIN oagg ON c.c_custkey = oagg.o_custkey
    GROUP BY 1
    ORDER BY presence
    """,
)
def customer_order_full_outer_recon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer reconciliation (SURVEY §2.5 — the last join shape):
    customers vs per-customer order rollup, keyed classification of
    which side each key appears on. The order side pre-aggregates to one
    row per key BEFORE the full-outer join, so the join carries |keys|
    rows, not |orders| — at 100 TB the rollup absorbs the fact-table
    volume and the outer join is key-to-key. Spark plans this as a
    single sort-merge full-outer on the custkey shuffle."""
    cust = scan_table(spark, sf_dir, "customer").select("c_custkey")
    oagg = (
        scan_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("spend"),
        )
    )
    full = cust.join(oagg, cust.c_custkey == oagg.o_custkey, "full_outer")
    presence = (
        F.when(F.col("c_custkey").isNull(), F.lit("order_only"))
        .when(F.col("o_custkey").isNull(), F.lit("customer_only"))
        .otherwise(F.lit("both"))
    )
    return (
        full.groupBy(presence.alias("presence"))
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.coalesce(F.sum("n_orders"), F.lit(0)).alias("n_orders"),
            F.coalesce(F.sum(F.col("spend").cast("decimal(30,4)")), F.lit(0).cast("decimal(30,4)"))
            .cast("double")
            .alias("total_spend"),
        )
        .orderBy("presence")
    )


def _dim_stats(spark, sf_dir: str, name: str):
    """Footer stats for a star-schema dim — feeds the mini-CBO's
    broadcast decision (operators/cbo.py), replacing hand F.broadcast
    hints in the TPC-H shapes. Cached per path (mtime-keyed)."""
    from ..operators.cbo import stats_for_parquet

    return stats_for_parquet(spark, f"{sf_dir}/{name}.parquet")


@query(
    "shipping_priority_top10",
    oracle=f"""
    SELECT l.l_orderkey,
           {dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           o.o_orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
      AND l.l_shipdate > TIMESTAMP '1998-01-01'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, o.o_orderdate ASC, l.l_orderkey ASC
    LIMIT 10
    """,
)
def shipping_priority_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (shipping priority): segment-filtered customers x
    open orders x late-shipped lineitems, revenue per order, top-10.
    The segment filter prunes customer BEFORE its join (predicate
    pushdown into the scan); customer joins broadcast into orders; the
    orders->lineitem join shuffles on orderkey — at 100 TB both fact
    tables arrive pre-bucketed on orderkey (operators/bucketing) and
    that join goes exchange-free. Top-10 compiles to
    TakeOrderedAndProject: no global sort materializes."""
    c = scan_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = scan_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1998-01-01"
    )
    l = scan_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > "1998-01-01"
    )
    return (
        stats_join(
            l.join(o, l.l_orderkey == o.o_orderkey),
            c, o.o_custkey == c.c_custkey,
            right_stats=_dim_stats(spark, sf_dir, "customer"),
        )
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), F.asc("o_orderdate"), F.asc("l_orderkey"))
        .limit(10)
    )


@extra_query(
    "returned_item_report_top20",
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           {dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           n.n_name
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey ASC
    LIMIT 20
    """,
)
def returned_item_report_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape (returned-item reporting): which customers
    returned the most revenue. The returnflag filter pushes into the
    lineitem scan (the dominant table); nation (25 rows) and customer
    broadcast; the only big shuffle is lineitem->orders on orderkey,
    then the rollup on custkey. Top-20 via TakeOrderedAndProject."""
    c = scan_table(spark, sf_dir, "customer")
    o = scan_table(spark, sf_dir, "orders")
    l = scan_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = scan_table(spark, sf_dir, "nation")
    return (
        stats_join(
            stats_join(
                l.join(o, l.l_orderkey == o.o_orderkey),
                c, o.o_custkey == c.c_custkey,
                right_stats=_dim_stats(spark, sf_dir, "customer"),
            ),
            n, c.c_nationkey == n.n_nationkey,
            right_stats=_dim_stats(spark, sf_dir, "nation"),
        )
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@extra_query(
    "promo_revenue_share_1997",
    oracle=f"""
    SELECT {dsum_sql("CASE WHEN p.p_type = 'PROMO' "
                     "THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END")}
             AS promo_revenue,
           {dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS total_revenue,
           (CAST({dsum_sql("CASE WHEN p.p_type = 'PROMO' "
                           "THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END")}
                 AS DOUBLE)
            / CAST({dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS DOUBLE))
             AS promo_share
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    """,
)
def promo_revenue_share_1997(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape (promotion effect): share of 1997 revenue from
    PROMO-type parts. The shipdate window pushes into the lineitem scan;
    part broadcasts (dim); the conditional revenue and the total come
    out of ONE aggregation pass (no second scan for the denominator).
    Decimal sums keep both numerators exact; the share is a single IEEE
    division of identical operands, so it is bit-equal cross-engine."""
    l = (
        scan_table(spark, sf_dir, "lineitem")
        .filter((F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01"))
    )
    p = scan_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))
    agg = (
        stats_join(l, p, l.l_partkey == p.p_partkey,
                   right_stats=_dim_stats(spark, sf_dir, "part"))
        .agg(dsum(promo).alias("promo_revenue"), dsum(rev).alias("total_revenue"))
    )
    return agg.select(
        "promo_revenue",
        "total_revenue",
        (F.col("promo_revenue").cast("double") / F.col("total_revenue").cast("double")).alias(
            "promo_share"
        ),
    )


@extra_query(
    "local_supplier_volume",
    oracle=f"""
    SELECT n.n_name,
           {dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN customer c ON o.o_custkey = c.c_custkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n.n_name ASC
    """,
)
def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape (local supplier volume): revenue where the
    supplier and the ordering customer share a nation — the one TPC-H
    join topology with an equality constraint BETWEEN two dimensions,
    not just star edges. Orders' date window pushes into its scan;
    supplier, customer and nation broadcast; the only big shuffle is
    lineitem->orders on orderkey. The c_nationkey = s_nationkey
    constraint rides the customer broadcast join as a residual
    condition — no extra shuffle."""
    l = scan_table(spark, sf_dir, "lineitem")
    o = scan_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    s = scan_table(spark, sf_dir, "supplier")
    c = scan_table(spark, sf_dir, "customer")
    n = scan_table(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        stats_join(
            stats_join(
                stats_join(
                    l.join(o, l.l_orderkey == o.o_orderkey),
                    s, l.l_suppkey == s.s_suppkey,
                    right_stats=_dim_stats(spark, sf_dir, "supplier"),
                ),
                c, (o.o_custkey == c.c_custkey) & (c.c_nationkey == s.s_nationkey),
                right_stats=_dim_stats(spark, sf_dir, "customer"),
            ),
            n, s.s_nationkey == n.n_nationkey,
            right_stats=_dim_stats(spark, sf_dir, "nation"),
        )
        .groupBy("n_name")
        .agg(dsum(rev).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


@extra_query(
    "late_shipment_priority_counts",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS n_orders
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
      )
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
)
def late_shipment_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order-priority check): orders in a window having
    AT LEAST ONE lineitem shipped >30 days after the order date, counted
    by priority — the EXISTS topology with a NON-EQUI residual. As a
    left-semi join the probe emits each order at most once (no distinct
    needed, no fact-row multiplication); the equi part (orderkey) drives
    the shuffle and the date comparison rides as a residual condition —
    no cartesian anywhere. The date window pushes into the orders
    scan."""
    o = scan_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    l = scan_table(spark, sf_dir, "lineitem")
    return (
        o.join(
            l,
            (o.o_orderkey == l.l_orderkey)
            & (l.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderpriority")
    )
