"""Temporal declared queries: as-of join and range/band join (SURVEY §2.5).

The reference's FX vertical names a rate-lookup semantic ("latest rate at
or before t" — the stg_fx_rates / fx_top10_daily models,
airflow/dags/weather_hourly_pipeline.py:119) without implementing it.
Here it is as first-class operators over the events fixture, oracled
against DuckDB's native ``ASOF JOIN``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import dsum, dsum_sql
from ..operators.skew import salted_join
from ..operators.temporal import asof_join, band_join
from ..sources.parquet import scan_table
from . import extra_query, query


def _purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        scan_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts", "value")
    )


def _clicks_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # One row per (user_id, ts): as-of semantics are ambiguous under
    # exact-timestamp ties, so the right side is pre-aggregated — the
    # same contract the oracle applies.
    return (
        scan_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("click_value"))
    )


@extra_query(
    "asof_purchase_last_click",
    oracle="""
    WITH purchases AS (
      SELECT event_id, user_id, ts, value
      FROM events WHERE event_type = 'purchase'
    ), clicks AS (
      SELECT user_id, ts, MAX(value) AS click_value
      FROM events WHERE event_type = 'click'
      GROUP BY user_id, ts
    )
    SELECT p.event_id, p.user_id, p.ts, p.value,
           c.click_value AS asof_click_value
    FROM purchases p
    ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def asof_purchase_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (custom operator — Spark has no built-in): each purchase
    picks up the most recent click value at or before it, per user.
    Union+window formulation: one shuffle on user_id, linear in rows —
    no pair explosion (see operators/temporal.py scale notes). Oracle is
    DuckDB's native ASOF LEFT JOIN."""
    return asof_join(
        _purchases(spark, sf_dir),
        _clicks_dedup(spark, sf_dir),
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        value_cols=("click_value",),
    )


@extra_query(
    "user_sessions_gap30m",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), numbered AS (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY ts
               ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marked
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS n_events
    FROM numbered
    GROUP BY user_id, session_id
    """,
)
def user_sessions_gap30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (the batch face of streaming
    ``session_window`` — SURVEY M5): sessions close after 30 min of
    silence; end = last event + gap. Spark uses the built-in
    ``session_window`` (one shuffle on user_id, state merged per key);
    the oracle derives identical sessions from lag + running sum. At
    100 TB the session merge stays linear per key — no self-join."""
    return (
        scan_table(spark, sf_dir, "events")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


@extra_query(
    "events_value_band_rollup",
    oracle=f"""
    WITH bands(band, lo, hi) AS (
      VALUES ('low', 0.0, 50.0), ('mid', 50.0, 200.0), ('high', 200.0, 1e9)
    )
    SELECT b.band,
           COUNT(*) AS n_events,
           {dsum_sql('e.value')} AS total_value
    FROM events e
    JOIN bands b ON e.value >= b.lo AND e.value < b.hi
    GROUP BY b.band
    ORDER BY b.band
    """,
)
def events_value_band_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range/band join: classify every event's value into a broadcast
    bands dimension via a non-equi [lo, hi) predicate, then roll up.
    The 3-row dim broadcasts, so the fact side never shuffles for the
    join — the only strategy that survives a 100 TB fact table; the
    rollup then shuffles 3 keys."""
    events = scan_table(spark, sf_dir, "events")
    bands = spark.createDataFrame(
        [("low", 0.0, 50.0), ("mid", 50.0, 200.0), ("high", 200.0, 1e9)],
        "band string, lo double, hi double",
    )
    return (
        band_join(events, bands, "value", how="inner")
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("total_value"),
        )
        .orderBy("band")
    )


@query(
    "salted_revenue_by_segment",
    oracle=f"""
    SELECT c.c_mktsegment,
           COUNT(*) AS n_orders,
           {dsum_sql('o.o_totalprice')} AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    ORDER BY c.c_mktsegment
    """,
)
def salted_revenue_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigated join (SCALE.md): orders x customer through an
    8-way salted equi-join — each hot customer key spreads over 8 shuffle
    partitions — then revenue per market segment. The salt is internal
    routing only, so the result (and oracle) is the plain join's."""
    orders = scan_table(spark, sf_dir, "orders")
    cust = scan_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    # Key names differ per side; align the right side to the left key.
    joined = salted_join(
        orders.select("o_custkey", "o_totalprice"),
        cust.withColumnRenamed("c_custkey", "o_custkey"),
        on="o_custkey",
        n_salts=8,
    )
    return (
        joined.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("revenue"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "rolling_7d_user_value",
    oracle="""
    SELECT event_id, user_id, ts,
           CAST(SUM(CAST(value AS DECIMAL(30,4))) OVER (
             PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS rolling_7d_sum,
           COUNT(value) OVER (
             PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW
           ) AS rolling_7d_n
    FROM events
    """,
)
def rolling_7d_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval RANGE-frame rolling aggregate (SURVEY §2.6 ext): per
    user, the trailing-7-day sum/count of ``value`` at every event.
    Spark's RANGE frame needs a numeric order key, so the frame runs
    over ``unix_micros(ts)`` with a ±micros bound — semantically
    identical to the oracle's ``RANGE INTERVAL 7 DAY PRECEDING`` (both
    bounds inclusive, ties all included). One shuffle on user_id; the
    frame is evaluated with a sliding two-pointer pass per partition —
    linear, no per-row rescan. Sum accumulates in DECIMAL(30,4) (the
    dsum contract) so the value is order-independent and bit-exact
    cross-engine."""
    seven_days_us = 7 * 86400 * 1_000_000
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-seven_days_us, 0)
    )
    return scan_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        F.sum(F.col("value").cast("decimal(30,4)")).over(w).cast("double").alias("rolling_7d_sum"),
        F.count("value").over(w).alias("rolling_7d_n"),
    )


@extra_query(
    "daily_gapfill_ffill",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d, event_type,
             {dsum_sql('value')} AS day_value
      FROM events GROUP BY 1, 2
    ),
    bounds AS (
      SELECT MIN(CAST(ts AS DATE)) AS d0, MAX(CAST(ts AS DATE)) AS d1 FROM events
    ),
    spine AS (
      SELECT CAST(UNNEST(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS d
      FROM bounds
    ),
    types AS (SELECT DISTINCT event_type FROM events)
    SELECT s.d, t.event_type,
           LAST_VALUE(daily.day_value IGNORE NULLS) OVER (
             PARTITION BY t.event_type ORDER BY s.d
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS day_value_ffill,
           daily.day_value IS NOT NULL AS observed
    FROM spine s
    CROSS JOIN types t
    LEFT JOIN daily ON daily.d = s.d AND daily.event_type = t.event_type
    """,
)
def daily_gapfill_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-spine gap fill + forward fill (SURVEY §2.6 ext — the
    time-series resample primitive): a complete (day x event_type) grid
    from ``sequence(min_day, max_day)``, left-joined to the observed
    daily totals, missing days forward-filled with
    ``last(value, ignorenulls=True)``. The spine derives from two
    broadcast-size aggregates (global min/max + distinct types), so the
    only real shuffle is the daily rollup itself; at 100 TB the grid is
    |days| x |types| rows — trivially small next to the fact table."""
    events = scan_table(spark, sf_dir, "events")
    daily = events.groupBy(
        F.to_date("ts").alias("d"), "event_type"
    ).agg(dsum("value").alias("day_value"))
    bounds = events.agg(
        F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
    )
    spine = bounds.select(F.explode(F.sequence("d0", "d1")).alias("d"))
    types = events.select("event_type").distinct()
    w = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.crossJoin(F.broadcast(types))
        .join(daily, ["d", "event_type"], "left")
        .select(
            "d",
            "event_type",
            F.last("day_value", ignorenulls=True).over(w).alias("day_value_ffill"),
            F.col("day_value").isNotNull().alias("observed"),
        )
    )


@query(
    "scd2_user_type_history",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, event_id, event_type,
             LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      FROM events
    ),
    changes AS (
      SELECT user_id, ts, event_id, event_type FROM ordered
      WHERE prev_type IS NULL OR event_type <> prev_type
    )
    SELECT user_id, event_type,
           ts AS valid_from,
           LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
           LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
             AS is_current
    FROM changes
    """,
)
def scd2_user_type_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 history built from a change log (SURVEY §2.6 ext /
    dbt-snapshot parity): collapse each user's event stream into
    contiguous [valid_from, valid_to) intervals of its ``event_type``
    attribute — change detection via lag, interval close via lead, open
    interval = current row. Two windows over one user_id shuffle,
    linear per key; ties broken by event_id so the history is
    deterministic. The batch-merge face of the same semantic lives in
    operators/scd.py (``scd2_merge``)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = scan_table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    changes = ordered.filter(
        F.col("prev_type").isNull() | (F.col("event_type") != F.col("prev_type"))
    )
    return changes.select(
        "user_id",
        "event_type",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.lead("ts").over(w).isNull().alias("is_current"),
    )


@extra_query(
    "purchase_funnel_counts",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t_view
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS t_click
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t_view
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS t_purchase
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
      GROUP BY e.user_id
    )
    SELECT
      (SELECT COUNT(*) FROM v) AS n_view,
      (SELECT COUNT(*) FROM c) AS n_view_click,
      (SELECT COUNT(*) FROM p) AS n_view_click_purchase
    """,
)
def purchase_funnel_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis (SURVEY §2.6 ext — the product-analytics
    staple): users reaching view → click-after-view →
    purchase-after-that-click. Each stage is a per-user MIN over the
    previous stage's anchor — three key-partitioned aggregations riding
    the SAME user_id shuffle (Spark reuses the partitioning across the
    chained joins), no self-join explosion, no window over the full
    event stream. The stage tables shrink monotonically, so each join
    is smaller than the last; final counts are three scalar aggregates
    combined into one row."""
    events = scan_table(spark, sf_dir, "events")
    v = (
        events.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        events.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        events.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        v.agg(F.count(F.lit(1)).alias("n_view"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_view_click")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_view_click_purchase")))
    )


@extra_query(
    "weekly_cohort_retention",
    oracle="""
    WITH firsts AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day FROM events
      GROUP BY user_id
    ),
    cohorts AS (
      SELECT user_id,
             first_day - CAST(ISODOW(first_day) - 1 AS INTEGER) AS cohort_week
      FROM firsts
    ),
    activity AS (
      SELECT DISTINCT e.user_id,
             CAST(e.ts AS DATE)
               - CAST(ISODOW(CAST(e.ts AS DATE)) - 1 AS INTEGER) AS active_week
      FROM events e
    )
    SELECT c.cohort_week,
           CAST((a.active_week - c.cohort_week) / 7 AS BIGINT) AS week_offset,
           COUNT(*) AS n_active_users
    FROM cohorts c JOIN activity a ON c.user_id = a.user_id
    GROUP BY c.cohort_week, week_offset
    ORDER BY c.cohort_week, week_offset
    """,
)
def weekly_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix (SURVEY §2.6 ext): users grouped by
    first-activity week (Monday-anchored), counted in every later week
    they were active. Two user-keyed aggregations share one shuffle;
    the cohort table joins the distinct-activity table on user_id (both
    one-row-per-user-per-week — tiny next to the event stream). Week
    anchoring subtracts days-since-Monday via each engine's own
    day-of-week convention (Spark DAYOFWEEK is 1=Sunday, DuckDB ISODOW
    is 1=Monday — the expressions differ, the anchored date is
    identical)."""
    events = scan_table(spark, sf_dir, "events")
    day = F.to_date("ts")
    week_of = lambda d: F.date_sub(d, (F.dayofweek(d) + 5) % 7)  # noqa: E731
    cohorts = (
        events.groupBy("user_id")
        .agg(F.min(day).alias("first_day"))
        .select("user_id", week_of(F.col("first_day")).alias("cohort_week"))
    )
    activity = events.select(
        "user_id", week_of(day).alias("active_week")
    ).distinct()
    return (
        cohorts.join(activity, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff("active_week", "cohort_week") / 7).cast("bigint").alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_active_users"))
        .orderBy("cohort_week", "week_offset")
    )
