"""Statistical-aggregate declared queries (SURVEY §2.4 extensions).

The reference's aggregate surface stops at avg/min/max/count
(dbt/models/marts/weather_daily.sql:4-11); a production mart layer also
needs dispersion (stddev/variance), correlation, quantiles, multi-level
rollups (GROUPING SETS) and pivots. All are Spark built-ins; the work
here is *deterministic formulations* so every value hash-matches the
DuckDB oracle:

- Moments come from exact decimal sums (n, Σx, Σx²) combined by one
  fixed IEEE expression — the built-in ``stddev``/``corr`` accumulate
  doubles in partition order and are nondeterministic in the last ulp.
- ``percentile`` (Spark) and ``quantile_cont`` (DuckDB) use the same
  linear-interpolation definition — validated bit-identical.

Scale: each query is one shuffle on its grouping key with map-side
partial aggregation; GROUPING SETS expands to one pass per set over the
same shuffle (Spark's Expand operator), not one scan per set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import dsum, dsum_sql, ensure_min_parallelism
from ..sources.parquet import scan_table
from . import extra_query, query


def _var_samp(n: Column, s1: Column, s2: Column) -> Column:
    # (Σx² − (Σx)²/n) / (n−1), every operand an exact-sum double ⇒ the
    # expression is one deterministic IEEE evaluation in both engines.
    return (s2 - s1 * s1 / n) / (n - F.lit(1))


def _var_samp_sql(n: str, s1: str, s2: str) -> str:
    return f"({s2} - {s1} * {s1} / {n}) / ({n} - 1)"


@extra_query(
    "stats_value_moments",
    oracle=f"""
    WITH s AS (
      SELECT event_type,
             CAST(COUNT(value) AS DOUBLE) AS n,
             {dsum_sql('value')} AS s1,
             {dsum_sql('value * value')} AS s2
      FROM events
      GROUP BY event_type
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n_events,
           s1 / n AS mean_value,
           {_var_samp_sql('n', 's1', 's2')} AS var_value,
           sqrt({_var_samp_sql('n', 's1', 's2')}) AS stddev_value
    FROM s
    ORDER BY event_type
    """,
)
def stats_value_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean / sample variance / stddev per event type from exact decimal
    power sums — deterministic where the built-in ``stddev_samp`` is
    partition-order-dependent. One shuffle, three sums."""
    e = scan_table(spark, sf_dir, "events")
    s = e.groupBy("event_type").agg(
        F.count("value").cast("double").alias("n"),
        dsum("value").alias("s1"),
        dsum(F.col("value") * F.col("value")).alias("s2"),
    )
    var = _var_samp(F.col("n"), F.col("s1"), F.col("s2"))
    return s.select(
        "event_type",
        F.col("n").cast("bigint").alias("n_events"),
        (F.col("s1") / F.col("n")).alias("mean_value"),
        var.alias("var_value"),
        F.sqrt(var).alias("stddev_value"),
    ).orderBy("event_type")


@query(
    "stats_price_qty_corr",
    oracle=f"""
    WITH s AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS DOUBLE) AS n,
             {dsum_sql('l_quantity')} AS sx,
             {dsum_sql('l_extendedprice')} AS sy,
             {dsum_sql('l_quantity * l_extendedprice')} AS sxy,
             {dsum_sql('l_quantity * l_quantity')} AS sxx,
             {dsum_sql('l_extendedprice * l_extendedprice')} AS syy
      FROM lineitem
      GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           (sxy - sx * sy / n)
             / (sqrt(sxx - sx * sx / n) * sqrt(syy - sy * sy / n)) AS corr_qty_price
    FROM s
    ORDER BY l_returnflag
    """,
)
def stats_price_qty_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation of quantity vs extended price per return flag,
    from exact cross/power sums (the built-in ``corr`` is partition-order
    nondeterministic). Single shuffle; five sums.

    The scan widens to cluster parallelism first (r16, guide §2.5
    input-skew): the five decimal(30,4) partial sums per row are the
    heavy map stage and the one-split fixture scan would serialize them
    (measured 2.2 s → 0.97 s warm at sf0.1); no-op on a wide scan."""
    li = ensure_min_parallelism(scan_table(spark, sf_dir, "lineitem"))
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        dsum("l_quantity").alias("sx"),
        dsum("l_extendedprice").alias("sy"),
        dsum(F.col("l_quantity") * F.col("l_extendedprice")).alias("sxy"),
        dsum(F.col("l_quantity") * F.col("l_quantity")).alias("sxx"),
        dsum(F.col("l_extendedprice") * F.col("l_extendedprice")).alias("syy"),
    )
    corr = (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n")) / (
        F.sqrt(F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"))
        * F.sqrt(F.col("syy") - F.col("sy") * F.col("sy") / F.col("n"))
    )
    return s.select("l_returnflag", corr.alias("corr_qty_price")).orderBy("l_returnflag")


@extra_query(
    "stats_quantity_quantiles",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.5) AS median_qty,
           quantile_cont(l_extendedprice, 0.25) AS p25_price,
           quantile_cont(l_extendedprice, 0.75) AS p75_price
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def stats_quantity_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated quantiles per group — Spark ``percentile`` and
    DuckDB ``quantile_cont`` share the linear-interpolation definition
    (validated bit-identical). The in-memory aggregate buffers each
    group's value counts, which is the right tool at this group
    cardinality; when one group's distinct values outgrow an executor,
    ``operators.pipeline.exact_quantiles_by_rank`` computes the SAME
    bit-identical result by rank over the two-phase prefix sum with
    bounded memory (the shape ``approx_price_percentiles`` runs) — no
    need to drop to ``approx_percentile``."""
    li = scan_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_quantity, 0.5)").alias("median_qty"),
            # One buffer for both price percentiles: the array form
            # sorts the column once per group instead of twice.
            F.expr("percentile(l_extendedprice, array(0.25, 0.75))").alias("_p"),
        )
        .select(
            "l_returnflag",
            "median_qty",
            F.col("_p")[0].alias("p25_price"),
            F.col("_p")[1].alias("p75_price"),
        )
        .orderBy("l_returnflag")
    )


@extra_query(
    "grouping_sets_events",
    oracle=f"""
    SELECT COALESCE(event_type, 'ALL') AS event_type,
           COALESCE(CAST(CAST(ts AS DATE) AS VARCHAR), 'ALL') AS date_utc,
           COUNT(*) AS n_events,
           {dsum_sql('value')} AS total_value
    FROM events
    GROUP BY GROUPING SETS ((event_type), (CAST(ts AS DATE)), ())
    ORDER BY event_type, date_utc
    """,
)
def grouping_sets_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS: per-type, per-day, and grand totals in ONE pass —
    Spark's Expand operator replicates rows per set over a single
    shuffle instead of three scans. NULL group labels are coalesced to
    'ALL' so the three levels are distinguishable and hash-stable."""
    scan_table(spark, sf_dir, "events").createOrReplaceTempView("events_gs")
    return spark.sql(
        f"""
        SELECT COALESCE(event_type, 'ALL') AS event_type,
               COALESCE(CAST(CAST(ts AS DATE) AS STRING), 'ALL') AS date_utc,
               COUNT(*) AS n_events,
               {{dsum}} AS total_value
        FROM events_gs
        GROUP BY GROUPING SETS ((event_type), (CAST(ts AS DATE)), ())
        ORDER BY event_type, date_utc
        """.replace("{dsum}", "CAST(SUM(CAST(value AS DECIMAL(30,4))) AS DOUBLE)")
    )


@extra_query(
    "returnflag_status_pivot",
    oracle=f"""
    SELECT l_linestatus,
           {dsum_sql("CASE WHEN l_returnflag = 'A' THEN l_quantity END")} AS qty_A,
           {dsum_sql("CASE WHEN l_returnflag = 'N' THEN l_quantity END")} AS qty_N,
           {dsum_sql("CASE WHEN l_returnflag = 'R' THEN l_quantity END")} AS qty_R
    FROM lineitem
    GROUP BY l_linestatus
    ORDER BY l_linestatus
    """,
)
def returnflag_status_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: return-flag columns per line status. Explicit pivot values
    keep it one pass (no extra distinct-values job) — mandatory at scale
    where an implicit pivot first scans for the value set."""
    li = scan_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(dsum("l_quantity"))
        .select(
            "l_linestatus",
            F.col("A").alias("qty_A"),
            F.col("N").alias("qty_N"),
            F.col("R").alias("qty_R"),
        )
        .orderBy("l_linestatus")
    )


#: rsd configured for the HLL++ sketch; its published standard error is
#: 1.04/sqrt(m) ≈ rsd, and the contract bound below allows 3×rsd.
HLL_RSD = 0.02


@extra_query(
    "approx_distinct_users_daily",
    oracle="""
    SELECT CAST(ts AS DATE) AS date_utc,
           COUNT(DISTINCT user_id) AS exact_users,
           COUNT(*) AS n_events,
           TRUE AS within_bound
    FROM events
    GROUP BY CAST(ts AS DATE)
    ORDER BY date_utc
    """,
)
def approx_distinct_users_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ cardinality in ORACLE-CHECKABLE contract form: per
    day, the exact distinct count (DuckDB-computable, hash-matched) plus
    ``within_bound`` — Spark's ``approx_count_distinct`` estimate landing
    within 3×rsd of the exact value, the published HLL++ standard-error
    band. The sketch is genuinely evaluated (the boolean is computed from
    it, not a literal), so the driver's hash check now covers the sketch's
    accuracy contract, not just the exact arm.

    The raw single-pass sketch (the actual 100 TB shape: fixed-size
    mergeable state, no exact distinct) lives beside this as
    ``approx_distinct_users_daily_raw``; the exact arm here exists only
    to make the contract deterministic.

    Shape note: a mixed distinct/non-distinct aggregate would plan via
    Expand (3× the shuffle rows); instead the exact arm runs as
    dedup-then-count over (day, user) pairs — HLL is duplicate-
    insensitive, so sketching the deduped pairs yields the identical
    estimate, and the second shuffle moves pre-aggregated pairs.
    Measured 2.3× faster at sf0.1, bit-identical output."""
    e = scan_table(spark, sf_dir, "events")
    pairs = e.groupBy(
        F.to_date("ts").alias("date_utc"), "user_id"
    ).agg(F.count(F.lit(1)).alias("_c"))
    agg = pairs.groupBy("date_utc").agg(
        F.count(F.lit(1)).alias("exact_users"),
        F.approx_count_distinct("user_id", rsd=HLL_RSD).alias("_approx"),
        F.sum("_c").alias("n_events"),
    )
    rel_err = F.abs(F.col("_approx") - F.col("exact_users")) / F.col(
        "exact_users"
    )
    return agg.select(
        "date_utc",
        "exact_users",
        "n_events",
        (rel_err <= 3 * HLL_RSD).alias("within_bound"),
    ).orderBy("date_utc")


@extra_query("approx_distinct_users_daily_raw")  # rows-only: sketch values are engine-specific
def approx_distinct_users_daily_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The raw HLL++ sketch — the true 100 TB path for cardinality:
    fixed-size sketch per group mergeable across partitions, vs an exact
    distinct whose shuffle carries every (day, user) pair. Engine-
    specific values, so no SQL oracle; the error is hard-bounded in
    tests/test_stats.py::test_hll_error_within_published_bound_vs_duckdb
    and the declared ``approx_distinct_users_daily`` folds the same bound
    into an oracle-checkable contract."""
    e = scan_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.to_date("ts").alias("date_utc"))
        .agg(
            F.approx_count_distinct("user_id", rsd=HLL_RSD).alias("approx_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("date_utc")
    )


#: accuracy configured for approx_percentile; its contract is a rank
#: error of at most n/accuracy.
APPROX_PCT_ACCURACY = 10000
_APPROX_PCT_QS = (0.5, 0.95, 0.99)


@extra_query(
    "approx_price_percentiles",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_extendedprice, 0.50) AS p50_exact,
           quantile_cont(l_extendedprice, 0.95) AS p95_exact,
           quantile_cont(l_extendedprice, 0.99) AS p99_exact,
           TRUE AS within_bound
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def approx_price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile in ORACLE-CHECKABLE contract form: per return
    flag, the exact interpolated p50/p95/p99 (Spark ``percentile`` ==
    DuckDB ``quantile_cont``, bit-identical) plus ``within_bound`` —
    each sketch value must (a) be a real data value and (b) have an
    exact rank window intersecting the contract's ±n/accuracy rank band
    (±1 for the discrete boundary). The sketch is genuinely evaluated:
    the boolean derives from a second rank-counting pass over the data
    against the sketch's outputs, so the driver's hash check covers the
    sketch's published contract.

    Fusion note (r11 verdict #5, reshaped r13): the exact-rank arm and
    the sketch-verification ranks SHARE one ``ranked_value_counts``
    frame (now a single range exchange + in-stage count/cumsum,
    localCheckpoint-materialized). r12 fused everything into one wide
    aggregation over that 594k-row frame; profiling showed the 27
    when-expressions over every distinct value were the cost, so r13
    splits by row volume instead: (a) the sketch rank sums
    (lo/hi/present — full-population counts) run over the RAW fact
    rows in the same codegen'd pass that already counts the group
    (identical values: a count of raw rows IS the _c-weighted sum),
    and (b) the floor/ceil order-statistic picks FILTER the ranked
    frame to the handful of rows whose rank windows can match before
    aggregating — tens of rows instead of 594k. The projected fact
    scan is localCheckpoint'ed once and feeds the sampler, the ranked
    build, the sketch, and the rank-sum pass from memory.

    Scale note (r7): the exact arm is computed by RANK on the two-phase
    distributed prefix-sum infrastructure
    (``operators.pipeline.ranked_value_counts``) — bounded memory
    per task at any group size, bit-identical to the in-memory
    ``percentile()`` aggregate it replaced (which buffers a whole
    group's value counts in one executor). The contract no longer has
    to drop to the raw sketch at extreme scale."""
    from ..operators.pipeline import ranked_value_counts

    # One fact scan, four consumers (range sampler, ranked build, the
    # sketch, the rank-sum pass): localCheckpoint the 2-column
    # projection lazily — materialized by the sampler's full pass,
    # reused from memory by the other three, and reclaimed by the
    # bench's between-runs checkpoint cleanup (a plain persist would
    # leak until the driver's periodic GC).
    #
    # Durability trade-off (r13 verdict note): local checkpoints are
    # NON-replicated — on a multi-executor cluster an executor loss
    # mid-query fails the job instead of recomputing (checkpointed
    # lineage is truncated). That is the right trade for this query
    # shape: the frame is a cheap 2-column projection of one scan, so a
    # retry of the whole query costs about what one recompute would,
    # and the truncation is what lets the bench reclaim the blocks
    # deterministically. A long-lived pipeline sharing a scan across
    # MANY downstream jobs should prefer persist(MEMORY_AND_DISK) +
    # explicit unpersist instead.
    li = (
        scan_table(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_extendedprice")
        .localCheckpoint(eager=False)
    )
    qs = ", ".join(str(q) for q in _APPROX_PCT_QS)
    agg = li.groupBy("l_returnflag").agg(
        F.expr(
            f"approx_percentile(l_extendedprice, array({qs}), "
            f"{APPROX_PCT_ACCURACY})"
        ).alias("_ap"),
        F.count(F.lit(1)).alias("_n"),
    )
    cum = ranked_value_counts(li, ["l_returnflag"], "l_extendedprice")
    # pass 1 over the (checkpointed) distinct-value frame: per-flag
    # size and base offset → the floor/ceil target ranks per quantile,
    # WIDE (one row per flag; the broadcast build side of pass 2)
    targets = (
        cum.groupBy("l_returnflag")
        .agg(F.sum("_c").alias("_gn"), F.max("_cum").alias("_maxcum"))
        .withColumn("_base", F.col("_maxcum") - F.col("_gn"))
        .select(
            "l_returnflag",
            "_base",
            *[
                ((F.col("_gn") - 1).cast("double") * F.lit(float(q))).alias(
                    f"_h{i}"
                )
                for i, q in enumerate(_APPROX_PCT_QS)
            ],
        )
        .select(
            "l_returnflag",
            "_base",
            *[F.col(f"_h{i}") for i in range(len(_APPROX_PCT_QS))],
            *[
                F.floor(f"_h{i}").cast("long").alias(f"_frn{i}")
                for i in range(len(_APPROX_PCT_QS))
            ],
            *[
                F.ceil(f"_h{i}").cast("long").alias(f"_crn{i}")
                for i in range(len(_APPROX_PCT_QS))
            ],
        )
    )
    # pass 2a — sketch rank sums over the RAW fact rows (a count of raw
    # rows equals the _c-weighted sum over the distinct-value frame,
    # value for value): simple codegen'd comparisons against the 3-row
    # broadcast sketch, in the same pass that counts the group.
    p_raw = F.col("l_extendedprice")
    lohi_aggs = [F.count(F.lit(1)).alias("_n")]
    for i in range(len(_APPROX_PCT_QS)):
        ap = F.col("_ap")[i]
        lohi_aggs += [
            F.sum(F.when(p_raw < ap, 1).otherwise(0)).alias(f"_lo{i}"),
            F.sum(F.when(p_raw <= ap, 1).otherwise(0)).alias(f"_hi{i}"),
            F.max(F.when(p_raw == ap, 1).otherwise(0)).alias(f"_present{i}"),
        ]
    lohi = (
        li.join(F.broadcast(agg.select("l_returnflag", "_ap")), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(*lohi_aggs)
    )
    # pass 2b — the exact order-statistic picks: FILTER the ranked frame
    # to the rows whose rank window can match a floor/ceil target (a
    # handful per group) before aggregating, instead of running wide
    # when-aggregates over every distinct value.
    probe = cum.join(F.broadcast(targets), "l_returnflag")
    v = F.col("l_extendedprice").cast("double")
    c = F.col("_c")
    gcum = F.col("_cum") - F.col("_base")  # per-group inclusive rank end
    glo = gcum - c  # exclusive rank start
    hit = F.lit(False)
    for i in range(len(_APPROX_PCT_QS)):
        frn, crn = F.col(f"_frn{i}"), F.col(f"_crn{i}")
        hit = hit | ((glo <= frn) & (frn < gcum)) | ((glo <= crn) & (crn < gcum))
    pick_aggs = []
    for i in range(len(_APPROX_PCT_QS)):
        frn, crn = F.col(f"_frn{i}"), F.col(f"_crn{i}")
        pick_aggs += [
            F.max(F.when((glo <= frn) & (frn < gcum), v)).alias(f"_vlo{i}"),
            F.max(F.when((glo <= crn) & (crn < gcum), v)).alias(f"_vhi{i}"),
            F.max(f"_h{i}").alias(f"_h{i}"),
            F.max(frn).alias(f"_frn{i}"),
            F.max(crn).alias(f"_crn{i}"),
        ]
    picks = probe.filter(hit).groupBy("l_returnflag").agg(*pick_aggs)
    fused = lohi.join(F.broadcast(picks), "l_returnflag")
    eps = 1.0 / APPROX_PCT_ACCURACY
    cond = F.lit(True)
    outs = []
    names = ["p50_exact", "p95_exact", "p99_exact"]
    for i, q in enumerate(_APPROX_PCT_QS):
        cond = (
            cond
            & (F.col(f"_present{i}") == 1)
            & (F.col(f"_lo{i}") <= (q + eps) * F.col("_n") + 1)
            & (F.col(f"_hi{i}") >= (q - eps) * F.col("_n") - 1)
        )
        frn, crn, h = (
            F.col(f"_frn{i}"), F.col(f"_crn{i}"), F.col(f"_h{i}")
        )
        outs.append(
            F.when(frn == crn, F.col(f"_vlo{i}"))
            .otherwise(
                F.col(f"_vlo{i}") * (crn.cast("double") - h)
                + F.col(f"_vhi{i}") * (h - frn.cast("double"))
            )
            .alias(names[i])
        )
    return fused.select(
        "l_returnflag", *outs, cond.alias("within_bound")
    ).orderBy("l_returnflag")


@extra_query("approx_price_percentiles_raw")  # rows-only: sketch values are engine-specific
def approx_price_percentiles_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The raw percentile sketch — the true 100 TB shape: one pass +
    fixed memory where exact percentile sorts every group. Engine-
    specific values, so no SQL oracle; hard-bounded in tests/test_stats
    .py::test_approx_percentile_rank_error_within_accuracy_vs_duckdb,
    and the declared ``approx_price_percentiles`` folds the same rank
    bound into an oracle-checkable contract."""
    li = scan_table(spark, sf_dir, "lineitem")
    qs = ", ".join(str(q) for q in _APPROX_PCT_QS)
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.expr(
                f"approx_percentile(l_extendedprice, array({qs}), "
                f"{APPROX_PCT_ACCURACY})"
            ).alias("p")
        )
        .select(
            "l_returnflag",
            F.col("p")[0].alias("p50_price"),
            F.col("p")[1].alias("p95_price"),
            F.col("p")[2].alias("p99_price"),
        )
        .orderBy("l_returnflag")
    )


@extra_query(
    "value_histogram_20bins",
    oracle=f"""
    WITH b AS (
      SELECT LEAST(CAST(FLOOR(value / 25.0) AS BIGINT), 19) AS bin, value
      FROM events
    )
    SELECT bin,
           bin * 25.0 AS bin_lo,
           COUNT(*) AS n_events,
           {dsum_sql('value')} AS bin_value
    FROM b
    GROUP BY bin
    ORDER BY bin
    """,
)
def value_histogram_20bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram (SURVEY §2.4 ext — the distribution-profiling
    primitive): 20 bins of width 25 over ``value``, overflow clamped to
    the last bin. One aggregation with map-side partial counts on ≤20
    keys — at 100 TB the shuffle moves 20 rows per map partition.
    Fixed-width (not quantile) bins keep the binning a pure per-row
    expression: no pre-pass, no broadcast."""
    bin_ = F.least(F.floor(F.col("value") / 25.0).cast("bigint"), F.lit(19))
    return (
        scan_table(spark, sf_dir, "events")
        .groupBy(bin_.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("bin_value"),
        )
        .select("bin", (F.col("bin") * 25.0).alias("bin_lo"), "n_events", "bin_value")
        .orderBy("bin")
    )


@extra_query(
    "price_quantity_linreg",
    oracle=f"""
    WITH s AS (
      SELECT COUNT(*) AS n,
             {dsum_sql('l_quantity')} AS sx,
             {dsum_sql('l_extendedprice')} AS sy,
             {dsum_sql('l_quantity * l_quantity')} AS sxx,
             {dsum_sql('l_quantity * l_extendedprice')} AS sxy
      FROM lineitem
    )
    SELECT n, sx, sy, sxx, sxy,
           ((n * sxy) - (sx * sy)) / ((n * sxx) - (sx * sx)) AS slope,
           (sy - (((n * sxy) - (sx * sy)) / ((n * sxx) - (sx * sx))) * sx) / n
             AS intercept
    FROM s
    """,
)
def price_quantity_linreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form least squares in ONE aggregation pass (SURVEY §2.4
    ext): slope/intercept of extendedprice ~ quantity from the five
    classic sums — the way regression runs at 100 TB (a single map-side-
    combinable aggregate; no iteration, no driver data). Sums accumulate
    in DECIMAL(30,4) (dsum) so the derived coefficients are bit-exact
    cross-engine; the final slope/intercept arithmetic is written in
    identical evaluation order in both engines."""
    li = scan_table(spark, sf_dir, "lineitem")
    s = li.agg(
        F.count(F.lit(1)).alias("n"),
        dsum("l_quantity").alias("sx"),
        dsum("l_extendedprice").alias("sy"),
        dsum(F.col("l_quantity") * F.col("l_quantity")).alias("sxx"),
        dsum(F.col("l_quantity") * F.col("l_extendedprice")).alias("sxy"),
    )
    slope = ((F.col("n") * F.col("sxy")) - (F.col("sx") * F.col("sy"))) / (
        (F.col("n") * F.col("sxx")) - (F.col("sx") * F.col("sx"))
    )
    return s.select(
        "n",
        "sx",
        "sy",
        "sxx",
        "sxy",
        slope.alias("slope"),
        ((F.col("sy") - slope * F.col("sx")) / F.col("n")).alias("intercept"),
    )


@extra_query(
    "value_zscore_outliers",
    oracle=f"""
    WITH m AS (
      SELECT event_type,
             COUNT(value) AS n,
             {dsum_sql('value')} AS s1,
             {dsum_sql('value * value')} AS s2
      FROM events GROUP BY event_type
    ),
    stats AS (
      SELECT event_type, n,
             s1 / n AS mean,
             SQRT((s2 / n) - ((s1 / n) * (s1 / n))) AS sd
      FROM m
    )
    SELECT e.event_id, e.event_type, e.value,
           (e.value - st.mean) / st.sd AS zscore
    FROM events e JOIN stats st ON e.event_type = st.event_type
    WHERE ABS((e.value - st.mean) / st.sd) > 3.0
    """,
)
def value_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score outlier flagging (SURVEY §2.4 ext — the data-
    quality anomaly gate): events more than 3 population-sd from their
    type's mean. Two-pass shape that scales: a per-type moment aggregate
    (|types| rows, broadcast back) then a map-side score+filter — no
    window over the event stream, so the fact table never sorts. Moments
    accumulate via dsum; mean/sd derive in identical evaluation order
    both engines (libm sqrt is correctly rounded ⇒ bit-exact)."""
    events = scan_table(spark, sf_dir, "events")
    m = events.groupBy("event_type").agg(
        F.count("value").alias("n"),
        dsum("value").alias("s1"),
        dsum(F.col("value") * F.col("value")).alias("s2"),
    )
    stats = m.select(
        "event_type",
        "n",
        (F.col("s1") / F.col("n")).alias("mean"),
        F.sqrt((F.col("s2") / F.col("n")) - ((F.col("s1") / F.col("n")) * (F.col("s1") / F.col("n")))).alias("sd"),
    )
    z = (F.col("value") - F.col("mean")) / F.col("sd")
    return (
        events.join(F.broadcast(stats), "event_type")
        .select("event_id", "event_type", "value", z.alias("zscore"))
        .filter(F.abs(F.col("zscore")) > 3.0)
    )
