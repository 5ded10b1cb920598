"""AQE skew-join evidence (operators/skew.py's runtime counterpart).

The manual salted join (tests/test_temporal.py) is the *static* skew fix.
Spark's AQE can do the same split at runtime: with
``spark.sql.adaptive.skewJoin.enabled`` a sort-merge join whose shuffle
partition is both > skewedPartitionFactor x median and
> skewedPartitionThresholdInBytes is split into advisory-sized sub-reads
(visible as ``skew=true`` on the SMJ / ``AQEShuffleRead skewed``).

This suite pins (a) the rewrite actually FIRES on a skewed fixture and
(b) its result is row-identical to the manual salted join — so both skew
paths are proven equivalent on the same data.

When is the manual salt still needed?
- AQE skew splitting applies to sort-merge (and shuffled-hash) JOIN
  partitions only — a skewed *aggregation* still hot-spots one task;
  salting the groupBy key remains the only fix (queries/relational.py's
  salted_revenue_by_segment).
- AQE sees skew only in shuffle *bytes at runtime*. Skew that
  materializes after a preceding broadcast join or inside a single
  mapper (stats-invisible until too late) can still need the explicit
  salt.
- Left-anti/semi joins under AQE cannot split the preserved side in all
  plan shapes; the salted form handles them uniformly.
"""

from __future__ import annotations

import pytest

from portfolio_data_pipelines_spark.operators.skew import salted_join

#: AQE knobs scaled down so a local fixture trips the same code path a
#: multi-GB hot partition would on a cluster.
_AQE_CONF = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
    # Force the shuffle join: broadcast would dissolve the skew (and at
    # real scale the dim side may be too big to broadcast).
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.coalescePartitions.enabled": "false",
}


@pytest.fixture()
def aqe_skew_conf(spark):
    old = {k: spark.conf.get(k, None) for k in _AQE_CONF}
    for k, v in _AQE_CONF.items():
        spark.conf.set(k, v)
    yield
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _skewed_fixture(spark):
    """~95% of fact rows share key 0; 200-key dim side. The payload is
    xxhash64(id) — INCOMPRESSIBLE, so the hot shuffle partition's
    on-the-wire bytes actually exceed the (scaled-down) skew threshold;
    a constant payload lz4-compresses below it and AQE sees no skew."""
    from pyspark.sql import functions as F

    left = (
        spark.range(200_000)
        .select(
            F.when(F.col("id") % 20 != 0, F.lit(0))
            .otherwise((F.col("id") % 199) + 1)
            .alias("k"),
            F.xxhash64("id").alias("v"),
        )
    )
    right = spark.range(200).select(
        F.col("id").alias("k"), F.concat(F.lit("seg_"), F.col("id")).alias("seg")
    )
    return left, right


def test_aqe_skew_join_fires_and_matches_salted(spark, aqe_skew_conf):
    left, right = _skewed_fixture(spark)

    joined = left.join(right, "k").groupBy("seg").count()
    aqe_rows = {(r["seg"], r["count"]) for r in joined.collect()}

    # The rewrite must have fired: the FINAL adaptive plan marks the SMJ
    # as skew-handled. (Inspect after the action — AQE finalizes then.)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert "skew=true" in plan, plan[:2000]

    # Row-identical to the manual salted join on the same fixture.
    salted = salted_join(left, right, on="k", n_salts=8).groupBy("seg").count()
    salted_rows = {(r["seg"], r["count"]) for r in salted.collect()}
    assert aqe_rows == salted_rows
    # Sanity: the hot key dominates, so the skew was real.
    hot = {seg: n for seg, n in aqe_rows}
    assert hot["seg_0"] == 190_000


def test_aqe_does_not_split_skewed_aggregation(spark, aqe_skew_conf):
    """The documented gap: AQE skew handling is join-only. A skewed
    groupBy still lands one hot task (no 'skew=true' anywhere), which is
    why the salted AGGREGATION pattern exists independently."""
    from pyspark.sql import functions as F

    left, _ = _skewed_fixture(spark)
    agg = left.groupBy("k").agg(F.max("v"))  # max: no ANSI overflow on hashed longs
    agg.collect()
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" not in plan
