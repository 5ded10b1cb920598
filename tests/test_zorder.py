"""Z-order clustering (operators/zorder.py): multi-column data skipping."""

from __future__ import annotations

from pyspark.sql import functions as F

from portfolio_data_pipelines_spark.operators.zorder import (
    zorder_file_stats,
    zorder_write,
)
from portfolio_data_pipelines_spark.sources.parquet import scan_table

SF = "/root/testdata/sf0.01"


def test_zorder_preserves_rows(spark, tmp_path):
    out = str(tmp_path / "z")
    events = scan_table(spark, SF, "events")
    zorder_write(events, out, ["user_id", "value"], n_files=8)
    got = spark.read.parquet(out)
    assert got.count() == events.count()
    assert sorted(got.columns) == sorted(events.columns)
    # Content identical (ids are unique).
    assert (
        got.select("event_id").exceptAll(events.select("event_id")).count() == 0
    )


def test_zorder_narrows_per_file_spans_on_both_columns(spark, tmp_path):
    """The point of z-ordering: per-file min-max spans shrink on BOTH
    clustered columns simultaneously, so footer stats prune scans
    filtering on either one. A single-column sort would narrow one
    column and leave the other at ~full range."""
    events = scan_table(spark, SF, "events")

    z_path = str(tmp_path / "z")
    zorder_write(events, z_path, ["user_id", "value"], n_files=8)
    z = zorder_file_stats(z_path, ["user_id", "value"])

    naive_path = str(tmp_path / "naive")
    events.repartition(8).write.mode("overwrite").parquet(naive_path)
    naive = zorder_file_stats(naive_path, ["user_id", "value"])

    # Naive round-robin files each span most of both columns' ranges
    # (value is right-skewed, so its random-file span sits ~0.7).
    assert naive["user_id"] > 0.9 and naive["value"] > 0.6
    # Z-ordered files cover narrow slices of both at once.
    assert z["user_id"] < 0.5, z
    assert z["value"] < 0.5, z


def test_zorder_beats_single_column_sort_on_the_other_column(spark, tmp_path):
    events = scan_table(spark, SF, "events")

    sorted_path = str(tmp_path / "sorted")
    (
        events.repartitionByRange(8, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(sorted_path)
    )
    single = zorder_file_stats(sorted_path, ["user_id", "value"])

    z_path = str(tmp_path / "z")
    zorder_write(events, z_path, ["user_id", "value"], n_files=8)
    z = zorder_file_stats(z_path, ["user_id", "value"])

    # The user_id sort nails user_id but leaves value unclustered.
    assert single["user_id"] < 0.3
    assert single["value"] > 0.6
    # Z-order trades a little user_id selectivity for value selectivity.
    assert z["value"] < 0.75 * single["value"]


def test_zorder_null_and_constant_columns(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, None if i % 3 == 0 else float(i), 42.0) for i in range(100)],
        "id bigint, x double, const double",
    )
    out = str(tmp_path / "z")
    zorder_write(df, out, ["x", "const"], n_files=4)
    got = spark.read.parquet(out)
    assert got.count() == 100
    assert got.filter(F.col("x").isNull()).count() == 34


def test_zorder_four_columns_stays_nonnegative(spark, tmp_path):
    """bits=16 x 4 cols would write into a long's sign bit; zorder_write
    must clamp per-column bits so the Morton code stays monotone
    (non-negative) and the write succeeds with correct clustering."""
    import math

    df = spark.createDataFrame(
        [
            (i, float(i % 97), float((i * 7) % 89), float((i * 13) % 83), float(i))
            for i in range(2000)
        ],
        "id bigint, a double, b double, c double, d double",
    )
    out = str(tmp_path / "z4")
    zorder_write(df, out, ["a", "b", "c", "d"], n_files=16)
    got = spark.read.parquet(out)
    assert got.count() == 2000
    # 16 files = the top 4 Morton bits = the top bucket bit of each of the
    # 4 columns, so every column's per-file span should drop below full
    # range. With the old sign-bit overflow, top-bucket rows sorted FIRST
    # (negative codes) and clustering silently degraded.
    stats = zorder_file_stats(out, ["a", "b", "c", "d"])
    assert all(not math.isnan(v) and v < 0.95 for v in stats.values()), stats

    # Direct sign-bit property: clamped bits keep the Morton code inside
    # the 63 value bits of a long even at the all-max-bucket corner.
    from portfolio_data_pipelines_spark.operators.zorder import _interleave

    bits = 63 // 4
    corner = spark.createDataFrame([(2**bits - 1,) * 4], "a long, b long, c long, d long")
    (z_val,) = corner.select(
        _interleave([F.col(c) for c in ("a", "b", "c", "d")], bits).alias("z")
    ).first()
    assert 0 <= z_val < 2**63


def test_zorder_rejects_too_many_columns(spark):
    import pytest as _pytest

    df = spark.range(10).selectExpr(*[f"id as c{i}" for i in range(64)])
    with _pytest.raises(ValueError):
        zorder_write(df, "/tmp/unused", [f"c{i}" for i in range(64)], n_files=2)


def test_zorder_file_stats_handles_missing_statistics(spark, tmp_path):
    """An all-null column produces row groups without min/max stats;
    zorder_file_stats must skip them (NaN for span-less columns) rather
    than raise."""
    import math

    df = spark.createDataFrame(
        [(i, float(i), None) for i in range(50)],
        "id bigint, x double, y double",
    )
    out = str(tmp_path / "nullcol")
    df.repartition(2).write.mode("overwrite").parquet(out)
    stats = zorder_file_stats(out, ["x", "y"])
    assert stats["x"] <= 1.0
    assert math.isnan(stats["y"])
