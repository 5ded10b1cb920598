"""Python DataSource plumbing tests (sources/http_datasource.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from portfolio_data_pipelines_spark.sources.http_datasource import (
    HOURS,
    WeatherHttpDataSource,
)


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(WeatherHttpDataSource)
    return spark


def test_reads_one_partition_per_location(registered):
    df = (
        registered.read.format("weather_http")
        .option("locations", "-23.55,-46.63;40.71,-74.01;51.5,-0.12")
        .load()
    )
    assert df.rdd.getNumPartitions() == 3
    assert df.count() == 3 * HOURS


def test_schema_matches_reference_contract(registered):
    df = registered.read.format("weather_http").load()
    assert [f.name for f in df.schema.fields] == [
        "time", "temperature_2m", "relative_humidity_2m", "lat", "lon", "ingested_at",
    ]
    assert dict((f.name, f.dataType.simpleString()) for f in df.schema.fields)["lat"] == "string"


def test_deterministic_across_reads(registered):
    opts = {"locations": "-23.55,-46.63", "start": "2025-08-01T00:00:00"}
    a = registered.read.format("weather_http").options(**opts).load().collect()
    b = registered.read.format("weather_http").options(**opts).load().collect()
    assert a == b
    assert len(a) == HOURS


def test_feeds_daily_mart_shape(registered):
    # The DataSource output drives the reference's mart query unchanged.
    df = registered.read.format("weather_http").option(
        "locations", "-23.55,-46.63"
    ).load()
    mart = (
        df.groupBy(F.to_date("time").alias("date_utc"))
        .agg(F.avg("temperature_2m").alias("avg_temp"), F.count(F.lit(1)).alias("n"))
        .orderBy("date_utc")
    )
    rows = mart.collect()
    assert len(rows) == 7 and all(r["n"] == 24 for r in rows)


def test_malformed_locations_fail_at_parse_time(spark):
    import pytest

    from portfolio_data_pipelines_spark.sources.http_datasource import WeatherHttpReader

    for bad in ("-23.55", "1,2,3", "abc,def"):
        with pytest.raises(ValueError, match="locations entry"):
            WeatherHttpReader(None, {"locations": bad})


def test_user_schema_prunes_and_reorders(registered):
    df = (
        registered.read.format("weather_http")
        .schema("lat string, time timestamp")
        .option("locations", "-23.55,-46.63")
        .load()
    )
    assert [f.name for f in df.schema.fields] == ["lat", "time"]
    rows = df.collect()
    assert len(rows) == 168
    assert rows[0]["lat"] == "-23.55"


def test_user_schema_unknown_column_fails_clearly(registered):
    import pytest as _pytest

    with _pytest.raises(Exception, match="no column"):
        (
            registered.read.format("weather_http")
            .schema("nope string")
            .option("locations", "-23.55,-46.63")
            .load()
            .collect()
        )
