"""End-to-end tests for the weather vertical (SURVEY §7 M1, §5 implication b).

Mirrors the reference's smoke path — payload → bronze parquet → warehouse
relation → staging view → daily mart — with hand-computed goldens, plus the
fixture variants FIXTURES.md §1 mandates: empty payload, missing keys,
malformed timestamps.
"""

from __future__ import annotations

import datetime as dt
import json

import pytest

from portfolio_data_pipelines_spark.runner import WeatherPipeline
from portfolio_data_pipelines_spark.config import PipelineConfig
from portfolio_data_pipelines_spark.sources.weather import (
    batch_partition_date,
    weather_payload_to_df,
)


def payload_fixture(days: int = 2, per_day: int = 24) -> dict:
    times, temps, hums = [], [], []
    for d in range(days):
        for h in range(per_day):
            times.append(f"2025-08-{20 + d:02d}T{h:02d}:00")
            temps.append(15.0 + d + h * 0.25)
            hums.append(50.0 + (h % 10))
    return {
        "hourly": {
            "time": times,
            "temperature_2m": temps,
            "relative_humidity_2m": hums,
        },
        "_meta": {"lat": "-23.5505", "lon": "-46.6333", "ingested_at": "2025-08-20T12:00:00Z"},
    }


class TestWeatherTransform:
    def test_normal_payload(self, spark):
        df = weather_payload_to_df(spark, payload_fixture())
        assert df.columns == [
            "time",
            "temperature_2m",
            "relative_humidity_2m",
            "lat",
            "lon",
            "ingested_at",
        ]
        rows = df.collect()
        assert len(rows) == 48
        assert rows[0]["lat"] == "-23.5505"  # strings, not floats
        assert isinstance(rows[0]["time"], dt.datetime)
        assert rows[0]["ingested_at"] == dt.datetime(2025, 8, 20, 12, 0, 0)

    def test_empty_payload_typed_empty_frame(self, spark):
        df = weather_payload_to_df(spark, {})
        assert df.count() == 0
        # schema must survive emptiness (weather_transform.py:18-23 parity)
        assert [f.dataType.simpleString() for f in df.schema.fields] == [
            "timestamp",
            "double",
            "double",
            "string",
            "string",
            "timestamp",
        ]

    def test_missing_keys_tolerated(self, spark):
        df = weather_payload_to_df(spark, {"hourly": {"time": None}})
        assert df.count() == 0

    def test_malformed_timestamps_null_not_error(self, spark):
        p = payload_fixture(days=1, per_day=3)
        p["hourly"]["time"][1] = "not-a-timestamp"
        df = weather_payload_to_df(spark, p)
        got = df.select("time").collect()
        assert got[1]["time"] is None  # strict=False parity
        assert got[0]["time"] is not None

    def test_batch_partition_date_is_min_date(self, spark):
        df = weather_payload_to_df(spark, payload_fixture(days=3))
        assert batch_partition_date(df) == dt.date(2025, 8, 20)


class TestPipelineEndToEnd:
    @pytest.fixture()
    def pipeline(self, spark, tmp_path):
        cfg = PipelineConfig(lake_root=str(tmp_path / "lake"))
        raw = json.dumps(payload_fixture(days=2))
        return WeatherPipeline(spark, config=cfg, fetcher=lambda: raw)

    def test_full_run_builds_mart(self, spark, pipeline):
        built = pipeline.run()
        assert set(built) == {"stg_stg_weather_hourly", "marts_weather_daily"}
        mart = spark.table("marts_weather_daily").orderBy("date_utc").collect()
        assert [str(r["date_utc"]) for r in mart] == ["2025-08-20", "2025-08-21"]
        # golden: day-0 temps are 15.0 + h*0.25 for h in 0..23 → avg 17.875
        assert mart[0]["avg_temp_c"] == pytest.approx(17.875)
        assert mart[0]["max_temp_c"] == pytest.approx(15.0 + 23 * 0.25)
        assert mart[0]["min_temp_c"] == pytest.approx(15.0)
        assert mart[1]["avg_temp_c"] == pytest.approx(18.875)

    def test_warehouse_schema_narrowed(self, spark, pipeline):
        pipeline.run()
        wh = spark.table("weather_hourly")
        assert wh.columns == ["time", "temperature_2m", "relative_humidity_2m", "ingested_at"]

    def test_rerun_is_idempotent(self, spark, pipeline):
        pipeline.run()
        first = spark.table("weather_hourly").count()
        pipeline.run()  # same batch again — K4 contract: no duplicates
        assert spark.table("weather_hourly").count() == first

    def test_empty_batch_short_circuits(self, spark, tmp_path):
        cfg = PipelineConfig(lake_root=str(tmp_path / "lake2"))
        p = WeatherPipeline(spark, config=cfg, fetcher=lambda: json.dumps({}))
        assert p.run() == {}

    def test_quality_gate_fails_on_out_of_range(self, spark, tmp_path):
        bad = payload_fixture(days=1)
        bad["hourly"]["temperature_2m"][0] = 999.0  # breaches −80..60 sanity
        cfg = PipelineConfig(lake_root=str(tmp_path / "lake3"))
        p = WeatherPipeline(spark, config=cfg, fetcher=lambda: json.dumps(bad))
        with pytest.raises(AssertionError, match="data-quality"):
            p.run()


def test_unique_expectation(spark):
    """dbt `unique` parity: duplicate keys are counted as violations."""
    from portfolio_data_pipelines_spark.plans.quality import run_expectations, unique

    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (2, "c"), (3, "d"), (3, "e")], "id bigint, v string"
    )
    dup, composite = run_expectations(df, [unique("id"), unique(["id", "v"])])
    assert not dup.passed and dup.violations == 2  # ids 2 and 3
    assert composite.passed  # (id, v) pairs are all distinct


def test_freshness_expectation(spark):
    """dbt source `freshness` parity with an injectable clock."""
    import datetime as dt

    from portfolio_data_pipelines_spark.plans.quality import freshness, run_expectations

    df = spark.createDataFrame(
        [(dt.datetime(2025, 8, 1, 10),), (dt.datetime(2025, 8, 1, 12),)], "ts timestamp"
    )
    fresh, stale = run_expectations(
        df,
        [
            freshness("ts", 6, now=dt.datetime(2025, 8, 1, 15)),   # newest 3h old
            freshness("ts", 2, now=dt.datetime(2025, 8, 1, 15)),   # newest 3h old > 2h
        ],
    )
    assert fresh.passed
    assert not stale.passed and stale.violations == 1
    empty = spark.createDataFrame([], "ts timestamp")
    (r,) = run_expectations(empty, [freshness("ts", 6, now=dt.datetime(2025, 8, 1))])
    assert not r.passed  # no data counts as stale
