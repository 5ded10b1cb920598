"""Tests for the model registry (dbt parity) and FX models (SURVEY M4)."""

from __future__ import annotations

import datetime as dt

import pytest

from portfolio_data_pipelines_spark.plans.models import default_registry
from portfolio_data_pipelines_spark.plans.registry import Model, ModelRegistry
from portfolio_data_pipelines_spark.schemas import FX_RATES
from portfolio_data_pipelines_spark.sources.fx import fx_payload_to_df


class TestRegistry:
    def test_topo_order_puts_refs_first(self):
        reg = default_registry()
        order = reg.topo_order(["weather_daily"])
        assert order.index("stg_weather_hourly") < order.index("weather_daily")

    def test_tag_selection_and_exclusion(self):
        reg = default_registry()
        assert set(reg.select(tag="weather")) == {"stg_weather_hourly", "weather_daily"}
        assert set(reg.select(tag="fx", exclude={"fx_top10_daily"})) == {"stg_fx_rates"}

    def test_unknown_ref_raises(self):
        reg = ModelRegistry().add(Model(name="m", sql="SELECT * FROM {{ ref('nope') }}"))
        with pytest.raises(KeyError):
            reg.compile_sql(reg.models()["m"])

    def test_duplicate_model_raises(self):
        reg = ModelRegistry().add(Model(name="m", sql="SELECT 1"))
        with pytest.raises(ValueError):
            reg.add(Model(name="m", sql="SELECT 2"))


class TestFxVertical:
    @pytest.fixture()
    def fx_rates(self, spark):
        # 3 days × 15 currencies, with deliberate rate ties to pin the
        # quote_ccy tie-break (FIXTURES.md §4 golden contract).
        rows = []
        for d in range(3):
            day = dt.date(2025, 8, 20 + d)
            for i in range(15):
                ccy = f"C{i:02d}"
                rate = float(100 - i - (i % 3 == 0) * 0)  # ties: C00 pairs
                rows.append((day, "USD", ccy, rate, dt.datetime(2025, 8, 20, 12)))
        # introduce explicit ties on each day: C13 and C14 share a rate
        rows = [
            (d, b, c, (87.0 if c in ("C13", "C14") else r), t) for (d, b, c, r, t) in rows
        ]
        df = spark.createDataFrame(rows, schema=FX_RATES)
        df.createOrReplaceTempView("fx_rates")
        return df

    def test_fx_top10_daily(self, spark, fx_rates):
        built = default_registry().run(spark, tag="fx")
        top = built["marts_fx_top10_daily"]
        rows = top.orderBy("rate_date", "rate_rank").collect()
        per_day = {}
        for r in rows:
            per_day.setdefault(str(r["rate_date"]), []).append(r)
        assert set(len(v) for v in per_day.values()) == {10}  # exactly 10/day
        for day_rows in per_day.values():
            rates = [r["rate"] for r in day_rows]
            assert rates == sorted(rates, reverse=True)
            # tie-break deterministic: equal rates ordered by quote_ccy asc
            for a, b in zip(day_rows, day_rows[1:]):
                if a["rate"] == b["rate"]:
                    assert a["quote_ccy"] < b["quote_ccy"]

    def test_fx_payload_flatten(self, spark):
        payload = {
            "base": "USD",
            "date": "2025-08-20",
            "rates": {"EUR": 0.9, "BRL": 5.4},
            "_meta": {"ingested_at": "2025-08-20T12:00:00Z"},
        }
        df = fx_payload_to_df(spark, payload)
        rows = {r["quote_ccy"]: r for r in df.collect()}
        assert rows["EUR"]["rate"] == pytest.approx(0.9)
        assert str(rows["BRL"]["rate_date"]) == "2025-08-20"
        assert rows["BRL"]["base_ccy"] == "USD"

    def test_fx_empty_payload(self, spark):
        df = fx_payload_to_df(spark, {"rates": {}})
        assert df.count() == 0 and df.schema == FX_RATES


class TestPersistentCatalog:
    """Persistent schema namespaces (VERDICT r1 #8): models built as
    CREATE OR REPLACE VIEW in real schemas (stg/marts) against a
    metastore-backed session survive a session restart. Each phase runs
    in its own subprocess because one JVM hosts one SparkContext."""

    BUILD = """
import datetime as dt
import sys
sys.path.insert(0, "/root/repo")
from portfolio_data_pipelines_spark.plans.models import STG_WEATHER_HOURLY, WEATHER_DAILY
from portfolio_data_pipelines_spark.plans.registry import ModelRegistry
from portfolio_data_pipelines_spark.session import get_spark

spark = get_spark(app_name="persist-build", master="local[2]", warehouse_dir="{wh}",
                  extra_conf={{"spark.ui.enabled": "false",
                               "spark.sql.shuffle.partitions": "2"}})
rows = [(dt.datetime(2024, 1, 1, h), 10.0 + h, 50.0 + h) for h in range(24)]
src = spark.createDataFrame(rows, "time timestamp, temperature_2m double, relative_humidity_2m double")
src.write.mode("overwrite").saveAsTable("weather_hourly_src")

reg = ModelRegistry().add(STG_WEATHER_HOURLY).add(WEATHER_DAILY)
reg.map_source("public", "weather_hourly", "default.weather_hourly_src")
built = reg.run(spark, tag="weather", persistent=True)
assert set(built) == {{"stg.stg_weather_hourly", "marts.weather_daily"}}, built
assert spark.sql("SELECT * FROM marts.weather_daily").count() == 1
print("BUILD_OK")
spark.stop()
"""

    REOPEN = """
import sys
sys.path.insert(0, "/root/repo")
from portfolio_data_pipelines_spark.session import get_spark

spark = get_spark(app_name="persist-reopen", master="local[2]", warehouse_dir="{wh}",
                  extra_conf={{"spark.ui.enabled": "false",
                               "spark.sql.shuffle.partitions": "2"}})
stg = spark.table("stg.stg_weather_hourly")
assert stg.columns == ["time_utc", "date_utc", "temperature_2m", "relative_humidity_2m"], stg.columns
daily = spark.sql("SELECT * FROM marts.weather_daily")
assert daily.count() == 1
row = daily.first()
assert row["max_temp_c"] == 33.0, row
print("REOPEN_OK")
spark.stop()
"""

    def test_views_survive_session_restart(self, tmp_path):
        import subprocess
        import sys as _sys

        wh = str(tmp_path / "cat")
        for script, marker in ((self.BUILD, "BUILD_OK"), (self.REOPEN, "REOPEN_OK")):
            proc = subprocess.run(
                [_sys.executable, "-c", script.format(wh=wh)],
                capture_output=True, text=True, timeout=300,
            )
            assert marker in proc.stdout, proc.stderr[-3000:]


class TestIncrementalMaterialization:
    """dbt materialized=incremental / table parity (plans/registry.py)."""

    SCRIPT = """
import sys
sys.path.insert(0, "/root/repo")
import datetime as dt
from portfolio_data_pipelines_spark.plans.registry import Model, ModelRegistry
from portfolio_data_pipelines_spark.session import get_spark

spark = get_spark(app_name="incremental-build", master="local[2]", warehouse_dir="{wh}",
                  extra_conf={{"spark.ui.enabled": "false",
                               "spark.sql.shuffle.partitions": "2"}})

rows = [(1, dt.datetime(2024, 1, 1), 10.0), (2, dt.datetime(2024, 1, 2), 20.0)]
spark.createDataFrame(rows, "id bigint, ts timestamp, v double") \\
    .write.mode("overwrite").saveAsTable("events_src")

MODEL = Model(
    name="events_latest",
    schema="marts",
    materialized="incremental",
    unique_key=("id",),
    sql='''
        SELECT id, ts, v FROM {{{{ source('public', 'events') }}}}
        {{% if is_incremental() %}}
        WHERE ts > (SELECT MAX(ts) FROM {{{{ this }}}})
        {{% endif %}}
    ''',
)
reg = ModelRegistry().add(MODEL).map_source("public", "events", "default.events_src")

# First run: CTAS with the incremental block stripped.
built = reg.run(spark, persistent=True)
assert spark.table("marts.events_latest").count() == 2

# Source grows: one genuinely new id, one updated id (same key, newer ts).
more = [(2, dt.datetime(2024, 1, 5), 99.0), (3, dt.datetime(2024, 1, 6), 30.0)]
spark.createDataFrame(more, "id bigint, ts timestamp, v double") \\
    .write.mode("append").saveAsTable("events_src")

# Second run: only rows past the high-water mark are computed, merged on id.
reg.run(spark, persistent=True)
got = {{r.id: (r.v, r.ts) for r in spark.table("marts.events_latest").collect()}}
assert len(got) == 3, got
assert got[1][0] == 10.0
assert got[2] == (99.0, dt.datetime(2024, 1, 5)), got[2]  # key 2 replaced, not duplicated
assert got[3][0] == 30.0

# Re-run with no new source rows: idempotent (high-water filter yields 0).
reg.run(spark, persistent=True)
assert spark.table("marts.events_latest").count() == 3

# materialized=table: full rebuild every run.
TBL = Model(name="events_copy", schema="marts", materialized="table",
            sql="SELECT id, v FROM {{{{ source('public', 'events') }}}}")
reg2 = ModelRegistry().add(TBL).map_source("public", "events", "default.events_src")
reg2.run(spark, persistent=True)
assert spark.table("marts.events_copy").count() == 4

# Physical materializations demand a metastore-backed run.
try:
    reg.run(spark, persistent=False)
    raise AssertionError("expected ValueError for non-persistent incremental run")
except ValueError:
    pass

print("INCR_OK")
spark.stop()
"""

    def test_incremental_merge_and_table_rebuild(self, tmp_path):
        import subprocess
        import sys as _sys

        proc = subprocess.run(
            [_sys.executable, "-c", self.SCRIPT.format(wh=str(tmp_path / "cat"))],
            capture_output=True, text=True, timeout=300,
        )
        assert "INCR_OK" in proc.stdout, proc.stderr[-3000:]
