"""The reference's dbt models, ported — plus the two it named but never shipped.

- ``stg_weather_hourly``: rename ``time → time_utc``, derive
  ``date_utc = date(time)`` (``dbt/models/staging/stg_weather_hourly.sql``).
- ``weather_daily``: daily grain mart — avg/max/min temperature, avg RH,
  ordered by day (``dbt/models/marts/weather_daily.sql``).
- ``stg_fx_rates`` / ``fx_top10_daily``: named only via their exclusion at
  ``weather_hourly_pipeline.py:119``; ``fx_top10_daily`` implies
  top-10-currencies-per-day — a ``row_number`` window over (day, rate desc)
  with a deterministic ``quote_ccy`` tie-break (FIXTURES.md §4).
"""

from __future__ import annotations

from .registry import Model, ModelRegistry

STG_WEATHER_HOURLY = Model(
    name="stg_weather_hourly",
    schema="stg",
    tags=frozenset({"weather"}),
    # Columns match dbt/models/staging/stg_weather_hourly.sql:3-8 exactly
    # (4 data columns; the ingestion audit column stays in bronze/the
    # warehouse relation, not the staging contract).
    sql="""
        SELECT
            time AS time_utc,
            CAST(time AS DATE) AS date_utc,
            temperature_2m,
            relative_humidity_2m
        FROM {{ source('public', 'weather_hourly') }}
    """,
)

WEATHER_DAILY = Model(
    name="weather_daily",
    schema="marts",
    tags=frozenset({"weather"}),
    sql="""
        SELECT
            date_utc,
            AVG(temperature_2m)       AS avg_temp_c,
            MAX(temperature_2m)       AS max_temp_c,
            MIN(temperature_2m)       AS min_temp_c,
            AVG(relative_humidity_2m) AS avg_rh
        FROM {{ ref('stg_weather_hourly') }}
        GROUP BY 1
        ORDER BY 1
    """,
)

STG_FX_RATES = Model(
    name="stg_fx_rates",
    schema="stg",
    tags=frozenset({"fx"}),
    sql="""
        SELECT
            rate_date,
            base_ccy,
            quote_ccy,
            rate,
            ingested_at
        FROM {{ source('public', 'fx_rates') }}
    """,
)

FX_TOP10_DAILY = Model(
    name="fx_top10_daily",
    schema="marts",
    tags=frozenset({"fx"}),
    sql="""
        SELECT rate_date, quote_ccy, rate, rate_rank
        FROM (
            SELECT
                rate_date,
                quote_ccy,
                rate,
                ROW_NUMBER() OVER (
                    PARTITION BY rate_date
                    ORDER BY rate DESC, quote_ccy ASC
                ) AS rate_rank
            FROM {{ ref('stg_fx_rates') }}
        )
        WHERE rate_rank <= 10
    """,
)


def default_registry() -> ModelRegistry:
    """Registry with the reference's model set and source mappings."""
    reg = ModelRegistry()
    for m in (STG_WEATHER_HOURLY, WEATHER_DAILY, STG_FX_RATES, FX_TOP10_DAILY):
        reg.add(m)
    # dbt sources.yml parity: source('public','weather_hourly') → the
    # temp view the pipeline registers after the warehouse load.
    reg.map_source("public", "weather_hourly", "weather_hourly")
    reg.map_source("public", "fx_rates", "fx_rates")
    return reg
