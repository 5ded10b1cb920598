"""Weather payload → typed DataFrame (SURVEY §2.3 P1-P3, §2.7 F1).

Re-expresses the reference transform
(``airflow/include/lib/weather_transform.py:4-37``) Spark-first:

- missing keys tolerated: ``payload.get("hourly") or {}`` semantics (P10);
- empty input → a **typed** empty DataFrame (the reference fabricates an
  explicit 6-column empty frame, ``weather_transform.py:18-23``);
- timestamps parsed non-strictly: malformed strings become NULL rather
  than failing the job (Polars ``strict=False`` → Spark
  ``F.try_to_timestamp``), per SURVEY §4 semantics note (b);
- ``lat``/``lon`` stay strings (reference keeps them Utf8).

The payload itself arrives driver-side (the reference fetches on an
Airflow worker with ``requests``); at reference scale (~168 rows/batch)
a driver-side parse + ``createDataFrame`` is the correct topology. For
partition-parallel ingestion of many payloads, feed a directory of raw
JSON files to ``spark.read.json`` or the streaming source instead.
"""

from __future__ import annotations

from typing import Any, Mapping

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import WEATHER_BRONZE

#: Raw (pre-cast) shape: everything as strings except the metric doubles,
#: mirroring how the reference builds from Python lists then casts.
_RAW_SCHEMA = T.StructType(
    [
        T.StructField("time", T.StringType(), True),
        T.StructField("temperature_2m", T.DoubleType(), True),
        T.StructField("relative_humidity_2m", T.DoubleType(), True),
    ]
)


def weather_payload_to_df(spark: SparkSession, payload: Mapping[str, Any]) -> DataFrame:
    """Flatten an Open-Meteo-shaped payload into the 6-column bronze frame.

    Accepts the ``_meta``-enriched payload shape (FIXTURES.md §1). Missing
    or None-valued keys yield empty columns; ragged series are truncated
    to the shortest length (zip semantics, matching the columnar dict
    construction in the reference).
    """
    hourly = payload.get("hourly") or {}
    meta = payload.get("_meta") or {}
    times = hourly.get("time") or []
    temps = hourly.get("temperature_2m") or []
    hums = hourly.get("relative_humidity_2m") or []

    rows = list(zip(times, temps, hums))
    if not rows:
        # Typed empty frame — the P7 empty-relation guard downstream
        # relies on schema presence even with zero rows.
        return spark.createDataFrame([], schema=WEATHER_BRONZE)

    raw = spark.createDataFrame(rows, schema=_RAW_SCHEMA)
    return raw.select(
        # try_to_timestamp: malformed → NULL, never an error (F1 parity).
        F.try_to_timestamp(F.col("time")).alias("time"),
        F.col("temperature_2m").cast("double").alias("temperature_2m"),
        F.col("relative_humidity_2m").cast("double").alias("relative_humidity_2m"),
        F.lit(meta.get("lat")).cast("string").alias("lat"),
        F.lit(meta.get("lon")).cast("string").alias("lon"),
        F.try_to_timestamp(
            F.lit(meta.get("ingested_at")),
            F.lit("yyyy-MM-dd'T'HH:mm:ss[.SSSSSS]'Z'"),
        ).alias("ingested_at"),
    )


def batch_partition_date(df: DataFrame):
    """Scalar min date of the batch (SURVEY §2.4 A1).

    The reference derives one partition date per batch via
    ``df.select(pl.col("time").dt.date().min()).item()``
    (``weather_hourly_pipeline.py:67,89``); used for the file name, the
    Hive partition key, and the idempotent-delete predicate.
    """
    row = df.agg(F.min(F.to_date("time")).alias("d")).first()
    return row["d"] if row is not None else None
