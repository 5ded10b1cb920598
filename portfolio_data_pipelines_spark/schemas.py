"""Explicit schema contracts (SURVEY §1.2-§1.3).

The reference declares schemas explicitly at every boundary — the typed
empty frame (``weather_transform.py:18-23``), the warehouse DDL
(``weather_hourly_pipeline.py:92-99``), and the dbt source contract
(``dbt/models/sources.yml``). We do the same: StructType constants per
dataset, never inference on ingestion.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Weather vertical (reference parity)
# ---------------------------------------------------------------------------

#: Bronze/lake table — 6 columns (weather_transform.py:19-23,31-36).
#: lat/lon are deliberately **strings**, matching the reference
#: (pl.Utf8 at weather_transform.py:21-22).
WEATHER_BRONZE = T.StructType(
    [
        T.StructField("time", T.TimestampType(), True),
        T.StructField("temperature_2m", T.DoubleType(), True),
        T.StructField("relative_humidity_2m", T.DoubleType(), True),
        T.StructField("lat", T.StringType(), True),
        T.StructField("lon", T.StringType(), True),
        T.StructField("ingested_at", T.TimestampType(), True),
    ]
)

#: Warehouse table — the narrowed 4-column load target
#: (weather_hourly_pipeline.py:92-99,104-106): lat/lon live only in the lake.
WEATHER_WAREHOUSE = T.StructType(
    [
        T.StructField("time", T.TimestampType(), False),
        T.StructField("temperature_2m", T.DoubleType(), True),
        T.StructField("relative_humidity_2m", T.DoubleType(), True),
        T.StructField("ingested_at", T.TimestampType(), True),
    ]
)

#: FX long-format table (FIXTURES.md §4; the reference named but never
#: shipped stg_fx_rates / fx_top10_daily — weather_hourly_pipeline.py:119).
FX_RATES = T.StructType(
    [
        T.StructField("rate_date", T.DateType(), True),
        T.StructField("base_ccy", T.StringType(), True),
        T.StructField("quote_ccy", T.StringType(), True),
        T.StructField("rate", T.DoubleType(), True),
        T.StructField("ingested_at", T.TimestampType(), True),
    ]
)

# ---------------------------------------------------------------------------
# Driver star schema (/root/testdata — TESTDATA.md). Declared so scans can
# assert the contract instead of trusting inference.
# ---------------------------------------------------------------------------

REGION = T.StructType(
    [
        T.StructField("r_regionkey", T.IntegerType(), True),
        T.StructField("r_name", T.StringType(), True),
    ]
)

NATION = T.StructType(
    [
        T.StructField("n_nationkey", T.IntegerType(), True),
        T.StructField("n_name", T.StringType(), True),
        T.StructField("n_regionkey", T.IntegerType(), True),
    ]
)

CUSTOMER = T.StructType(
    [
        T.StructField("c_custkey", T.LongType(), True),
        T.StructField("c_name", T.StringType(), True),
        T.StructField("c_nationkey", T.IntegerType(), True),
        T.StructField("c_acctbal", T.DoubleType(), True),
        T.StructField("c_mktsegment", T.StringType(), True),
    ]
)

SUPPLIER = T.StructType(
    [
        T.StructField("s_suppkey", T.LongType(), True),
        T.StructField("s_name", T.StringType(), True),
        T.StructField("s_nationkey", T.IntegerType(), True),
        T.StructField("s_acctbal", T.DoubleType(), True),
    ]
)

PART = T.StructType(
    [
        T.StructField("p_partkey", T.LongType(), True),
        T.StructField("p_name", T.StringType(), True),
        T.StructField("p_brand", T.StringType(), True),
        T.StructField("p_type", T.StringType(), True),
        T.StructField("p_size", T.IntegerType(), True),
        T.StructField("p_retailprice", T.DoubleType(), True),
    ]
)

ORDERS = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType(), True),
        T.StructField("o_custkey", T.LongType(), True),
        T.StructField("o_orderstatus", T.StringType(), True),
        T.StructField("o_totalprice", T.DoubleType(), True),
        T.StructField("o_orderdate", T.TimestampType(), True),
        T.StructField("o_orderpriority", T.StringType(), True),
    ]
)

LINEITEM = T.StructType(
    [
        T.StructField("l_orderkey", T.LongType(), True),
        T.StructField("l_partkey", T.LongType(), True),
        T.StructField("l_suppkey", T.LongType(), True),
        T.StructField("l_linenumber", T.IntegerType(), True),
        T.StructField("l_quantity", T.DoubleType(), True),
        T.StructField("l_extendedprice", T.DoubleType(), True),
        T.StructField("l_discount", T.DoubleType(), True),
        T.StructField("l_tax", T.DoubleType(), True),
        T.StructField("l_returnflag", T.StringType(), True),
        T.StructField("l_linestatus", T.StringType(), True),
        T.StructField("l_shipdate", T.TimestampType(), True),
    ]
)

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), True),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
        T.StructField("label", T.IntegerType(), True),
    ]
)

#: All star-schema tables by name, for typed scans and view registration.
STAR_SCHEMA: dict[str, T.StructType] = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}

#: Multimodal asset table (SURVEY §2.10 extension): opaque binary payload
#: plus typed metadata. The decode step is stubbed (no codec libs in this
#: environment) but the schema and partitioning are real.
MEDIA_ASSETS = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image | audio | video
        T.StructField("content", T.BinaryType(), True),
        T.StructField("mime_type", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("captured_at", T.TimestampType(), True),
    ]
)
