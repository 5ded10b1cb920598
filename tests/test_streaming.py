"""Structured Streaming surface vs batch equivalents (SURVEY M5/O2).

Every streaming aggregation is checked against the same computation done
in batch over the same fixture — the stream (AvailableNow, memory sink)
must converge to exactly the batch answer.
"""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from portfolio_data_pipelines_spark.functions import davg
from portfolio_data_pipelines_spark.sources.parquet import scan_table
from portfolio_data_pipelines_spark.streaming import (
    events_file_stream,
    running_user_totals,
    stream_to_bronze,
    tumbling_daily_mart,
    user_session_windows,
)

SF = "/root/testdata/sf0.001"


def _run_to_memory(stream_df, mode: str):
    name = "t" + uuid.uuid4().hex[:12]
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return name


def _rows(spark, name):
    return sorted(tuple(map(str, r)) for r in spark.table(name).collect())


def test_stream_schema_matches_batch(spark):
    stream = events_file_stream(spark, SF)
    assert stream.isStreaming
    assert stream.schema == scan_table(spark, SF, "events").schema


def test_tumbling_daily_mart_equals_batch(spark):
    name = _run_to_memory(tumbling_daily_mart(events_file_stream(spark, SF)), "complete")
    batch = (
        scan_table(spark, SF, "events")
        .groupBy(F.to_date("ts").alias("date_utc"))
        .agg(
            davg("value").alias("avg_value"),
            F.max("value").alias("max_value"),
            F.min("value").alias("min_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    assert _rows(spark, name) == sorted(tuple(map(str, r)) for r in batch.collect())


def test_session_windows_equal_batch_session_window(spark):
    name = _run_to_memory(user_session_windows(events_file_stream(spark, SF)), "complete")
    batch = (
        scan_table(spark, SF, "events")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
        .select("user_id", F.col("w.start").alias("session_start"),
                F.col("w.end").alias("session_end"), "n_events", "total_value")
    )
    assert _rows(spark, name) == sorted(tuple(map(str, r)) for r in batch.collect())


def test_running_user_totals_equal_batch_groupby(spark):
    name = _run_to_memory(running_user_totals(events_file_stream(spark, SF)), "update")
    # Single AvailableNow pass ⇒ the last update per user is the total.
    got = {
        r["user_id"]: (r["n_events"], round(r["total_value"], 6))
        for r in spark.table(name).collect()
    }
    batch = {
        r["user_id"]: (r["n"], round(r["tv"], 6))
        for r in scan_table(spark, SF, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("tv"))
        .collect()
    }
    assert got == batch


def test_running_totals_last_ts_is_user_max(spark):
    name = _run_to_memory(running_user_totals(events_file_stream(spark, SF)), "update")
    got = {r["user_id"]: r["last_ts"] for r in spark.table(name).collect()}
    batch = {
        r["user_id"]: r["m"]
        for r in scan_table(spark, SF, "events").groupBy("user_id").agg(F.max("ts").alias("m")).collect()
    }
    assert got == batch


def test_stream_to_bronze_is_idempotent(spark, tmp_path):
    out = str(tmp_path / "bronze")
    for i in range(2):  # second run replays from a fresh checkpoint
        q = stream_to_bronze(
            events_file_stream(spark, SF), out, str(tmp_path / f"ckpt{i}")
        )
        q.awaitTermination(300)
    written = spark.read.parquet(out)
    src = scan_table(spark, SF, "events")
    assert written.count() == src.count()  # replay overwrote, not appended
    assert set(written.columns) == set(src.columns) | {"date"}


def test_dedup_stream_drops_replayed_duplicates(spark, tmp_path):
    """A replayed (duplicated) source file must contribute no extra rows:
    the streamed dedup output equals the batch-distinct answer."""
    from portfolio_data_pipelines_spark.streaming import dedup_stream

    src = str(tmp_path / "landing")
    batch = scan_table(spark, SF, "events")
    # Landing files carry ts as epoch-nanos long like the source fixture
    # (events_file_stream declares that read schema and converts).
    # Simulate at-least-once delivery: the same batch lands twice.
    batch.withColumn("ts", F.expr("unix_micros(ts) * 1000")).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    import glob
    import shutil

    f = glob.glob(f"{src}/part-*.parquet")[0]
    shutil.copy(f, f.replace("part-", "events-replay-part-"))
    import os

    os.rename(f, f.replace("part-", "events-part-"))

    stream = events_file_stream(spark, src)
    name = _run_to_memory(dedup_stream(stream, key_cols=["event_id"]), "append")
    got = spark.table(name)
    assert got.count() == batch.count()  # each event exactly once
    assert got.select("event_id").distinct().count() == batch.count()
