"""Streaming declared query (SURVEY §2.9 O2, M5).

Structured Streaming is usually excluded from oracle checks, but an
``AvailableNow`` run over a static source is deterministic: it processes
every file exactly once and, in complete output mode, the final memory-
sink table equals the batch aggregation over the same data. That makes
the streaming restatement of the reference's daily mart fully
SQL-oracle-checkable — the stream must converge to the identical
value-hash as the batch mart.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession

from ..functions import davg_sql
from . import query


@query(
    "streaming_daily_mart",
    oracle=f"""
    SELECT CAST(ts AS DATE) AS date_utc,
           {davg_sql('value')} AS avg_value,
           MAX(value)          AS max_value,
           MIN(value)          AS min_value,
           COUNT(*)            AS n_events
    FROM events
    GROUP BY 1
    ORDER BY 1
    """,
)
def streaming_daily_mart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship daily mart computed BY THE STREAMING ENGINE: file
    source → tumbling 1-day event-time windows (watermarked) → memory
    sink, run to completion with ``Trigger.AvailableNow``. Complete
    output mode emits every window at the final trigger, so the result
    equals the batch mart bit-for-bit (decimal avg both sides). At
    scale this is the backfill path: the same streaming job replays a
    lake prefix deterministically, then keeps running incrementally."""
    from ..streaming import events_file_stream, tumbling_daily_mart

    name = "stream_mart_" + uuid.uuid4().hex[:12]
    q = (
        tumbling_daily_mart(events_file_stream(spark, sf_dir))
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError("streaming_daily_mart did not finish within 300s")
    return spark.table(name).orderBy("date_utc")
