"""Lakehouse-path queries under the ORACLE harness (SURVEY §2.2/K4).

The Delta log's write → skip-read path was previously verified only by
its own test suite; this registers it with the same DuckDB value-hash
gate every relational operator faces: the query lands the events table
in a Delta table (partitioned, stats-bearing), reads it back through
file-level data skipping, and aggregates — any wire-format, partition-
restore, stats, or pruning bug surfaces as a hash mismatch against
plain SQL over the original parquet.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import dsum, dsum_sql
from ..sources.parquet import scan_table
from . import extra_query

#: Fixed window inside the generator's 2024-01-01..30 span, so the
#: oracle literal is scale-independent.
_LO, _HI = "2024-01-10", "2024-01-14"


@extra_query(
    "delta_skip_daily_mart",
    oracle=f"""
    SELECT CAST(ts AS DATE) AS date_utc,
           COUNT(*) AS n_events,
           {dsum_sql('value')} AS total_value
    FROM events
    WHERE CAST(ts AS DATE) BETWEEN '{_LO}' AND '{_HI}'
    GROUP BY CAST(ts AS DATE)
    ORDER BY date_utc
    """,
)
def delta_skip_daily_mart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily mart over a 5-day window, computed THROUGH the lakehouse:
    events → Delta table (date-partitioned, per-file stats) → skip-read
    (``predicate`` prunes non-window files from the log alone) → exact
    filter → aggregate. The oracle never sees the Delta table, so the
    hash match certifies the whole write/read/skip path end to end.

    The rewrite-per-call is the fixture shape; production writes once
    and serves every reader. Scale: the skip-read plans O(window days)
    files regardless of table history — the property the declared
    lifecycle tests pin via inputFiles counts."""
    from ..operators.delta_log import read_delta, write_delta

    # PID-keyed fixture root: two concurrent runs against the same scale
    # factor (e.g. bench and pytest on one host) must not share a table —
    # one process deleting/rewriting while the other is mid-read produced
    # spurious failures (r6 ADVICE). Within one process calls are
    # sequential, so rmtree-then-rewrite is safe.
    table = os.path.join(
        "/tmp", "pdp_delta_q", f"pid{os.getpid()}",
        os.path.basename(os.path.normpath(sf_dir)), "events"
    )
    shutil.rmtree(table, ignore_errors=True)
    events = scan_table(spark, sf_dir, "events").select(
        F.to_date("ts").cast("string").alias("date"), "value"
    )
    write_delta(spark, events, table, partition_col="date")
    pruned = read_delta(spark, table, predicate={"date": (_LO, _HI)})
    return (
        pruned.filter(F.col("date").between(_LO, _HI))
        .groupBy(F.col("date").cast("date").alias("date_utc"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("total_value"),
        )
        .orderBy("date_utc")
    )
