"""Medallion writers (SURVEY §2.2 K1-K4, §7 M3).

The reference's sink contract, restated Spark-native:

- **Bronze (lake)**: zstd Parquet under Hive-style ``date=YYYY-MM-DD``
  partitions (``weather_hourly_pipeline.py:70-79``). Spark writes the
  partitioned layout directly — no per-file boto3 uploads.
- **Idempotent day-level upsert (K4)**: the reference deletes the day then
  re-inserts inside one transaction (``weather_hourly_pipeline.py:101-112``).
  Spark-native equivalent: *dynamic partition overwrite* — an
  ``INSERT OVERWRITE`` that replaces only the partitions present in the
  incoming batch. Running the same batch twice yields the same rows
  (idempotency test in tests/test_medallion.py).

Atomicity note (SURVEY §4 "hard parts" #1): dynamic partition overwrite on
plain Parquet is last-writer-wins per partition, not transactional across
partitions — readers can observe a partially-rewritten multi-day batch. The
reference has the same exposure (its DELETE+INSERT is transactional only
because one Postgres txn spans the whole batch). A table format with
commit atomicity (Delta/Iceberg — the reference's own roadmap,
``README.md:204,209``) closes the gap; the writer below works unchanged on
those via ``saveAsTable``/``replaceWhere``.

Scale notes:
- Partition column = ``to_date(time)`` → one directory per day; at 100 TB
  (~years of data × many locations) add a second partition level (e.g.
  location bucket) before any single day exceeds a few GB.
- ``repartition(partition_cols)`` before write: groups each output
  partition's rows into one task → one file per partition per batch, the
  same layout the reference produces, and avoids the many-small-files
  failure mode of a 32-way-parallel write of a tiny batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_bronze(
    df: DataFrame,
    path: str,
    partition_col: str = "date",
    derive_from: str = "time",
    coalesce_files: bool = True,
) -> None:
    """Write a batch to the bronze lake, Hive-partitioned by date.

    Derives ``partition_col`` from ``derive_from`` when absent (the
    reference computes ``date`` from ``time`` at
    ``weather_hourly_pipeline.py:67``). Uses dynamic partition overwrite:
    re-running a batch replaces exactly its own days.
    """
    if partition_col not in df.columns:
        df = df.withColumn(partition_col, F.to_date(F.col(derive_from)))
    if coalesce_files:
        # One task per output day ⇒ one file per day per batch. For large
        # batches drop coalesce_files and let AQE size the tasks.
        df = df.repartition(partition_col)
    (
        df.write.mode("overwrite")
        .option("compression", "zstd")
        .partitionBy(partition_col)
        .parquet(path)
    )


def write_partition_overwrite(
    df: DataFrame,
    table: str,
    partition_col: str = "date",
    derive_from: str = "time",
) -> None:
    """Idempotent day-level upsert into a catalog table (K4 parity).

    ``INSERT OVERWRITE`` with ``partitionOverwriteMode=dynamic`` (set in
    the session factory) replaces only the partitions present in ``df`` —
    the declarative form of the reference's ``DELETE WHERE time::date = %s``
    + ``executemany INSERT``.
    """
    spark = df.sparkSession
    if partition_col not in df.columns:
        df = df.withColumn(partition_col, F.to_date(F.col(derive_from)))
    if not spark.catalog.tableExists(table):
        (
            df.repartition(partition_col)
            .write.partitionBy(partition_col)
            .format("parquet")
            .saveAsTable(table)
        )
        return
    # insertInto is positional: align to the table's column order (the
    # partition column sits last in a saveAsTable-created schema).
    aligned = df.select(*spark.table(table).columns)
    (
        aligned.repartition(partition_col)
        .write.mode("overwrite")
        .insertInto(table)
    )
