"""Bucketed-table operators: pre-shuffled, co-located joins (SCALE.md).

A 100 TB fact-to-fact equi-join (orders × lineitem) cannot broadcast
either side; a sort-merge join shuffles both — twice the data over the
network every query. **Bucketing** pays that shuffle once at write time:
both tables are written ``bucketBy(N, key)``, and every subsequent join
or aggregation on the key reads co-located buckets with NO exchange.

This is the Spark-native equivalent of the co-partitioning the reference
delegates to Postgres (its roadmap asks for warehouse partitioning,
README.md:207); on a lakehouse it is the difference between a per-query
shuffle of the big tables and none.

Bucket-count choice: fixed at write time, so size it for the target
scale — ``table_bytes / bucket_count ≲ 1 GB`` per bucket file per
partition; both join sides must use the SAME count (or a multiple) for
the exchange-free plan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: str | Sequence[str],
    n_buckets: int = 8,
    sort_cols: str | Sequence[str] | None = None,
) -> None:
    """Save ``df`` as a bucketed (and optionally sorted) managed table.

    Sorting within buckets additionally removes the per-query sort from
    sort-merge joins — the stored layout satisfies the join's ordering
    requirement outright.
    """
    spark = df.sparkSession
    # Idempotent across session restarts: DROP removes a cataloged
    # table's managed location, but a location orphaned by a previous
    # session (whose in-memory catalog died with it) would still make
    # saveAsTable fail with LOCATION_ALREADY_EXISTS — clear it too.
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    if "." in table:
        db, name = table.split(".", 1)
        base = spark.catalog.getDatabase(db).locationUri
    else:
        name = table
        base = spark.conf.get("spark.sql.warehouse.dir")
    jvm = spark._jvm
    loc = jvm.org.apache.hadoop.fs.Path(f"{base}/{name.lower()}")
    fs = loc.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(loc):
        fs.delete(loc, True)
    cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    writer = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, *cols)
    if sort_cols is not None:
        s = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        writer = writer.sortBy(*s)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str | Sequence[str], how: str = "inner"
) -> DataFrame:
    """Join two bucketed tables on their bucket key.

    When both tables were written with compatible bucket counts on the
    join key, Catalyst plans a sort-merge join with ZERO shuffle
    Exchange nodes — verify with ``.explain()``; the test asserts it.

    The ``merge`` hint pins the sort-merge strategy: bucketing exists
    for fact-to-fact joins where neither side broadcasts, but on small
    test data the planner would otherwise pick a broadcast join (which
    disables bucketed reading entirely).
    """
    keys = [on] if isinstance(on, str) else list(on)
    return (
        spark.table(left_table)
        .hint("merge")
        .join(spark.table(right_table).hint("merge"), keys, how)
    )
