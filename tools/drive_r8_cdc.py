"""Drive the round-8 write-side CDF surface end to end: enable CDF,
run a merge / keyed replaceWhere / keyed restore lifecycle, show cdc
actions land under _delta_log + _change_data, and read the changes
three ways — batch read_delta_cdf (keyless, cdc-preferred), the
delta_feed readChangeFeed stream (arrow cdc path), and the independent
spec-only external reader — all pinned to the same rows."""
import os
import shutil
import tempfile

from pyspark.sql import functions as F

from portfolio_data_pipelines_spark.operators.delta_log import (
    enable_change_data_feed,
    merge_delta,
    read_delta,
    read_delta_cdf,
    restore_delta,
    write_delta,
)
from portfolio_data_pipelines_spark.operators.delta_reader import (
    read_delta_changes_external,
)
from portfolio_data_pipelines_spark.session import get_spark
from portfolio_data_pipelines_spark.sources.delta_feed import (
    DeltaChangeFeedDataSource,
)

spark = get_spark(
    master="local[4]",
    extra_conf={"spark.ui.enabled": "false",
                "spark.sql.shuffle.partitions": "4"},
)
spark.dataSource.register(DeltaChangeFeedDataSource)
base = tempfile.mkdtemp(prefix="drive_r8_cdc_")
path = os.path.join(base, "events")

import datetime
d = datetime.date.fromisoformat
df0 = spark.createDataFrame(
    [(i, float(i), d("2024-01-01") if i < 5 else d("2024-01-02"))
     for i in range(1, 9)],
    "id bigint, v double, date date",
)
write_delta(spark, df0, path, partition_col="date")
enable_change_data_feed(spark, path)
merge_delta(
    spark, path,
    spark.createDataFrame(
        [(1, 100.0, d("2024-01-01")), (9, 9.0, d("2024-01-03"))],
        "id bigint, v double, date date"),
    ["id"],
)
v_mid = write_delta(
    spark,
    spark.createDataFrame(
        [(2, 222.0, d("2024-01-01"))], "id bigint, v double, date date"),
    path, partition_col="date", mode="overwrite",
    replace_partitions=["2024-01-01"], cdf_key_cols=["id"],
)
restore_delta(spark, path, v_mid - 1, cdf_key_cols=["id"])

log_dir = os.path.join(path, "_delta_log")
cdc_commits = [f for f in sorted(os.listdir(log_dir))
               if f.endswith(".json") and '"cdc"' in open(os.path.join(log_dir, f)).read()]
print("commits with cdc actions:", cdc_commits)
print("_change_data files:",
      sorted(f for f in os.listdir(os.path.join(path, "_change_data"))
             if f.endswith(".parquet")))

batch = read_delta_cdf(spark, path, -1)  # keyless: cdc + derivation only
batch.orderBy("_commit_version", "id", "_change_type").show(50, truncate=False)
key = lambda r: (r["id"], r["v"], str(r["date"]), r["_change_type"],
                 r["_commit_version"])
b_rows = sorted(map(key, batch.collect()))

out, ckpt = os.path.join(base, "out"), os.path.join(base, "ckpt")
q = (spark.readStream.format("delta_feed")
     .option("path", path).option("readChangeFeed", "true").load()
     .writeStream.format("parquet").option("path", out)
     .option("checkpointLocation", ckpt)
     .trigger(availableNow=True).start())
q.awaitTermination(300)
s_rows = sorted(map(key, spark.read.parquet(out).collect()))
print("stream == batch:", s_rows == b_rows, f"({len(s_rows)} rows)")

names, ext = read_delta_changes_external(path, -1)
e_rows = sorted(
    (int(r[0]), float(r[1]), str(r[2]), r[3], int(r[4])) for r in ext
)
print("external == batch:", e_rows == b_rows, f"({len(e_rows)} rows)")
print("final table:")
read_delta(spark, path).orderBy("id").show()
spark.stop()
shutil.rmtree(base)
