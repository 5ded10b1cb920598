"""Drive round-9 deletion vectors end to end from the public surface:
a foreign v3 DV table read by read_delta + read_delta_external, plan
shape of the DV anti-join, and the feature-granular protocol gate.
Run from /tmp with PYTHONPATH=/root/repo."""
import json, os, shutil, sys, tempfile

sys.path.insert(0, "/root/repo")
from portfolio_data_pipelines_spark.session import get_spark
from portfolio_data_pipelines_spark.operators import deletion_vectors as dvc
from portfolio_data_pipelines_spark.operators.delta_log import read_delta
from portfolio_data_pipelines_spark.operators.delta_reader import read_delta_external

spark = get_spark(master="local[4]", extra_conf={
    "spark.ui.enabled": "false", "spark.sql.shuffle.partitions": "4"})
base = tempfile.mkdtemp()
root = os.path.join(base, "t_dv"); os.makedirs(root)
stage = os.path.join(base, "stage")
spark.createDataFrame([(i, f"s{i}") for i in range(1, 10001)],
                      "id bigint, s string").coalesce(1).orderBy("id")\
    .write.mode("overwrite").parquet(stage)
part = next(f for f in os.listdir(stage) if f.endswith(".parquet"))
shutil.copy(os.path.join(stage, part), os.path.join(root, "f.parquet"))
# delete every even position (ids 1,3,5,... survive: position i holds id i+1)
dead = list(range(1, 10000, 2))
data = dvc.serialize_roaring64(dead)
blob, [(off, size)] = dvc.frame_dv_blob([data])
poi, rel = dvc.new_dv_file_name()
with open(os.path.join(root, rel), "wb") as f:
    f.write(blob)
desc = {"storageType": "u", "pathOrInlineDv": poi, "offset": off,
        "sizeInBytes": size, "cardinality": len(dead)}
schema_string = spark.createDataFrame([], "id bigint, s string").schema.json()
actions = [
    {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                  "readerFeatures": ["deletionVectors"],
                  "writerFeatures": ["deletionVectors"]}},
    {"metaData": {"id": "t", "format": {"provider": "parquet", "options": {}},
                  "schemaString": schema_string, "partitionColumns": [],
                  "configuration": {}, "createdTime": 0}},
    {"add": {"path": "f.parquet", "partitionValues": {}, "size": 1,
             "modificationTime": 0, "dataChange": True,
             "deletionVector": desc}},
]
os.makedirs(os.path.join(root, "_delta_log"))
with open(os.path.join(root, "_delta_log", f"{0:020d}.json"), "w") as f:
    f.write("\n".join(json.dumps(a) for a in actions))

df = read_delta(spark, root)
n = df.count()
odd = df.filter("id % 2 = 0").count()
assert n == 5000 and odd == 0, (n, odd)
names, rows = read_delta_external(root)
assert len(rows) == 5000 and all(r[0] % 2 == 1 for r in rows)
plan = df._jdf.queryExecution().executedPlan().toString()
assert "LeftAnti" in plan, plan[:500]
print("plan uses", "BroadcastHashJoin LeftAnti" if "BroadcastHashJoin" in plan
      else "shuffle LeftAnti")
print("OK: 10k-row file, 5k DV'd rows dropped identically by both readers")

# --- writer-side drive: delete_where_dv lifecycle on a fresh table ---
from pyspark.sql import functions as F
from portfolio_data_pipelines_spark.operators.delta_log import (
    write_delta, delete_where_dv, enable_change_data_feed, read_delta_cdf,
    optimize_delta, vacuum_delta)
from portfolio_data_pipelines_spark.operators.delta_reader import (
    read_delta_changes_external)

t = os.path.join(base, "t_writer")
write_delta(spark, spark.range(1, 1001).select(
    F.col("id"), (F.col("id") % 10).alias("bucket"), (F.col("id") * 2).alias("val")),
    t, partition_col="bucket")
enable_change_data_feed(spark, t)
v = delete_where_dv(spark, t, "id % 7 = 0")
live = read_delta(spark, t).count()
assert live == 1000 - len(range(7, 1001, 7)), live
names, rows = read_delta_external(t)
assert len(rows) == live
ch = read_delta_cdf(spark, t, from_version=v - 1).collect()
assert len(ch) == 1000 - live and all(r["_change_type"] == "delete" for r in ch)
names2, rows2 = read_delta_changes_external(t, from_version=v - 1)
assert len(rows2) == len(ch)
vopt = optimize_delta(spark, t)
assert read_delta(spark, t).count() == live
names3, rows3 = read_delta_external(t)
assert len(rows3) == live
vacuum_delta(spark, t, retain_hours=168, now_ms=10**18)
assert read_delta(spark, t).count() == live
print("OK writer: dv-delete %d rows, CDF parity, optimize+vacuum clean" % len(ch))

# --- streaming feed drive: plain feed over the DV'd writer table ---
from portfolio_data_pipelines_spark.sources.delta_feed import DeltaChangeFeedDataSource
spark.dataSource.register(DeltaChangeFeedDataSource)
tf = os.path.join(base, "t_feed")
write_delta(spark, spark.range(1, 101).select(
    F.col("id"), (F.col("id") % 3).alias("bucket"), (F.col("id") * 2).alias("val")),
    tf, partition_col="bucket")
delete_where_dv(spark, tf, "id % 4 = 0")
out = os.path.join(base, "feed_out"); ckpt = os.path.join(base, "feed_ckpt")
# r10 made the plain feed refuse change commits, and a DV delete IS a
# change commit (dataChange remove + DV re-add of the same path), so
# the documented ignorechanges opt-in is required; duplicates of
# surviving rows are accepted — the drive's point is exactly that the
# DV'd rows are never emitted
q = (spark.readStream.format("delta_feed").option("path", tf)
     .option("ignorechanges", "true").load()
     .writeStream.format("parquet").option("path", out)
     .option("checkpointLocation", ckpt).trigger(availableNow=True).start())
q.awaitTermination(300)
feed_rows = spark.read.parquet(out)
# the DV-delete commit re-streamed only live rows; no id divisible by 7
# appears at or after that commit
bad = feed_rows.filter("_commit_version >= 1 and id % 4 = 0").count()
assert bad == 0, bad
print("OK feed: plain stream over DV'd table emits no deleted rows")
