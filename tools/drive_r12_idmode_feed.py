import sys, json, shutil, os
sys.path.insert(0, "/root/repo")
import pyarrow as pa
import pyarrow.parquet as pq
from portfolio_data_pipelines_spark.session import get_spark
from portfolio_data_pipelines_spark.operators.delta_log import (
    write_delta, merge_delta)
from portfolio_data_pipelines_spark.sources.delta_feed import (
    DeltaChangeFeedDataSource)

spark = get_spark(master="local[4]", extra_conf={
    "spark.ui.enabled": "false", "spark.sql.shuffle.partitions": "4"})
spark.dataSource.register(DeltaChangeFeedDataSource)
root = "/tmp/r12_idmode_feed"
shutil.rmtree(root, ignore_errors=True)
os.makedirs(f"{root}/_delta_log")
def fld(n, t, i):
    return pa.field(n, t, metadata={b"PARQUET:field_id": str(i).encode()})
pq.write_table(
    pa.table([pa.array([1, 2], pa.int64()), pa.array(["a", "b"])],
             schema=pa.schema([fld("ice_id", pa.int64(), 1),
                               fld("ice_s", pa.string(), 2)])),
    f"{root}/f1.parquet")
ss = json.dumps({"type": "struct", "fields": [
    {"name": "id", "type": "long", "nullable": True,
     "metadata": {"delta.columnMapping.id": 1,
                  "delta.columnMapping.physicalName": "ice_id"}},
    {"name": "s", "type": "string", "nullable": True,
     "metadata": {"delta.columnMapping.id": 2,
                  "delta.columnMapping.physicalName": "ice_s"}},
]})
with open(f"{root}/_delta_log/{0:020d}.json", "w") as f:
    for a in [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["columnMapping"],
                      "writerFeatures": ["columnMapping", "changeDataFeed"]}},
        {"metaData": {"id": "idfeed",
                      "format": {"provider": "parquet", "options": {}},
                      "schemaString": ss, "partitionColumns": [],
                      "configuration": {
                          "delta.columnMapping.mode": "id",
                          "delta.columnMapping.maxColumnId": "2",
                          "delta.enableChangeDataFeed": "true"},
                      "createdTime": 0}},
        {"add": {"path": "f1.parquet", "partitionValues": {},
                 "size": 1, "modificationTime": 0, "dataChange": True}},
    ]:
        f.write(json.dumps(a) + "\n")
# our own commits on top: an append and a merge
write_delta(spark, spark.createDataFrame([(3, "c")], "id long, s string"),
            root, mode="append")
merge_delta(spark, root,
            spark.createDataFrame([(2, "B"), (4, "d")], "id long, s string"),
            key_cols=["id"])

print("-- plain feed (startingVersion=-1, availableNow)")
q = (spark.readStream.format("delta_feed").option("path", root)
     .option("ignorechanges", "true")
     .load().writeStream.format("memory").queryName("idfeed")
     .trigger(availableNow=True).start())
q.awaitTermination(120)
rows = {(r["id"], r["s"], r["_commit_version"])
        for r in spark.sql("select * from idfeed").collect()}
print(sorted(rows))
assert (1, "a", 0) in rows and (2, "b", 0) in rows
assert (3, "c", 1) in rows
assert (2, "B", 2) in rows and (4, "d", 2) in rows
print("plain feed ok")

print("-- CDF feed")
q2 = (spark.readStream.format("delta_feed").option("path", root)
      .option("readChangeFeed", "true").option("keyCols", "id")
      .load().writeStream.format("memory").queryName("idcdf")
      .trigger(availableNow=True).start())
q2.awaitTermination(120)
ch = {(r["id"], r["s"], r["_change_type"], r["_commit_version"])
      for r in spark.sql("select * from idcdf").collect()}
print(sorted(ch))
assert (3, "c", "insert", 1) in ch
assert (2, "b", "update_preimage", 2) in ch
assert (2, "B", "update_postimage", 2) in ch
assert (4, "d", "insert", 2) in ch
print("cdf feed ok")
print("ALL ID-MODE FEED CHECKS PASSED")
