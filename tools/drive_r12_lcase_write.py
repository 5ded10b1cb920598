import sys, json, shutil, os
sys.path.insert(0, "/root/repo")
import pyarrow as pa, pyarrow.parquet as pq
from portfolio_data_pipelines_spark.session import get_spark
from portfolio_data_pipelines_spark.operators.delta_log import (
    write_delta, read_delta, merge_delta, update_where, delete_where,
    apply_changes_delta)
from portfolio_data_pipelines_spark.operators.delta_reader import (
    read_delta_external)
from pyspark.sql import functions as F

spark = get_spark(master="local[4]", extra_conf={
    "spark.ui.enabled": "false", "spark.sql.shuffle.partitions": "4"})
root = "/tmp/r12_lcase_write"; shutil.rmtree(root, ignore_errors=True)
os.makedirs(f"{root}/_delta_log")
pq.write_table(pa.table({"id": pa.array([1, 2], pa.int64()),
                         "s": pa.array(["Foo", "BAR"]),
                         "v": pa.array([1.0, 2.0])}), f"{root}/p0.parquet")
ss = json.dumps({"type": "struct", "fields": [
  {"name": "id", "type": "long", "nullable": True, "metadata": {}},
  {"name": "s", "type": "string", "nullable": True,
   "metadata": {"__COLLATIONS": {"s": "spark.UTF8_LCASE"}}},
  {"name": "v", "type": "double", "nullable": True, "metadata": {}}]})
with open(f"{root}/_delta_log/{0:020d}.json", "w") as f:
    for a in [{"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                            "readerFeatures": ["collations-preview"],
                            "writerFeatures": ["collations-preview"]}},
              {"metaData": {"id": "lcw",
                            "format": {"provider": "parquet", "options": {}},
                            "schemaString": ss, "partitionColumns": [],
                            "configuration": {}, "createdTime": 0}},
              {"add": {"path": "p0.parquet", "partitionValues": {},
                       "size": 1, "modificationTime": 0,
                       "dataChange": True}}]:
        f.write(json.dumps(a) + "\n")

write_delta(spark, spark.createDataFrame([(3, "baz", 3.0)],
            "id long, s string, v double"), root, mode="append")
got = sorted(tuple(r) for r in read_delta(spark, root).collect())
assert got == [(1, "Foo", 1.0), (2, "BAR", 2.0), (3, "baz", 3.0)], got
print("append ok")

# merge ON the collated key: 'FOO' must match stored 'Foo' (fold)
merge_delta(spark, root,
            spark.createDataFrame([("FOO", 10.0, 9), ("new", 4.0, 4)],
                                  "s string, v double, id long"),
            key_cols=["s"])
got = {r["s"]: (r["id"], r["v"]) for r in read_delta(spark, root).collect()}
assert got == {"FOO": (9, 10.0), "BAR": (2, 2.0), "baz": (3, 3.0),
               "new": (4, 4.0)}, got
print("merge folds keys ok:", got)

# update/delete with folded predicates
update_where(spark, root, "s = 'BAZ'", {"v": "99.0"})
delete_where(spark, root, "s = 'bar'")
got = {r["s"]: r["v"] for r in read_delta(spark, root).collect()}
assert got == {"FOO": 10.0, "baz": 99.0, "new": 4.0}, got
print("update/delete fold ok:", got)

# external reader still reads the raw rows
names, rows = read_delta_external(root)
assert {r[1] for r in rows} == {"FOO", "baz", "new"}
print("external parity ok")

# apply_changes over the collated key
ch = (spark.createDataFrame([(5, "NEW", 7.5)], "id long, s string, v double")
      .withColumn("_change_type", F.lit("insert"))
      .withColumn("_commit_version", F.lit(1).cast("long")))
apply_changes_delta(spark, root, ch, key_cols=["s"])
got = {r["s"]: r["v"] for r in read_delta(spark, root).collect()}
# 'NEW' folds onto the existing 'new' key -> upsert replaced it
assert got == {"FOO": 10.0, "baz": 99.0, "NEW": 7.5}, got
print("apply_changes fold ok:", got)
print("ALL LCASE-WRITE CHECKS PASSED")
