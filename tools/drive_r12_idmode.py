import sys, json, shutil, os

sys.path.insert(0, "/root/repo")
import pyarrow as pa
import pyarrow.parquet as pq
from portfolio_data_pipelines_spark.session import get_spark
from portfolio_data_pipelines_spark.operators.delta_log import (
    write_delta, read_delta, merge_delta, optimize_delta, read_delta_cdf,
    delete_where, update_where,
)
from portfolio_data_pipelines_spark.operators.delta_reader import (
    read_delta_external,
)

spark = get_spark(master="local[4]", extra_conf={
    "spark.ui.enabled": "false", "spark.sql.shuffle.partitions": "4"})

root = "/tmp/r12_idmode"
shutil.rmtree(root, ignore_errors=True)
os.makedirs(f"{root}/_delta_log")


def fld(name, typ, fid):
    return pa.field(name, typ,
                    metadata={b"PARQUET:field_id": str(fid).encode()})


# foreign Iceberg-converted table: arbitrary physical names, ids 1..3
pq.write_table(
    pa.table([pa.array([1, 2], pa.int64()), pa.array(["a", "b"])],
             schema=pa.schema([fld("ice_id", pa.int64(), 1),
                               fld("ice_s", pa.string(), 2)])),
    f"{root}/f1.parquet")
schema_string = json.dumps({"type": "struct", "fields": [
    {"name": "id", "type": "long", "nullable": True,
     "metadata": {"delta.columnMapping.id": 1,
                  "delta.columnMapping.physicalName": "ice_id"}},
    {"name": "s", "type": "string", "nullable": True,
     "metadata": {"delta.columnMapping.id": 2,
                  "delta.columnMapping.physicalName": "ice_s"}},
    {"name": "part", "type": "string", "nullable": True,
     "metadata": {"delta.columnMapping.id": 3,
                  "delta.columnMapping.physicalName": "ice_part"}},
]})
with open(f"{root}/_delta_log/{0:020d}.json", "w") as f:
    for a in [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {"metaData": {"id": "idmode",
                      "format": {"provider": "parquet", "options": {}},
                      "schemaString": schema_string,
                      "partitionColumns": ["part"],
                      "configuration": {
                          "delta.columnMapping.mode": "id",
                          "delta.columnMapping.maxColumnId": "3"},
                      "createdTime": 0}},
        {"add": {"path": "f1.parquet",
                 "partitionValues": {"ice_part": "p0"},
                 "size": 1, "modificationTime": 0, "dataChange": True}},
    ]:
        f.write(json.dumps(a) + "\n")

print("-- plain read (foreign file, grouped path)")
df = read_delta(spark, root)
assert df.columns == ["id", "s", "part"]
assert {tuple(r) for r in df.collect()} == {(1, "a", "p0"), (2, "b", "p0")}
print("read ok")

print("-- APPEND (the new write path)")
write_delta(spark,
            spark.createDataFrame([(3, "c", "p1")],
                                  "id long, s string, part string"),
            root, mode="append", partition_col=["part"])
got = {tuple(r) for r in read_delta(spark, root).collect()}
assert got == {(1, "a", "p0"), (2, "b", "p0"), (3, "c", "p1")}, got
# the staged file must carry field ids + physical names
import glob
newf = [p for p in glob.glob(f"{root}/**/*.parquet", recursive=True)
        if "f1" not in p and "_delta_log" not in p and "_change_data" not in p]
sch = pq.read_schema(newf[0])
ids = {f.name: (f.metadata or {}).get(b"PARQUET:field_id") for f in sch}
print("staged schema:", sch.names, ids)
assert ids.get("ice_id") == b"1" and ids.get("ice_s") == b"2", ids
print("append stamps physical names + field ids OK")

print("-- external reader parity")
names, rows = read_delta_external(root)
assert names == ["id", "s", "part"]
assert set(rows) == got, rows

print("-- MERGE")
merge_delta(spark, root,
            spark.createDataFrame([(2, "B", "p0"), (4, "d", "p1")],
                                  "id long, s string, part string"),
            key_cols=["id"])
got = {tuple(r) for r in read_delta(spark, root).collect()}
assert got == {(1, "a", "p0"), (2, "B", "p0"), (3, "c", "p1"),
               (4, "d", "p1")}, got
names, rows = read_delta_external(root)
assert set(rows) == got
print("merge ok (both readers)")

print("-- UPDATE / DELETE")
update_where(spark, root, "id = 1", {"s": "'A'"})
delete_where(spark, root, "id = 4")
got = {tuple(r) for r in read_delta(spark, root).collect()}
assert got == {(1, "A", "p0"), (2, "B", "p0"), (3, "c", "p1")}, got
print("update/delete ok")

print("-- OPTIMIZE")
optimize_delta(spark, root)
got2 = {tuple(r) for r in read_delta(spark, root).collect()}
assert got2 == got
names, rows = read_delta_external(root)
assert set(rows) == got
print("optimize ok (both readers)")

print("-- time travel to v0 (foreign file still id-resolves)")
got0 = {tuple(r) for r in read_delta(spark, root, version=0).collect()}
assert got0 == {(1, "a", "p0"), (2, "b", "p0")}, got0
print("time travel ok")
print("ALL ID-MODE LIFECYCLE CHECKS PASSED")
