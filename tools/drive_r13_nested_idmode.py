"""Drive nested id-mode column mapping end to end (r13): foreign
fixture with arbitrary names at BOTH levels -> read_delta /
read_delta_external / append / MERGE / CDF, field-id stamps pinned.
Run from /tmp with PYTHONPATH=/root/repo."""
import sys, json, glob, shutil, os
sys.path.insert(0, "/root/repo")  # run from /tmp with PYTHONPATH=/root/repo
import pyarrow as pa
import pyarrow.parquet as pq
from portfolio_data_pipelines_spark.session import get_spark
from portfolio_data_pipelines_spark.operators.delta_log import (
    read_delta, write_delta, merge_delta, read_delta_cdf)
from portfolio_data_pipelines_spark.operators.delta_reader import read_delta_external

root = "/tmp/nested_idmode_t"
shutil.rmtree(root, ignore_errors=True)
os.makedirs(f"{root}/_delta_log")

def fld(name, typ, fid):
    return pa.field(name, typ, metadata={b"PARQUET:field_id": str(fid).encode()})

inner = pa.struct([fld("w_name", pa.string(), 3), fld("w_age", pa.int64(), 4)])
tbl = pa.table(
    [pa.array([1, 2], pa.int64()),
     pa.array([{"w_name": "bob", "w_age": 30}, {"w_name": "eve", "w_age": 25}], type=inner),
     pa.array([[1, 2], [3]], type=pa.list_(pa.int64()))],
    schema=pa.schema([fld("w_id", pa.int64(), 1), fld("w_info", inner, 2),
                      fld("w_tags", pa.list_(pa.int64()), 5)]))
pq.write_table(tbl, f"{root}/f1.parquet")

fields = [
    {"name": "id", "type": "long", "nullable": True,
     "metadata": {"delta.columnMapping.id": 1, "delta.columnMapping.physicalName": "ice_id"}},
    {"name": "info", "nullable": True,
     "type": {"type": "struct", "fields": [
         {"name": "name", "type": "string", "nullable": True,
          "metadata": {"delta.columnMapping.id": 3, "delta.columnMapping.physicalName": "ice_name"}},
         {"name": "age", "type": "long", "nullable": True,
          "metadata": {"delta.columnMapping.id": 4, "delta.columnMapping.physicalName": "ice_age"}}]},
     "metadata": {"delta.columnMapping.id": 2, "delta.columnMapping.physicalName": "ice_info"}},
    {"name": "tags", "nullable": True,
     "type": {"type": "array", "elementType": "long", "containsNull": True},
     "metadata": {"delta.columnMapping.id": 5, "delta.columnMapping.physicalName": "ice_tags"}},
]
with open(f"{root}/_delta_log/{0:020d}.json", "w") as f:
    for a in [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["columnMapping"],
                      "writerFeatures": ["columnMapping", "changeDataFeed"]}},
        {"metaData": {"id": "nested-id", "format": {"provider": "parquet", "options": {}},
                      "schemaString": json.dumps({"type": "struct", "fields": fields}),
                      "partitionColumns": [],
                      "configuration": {"delta.columnMapping.mode": "id",
                                        "delta.columnMapping.maxColumnId": "5",
                                        "delta.enableChangeDataFeed": "true"},
                      "createdTime": 0}},
        {"add": {"path": "f1.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True}},
    ]:
        f.write(json.dumps(a) + "\n")

spark = get_spark(master="local[4]", extra_conf={"spark.ui.enabled": "false"})
spark.sparkContext.setLogLevel("ERROR")

df = read_delta(spark, root)
print("SPARK READ:", sorted([tuple(r) for r in df.collect()]))
print("schema:", df.schema.simpleString())

names, rows = read_delta_external(root)
print("EXT READ:", names, sorted(rows, key=lambda r: r[0]))

# append with logical nested names
app = spark.createDataFrame([(3, ("zed", 40), [7])],
                            "id long, info struct<name string, age long>, tags array<long>")
write_delta(spark, app, root, mode="append")
print("AFTER APPEND spark:", sorted([tuple(r) for r in read_delta(spark, root).collect()]))
n2, r2 = read_delta_external(root)
print("AFTER APPEND ext:", sorted(r2, key=lambda r: r[0]))

# staged file schema check
staged = [p for p in glob.glob(f"{root}/*.parquet") if "f1" not in p]
sch = pq.read_schema(staged[0])
print("staged top:", [(f.name, (f.metadata or {}).get(b"PARQUET:field_id")) for f in sch])
it = sch.field("ice_info").type
print("staged inner:", [(it.field(i).name, (it.field(i).metadata or {}).get(b"PARQUET:field_id")) for i in range(it.num_fields)])

# MERGE on id, updating nested
src = spark.createDataFrame([(2, ("eva", 26), [9]), (4, ("kim", 50), [0])],
                            "id long, info struct<name string, age long>, tags array<long>")
merge_delta(spark, root, src, ["id"])
print("AFTER MERGE spark:", sorted([tuple(r) for r in read_delta(spark, root).collect()]))
n3, r3 = read_delta_external(root)
print("AFTER MERGE ext:", sorted(r3, key=lambda r: r[0]))
cdf = read_delta_cdf(spark, root, 1)
print("CDF rows:", sorted([tuple(r) for r in cdf.select("id", "info", "_change_type").collect()]))
