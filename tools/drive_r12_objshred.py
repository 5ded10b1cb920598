import sys, shutil, glob
sys.path.insert(0, "/root/repo")
import pyarrow.parquet as pq
from pyspark.sql import functions as F
from portfolio_data_pipelines_spark.session import get_spark
from portfolio_data_pipelines_spark.operators.delta_log import (
    write_delta, read_delta)
from portfolio_data_pipelines_spark.operators.delta_reader import (
    read_delta_external)

spark = get_spark(master="local[4]", extra_conf={
    "spark.ui.enabled": "false", "spark.sql.shuffle.partitions": "4"})
p = "/tmp/r12_objshred"; shutil.rmtree(p, ignore_errors=True)
df = spark.range(0, 6).select(
    "id",
    F.parse_json(
        F.when(F.col("id") == 0, F.lit('{"a": 7, "b": "x"}'))       # a shreds, b residual
         .when(F.col("id") == 1, F.lit('{"a": "notlong"}'))          # a field-level binary
         .when(F.col("id") == 2, F.lit('{"b": true}'))               # a absent
         .when(F.col("id") == 3, F.lit('{"a": 5}'))                  # no residual
         .when(F.col("id") == 4, F.lit('"scalar"'))                  # not an object
         .otherwise(F.lit(None))                                     # SQL NULL
    ).alias("v"),
)
write_delta(spark, df, p, shred_variants={"v": {"a": "long"}})
by_id = {}
for fl in sorted(glob.glob(f"{p}/*.parquet")):
    for r in pq.read_table(fl).to_pylist():
        by_id[r["id"]] = r["v"]
c0 = by_id[0]
assert c0["typed_value"]["a"]["typed_value"] == 7
assert c0["typed_value"]["a"]["value"] is None
assert c0["value"] is not None  # residual {"b": "x"}
c1 = by_id[1]
assert c1["typed_value"]["a"]["typed_value"] is None
assert c1["typed_value"]["a"]["value"] is not None  # field-level binary
assert c1["value"] is None
c2 = by_id[2]
assert c2["typed_value"]["a"]["typed_value"] is None
assert c2["typed_value"]["a"]["value"] is None  # absent
assert c2["value"] is not None  # residual {"b": true}
c3 = by_id[3]
assert c3["typed_value"]["a"]["typed_value"] == 5 and c3["value"] is None
c4 = by_id[4]
assert c4["typed_value"] is None and c4["value"] is not None
assert by_id[5] is None
print("physical object-shred shapes OK")

want = {0: {"a": 7, "b": "x"}, 1: {"a": "notlong"}, 2: {"b": True},
        3: {"a": 5}, 4: "scalar", 5: None}
got = {r["id"]: (None if r["v"] is None else r["v"].toPython())
       for r in read_delta(spark, p).collect()}
assert got == want, got
print("spark reassembles object shreds OK:", got)
names, rows = read_delta_external(p)
ext = {r[0]: r[1] for r in rows}
assert ext == want, ext
print("external reader parity OK")
print("ALL OBJECT-SHRED CHECKS PASSED")
