"""Drive icebergCompatV2 end to end (r13): create -> mapping ->
enable (rewrites unstamped files) -> append/MERGE/DELETE, every live
file asserted id-stamped, both readers agreeing.
Run from /tmp with PYTHONPATH=/root/repo."""
import sys, glob, json
sys.path.insert(0, "/root/repo")
import pyarrow.parquet as pq
from portfolio_data_pipelines_spark.session import get_spark
from portfolio_data_pipelines_spark.operators.delta_log import (
    enable_column_mapping, enable_iceberg_compat, write_delta, read_delta,
    merge_delta, delete_where)
from portfolio_data_pipelines_spark.operators.delta_reader import read_delta_external, _replay
import shutil, os
root = "/tmp/iceb_drive_t"; shutil.rmtree(root, ignore_errors=True)
spark = get_spark(master="local[4]", extra_conf={"spark.ui.enabled": "false",
                                                 "spark.sql.shuffle.partitions": "4"})
spark.sparkContext.setLogLevel("ERROR")
write_delta(spark, spark.createDataFrame(
    [(i, f"s{i}", (f"p{i}", i * 10)) for i in range(6)],
    "id long, s string, o struct<p string, q long>"), root, partition_col="s")
enable_column_mapping(spark, root)
v = enable_iceberg_compat(spark, root, version=2)
print("enabled at v", v)
write_delta(spark, spark.createDataFrame([(9, "s9", ("p9", 90))],
            "id long, s string, o struct<p string, q long>"), root, mode="append", partition_col="s")
merge_delta(spark, root, spark.createDataFrame([(2, "s2", ("P2", 22))],
            "id long, s string, o struct<p string, q long>"), key_cols=["id"])
delete_where(spark, root, "id = 4")
r, adds, _m = _replay(root, None)
ok = True
for rel in sorted(adds):
    sch = pq.read_schema(os.path.join(r, rel))
    for fl in sch:
        if (fl.metadata or {}).get(b"PARQUET:field_id") is None:
            ok = False; print("MISSING ID:", rel, fl.name)
print("all live files id-stamped:", ok, f"({len(adds)} files)")
print("spark rows:", sorted((x["id"], x["o"]["q"]) for x in read_delta(spark, root).collect()))
names, rows = read_delta_external(root)
print("ext rows:", sorted((row[0], row[2]["q"]) for row in rows))
