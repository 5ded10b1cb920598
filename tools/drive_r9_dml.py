"""Drive copy-on-write DELETE/UPDATE end to end: predicate rewrite,
CDF change rows, constraint gate, both readers. Run from /tmp with
PYTHONPATH=/root/repo."""
import os, sys, tempfile
sys.path.insert(0, "/root/repo")
from portfolio_data_pipelines_spark.session import get_spark
from pyspark.sql import functions as F
from portfolio_data_pipelines_spark.operators.delta_log import (
    write_delta, delete_where, update_where, enable_change_data_feed,
    read_delta, read_delta_cdf, add_check_constraint)
from portfolio_data_pipelines_spark.operators.delta_reader import read_delta_external

spark = get_spark(master="local[4]", extra_conf={
    "spark.ui.enabled": "false", "spark.sql.shuffle.partitions": "4"})
t = os.path.join(tempfile.mkdtemp(), "t")
write_delta(spark, spark.range(1, 2001).select(
    F.col("id"), (F.col("id") % 7).alias("bucket"), (F.col("id") * 1.5).alias("val")),
    t, partition_col="bucket")
enable_change_data_feed(spark, t)
add_check_constraint(spark, t, "val_pos", "val >= 0")
v1 = update_where(spark, t, "id % 10 = 0", {"val": "val + 0.25"})
v2 = delete_where(spark, t, "id % 13 = 0")
df = read_delta(spark, t)
n = df.count()
assert n == 2000 - len(range(13, 2001, 13)), n
s = df.filter("id = 10").collect()[0]["val"]
assert s == 15.25, s
names, rows = read_delta_external(t)
assert len(rows) == n
ch = read_delta_cdf(spark, t, from_version=v1 - 1).collect()
kinds = {}
for r in ch: kinds[r["_change_type"]] = kinds.get(r["_change_type"], 0) + 1
assert kinds["update_preimage"] == kinds["update_postimage"] == 200
assert kinds["delete"] == len(range(13, 2001, 13))
try:
    update_where(spark, t, "id = 1", {"val": "-1.0"})
    print("FAIL constraint"); sys.exit(1)
except ValueError:
    pass
print("OK dml: update %d rows, delete %d rows, CDF + constraint + external parity" %
      (kinds["update_preimage"], kinds["delete"]))
