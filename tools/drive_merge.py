import sys, shutil; sys.path.insert(0, "/root/repo")
from portfolio_data_pipelines_spark.session import get_spark
from portfolio_data_pipelines_spark.operators.delta_log import write_delta, read_delta, merge_delta
from portfolio_data_pipelines_spark.sources.parquet import scan_table
import pyspark.sql.functions as F
spark = get_spark(master="local[4]", extra_conf={"spark.ui.enabled": "false",
                                                 "spark.sql.shuffle.partitions": "4"})
root = "/tmp/merge_drive"; shutil.rmtree(root, ignore_errors=True)
ev = scan_table(spark, "/root/testdata/sf0.001", "events").withColumn("date", F.to_date("ts"))
write_delta(spark, ev, f"{root}/t", partition_col="date")
# MERGE: bump value for 50 events, insert 10 synthetic new ones
upd = ev.limit(50).withColumn("value", F.col("value") + 1000.0)
new = ev.limit(10).withColumn("event_id", F.col("event_id") + 10_000_000)
src = upd.unionByName(new)
merge_delta(spark, f"{root}/t", src, key_cols=["event_id"])
t = read_delta(spark, f"{root}/t")
n = t.count(); bumped = t.filter(F.col("value") > 999).count()
print("rows:", n, "bumped:", bumped)
ok = n == 1010 and bumped >= 50
print("DRIVE", "OK" if ok else "FAIL")
