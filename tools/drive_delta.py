import sys, shutil, json; sys.path.insert(0, "/root/repo")
from portfolio_data_pipelines_spark.session import get_spark
from portfolio_data_pipelines_spark.operators.delta_log import write_delta, read_delta, export_versioned_as_delta
from portfolio_data_pipelines_spark.operators.medallion import commit_versioned, read_versioned
from portfolio_data_pipelines_spark.sources.parquet import scan_table
import pyspark.sql.functions as F
spark = get_spark(master="local[4]", extra_conf={"spark.ui.enabled": "false",
                                                 "spark.sql.shuffle.partitions": "4"})
root = "/tmp/delta_drive"; shutil.rmtree(root, ignore_errors=True)
# real data: events table -> daily-partitioned delta table
ev = scan_table(spark, "/root/testdata/sf0.001", "events").withColumn("date", F.to_date("ts"))
write_delta(spark, ev.filter(F.col("date") <= "2021-01-10"), f"{root}/t", partition_col="date")
write_delta(spark, ev.filter(F.col("date") > "2021-01-10"), f"{root}/t", partition_col="date")
total = read_delta(spark, f"{root}/t").count()
v0 = read_delta(spark, f"{root}/t", version=0).count()
print("delta rows:", total, "v0:", v0, "source:", ev.count())
assert total == ev.count() and v0 < total
# lake export drive
commit_versioned(spark, f"{root}/lake", ev.limit(500), partition_col="date")
export_versioned_as_delta(spark, f"{root}/lake")
a = sorted(map(tuple, read_delta(spark, f"{root}/lake").select("event_id").collect()))
b = sorted(map(tuple, read_versioned(spark, f"{root}/lake").select("event_id").collect()))
print("export parity:", a == b, len(a))
print("DRIVE", "OK" if (total == ev.count() and a == b) else "FAIL")
