import sys, shutil
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from portfolio_data_pipelines_spark.operators.delta_log import (
    read_delta, write_delta)
from portfolio_data_pipelines_spark.session import get_spark
from portfolio_data_pipelines_spark.sources.parquet import scan_table

spark = get_spark(master="local[4]", extra_conf={
    "spark.ui.enabled": "false", "spark.sql.shuffle.partitions": "4"})
ev = scan_table(spark, "/root/testdata/sf0.001", "events").select("event_id", "value")
path = "/tmp/identity_drive_tbl"; shutil.rmtree(path, ignore_errors=True)
write_delta(spark, ev, path, identity_cols={"row_sk": {"start": 1, "step": 1}})
n = ev.count()
got = read_delta(spark, path)
ids = [r["row_sk"] for r in got.select("row_sk").collect()]
assert sorted(ids) == list(range(1, n + 1)), (len(ids), n)
write_delta(spark, ev.limit(100), path)
got2 = read_delta(spark, path)
ids2 = [r["row_sk"] for r in got2.select("row_sk").collect()]
assert sorted(ids2) == list(range(1, n + 101))
print(f"IDENTITY DRIVE OK: {n}+100 rows, dense surrogate keys 1..{n+100}")
