"""Drive name-mode column mapping end to end from outside the repo:
enable -> write -> rename -> merge -> evolution (col-uuid physical
names) -> time travel -> drop -> optimize -> CDF -> skipping -> history.
Run from /tmp with PYTHONPATH=/root/repo."""
import sys, tempfile, datetime as dt
sys.path.insert(0, "/root/repo")
from portfolio_data_pipelines_spark.session import get_spark
from portfolio_data_pipelines_spark.operators.delta_log import (
    write_delta, read_delta, merge_delta, optimize_delta, read_delta_cdf,
    enable_column_mapping, rename_column, drop_column, describe_history)
import pyspark.sql.functions as F

spark = get_spark(master="local[4]", extra_conf={"spark.ui.enabled": "false",
                                                 "spark.sql.shuffle.partitions": "4"})
spark.sparkContext.setLogLevel("ERROR")
t = tempfile.mkdtemp(prefix="cmap_") + "/t"
d = dt.date(2024, 1, 1)
write_delta(spark, spark.createDataFrame(
    [(1, 1.0, "2024-01-01"), (2, 2.0, "2024-01-02")],
    "id bigint, v double, day string"), t, partition_col="day")
v_en = enable_column_mapping(spark, t)
print("enabled at", v_en)
# read back after enable (old files logical==physical)
assert sorted(r["id"] for r in read_delta(spark, t).collect()) == [1, 2]
# write after enable (physical names == logical here)
write_delta(spark, spark.createDataFrame([(3, 3.0, "2024-01-03")],
    "id bigint, v double, day string"), t, partition_col="day")
assert read_delta(spark, t).count() == 3
# rename v -> amount (metadata-only)
rename_column(spark, t, "v", "amount")
got = read_delta(spark, t)
assert got.columns == ["id", "amount", "day"], got.columns
assert {r["amount"] for r in got.collect()} == {1.0, 2.0, 3.0}
# write under the NEW logical name — file carries the OLD physical name
write_delta(spark, spark.createDataFrame([(4, 4.0, "2024-01-04")],
    "id bigint, amount double, day string"), t, partition_col="day")
assert read_delta(spark, t).count() == 4
# merge under new name
merge_delta(spark, t, spark.createDataFrame([(4, 40.0, "2024-01-04"), (5, 5.0, "2024-01-05")],
    "id bigint, amount double, day string"), key_cols=["id"])
got = {r["id"]: r["amount"] for r in read_delta(spark, t).collect()}
assert got[4] == 40.0 and got[5] == 5.0 and len(got) == 5, got
# evolution under mapping: add a new column
write_delta(spark, spark.createDataFrame([(6, 6.0, "2024-01-06", "x")],
    "id bigint, amount double, day string, tag string"), t, partition_col="day")
got = read_delta(spark, t)
assert got.columns == ["id", "amount", "day", "tag"]
assert got.filter(F.col("tag").isNotNull()).count() == 1
# time travel: pre-rename version shows old logical name
old_df = read_delta(spark, t, version=v_en)
assert old_df.columns == ["id", "v", "day"], old_df.columns
# drop the evolved column
drop_column(spark, t, "tag")
assert read_delta(spark, t).columns == ["id", "amount", "day"]
# optimize under mapping
optimize_delta(spark, t)
assert read_delta(spark, t).count() == 6
# CDF under mapping
cdf = read_delta_cdf(spark, t, from_version=v_en, key_cols=["id"])
assert {r["_change_type"] for r in cdf.collect()} >= {"insert", "update_preimage", "update_postimage"}
# skipping predicate in logical names
pr = read_delta(spark, t, predicate={"id": (5, None)})
assert {r["id"] for r in pr.collect()} >= {5, 6}
ops = [r["operation"] for r in describe_history(spark, t).collect()]
assert "RENAME COLUMN" in ops and "DROP COLUMNS" in ops and "SET TBLPROPERTIES" in ops
print("COLUMN MAPPING SMOKE OK")
spark.stop()
