"""Drive generated columns from the public surface: a day-partitioned
events table GENERATED from ts (the canonical CAST(ts AS DATE) layout)
built from real testdata, then the full writer-duty lifecycle and the
pruning payoff pinned via inputFiles().

Run: PYTHONPATH=/root/repo python tools/drive_r9_gencols.py
"""

import shutil
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from portfolio_data_pipelines_spark.operators.delta_log import (
    merge_delta,
    read_delta,
    update_where,
    write_delta,
)
from portfolio_data_pipelines_spark.session import get_spark
from portfolio_data_pipelines_spark.sources.parquet import scan_table

spark = get_spark(
    master="local[4]",
    extra_conf={
        "spark.ui.enabled": "false",
        "spark.sql.shuffle.partitions": "4",
    },
)

events = scan_table(spark, "/root/testdata/sf0.001", "events").select(
    "event_id", "user_id", "ts", "value"
)
path = "/tmp/gencols_drive_tbl"
shutil.rmtree(path, ignore_errors=True)

write_delta(
    spark,
    events,
    path,
    partition_col="day",
    generated_cols={"day": "CAST(ts AS DATE)"},
)
base = read_delta(spark, path)
n0 = base.count()
days = sorted(
    str(r["day"]) for r in base.select("day").distinct().collect()
)
print(f"created: {n0} rows across {len(days)} generated day partitions")
assert base.filter(F.col("day") != F.to_date("ts")).count() == 0

# pruning through the expression: a 2-day ts window plans a fraction
# of the files a full read plans
full_files = len(base.inputFiles())
lo, hi = days[len(days) // 2], days[len(days) // 2 + 1]
pruned = read_delta(
    spark, path, predicate={"ts": (f"{lo} 00:00:00", f"{hi} 23:59:59")}
)
pruned_files = len(pruned.inputFiles())
print(f"pruned plan: {pruned_files}/{full_files} files for a 2-day window")
assert pruned_files < full_files
exact = pruned.filter((F.col("ts") >= f"{lo} 00:00:00") & (F.col("ts") <= f"{hi} 23:59:59"))
expect = base.filter((F.col("ts") >= f"{lo} 00:00:00") & (F.col("ts") <= f"{hi} 23:59:59"))
assert exact.count() == expect.count()

# merge omitting the generated column; update recomputing it
src = events.limit(5).select(
    "event_id", "user_id",
    F.expr("timestamp '2030-01-01 10:00:00'").alias("ts"),
    (F.col("value") * 0 + 1.0).alias("value"),
)
merge_delta(spark, path, src, key_cols=["event_id"])
moved = read_delta(spark, path).filter("day = DATE '2030-01-01'").count()
assert moved == 5, moved
eid = src.collect()[0]["event_id"]
update_where(
    spark, path, f"event_id = '{eid}'",
    {"ts": "timestamp '2031-06-06 01:00:00'"},
)
r = read_delta(spark, path).filter(f"event_id = '{eid}'").collect()[0]
assert str(r["day"]) == "2031-06-06"
print("GENERATED-COLUMNS DRIVE OK")
