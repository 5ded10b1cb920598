"""Drive the DV lifecycle tail from the public surface: DV delete →
REORG PURGE → DROP FEATURE → vacuum, through both readers."""
import sys

sys.path.insert(0, "/root/repo")

import json

from pyspark.sql import functions as F

from portfolio_data_pipelines_spark.operators.delta_log import (
    delete_where_dv,
    drop_table_feature,
    enable_change_data_feed,
    purge_delta,
    read_delta,
    read_delta_cdf,
    vacuum_delta,
    write_delta,
)
from portfolio_data_pipelines_spark.operators.delta_reader import (
    read_delta_external,
)
from portfolio_data_pipelines_spark.session import get_spark

spark = get_spark(
    master="local[4]",
    extra_conf={
        "spark.ui.enabled": "false",
        "spark.sql.shuffle.partitions": "4",
    },
)

path = "/tmp/purge_drive_tbl"
import shutil

shutil.rmtree(path, ignore_errors=True)

df = spark.range(1, 10_001).select(
    F.col("id"),
    (F.col("id") % 7).cast("string").alias("bucket"),
    (F.col("id") * 3).alias("val"),
)
write_delta(spark, df, path, partition_col="bucket")  # v0
enable_change_data_feed(spark, path)  # v1
v = delete_where_dv(spark, path, "id % 100 = 0")  # v2: 100 rows across all 7 parts
assert v == 2
expect = [i for i in range(1, 10_001) if i % 100]
got = sorted(r["id"] for r in read_delta(spark, path).select("id").collect())
assert got == expect, (len(got), len(expect))

pv = purge_delta(spark, path)
print("purge version:", pv)
got2 = sorted(r["id"] for r in read_delta(spark, path).select("id").collect())
assert got2 == expect
names, rows = read_delta_external(path)
ext = sorted(row[names.index("id")] for row in rows)
assert ext == expect
# change feed: delete rows from v2, nothing from the purge
cdf = read_delta_cdf(spark, path, 1, key_cols=["id"], to_version=pv)
kinds = {r["_change_type"] for r in cdf.collect()}
assert kinds == {"delete"}, kinds
assert cdf.count() == 100

dv = drop_table_feature(spark, path, "deletionVectors")
with open(f"{path}/_delta_log/{dv:020d}.json") as f:
    acts = [json.loads(l) for l in f.read().splitlines() if l.strip()]
proto = next(a["protocol"] for a in acts if "protocol" in a)
print("downgraded protocol:", proto)
assert proto == {"minReaderVersion": 1, "minWriterVersion": 4}, proto  # CDF keeps writer 4
reclaimed = vacuum_delta(spark, path, retain_hours=1, now_ms=4_000_000_000_000)
print("vacuumed:", len(reclaimed), "files incl bins:",
      sum(1 for r in reclaimed if r.endswith(".bin")))
assert any(r.endswith(".bin") for r in reclaimed)
got3 = sorted(r["id"] for r in read_delta(spark, path).select("id").collect())
assert got3 == expect
names, rows = read_delta_external(path)
assert sorted(row[names.index("id")] for row in rows) == expect
print("PURGE/DROP-FEATURE DRIVE OK")
