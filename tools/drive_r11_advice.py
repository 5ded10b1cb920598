"""Drive the round-11 ADVICE fixes end-to-end from the public surface.

Run from /tmp with PYTHONPATH=/root/repo (executor workers import the
package for the feed's arrow batches):

    cd /tmp && PYTHONPATH=/root/repo python /root/repo/tools/drive_r11_advice.py

Covers:
1. liquid clustering on a COLUMN-MAPPED table — the delta.clustering
   domain records physical name paths, every API speaks logical names,
   OPTIMIZE clusters correctly after a rename;
2. delta_feed plain mode: ignoreDeletes tolerates delete-only commits,
   still refuses rewrite commits;
3. delete_where_dv big path — closure carries only MATCHED files' DVs
   (behavioral check: two DV deletes on disjoint predicates succeed and
   the second sees the first's bitmaps only for re-touched files);
4. driver-contract smoke (entry()).
"""

import json
import shutil
import sys
import tempfile

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from portfolio_data_pipelines_spark.session import get_spark  # noqa: E402
from portfolio_data_pipelines_spark.operators import delta_log as dl  # noqa: E402
from portfolio_data_pipelines_spark.operators.delta_log import (  # noqa: E402
    clustering_columns,
    delete_where,
    delete_where_dv,
    describe_detail,
    enable_clustering,
    enable_column_mapping,
    optimize_delta,
    read_delta,
    rename_column,
    write_delta,
)

root = tempfile.mkdtemp(prefix="drive_r11_")
spark = get_spark(
    master="local[4]",
    extra_conf={"spark.ui.enabled": "false",
                "spark.sql.shuffle.partitions": "4"},
)

# ---- 1. clustering under column mapping -----------------------------------
p1 = f"{root}/t_cluster_cm"
df = spark.range(4000).select(
    "id", (F.col("id") % 97).alias("a"), ((F.col("id") * 31) % 89).alias("b")
)
write_delta(spark, df.repartition(6), p1)
enable_column_mapping(spark, p1)
rename_column(spark, p1, "a", "alpha")
v = enable_clustering(spark, p1, ["alpha"])
dm = next(
    json.loads(l)["domainMetadata"]
    for l in open(f"{p1}/_delta_log/{v:020d}.json")
    if l.strip() and "domainMetadata" in json.loads(l)
)
recorded = json.loads(dm["configuration"])["clusteringColumns"]
assert recorded != [["alpha"]], "domain must carry PHYSICAL names"
assert clustering_columns(spark, p1) == ["alpha"]
assert describe_detail(spark, p1).first()["clusteringColumns"] == ["alpha"]
before = sorted(tuple(r) for r in read_delta(spark, p1).collect())
optimize_delta(spark, p1)
assert sorted(tuple(r) for r in read_delta(spark, p1).collect()) == before
print("1. clustering-under-mapping OK (domain:", recorded, ")")

# ---- 2. feed ignoreDeletes -------------------------------------------------
from portfolio_data_pipelines_spark.sources.delta_feed import (  # noqa: E402
    DeltaChangeFeedDataSource,
)

spark.dataSource.register(DeltaChangeFeedDataSource)
p2 = f"{root}/t_feed"
mk = lambda rows: spark.createDataFrame(rows, "id bigint, day string").coalesce(1)
write_delta(spark, mk([(1, "d1"), (2, "d1")]), p2, partition_col="day")
write_delta(spark, mk([(3, "d2")]), p2, partition_col="day")
delete_where(spark, p2, "day = 'd1'")  # delete-only commit

def run_feed(out, ckpt, **opts):
    r = spark.readStream.format("delta_feed").option("path", p2)
    for k, vv in opts.items():
        r = r.option(k, vv)
    q = (r.load().writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(300)

try:
    run_feed(f"{root}/o0", f"{root}/c0")
    raise AssertionError("default must refuse the delete commit")
except Exception as e:
    assert "change commit" in str(e), e
run_feed(f"{root}/o1", f"{root}/c1", ignoredeletes="true")
got = sorted(r["id"] for r in spark.read.parquet(f"{root}/o1").collect())
assert got == [1, 2, 3], got
print("2. feed ignoreDeletes OK:", got)

# ---- 3. DV delete big path with bounded closure ---------------------------
p3 = f"{root}/t_dv"
write_delta(
    spark,
    spark.range(20000).select(
        "id", (F.col("id") % 4).alias("m")
    ).repartition(4),
    p3,
)
old_cap = dl.DV_DELETE_DRIVER_MAX_POSITIONS
dl.DV_DELETE_DRIVER_MAX_POSITIONS = 10  # force the executor-side path
try:
    delete_where_dv(spark, p3, "id % 10 = 3")
    delete_where_dv(spark, p3, "id % 10 = 7")
finally:
    dl.DV_DELETE_DRIVER_MAX_POSITIONS = old_cap
n = read_delta(spark, p3).count()
assert n == 16000, n
print("3. DV executor-side delete OK:", n, "rows live")

# ---- 4. driver contract smoke ---------------------------------------------
sys.path.insert(0, "/root/repo")
import __spark_entry__ as entrymod  # noqa: E402

cnt = entrymod.entry(spark).count()
assert cnt > 0
print("4. entry() OK:", cnt, "rows")

shutil.rmtree(root, ignore_errors=True)
print("ALL r11 advice drives green")
