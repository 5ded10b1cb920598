"""Drive the round-7 row-level CDF surface end-to-end from outside the
repo: batch read_delta_cdf over a merge+replaceWhere lifecycle, and the
delta_feed source in readChangeFeed mode (MERGE mid-stream → net rows
exactly once). Run from /tmp with PYTHONPATH=/root/repo."""
import sys, tempfile, datetime as dt

sys.path.insert(0, "/root/repo")
from portfolio_data_pipelines_spark.session import get_spark
from portfolio_data_pipelines_spark.operators.delta_log import (
    write_delta, read_delta, merge_delta, read_delta_cdf)
from portfolio_data_pipelines_spark.sources.delta_feed import (
    DeltaChangeFeedDataSource)

spark = get_spark(master="local[4]", extra_conf={
    "spark.ui.enabled": "false", "spark.sql.shuffle.partitions": "4"})
spark.sparkContext.setLogLevel("ERROR")
spark.dataSource.register(DeltaChangeFeedDataSource)
root = tempfile.mkdtemp(prefix="drive_cdf_")
t = f"{root}/t"
d = dt.date(2024, 1, 1)
write_delta(spark, spark.createDataFrame(
    [(1, 1.0, d), (2, 2.0, d)], "id bigint, v double, date date").coalesce(1), t)

out, ckpt = f"{root}/out", f"{root}/ckpt"
def run_feed():
    q = (spark.readStream.format("delta_feed").option("path", t)
         .option("readChangeFeed", "true").option("keyCols", "id").load()
         .writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

run_feed()
merge_delta(spark, t, spark.createDataFrame(
    [(2, 20.0, d), (3, 3.0, d)], "id bigint, v double, date date"), key_cols=["id"])
run_feed()
rows = spark.read.parquet(out).collect()
second = sorted((r["_change_type"], r["id"]) for r in rows if r["_commit_version"] == 1)
assert second == [("insert", 3), ("update_postimage", 2), ("update_preimage", 2)], second
state = {}
for r in sorted(rows, key=lambda r: r["_commit_version"]):
    if r["_change_type"] in ("delete", "update_preimage"): state.pop(r["id"], None)
    if r["_change_type"] in ("insert", "update_postimage"): state[r["id"]] = r["v"]
want = {r["id"]: r["v"] for r in read_delta(spark, t).collect()}
assert state == want, (state, want)
batch = read_delta_cdf(spark, t, from_version=0, key_cols=["id"])
assert sorted((r["_change_type"], r["id"]) for r in batch.collect()) == second
print("CDF FEED + BATCH DRIVE OK")

# --- round-7 additions: apply-changes replica + history + append race ---
from portfolio_data_pipelines_spark.operators.delta_log import (
    apply_changes_delta, describe_history, read_delta_cdf as _cdf)

rep = f"{root}/replica"
write_delta(spark, spark.createDataFrame([], "id bigint, v double, date date"), rep)
changes = _cdf(spark, t, from_version=-1, key_cols=["id"])
apply_changes_delta(spark, rep, changes, key_cols=["id"])
assert (sorted(tuple(r) for r in read_delta(spark, rep).collect())
        == sorted(tuple(r) for r in read_delta(spark, t).collect())), "replica diverged"
hist = describe_history(spark, t).collect()
assert [r["operation"] for r in hist][-1] == "WRITE" and "MERGE" in {r["operation"] for r in hist}
print("APPLY CHANGES + HISTORY DRIVE OK")

spark.stop()
