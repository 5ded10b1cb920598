import sys, json, os, tempfile
sys.path.insert(0, "/root/repo")
from portfolio_data_pipelines_spark.session import get_spark
from portfolio_data_pipelines_spark.operators.delta_log import write_delta, read_delta, DELTA_CHECKPOINT_EVERY
from portfolio_data_pipelines_spark.operators.delta_reader import read_delta_external
import pyarrow.parquet as pq
spark = get_spark(master="local[4]", extra_conf={"spark.ui.enabled":"false","spark.sql.shuffle.partitions":"4"})
spark.sparkContext.setLogLevel("ERROR")
root = tempfile.mkdtemp(); t = os.path.join(root, "t")
for i in range(DELTA_CHECKPOINT_EVERY + 1):
    write_delta(spark, spark.createDataFrame([(i,)], "id bigint"), t)
log = os.path.join(t, "_delta_log"); v = DELTA_CHECKPOINT_EVERY
tab = pq.read_table(os.path.join(log, f"{v:020d}.checkpoint.parquet"))
h = tab.num_rows // 2
pq.write_table(tab.slice(0, h), os.path.join(log, f"{v:020d}.checkpoint.{1:010d}.{2:010d}.parquet"))
pq.write_table(tab.slice(h), os.path.join(log, f"{v:020d}.checkpoint.{2:010d}.{2:010d}.parquet"))
os.remove(os.path.join(log, f"{v:020d}.checkpoint.parquet"))
open(os.path.join(log, "_last_checkpoint"), "w").write(json.dumps({"version": v, "size": tab.num_rows, "parts": 2}))
for f in os.listdir(log):
    if f.startswith(".") and f.endswith(".crc"): os.remove(os.path.join(log, f))
print("multipart spark read:", sorted(r["id"] for r in read_delta(spark, t).collect()))
print("multipart ext read:", sorted(r[0] for r in read_delta_external(t)[1]))
# protocol guard
with open(os.path.join(log, f"{0:020d}.json")) as f: pass
