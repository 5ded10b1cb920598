import sys, tempfile, os, shutil
sys.path.insert(0, "/root/repo")
from portfolio_data_pipelines_spark.session import get_spark
from portfolio_data_pipelines_spark.operators.delta_log import write_delta, merge_delta, optimize_delta
from portfolio_data_pipelines_spark.operators.delta_reader import read_delta_external
spark = get_spark(master="local[4]", extra_conf={"spark.ui.enabled": "false", "spark.sql.shuffle.partitions": "4"})
root = tempfile.mkdtemp(prefix="r6ext_"); t = os.path.join(root, "tbl")
import datetime
D = datetime.date.fromisoformat
df = spark.createDataFrame([(1, 1.0, D("2021-01-01")), (2, 2.0, D("2021-01-02"))], "id bigint, v double, date date")
write_delta(spark, df, t, partition_col="date")
merge_delta(spark, t, spark.createDataFrame([(2, 20.0, D("2021-01-02")), (7, 7.0, D("2021-01-07"))], "id bigint, v double, date date"), key_cols=["id"])
optimize_delta(spark, t)
names, rows = read_delta_external(t)
print("external:", names, sorted(rows))
print("v0:", sorted(read_delta_external(t, version=0)[1]))
shutil.rmtree(root)
