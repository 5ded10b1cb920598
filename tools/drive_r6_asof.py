import sys, tempfile, os, datetime
sys.path.insert(0, "/root/repo")
from portfolio_data_pipelines_spark.session import get_spark
from portfolio_data_pipelines_spark.operators.delta_log import write_delta, read_delta
spark = get_spark(master="local[4]", extra_conf={"spark.ui.enabled":"false","spark.sql.shuffle.partitions":"4"})
spark.sparkContext.setLogLevel("ERROR")
root = tempfile.mkdtemp(); t = os.path.join(root, "t")
D = datetime.date.fromisoformat
write_delta(spark, spark.createDataFrame([(1, D("2021-01-01"))], "id bigint, date date"), t, partition_col="date")
write_delta(spark, spark.createDataFrame([(2, D("2021-01-02"))], "id bigint, date date"), t, partition_col="date")
now = datetime.datetime.now(datetime.timezone.utc).isoformat()
print("as_of now:", sorted(r["id"] for r in read_delta(spark, t, as_of=now).collect()))
