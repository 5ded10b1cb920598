import sys, tempfile, os, datetime
sys.path.insert(0, "/root/repo")
from portfolio_data_pipelines_spark.session import get_spark
from portfolio_data_pipelines_spark.operators.delta_log import write_delta
from portfolio_data_pipelines_spark.sources.delta_feed import DeltaChangeFeedDataSource
spark = get_spark(master="local[4]", extra_conf={"spark.ui.enabled":"false","spark.sql.shuffle.partitions":"4"})
spark.sparkContext.setLogLevel("ERROR")
spark.dataSource.register(DeltaChangeFeedDataSource)
root = tempfile.mkdtemp(); t = os.path.join(root, "t")
D = datetime.date.fromisoformat
for i in range(3):
    write_delta(spark, spark.createDataFrame([(i, D("2021-01-01"))], "id bigint, date date"), t, partition_col="date")
q = (spark.readStream.format("delta_feed").option("path", t).load()
     .writeStream.format("memory").queryName("feed_drive").trigger(availableNow=True).start())
q.awaitTermination(120)
print(sorted(tuple(r) for r in spark.table("feed_drive").collect()))
