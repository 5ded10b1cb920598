import sys, shutil, time; sys.path.insert(0, "/root/repo")
from portfolio_data_pipelines_spark.session import get_spark
from portfolio_data_pipelines_spark.operators.delta_log import delta_stream_sink, read_delta
import pyspark.sql.functions as F
spark = get_spark(master="local[4]", extra_conf={"spark.ui.enabled": "false",
                                                 "spark.sql.shuffle.partitions": "4"})
root = "/tmp/delta_stream_drive"; shutil.rmtree(root, ignore_errors=True)
stream = (spark.readStream.format("rate").option("rowsPerSecond", "50").load()
          .select(F.col("value").alias("id"), F.to_date(F.lit("2021-01-01")).alias("date")))
q = (stream.writeStream.foreachBatch(delta_stream_sink(f"{root}/t", partition_col="date", app_id="drv"))
     .option("checkpointLocation", f"{root}/ckpt").trigger(processingTime="1 second").start())
time.sleep(8); q.stop(); q.awaitTermination()
n1 = read_delta(spark, f"{root}/t").count()
# restart from the same checkpoint: recovery replays the last batch via txn
q2 = (stream.writeStream.foreachBatch(delta_stream_sink(f"{root}/t", partition_col="date", app_id="drv"))
      .option("checkpointLocation", f"{root}/ckpt").trigger(processingTime="1 second").start())
time.sleep(5); q2.stop(); q2.awaitTermination()
df = read_delta(spark, f"{root}/t")
n2, distinct = df.count(), df.select("id").distinct().count()
print(f"rows after run1={n1}, after restart={n2}, distinct ids={distinct}")
print("DRIVE", "OK" if (n2 == distinct and n2 >= n1 > 0) else "FAIL")
