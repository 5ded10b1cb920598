import sys, tempfile, os, datetime
sys.path.insert(0, "/root/repo")
from portfolio_data_pipelines_spark.session import get_spark
from portfolio_data_pipelines_spark.operators.delta_log import write_delta, read_delta, restore_delta
spark = get_spark(master="local[4]", extra_conf={"spark.ui.enabled":"false","spark.sql.shuffle.partitions":"4"})
spark.sparkContext.setLogLevel("ERROR")
root = tempfile.mkdtemp(); t = os.path.join(root, "t")
D = datetime.date.fromisoformat
write_delta(spark, spark.createDataFrame([(1, D("2021-01-01"))], "id bigint, date date"), t,
            partition_col="date", constraints={"id_pos": "id > 0"})
write_delta(spark, spark.createDataFrame([(2, D("2021-01-02"))], "id bigint, date date"), t, partition_col="date")
try:
    write_delta(spark, spark.createDataFrame([(-7, D("2021-01-03"))], "id bigint, date date"), t, partition_col="date")
    print("CONSTRAINT FAILED TO FIRE")
except ValueError as e:
    print("constraint OK:", str(e)[:60])
write_delta(spark, spark.createDataFrame([(9, D("2021-09-09"))], "id bigint, date date"), t, partition_col="date", mode="overwrite")
print("after overwrite:", sorted(r["id"] for r in read_delta(spark, t).collect()))
v = restore_delta(spark, t, 1)
print(f"restored as v{v}:", sorted(r["id"] for r in read_delta(spark, t).collect()))
