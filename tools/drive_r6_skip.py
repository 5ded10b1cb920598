import sys, tempfile, os
sys.path.insert(0, "/root/repo")
from portfolio_data_pipelines_spark.session import get_spark
from portfolio_data_pipelines_spark.operators.delta_log import write_delta, read_delta, merge_delta, optimize_delta
spark = get_spark(master="local[4]", extra_conf={"spark.ui.enabled":"false","spark.sql.shuffle.partitions":"4"})
spark.sparkContext.setLogLevel("ERROR")
root = tempfile.mkdtemp(); t = os.path.join(root, "t")
rows = [(i, ["eu","us"][i%2], f"2021-01-{1+i%3:02d}", float(i)) for i in range(24)]
df = spark.createDataFrame(rows, "id bigint, region string, day string, v double")
write_delta(spark, df, t, partition_col=["region","day"])
full = read_delta(spark, t)
print("files full:", len(full.inputFiles()), "rows:", full.count())
p = read_delta(spark, t, predicate={"region": ("us","us"), "id": (10, 15)})
print("files pruned:", len(p.inputFiles()), "rows after exact filter:",
      p.filter("region='us' and id between 10 and 15").count())
merge_delta(spark, t, spark.createDataFrame([(10,"us","2021-01-02",999.0)], "id bigint, region string, day string, v double"), key_cols=["id"])
print("post-merge v10:", read_delta(spark, t).filter("id=10").collect())
print("optimize:", optimize_delta(spark, t))
