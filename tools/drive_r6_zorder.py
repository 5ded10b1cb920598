import sys, tempfile, os, random
sys.path.insert(0, "/root/repo")
from portfolio_data_pipelines_spark.session import get_spark
from portfolio_data_pipelines_spark.operators.delta_log import write_delta, read_delta, optimize_delta
spark = get_spark(master="local[4]", extra_conf={"spark.ui.enabled":"false","spark.sql.shuffle.partitions":"4"})
spark.sparkContext.setLogLevel("ERROR")
root = tempfile.mkdtemp(); t = os.path.join(root, "t")
rng = random.Random(1)
for _ in range(2):
    write_delta(spark, spark.createDataFrame(
        [(rng.randrange(1000), rng.randrange(1000)) for _ in range(2000)],
        "a bigint, b bigint").coalesce(4), t)
pred = {"a": (100, 140)}
print("files before:", len(read_delta(spark, t, predicate=pred).inputFiles()),
      "of", len(read_delta(spark, t).inputFiles()))
optimize_delta(spark, t, zorder_by=["a","b"], n_files=8)
print("files after zorder:", len(read_delta(spark, t, predicate=pred).inputFiles()),
      "of", len(read_delta(spark, t).inputFiles()))
print("rows:", read_delta(spark, t).count())
