import sys
sys.path.insert(0, "/root/repo")
from portfolio_data_pipelines_spark.session import get_spark
import bench
spark = get_spark(master="local[8]", extra_conf={"spark.ui.enabled":"false","spark.sql.shuffle.partitions":"8"})
spark.sparkContext.setLogLevel("ERROR")
t, m = bench.run_lakehouse_family(spark, "/root/testdata/sf0.01")
import json
print(json.dumps(t, indent=0)); print(m)
