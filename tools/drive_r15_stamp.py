"""Drive the r15 distributed icebergCompat element-id stamp end to end.

Builds a compat table with array/map columns, forces the distribution
threshold to 1 so a small multi-file append takes the mapInPandas
path, and asserts footer id completeness + add.size correctness +
both-reader parity. Run from /root/repo (or any cwd WITH
PYTHONPATH=/root/repo so executor workers can import the package —
without it the stamp falls back to the driver loop with a warning,
which this script also tolerates and reports).

    PYTHONPATH=/root/repo python tools/drive_r15_stamp.py
"""
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow.parquet as pq  # noqa: E402

from portfolio_data_pipelines_spark.operators import delta_log as dl  # noqa: E402
from portfolio_data_pipelines_spark.operators.delta_log import (  # noqa: E402
    enable_column_mapping,
    enable_iceberg_compat,
    read_delta,
    write_delta,
)
from portfolio_data_pipelines_spark.operators.delta_reader import (  # noqa: E402
    read_delta_external,
)
from portfolio_data_pipelines_spark.session import get_spark  # noqa: E402

spark = get_spark(master="local[4]", extra_conf={"spark.ui.enabled": "false"})
path = tempfile.mkdtemp() + "/t"
write_delta(
    spark,
    spark.createDataFrame([(1, [1, 2], {"k": 10})],
                          "id long, xs array<long>, m map<string, long>"),
    path,
)
enable_column_mapping(spark, path)
enable_iceberg_compat(spark, path, version=2)
dl.STAMP_DISTRIBUTE_MIN_FILES = 1  # force the distributed path
write_delta(
    spark,
    spark.createDataFrame([(i, [i], {"j": i}) for i in range(2, 10)],
                          "id long, xs array<long>, m map<string, long>"
                          ).repartition(4),
    path, mode="append",
)
st = dl._replay_log(spark, path, None)
for rel in st.adds:
    sch = pq.read_schema(os.path.join(path, rel))
    assert dl._arrow_schema_ids_complete(sch), rel
last = sorted(p for p in os.listdir(f"{path}/_delta_log")
              if p.endswith(".json"))[-1]
for line in open(f"{path}/_delta_log/{last}"):
    act = json.loads(line)
    if "add" in act:
        rel = act["add"]["path"]
        assert act["add"]["size"] == os.path.getsize(f"{path}/{rel}"), rel
assert read_delta(spark, path).count() == 9
_names, rows = read_delta_external(path)
assert len(rows) == 9
print("DISTRIBUTED-STAMP DRIVE OK")
