"""Drive the round-11 feature surface end-to-end from the public API.

Run from /tmp with PYTHONPATH=/root/repo:

    cd /tmp && PYTHONPATH=/root/repo python /root/repo/tools/drive_r11_features.py

Covers:
1. variantType WRITE: parse_json column -> write_delta -> both readers
   -> variant_get extraction; lifecycle (append/merge/optimize/delete/
   time travel); physical struct pair pinned pyarrow-readable;
2. the spec variant ENCODER against both decoders;
3. allowColumnDefaults: creation + fill-on-omit + set/drop default;
4. UTF8_BINARY collation acceptance on a hand-authored foreign table.
"""

import json
import shutil
import sys
import tempfile

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from portfolio_data_pipelines_spark.session import get_spark  # noqa: E402
from portfolio_data_pipelines_spark.operators.delta_log import (  # noqa: E402
    delete_where,
    merge_delta,
    optimize_delta,
    read_delta,
    set_column_default,
    write_delta,
)
from portfolio_data_pipelines_spark.operators.delta_reader import (  # noqa: E402
    read_delta_external,
)
from portfolio_data_pipelines_spark.operators.variant import (  # noqa: E402
    encode_variant,
)

root = tempfile.mkdtemp(prefix="drive_r11f_")
spark = get_spark(
    master="local[4]",
    extra_conf={"spark.ui.enabled": "false",
                "spark.sql.shuffle.partitions": "4"},
)

# ---- 1. variant write lifecycle -------------------------------------------
p1 = f"{root}/t_variant"
mk = lambda lo, hi: spark.range(lo, hi).select(
    "id",
    F.parse_json(
        F.format_string('{"n": %d, "arr": [%d, null]}', "id", "id")
    ).alias("v"),
)
write_delta(spark, mk(0, 5).coalesce(1), p1)
write_delta(spark, mk(5, 8).coalesce(1), p1)
merge_delta(
    spark, p1,
    spark.range(6, 9).select(
        "id", F.parse_json(F.lit('{"m": 1}')).alias("v")
    ),
    key_cols=["id"],
)
optimize_delta(spark, p1)
delete_where(spark, p1, "id = 0")
got = {r["id"]: r["v"].toPython() for r in read_delta(spark, p1).collect()}
assert got[6] == {"m": 1} and got[3] == {"arr": [3, None], "n": 3}, got
names, ext = read_delta_external(p1)
assert {r[0]: r[1] for r in ext} == got
n_extracted = (
    read_delta(spark, p1)
    .select(F.expr("variant_get(v, '$.n', 'bigint')").alias("n"))
    .where(F.col("n").isNotNull())
    .count()
)
assert n_extracted == 5, n_extracted  # ids 1-5 keep their n field
print("1. variant write lifecycle OK:", len(got), "rows in both readers")

# ---- 2. encoder vs both decoders ------------------------------------------
from portfolio_data_pipelines_spark.operators.delta_reader import (  # noqa: E402
    _variant_metadata_keys,
    _variant_value,
)

for case in [None, {"a": [1, 2.5, "x", None]}, list(range(300)), b"\x00\xff"]:
    md, val = encode_variant(case)
    dec, end = _variant_value(val, 0, _variant_metadata_keys(md))
    assert dec == case and end == len(val), case
print("2. encoder<->decoder OK")

# ---- 3. allowColumnDefaults ------------------------------------------------
p3 = f"{root}/t_defaults"
write_delta(
    spark,
    spark.createDataFrame([(1, "us")], "id bigint, region string"),
    p3,
    default_cols={"region": "'unknown'"},
)
write_delta(spark, spark.createDataFrame([(2,)], "id bigint"), p3)
set_column_default(spark, p3, "region", "'other'")
write_delta(spark, spark.createDataFrame([(3,)], "id bigint"), p3)
got3 = {r["id"]: r["region"] for r in read_delta(spark, p3).collect()}
assert got3 == {1: "us", 2: "unknown", 3: "other"}, got3
proto = next(
    json.loads(l)["protocol"]
    for l in open(f"{p3}/_delta_log/{0:020d}.json")
    if "protocol" in json.loads(l)
)
assert "allowColumnDefaults" in proto["writerFeatures"]
print("3. allowColumnDefaults OK:", got3)

# ---- 4. UTF8_BINARY collation read ----------------------------------------
import pyarrow as pa  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402
import os  # noqa: E402

p4 = f"{root}/t_collated"
os.makedirs(f"{p4}/_delta_log")
pq.write_table(
    pa.table({"s": pa.array(["a", "B"], pa.string())}),
    f"{p4}/part-0000.parquet",
)
schema = json.dumps({"type": "struct", "fields": [
    {"name": "s", "type": "string", "nullable": True,
     "metadata": {"__COLLATIONS": {"s": "spark.UTF8_BINARY"}}}]})
with open(f"{p4}/_delta_log/{0:020d}.json", "w") as f:
    for a in [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["collations-preview"],
                      "writerFeatures": ["collations-preview"]}},
        {"metaData": {"id": "c", "format": {"provider": "parquet",
                                            "options": {}},
                      "schemaString": schema, "partitionColumns": [],
                      "configuration": {}, "createdTime": 0}},
        {"add": {"path": "part-0000.parquet", "partitionValues": {},
                 "size": 1, "modificationTime": 0, "dataChange": True}},
    ]:
        f.write(json.dumps(a) + "\n")
assert sorted(
    r["s"] for r in read_delta(spark, p4).collect()
) == ["B", "a"]
assert sorted(r[0] for r in read_delta_external(p4)[1]) == ["B", "a"]
print("4. UTF8_BINARY collation read OK")

shutil.rmtree(root, ignore_errors=True)
print("ALL r11 feature drives green")
