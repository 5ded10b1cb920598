"""Drive the r14 struct-below-array id-mode lifecycle from the public
API: a foreign fixture whose list-element struct field names differ
from logical AND physical names at every level, read by both readers,
appended + MERGEd (staged files id-stamped below the array), and
streamed through the change feed.

Run from /tmp with PYTHONPATH=/root/repo (the feed imports the package
on executors).
"""
import glob
import json
import os
import shutil
import sys

sys.path.insert(0, "/root/repo")

import pyarrow as pa
import pyarrow.parquet as pq

from portfolio_data_pipelines_spark.operators.delta_log import (
    merge_delta, read_delta, write_delta,
)
from portfolio_data_pipelines_spark.operators.delta_reader import (
    read_delta_external,
)
from portfolio_data_pipelines_spark.session import get_spark


def fld(name, typ, fid):
    return pa.field(name, typ, metadata={b"PARQUET:field_id": str(fid).encode()})


def main():
    spark = get_spark(master="local[4]", extra_conf={
        "spark.ui.enabled": "false", "spark.sql.shuffle.partitions": "4"})
    root = "/tmp/pdp_r14_below_array"
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(f"{root}/_delta_log")
    inner = pa.struct([fld("w_x", pa.int64(), 3), fld("w_y", pa.string(), 4)])
    pq.write_table(
        pa.table(
            [pa.array([1, 2], pa.int64()),
             pa.array([[{"w_x": 10, "w_y": "a"}], [{"w_x": 20, "w_y": "c"}]],
                      type=pa.list_(pa.field("element", inner)))],
            schema=pa.schema([fld("w_id", pa.int64(), 1),
                              fld("w_items", pa.list_(pa.field("element", inner)), 2)]),
        ),
        f"{root}/f1.parquet",
    )
    fields = [
        {"name": "id", "type": "long", "nullable": True,
         "metadata": {"delta.columnMapping.id": 1,
                      "delta.columnMapping.physicalName": "ice_id"}},
        {"name": "items", "nullable": True,
         "type": {"type": "array", "containsNull": True,
                  "elementType": {"type": "struct", "fields": [
                      {"name": "x", "type": "long", "nullable": True,
                       "metadata": {"delta.columnMapping.id": 3,
                                    "delta.columnMapping.physicalName": "ice_x"}},
                      {"name": "y", "type": "string", "nullable": True,
                       "metadata": {"delta.columnMapping.id": 4,
                                    "delta.columnMapping.physicalName": "ice_y"}}]}},
         "metadata": {"delta.columnMapping.id": 2,
                      "delta.columnMapping.physicalName": "ice_items"}},
    ]
    with open(f"{root}/_delta_log/{0:020d}.json", "w") as f:
        for a in [
            {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                          "readerFeatures": ["columnMapping"],
                          "writerFeatures": ["columnMapping"]}},
            {"metaData": {"id": "r14-below-array",
                          "format": {"provider": "parquet", "options": {}},
                          "schemaString": json.dumps({"type": "struct", "fields": fields}),
                          "partitionColumns": [],
                          "configuration": {"delta.columnMapping.mode": "id",
                                            "delta.columnMapping.maxColumnId": "4"},
                          "createdTime": 0}},
            {"add": {"path": "f1.parquet", "partitionValues": {},
                     "size": 1, "modificationTime": 0, "dataChange": True}},
        ]:
            f.write(json.dumps(a) + "\n")

    def canon(pairs):
        return {(i, tuple((e["x"], e["y"]) for e in (it or []))) for i, it in pairs}

    got = canon([(r["id"], r["items"]) for r in read_delta(spark, root).collect()])
    assert got == {(1, ((10, "a"),)), (2, ((20, "c"),))}, got
    _n, erows = read_delta_external(root)
    assert canon(erows) == got
    print("foreign read OK (both readers)")

    write_delta(spark, spark.createDataFrame(
        [(3, [(30, "d")])], "id long, items array<struct<x long, y string>>"),
        root, mode="append")
    staged = [p for p in glob.glob(f"{root}/*.parquet")
              if os.path.basename(p) != "f1.parquet"]
    vt = pq.read_schema(staged[0]).field("ice_items").type.value_type
    ids = {vt.field(i).name: (vt.field(i).metadata or {}).get(b"PARQUET:field_id")
           for i in range(vt.num_fields)}
    assert ids == {"ice_x": b"3", "ice_y": b"4"}, ids
    print("append stamps inner ids OK:", ids)

    merge_delta(spark, root, spark.createDataFrame(
        [(2, [(21, "C")])], "id long, items array<struct<x long, y string>>"),
        key_cols=["id"])
    got = canon([(r["id"], r["items"]) for r in read_delta(spark, root).collect()])
    assert got == {(1, ((10, "a"),)), (2, ((21, "C"),)), (3, ((30, "d"),))}, got
    _n, erows = read_delta_external(root)
    assert canon(erows) == got
    print("merge OK (both readers)")

    from portfolio_data_pipelines_spark.sources.delta_feed import (
        DeltaChangeFeedDataSource,
    )
    spark.dataSource.register(DeltaChangeFeedDataSource)
    q = (spark.readStream.format("delta_feed").option("path", root)
         .option("ignorechanges", "true").load()
         .writeStream.format("memory").queryName("r14_below_array")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = canon([(r["id"], r["items"])
                  for r in spark.sql("select * from r14_below_array").collect()])
    assert (3, ((30, "d"),)) in rows, rows
    print("feed stream OK")
    print("R14 BELOW-ARRAY DRIVE OK")


if __name__ == "__main__":
    main()
