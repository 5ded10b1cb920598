"""JSONL shard sink/source round-trip tests (sources/jsonl.py)."""

import os

from pyspark.sql import functions as F


def test_jsonl_roundtrip_with_shards(spark, tmp_path):
    """Write documents as zstd JSONL sharded by source, read back with a
    pinned schema: identical rows, shard dirs are Hive-style, files are
    compressed."""
    from portfolio_data_pipelines_spark.sources.jsonl import read_jsonl, write_jsonl
    from portfolio_data_pipelines_spark.sources.parquet import scan_table

    docs = scan_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text", "lang", "source"
    )
    path = str(tmp_path / "shards")
    write_jsonl(docs, path, partition_by=["source"])

    dirs = [d for d in os.listdir(path) if d.startswith("source=")]
    assert dirs, "expected Hive-style shard directories"
    inner = os.path.join(path, dirs[0])
    assert any(".json.gz" in f for f in os.listdir(inner)), (
        "expected gzip-compressed shard files"
    )

    back = read_jsonl(spark, path, "doc_id BIGINT, text STRING, lang STRING, source STRING")
    a = {tuple(r) for r in docs.collect()}
    b = {tuple(r) for r in back.select("doc_id", "text", "lang", "source").collect()}
    assert a == b


def test_jsonl_corrupt_line_quarantined(spark, tmp_path):
    """A malformed line must land in _corrupt_record with data columns
    null — never dropped, never a scan failure."""
    from portfolio_data_pipelines_spark.sources.jsonl import read_jsonl

    p = tmp_path / "dirty"
    p.mkdir()
    (p / "part-0.json").write_text(
        '{"doc_id": 1, "text": "ok"}\n'
        'this is not json\n'
        '{"doc_id": 2, "text": "also ok"}\n'
    )
    df = read_jsonl(spark, str(p), "doc_id BIGINT, text STRING", keep_corrupt=True)
    rows = df.collect()
    assert len(rows) == 3
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert len(bad) == 1 and bad[0]["doc_id"] is None
    good = sorted(r["doc_id"] for r in rows if r["_corrupt_record"] is None)
    assert good == [1, 2]


def test_jsonl_binary_column_roundtrip(spark, tmp_path):
    """Binary payloads survive the JSON round trip via base64 when the
    read schema pins the column as BINARY."""
    from portfolio_data_pipelines_spark.sources.jsonl import read_jsonl, write_jsonl

    rows = [(1, bytes([0, 255, 10, 13, 34, 92])), (2, b"\x00" * 16)]
    df = spark.createDataFrame(rows, "id LONG, payload BINARY")
    path = str(tmp_path / "bin")
    write_jsonl(df, path)
    back = read_jsonl(spark, path, "id LONG, payload BINARY")
    got = {r["id"]: bytes(r["payload"]) for r in back.collect()}
    assert got == dict(rows)


def test_shard_counts_skew_check(spark):
    from portfolio_data_pipelines_spark.sources.jsonl import shard_counts
    from portfolio_data_pipelines_spark.sources.parquet import scan_table

    docs = scan_table(spark, "/root/testdata/sf0.001", "documents")
    counts = {r["source"]: r["n_rows"] for r in shard_counts(docs, "source").collect()}
    assert sum(counts.values()) == docs.count()
    assert len(counts) == 20
