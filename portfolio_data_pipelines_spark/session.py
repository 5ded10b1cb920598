"""SparkSession factory (SURVEY §7 M0).

Encodes as session defaults the semantics the reference fixes at each
boundary:

- UTC session timezone — the reference queries the weather API with
  ``timezone=UTC`` (``weather_hourly_pipeline.py:24``) and stores
  ``timestamptz`` in Postgres; one canonical timezone end-to-end.
- zstd Parquet compression — ``df.write_parquet(..., compression="zstd")``
  (``weather_hourly_pipeline.py:73``).
- Dynamic partition overwrite — the Spark-native equivalent of the
  reference's idempotent delete-day-then-insert upsert
  (``weather_hourly_pipeline.py:101-112``): ``INSERT OVERWRITE`` replaces
  only the partitions present in the incoming batch.
- AQE on (default in Spark 3.2+, pinned explicitly) — runtime coalescing
  of shuffle partitions and skew-join splitting; this is what makes a
  32-partition local test plan and a 100 TB cluster plan the same code.
- Arrow on — every pandas interchange and Pandas UDF is Arrow-batched.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from .config import DEFAULT_CONFIG, PipelineConfig


def get_spark(
    app_name: str = "portfolio-data-pipelines-spark",
    master: str | None = None,
    config: PipelineConfig | None = None,
    extra_conf: dict[str, str] | None = None,
    warehouse_dir: str | None = None,
) -> SparkSession:
    """Build (or get) a SparkSession with the engine's canonical settings.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` when run outside a
    cluster; on a real cluster, pass ``master=None`` with a cluster
    deployment and the builder inherits ``spark-submit`` settings.

    ``warehouse_dir`` switches the session to a PERSISTENT catalog
    (Hive-backed, embedded Derby metastore under the given directory):
    databases, tables and ``CREATE OR REPLACE VIEW`` definitions survive
    session restarts — the parity mode for the reference's Postgres
    schemas (``public_stg`` / ``public_marts``,
    ``dbt/dbt_project.yml:11-17``). On a real cluster the same flag
    points at the shared metastore instead.
    """
    cfg = config or DEFAULT_CONFIG
    builder = SparkSession.builder.appName(app_name)
    if master is None:
        master = f"local[{cfg.cpus}]"
    if master:
        builder = builder.master(master)
    if warehouse_dir:
        builder = builder.enableHiveSupport()

    conf: dict[str, str] = {
        # Canonical timezone: everything is UTC end-to-end.
        "spark.sql.session.timeZone": "UTC",
        # Lake format parity: zstd parquet.
        "spark.sql.parquet.compression.codec": "zstd",
        # Modern timestamp encoding (Spark's default is the deprecated
        # INT96): INT64 micros is what every external parquet/Delta
        # reader expects, and what the typed scan's footer probe treats
        # as the native form.
        "spark.sql.parquet.outputTimestampType": "TIMESTAMP_MICROS",
        # Idempotent day-level upsert: only overwrite partitions present
        # in the incoming batch (K4 parity).
        "spark.sql.sources.partitionOverwriteMode": "dynamic",
        # InferFiltersFromGenerate substitutes the generator expression
        # into an inferred (size(e) > 0 AND isnotnull(e)) filter BELOW
        # every explode — for this engine's explodes (shingles, n-grams,
        # token streams: all computed, expensive string expressions over
        # whole documents) that re-evaluates the most expensive
        # projection in the plan 1-2 extra times per input row, to prune
        # rows an empty-array Generate would emit nothing for anyway.
        # Measured r16 at sf0.1: the decontamination bench-side shingle
        # explode drops 1.45 s -> 0.17 s with the rule excluded; the
        # penalty is per-row, so the win holds at any scale wherever
        # generators are expensive and empty arrays are rare (every
        # explode in this engine). Scale-independent — a workload
        # property, not a local-mode tune.
        "spark.sql.optimizer.excludedRules": (
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"
        ),
        # Adaptive execution: coalesce shuffle partitions, split skewed
        # joins at runtime. Critical at 100 TB, harmless at sf0.001.
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        # Start from a bounded shuffle width; AQE coalesces below it.
        "spark.sql.shuffle.partitions": str(cfg.shuffle_partitions),
        "spark.sql.files.maxPartitionBytes": cfg.max_partition_bytes,
        # Arrow for all pandas interchange (vectorized UDF transfer).
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        # Non-strict timestamp parsing parity (Polars strict=False →
        # null on failure, never job failure).
        "spark.sql.legacy.timeParserPolicy": "CORRECTED",
        # Parquet TIMESTAMP(NANOS) (e.g. pandas-written files) is
        # otherwise an illegal type for the Spark reader; read as long
        # and convert in the typed scan (sources/parquet.py).
        "spark.sql.legacy.parquet.nanosAsLong": "true",
        # Resolve parquet columns by stamped field id when the read
        # schema carries parquet.field.id metadata — the mechanism
        # id-mode column-mapped (Iceberg-converted) Delta tables need;
        # inert for schemas without the metadata.
        "spark.sql.parquet.fieldId.read.enabled": "true",
        # Shredded-variant scans: the reader gate claims the
        # variantShredding feature, so the ability to read shredded
        # files must not depend on the build's ambient default.
        "spark.sql.variant.allowReadingShredded": "true",
        # Local mode runs every executor thread inside the driver JVM;
        # Spark's 1g default heap is sized for a thin cluster driver,
        # not a local[32] engine (the r11 sf1.0 soak OOM'd an
        # ObjectHashAggregate there). Honored only at JVM launch —
        # i.e. by whichever get_spark call creates the session.
        "spark.driver.memory": os.environ.get(
            "SPARK_GRAFT_DRIVER_MEM", "8g"
        ),
    }

    if warehouse_dir:
        conf.update(
            {
                "spark.sql.warehouse.dir": f"{warehouse_dir}/warehouse",
                # Embedded Derby metastore rooted under the warehouse dir
                # (instead of ./metastore_db in the CWD) so any process
                # pointing at the same dir sees the same catalog.
                "spark.hadoop.javax.jdo.option.ConnectionURL": (
                    f"jdbc:derby:;databaseName={warehouse_dir}/metastore_db;create=true"
                ),
            }
        )

    # Optional S3/MinIO surface (reference s3_client.py builds a boto3
    # client from env; we map the same env to Hadoop S3A conf).
    if cfg.s3_endpoint:
        conf.update(
            {
                "spark.hadoop.fs.s3a.endpoint": cfg.s3_endpoint,
                "spark.hadoop.fs.s3a.access.key": cfg.s3_access_key,
                "spark.hadoop.fs.s3a.secret.key": cfg.s3_secret_key,
                "spark.hadoop.fs.s3a.path.style.access": "true",
            }
        )

    if extra_conf:
        conf.update(extra_conf)

    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
