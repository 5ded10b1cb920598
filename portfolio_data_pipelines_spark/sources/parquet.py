"""Typed parquet scans (SURVEY §2.1 S3/S4).

The reference re-reads its own parquet between stages
(``weather_hourly_pipeline.py:86``) and resolves registered source tables
via dbt (``sources.yml``). Here: schema-asserted ``spark.read.parquet``
scans plus a helper that registers the whole star schema as temp views so
``spark.sql`` queries resolve by name.

Scale note: scans stay declarative so Catalyst pushes filters and prunes
columns into the parquet reader (verify with ``PushedFilters`` /
``ReadSchema`` in ``.explain``). Never ``mergeSchema`` on ingestion —
contracts are explicit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import STAR_SCHEMA

#: Columns that MAY be stored as parquet TIMESTAMP(NANOS). Spark's reader
#: rejects that type outright; with ``spark.sql.legacy.parquet.nanosAsLong
#: =true`` (set in the session factory) they arrive as epoch-nanos longs
#: and are converted here, so every consumer sees the declared
#: TimestampType. Whether a given file actually uses NANOS is detected
#: from its footer (some generator versions write MICROS), so the
#: conversion only applies when needed.
_NANOS_TS_COLUMNS: dict[str, set[str]] = {"events": {"ts"}}

#: (path, column) → (file-set signature, verdict). The signature is the
#: sorted (part-file, mtime) tuple, so a fixture regenerated in place —
#: possibly with a different timestamp unit — invalidates the cached
#: verdict instead of silently shifting every timestamp by 1000x.
_NANOS_DETECTED: dict[tuple[str, str], tuple[tuple, bool]] = {}


def _probe_files(path: str) -> list[str]:
    import glob
    import os

    if os.path.isdir(path):
        parts = sorted(glob.glob(os.path.join(path, "*.parquet")))
        return parts if parts else [path]
    return [path]


def _is_nanos_column(path: str, column: str) -> bool:
    """Inspect parquet footers once per (path, column, mtime-signature).

    Footer-only reads (no data pages) — cheap, driver-side, cached on the
    part-file mtimes so in-place rewrites re-probe. At cluster scale this
    mirrors what a table catalog records once at registration time.

    Contract: every part file in a directory dataset must use the SAME
    timestamp unit for ``column`` — all footers are probed and a mix of
    NANOS and MICROS raises rather than reading half the files shifted
    by 1000x.
    """
    try:
        import os

        import pyarrow.parquet as pq

        probes = _probe_files(path)
        # st_mtime_ns + st_size: plain mtime has 1s granularity on some
        # filesystems, so a fixture regenerated in place within the same
        # second would keep a stale unit verdict.
        sig = tuple(
            (p, os.stat(p).st_mtime_ns, os.stat(p).st_size) for p in probes
        )
    except Exception:
        return False
    key = (path, column)
    cached = _NANOS_DETECTED.get(key)
    if cached is not None and cached[0] == sig:
        return cached[1]
    try:
        verdicts = set()
        for probe in probes:
            pf = pq.ParquetFile(probe)
            ftype = pf.schema_arrow.field(column).type
            # pyarrow surfaces legacy INT96 timestamps as timestamp[ns]
            # too, but those are NOT int64-nanos on disk (Spark reads
            # INT96 natively; asking for bigint would fail the scan) —
            # distinguish by the parquet PHYSICAL type.
            phys = None
            ps = pf.schema
            for i in range(len(ps)):
                if ps.column(i).name == column:
                    phys = ps.column(i).physical_type
                    break
            # TIMESTAMP(NANOS) footers, or raw int64 columns (this lake's
            # contract: a long-typed event time IS epoch-nanos).
            verdicts.add(
                (
                    getattr(ftype, "unit", None) == "ns"
                    and phys != "INT96"
                )
                or str(ftype) == "int64"
            )
        if len(verdicts) > 1:
            raise ValueError(
                f"mixed timestamp units for column {column!r} across part files "
                f"of {path!r}: a directory dataset must be single-unit"
            )
        verdict = verdicts.pop() if verdicts else False
    except ValueError:
        raise
    except Exception:
        # Unreadable footer / missing pyarrow: assume the modern
        # MICROS encoding (Spark reads it natively).
        verdict = False
    _NANOS_DETECTED[key] = (sig, verdict)
    return verdict


def scan_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one star-schema table with its declared schema.

    Passing the explicit schema (rather than trusting footer inference)
    keeps the contract stable across files and skips schema merging.
    """
    schema = STAR_SCHEMA.get(name)
    path = f"{sf_dir}/{name}.parquet"
    nanos_cols = {
        c for c in _NANOS_TS_COLUMNS.get(name, set()) if _is_nanos_column(path, c)
    }
    reader = spark.read
    if schema is not None:
        if nanos_cols:
            read_schema = T.StructType(
                [
                    T.StructField(f.name, T.LongType() if f.name in nanos_cols else f.dataType, f.nullable)
                    for f in schema.fields
                ]
            )
            df = reader.schema(read_schema).parquet(path)
            for c in nanos_cols:
                # epoch-nanos → epoch-micros → timestamp; integer div
                # truncates sub-microsecond precision (none in testdata).
                df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
            return df.select(*[f.name for f in schema.fields])
        return reader.schema(schema).parquet(path)
    return reader.parquet(path)


def load_star_schema(spark: SparkSession, sf_dir: str, register_views: bool = True) -> dict[str, DataFrame]:
    """Load every star-schema table; optionally register temp views.

    With views registered, ``spark.sql("SELECT ... FROM lineitem ...")``
    resolves exactly like the dbt ``source()`` indirection (S4).
    """
    tables: dict[str, DataFrame] = {}
    for name in STAR_SCHEMA:
        df = scan_table(spark, sf_dir, name)
        if register_views:
            df.createOrReplaceTempView(name)
        tables[name] = df
    return tables
