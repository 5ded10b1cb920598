"""Typed parquet scan (sources/parquet.py): timestamp-unit detection.

The events fixture has shipped with ``ts`` as TIMESTAMP(NANOS) in some
generator versions and TIMESTAMP(MICROS) in others. The scan must read
BOTH correctly — an unconditional nanos division on a micros file shifts
every timestamp to 1970 (a silent, catastrophic corruption this suite
pins against).
"""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

TS = dt.datetime(2024, 1, 5, 12, 30, 0)


def _write_events(path: str, unit: str) -> None:
    """One-row events file with ts stored at the given parquet unit."""
    cols = {
        "event_id": pa.array([1], pa.int64()),
        "ts": pa.array([TS], pa.timestamp(unit)),
        "user_id": pa.array([7], pa.int64()),
        "event_type": pa.array(["click"], pa.string()),
        "value": pa.array([1.5], pa.float64()),
        "props": pa.array(["{}"], pa.string()),
    }
    pq.write_table(pa.table(cols), path, store_schema=False)


@pytest.mark.parametrize("unit", ["us", "ns"])
def test_scan_table_reads_both_timestamp_units(spark, tmp_path, unit):
    from portfolio_data_pipelines_spark.sources.parquet import scan_table

    _write_events(str(tmp_path / "events.parquet"), unit)
    row = scan_table(spark, str(tmp_path), "events").first()
    assert row.ts == TS, f"unit={unit} decoded to {row.ts}"
    assert row.event_id == 1 and row.value == 1.5


@pytest.mark.parametrize("unit", ["us", "ns"])
def test_events_file_stream_reads_both_timestamp_units(spark, tmp_path, unit):
    from portfolio_data_pipelines_spark.streaming import events_file_stream

    _write_events(str(tmp_path / "events.parquet"), unit)
    stream = events_file_stream(spark, str(tmp_path))
    import uuid

    name = "t" + uuid.uuid4().hex[:12]
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    row = spark.table(name).first()
    assert row.ts == TS, f"unit={unit} decoded to {row.ts}"


def test_fixture_unit_detection_matches_footer():
    """The cached probe reports exactly what the footer says."""
    from portfolio_data_pipelines_spark.sources.parquet import _is_nanos_column

    path = "/root/testdata/sf0.001/events.parquet"
    unit = pq.read_schema(path).field("ts").type.unit
    assert _is_nanos_column(path, "ts") == (unit == "ns")


def test_nanos_probe_invalidates_on_rewrite(spark, tmp_path):
    """A fixture regenerated in place with a different timestamp unit must
    re-probe (cache keyed on mtime), not serve the stale verdict."""
    import os
    import time

    from portfolio_data_pipelines_spark.sources.parquet import scan_table

    p = str(tmp_path / "events.parquet")
    _write_events(p, "us")
    assert scan_table(spark, str(tmp_path), "events").first().ts == TS
    time.sleep(0.01)
    _write_events(p, "ns")
    # Force a distinct mtime even on coarse-granularity filesystems.
    st = os.stat(p)
    os.utime(p, (st.st_atime, st.st_mtime + 1))
    assert scan_table(spark, str(tmp_path), "events").first().ts == TS


def test_nanos_probe_rejects_mixed_units_in_directory(spark, tmp_path):
    """A directory dataset mixing NANOS and MICROS part files violates the
    single-unit contract and must raise, not read half the files shifted."""
    d = tmp_path / "events.parquet"
    d.mkdir()
    _write_events(str(d / "part-0.parquet"), "us")
    _write_events(str(d / "part-1.parquet"), "ns")
    from portfolio_data_pipelines_spark.sources.parquet import scan_table

    with pytest.raises(ValueError, match="mixed timestamp units"):
        scan_table(spark, str(tmp_path), "events")


def test_int96_timestamps_read_as_timestamps(spark, tmp_path):
    """Legacy INT96 parquet timestamps: pyarrow surfaces them as
    timestamp[ns] in the ARROW schema, but they are not int64-nanos on
    disk — the probe must check the parquet PHYSICAL type and let Spark
    read INT96 natively (asking for bigint fails the whole scan)."""
    import pyarrow.parquet as pq

    sf = tmp_path / "sf_i96"
    sf.mkdir()
    key = "spark.sql.parquet.outputTimestampType"
    prev = spark.conf.get(key)
    spark.conf.set(key, "INT96")  # per-write option form is ignored
    try:
        spark.sql(
            "select 1 as event_id, timestamp'2021-03-04 05:06:07' as ts, "
            "2 as user_id, 'a' as event_type, 1.0 as value, '{}' as props"
        ).coalesce(1).write.parquet(str(sf / "events.parquet"))
    finally:
        spark.conf.set(key, prev)
    part = next((sf / "events.parquet").glob("*.parquet"))
    ps = pq.ParquetFile(str(part)).schema
    phys = {ps.column(i).name: ps.column(i).physical_type
            for i in range(len(ps))}
    assert phys["ts"] == "INT96", phys  # the fixture really is legacy
    from portfolio_data_pipelines_spark.sources.parquet import scan_table

    r = scan_table(spark, str(sf), "events").first()
    assert str(r.ts) == "2021-03-04 05:06:07"
