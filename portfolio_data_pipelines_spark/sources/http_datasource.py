"""Python DataSource (Spark 4) for HTTP JSON ingestion (SURVEY §2.1 S1/S2).

The reference fetches Open-Meteo JSON on a single worker
(airflow/dags/weather_hourly_pipeline.py:16-35) — one process, one
location. The idiomatic distributed form is a Spark *Python DataSource*:
each location becomes an input partition, so a 10,000-location fetch
fans out across executors with no driver bottleneck, and the result is
a normal DataFrame feeding the same medallion pipeline.

Network access is not assumed (and this container has none): the default
``fetcher=synthetic`` generates the deterministic 7-day hourly payload
shape the reference API returns (168 rows/location, seeded by location),
which keeps every bit of the Spark-side plumbing — registration, schema,
partition planning, per-partition reads — real and testable. The HTTP
fetcher is the same code path with ``requests`` swapped in, stubbed via
``NotImplementedError`` when unavailable.

Scale notes: one partition per location keeps fetch latency parallel;
rows are yielded as tuples (Arrow-batched by the runtime); downstream
transforms see an ordinary DataFrame with the declared 6-column weather
schema (weather_transform.py:18-23 parity).
"""

from __future__ import annotations

import datetime as dt
import hashlib
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType

#: Reference payload shape: 7 days × 24 h of (temperature, humidity).
HOURS = 168

WEATHER_SCHEMA_DDL = (
    "time timestamp, temperature_2m double, relative_humidity_2m double, "
    "lat string, lon string, ingested_at timestamp"
)


class _LocationPartition(InputPartition):
    def __init__(self, lat: str, lon: str):
        self.lat = lat
        self.lon = lon


def _seed(lat: str, lon: str) -> int:
    return int.from_bytes(hashlib.md5(f"{lat},{lon}".encode()).digest()[:4], "big")


def synthetic_hourly_series(lat: str, lon: str, start: dt.datetime) -> Iterator[tuple]:
    """Deterministic stand-in for the Open-Meteo hourly payload: values
    are a fixed function of (location, hour) — same output on every
    executor, every run."""
    s = _seed(lat, lon)
    ingested = start + dt.timedelta(hours=HOURS)
    for h in range(HOURS):
        t = start + dt.timedelta(hours=h)
        temp = round(10.0 + ((s >> 8) % 200) / 10.0 + 8.0 * ((h % 24) - 12) / 12.0, 2)
        rh = float(30 + (s + h * 7) % 60)
        yield (t, temp, rh, lat, lon, ingested)


#: Canonical field order of the full payload row, matching
#: WEATHER_SCHEMA_DDL.
_FIELD_ORDER = (
    "time",
    "temperature_2m",
    "relative_humidity_2m",
    "lat",
    "lon",
    "ingested_at",
)


class WeatherHttpReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.options = options
        # Honor the schema Spark hands down (the user's .schema(...) if
        # given, else the source default): rows are projected to exactly
        # its fields, in its order, so a user can prune or reorder
        # columns. Unknown fields fail here with the offending names.
        names = [f.name for f in schema.fields] if schema is not None else list(_FIELD_ORDER)
        unknown = [n for n in names if n not in _FIELD_ORDER]
        if unknown:
            raise ValueError(
                f"weather_http has no column(s) {unknown}; available: {list(_FIELD_ORDER)}"
            )
        self._projection = tuple(_FIELD_ORDER.index(n) for n in names)
        locs = options.get("locations", "-23.55,-46.63")
        self.locations: Sequence[tuple[str, str]] = []
        for loc in locs.split(";"):
            if not loc.strip():
                continue
            parts = [p.strip() for p in loc.split(",")]
            # Fail at parse time with the offending entry named — a bad
            # tuple would otherwise surface as an opaque unpack error
            # deep inside partitions().
            if len(parts) != 2:
                raise ValueError(
                    f"locations entry {loc!r} must be 'lat,lon' (got {len(parts)} fields)"
                )
            try:
                float(parts[0]), float(parts[1])
            except ValueError:
                raise ValueError(f"locations entry {loc!r} is not a numeric lat,lon pair")
            self.locations.append((parts[0], parts[1]))
        self.fetcher = options.get("fetcher", "synthetic")
        self.start = dt.datetime.fromisoformat(
            options.get("start", "2025-08-01T00:00:00")
        )

    def partitions(self) -> list[InputPartition]:
        # One partition per location — fetch parallelism == location count.
        return [_LocationPartition(lat, lon) for lat, lon in self.locations]

    def read(self, partition: _LocationPartition) -> Iterator[tuple]:
        if self.fetcher == "synthetic":
            for row in synthetic_hourly_series(partition.lat, partition.lon, self.start):
                yield tuple(row[i] for i in self._projection)
        elif self.fetcher == "http":  # pragma: no cover - no network in CI
            raise NotImplementedError(
                "HTTP fetch requires network access; the synthetic fetcher "
                "exercises the identical partition/read plumbing"
            )
        else:
            raise ValueError(f"unknown fetcher {self.fetcher!r}")


class WeatherHttpDataSource(DataSource):
    """``spark.read.format("weather_http")`` — register with
    ``spark.dataSource.register(WeatherHttpDataSource)``.

    Options: ``locations`` — ``"lat,lon;lat,lon;..."``; ``start`` — ISO
    timestamp of the first forecast hour; ``fetcher`` — ``synthetic`` |
    ``http``.
    """

    @classmethod
    def name(cls) -> str:
        return "weather_http"

    def schema(self) -> str:
        return WEATHER_SCHEMA_DDL

    def reader(self, schema: StructType) -> WeatherHttpReader:
        return WeatherHttpReader(schema, self.options)
