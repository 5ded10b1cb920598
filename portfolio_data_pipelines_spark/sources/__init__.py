"""Ingestion sources: JSON payload parsers and typed parquet scans."""

from .parquet import load_star_schema, scan_table  # noqa: F401
from .weather import weather_payload_to_df  # noqa: F401
from .fx import fx_payload_to_df  # noqa: F401
