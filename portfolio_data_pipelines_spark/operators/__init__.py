"""Engine operators: medallion writes, dedup, similarity, text, multimodal."""

from .medallion import write_bronze, write_partition_overwrite  # noqa: F401
