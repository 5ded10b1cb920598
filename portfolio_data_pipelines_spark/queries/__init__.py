"""Declared-query registry — the driver-harness surface (SURVEY §2, §7 M2+).

Each query is one operator (or operator composition) from the SURVEY §2
inventory, registered with its DuckDB oracle SQL right next to the Spark
implementation so semantics stay reviewable in one place.

Contract (``__spark_entry__.py``):
- callable ``(spark, sf_dir) -> DataFrame``;
- every computed column aliased identically in Spark and oracle SQL;
- double aggregates via ``functions.dsum/davg`` (exact decimal
  accumulation) so values are bit-identical across engines;
- oracle omitted only for genuinely non-SQL-expressible ops.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

REGISTRY: dict[str, "QuerySpec"] = {}


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: Optional[str]
    doc: str


def query(name: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    """Register a declared query with its oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=(fn.__doc__ or "").strip())
        return fn

    return deco


def _load_all() -> None:
    # Import for registration side effects.
    from . import relational  # noqa: F401
    from . import temporal  # noqa: F401
    from . import text  # noqa: F401
    from . import dedup  # noqa: F401
    from . import multimodal  # noqa: F401
    from . import similarity  # noqa: F401
    from . import stats  # noqa: F401


def all_queries() -> dict[str, QueryFn]:
    _load_all()
    return {name: spec.fn for name, spec in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _load_all()
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}
