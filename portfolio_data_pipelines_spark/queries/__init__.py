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

# Queries kept under local pytest/DuckDB parity but NOT declared to the
# driver: the driver verifies at most the first 50 registered queries per
# round (VERDICT r1), so the declared set is capped at 50 and overlapping
# operator variants live here instead. Same QuerySpec contract, same
# parity test (tests/test_oracle_parity.py runs both registries).
EXTRA_REGISTRY: dict[str, "QuerySpec"] = {}


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: Optional[str]
    doc: str


def _register(
    registry: dict[str, "QuerySpec"], name: str, oracle: Optional[str]
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY or name in EXTRA_REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        registry[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=(fn.__doc__ or "").strip())
        return fn

    return deco


def query(name: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    """Register a driver-declared query with its oracle SQL."""
    return _register(REGISTRY, name, oracle)


def extra_query(name: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    """Register a locally-verified query that is NOT declared to the driver
    (keeps the declared surface within the driver's 50-query window)."""
    return _register(EXTRA_REGISTRY, name, oracle)


def _load_all() -> None:
    # Import for registration side effects. Oracle-backed families first:
    # the driver verifies only the first 50 registered queries, so the
    # rows-only tail (approx sketches, seeded LSH) must never push an
    # oracle-backed query past the window.
    from . import relational  # noqa: F401
    from . import tpch  # noqa: F401
    from . import temporal  # noqa: F401
    from . import stats  # noqa: F401
    from . import similarity  # noqa: F401
    from . import text  # noqa: F401
    from . import dedup  # noqa: F401
    from . import multimodal  # noqa: F401
    from . import streaming_live  # noqa: F401
    from . import pipeline  # noqa: F401
    from . import lakehouse  # noqa: F401


def all_queries() -> dict[str, QueryFn]:
    _load_all()
    return {name: spec.fn for name, spec in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _load_all()
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}
