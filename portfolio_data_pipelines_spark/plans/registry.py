"""dbt-parity model registry (SURVEY §2.2 K5, §2.9 O5, §3.3, §7 M4).

The reference's SQL layer is dbt: models are SELECT statements with
``{{ source(...) }}`` / ``{{ ref(...) }}`` indirection, materialized as
views in namespaced schemas (``public_stg``, ``public_marts`` —
``dbt_project.yml:11-17``), selected/excluded by tag
(``dbt run --select tag:weather --exclude stg_fx_rates fx_top10_daily``,
``weather_hourly_pipeline.py:119``).

Spark-native restatement: a registry of named models whose SQL uses
``{{ source('schema','table') }}`` and ``{{ ref('model') }}`` placeholders,
resolved against the Spark catalog, topologically sorted by ref edges, and
built as (temp) views — Catalyst then inlines view-on-view plans exactly
like Postgres inlines the dbt views (lazy, no data movement at build time).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from graphlib import TopologicalSorter

from pyspark.sql import DataFrame, SparkSession

_SOURCE_RE = re.compile(r"\{\{\s*source\(\s*'([^']*)'\s*,\s*'([^']*)'\s*\)\s*\}\}")
_REF_RE = re.compile(r"\{\{\s*ref\(\s*'([^']*)'\s*\)\s*\}\}")


@dataclass(frozen=True)
class Model:
    """One named SELECT model (dbt-model parity)."""

    name: str
    sql: str
    tags: frozenset[str] = field(default_factory=frozenset)
    schema: str = ""  # namespace prefix, e.g. "stg" / "marts"

    @property
    def view_name(self) -> str:
        # dbt namespaces views as <target_schema>_<custom_schema>.<name>;
        # with temp views we flatten to <schema>_<name>.
        return f"{self.schema}_{self.name}" if self.schema else self.name

    @property
    def refs(self) -> set[str]:
        return set(_REF_RE.findall(self.sql))

    @property
    def sources(self) -> set[tuple[str, str]]:
        return set(_SOURCE_RE.findall(self.sql))


class ModelRegistry:
    """Register models, resolve refs/sources, build views in topo order."""

    def __init__(self) -> None:
        self._models: dict[str, Model] = {}
        self._source_views: dict[tuple[str, str], str] = {}

    def add(self, model: Model) -> "ModelRegistry":
        if model.name in self._models:
            raise ValueError(f"duplicate model {model.name!r}")
        self._models[model.name] = model
        return self

    def map_source(self, schema: str, table: str, view: str) -> "ModelRegistry":
        """Map a ``source('schema','table')`` to a catalog-visible name.

        Mirrors dbt's sources.yml: logical source → physical relation.
        """
        self._source_views[(schema, table)] = view
        return self

    def models(self) -> dict[str, Model]:
        return dict(self._models)

    # -- compilation --------------------------------------------------------

    def compile_sql(self, model: Model) -> str:
        """Resolve {{source}} / {{ref}} placeholders to view names."""

        def sub_source(m: re.Match) -> str:
            key = (m.group(1), m.group(2))
            if key in self._source_views:
                return self._source_views[key]
            return f"{m.group(1)}_{m.group(2)}" if m.group(1) else m.group(2)

        def sub_ref(m: re.Match) -> str:
            name = m.group(1)
            if name not in self._models:
                raise KeyError(f"ref to unknown model {name!r}")
            return self._models[name].view_name

        sql = _SOURCE_RE.sub(sub_source, model.sql)
        return _REF_RE.sub(sub_ref, sql)

    def topo_order(self, names: list[str]) -> list[str]:
        """Selected models plus their upstream refs, dependency-first."""
        ts: TopologicalSorter[str] = TopologicalSorter()
        seen: set[str] = set()
        stack = list(names)
        while stack:
            n = stack.pop()
            if n in seen:
                continue
            seen.add(n)
            refs = self._models[n].refs
            ts.add(n, *refs)
            stack.extend(refs)
        return [n for n in ts.static_order() if n in seen]

    # -- selection (dbt --select tag: / --exclude parity, O5) ---------------

    def select(self, tag: str | None = None, exclude: set[str] | None = None) -> list[str]:
        exclude = exclude or set()
        names = [
            m.name
            for m in self._models.values()
            if (tag is None or tag in m.tags) and m.name not in exclude
        ]
        return names

    # -- build --------------------------------------------------------------

    def run(
        self,
        spark: SparkSession,
        tag: str | None = None,
        exclude: set[str] | None = None,
    ) -> dict[str, DataFrame]:
        """Create temp views for the selected models, dependency-first.

        Like ``dbt run``: no data moves — views are lazy; Catalyst
        optimizes the composed plan at query time.
        """
        built: dict[str, DataFrame] = {}
        for name in self.topo_order(self.select(tag, exclude)):
            model = self._models[name]
            df = spark.sql(self.compile_sql(model))
            df.createOrReplaceTempView(model.view_name)
            built[model.view_name] = df
        return built
