"""Stream FROM a Delta table — a Spark 4 Python DataSource over the
transaction log's change feed.

``delta_stream_sink`` (operators/delta_log.py) covers writing a stream
INTO a Delta table; this module closes the other half of the lakehouse
streaming contract: a Structured Streaming SOURCE whose micro-batches
are the table's commit ranges, so a downstream job consumes exactly the
rows each commit appended — with offsets checkpointed by Spark, restart
picks up at the first unread commit, and ``dataChange=false`` layout
commits (OPTIMIZE / ZORDER) are skipped by construction.

Design:
- **Offsets are commit versions.** ``initialOffset`` starts at
  ``startingVersion`` (default −1 = from the beginning);
  ``latestOffset`` probes the log tip. A micro-batch covering
  ``(start, end]`` plans ONE input partition PER NEW DATA FILE, so a
  commit that landed 200 files fans out across 200 tasks.
- **Log access is spec-only and Python-side** (same parsing layer as
  the independent conformance reader ``operators/delta_reader``): the
  planner reads the NDJSON tail, never the data; each task reads
  exactly its one parquet file via pyarrow — acceptable by design
  because a feed batch touches only the files of new commits, never
  the table.
- Every output row carries ``_commit_version``, the same contract as
  the batch ``read_delta_changes``.

Usage::

    spark.dataSource.register(DeltaChangeFeedDataSource)
    stream = (spark.readStream.format("delta_feed")
              .option("path", table_path).load())

Options: ``startingVersion`` (consume commits AFTER this version;
default −1 = from the beginning) and ``maxCommitsPerTrigger``
(admission control: each ``latestOffset`` advances at most N commits
past the last planned batch, so a backlog drains in bounded batches
under a processing-time trigger; ``trigger(availableNow)`` snapshots
one end offset by Spark's own semantics, and a restarted reader never
caps below Spark's checkpointed position).

Local-filesystem tables (this sandbox has no object store); an external
deployment swaps the ``os`` calls for its store's SDK.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import LongType, StructField, StructType

from ..operators.delta_reader import (
    _cast_partition_value,
    _list_commit_versions,
    _local,
    _replay,
)


class _FeedFilePartition(InputPartition):
    def __init__(self, version: int, root: str, rel: str, pvals: dict):
        self.version = version
        self.root = root
        self.rel = rel
        self.pvals = pvals


def _commit_data_adds(log_dir: str, version: int) -> list[dict]:
    """dataChange add actions of ONE commit (paths decoded)."""
    from urllib.parse import unquote

    commit = os.path.join(log_dir, f"{version:020d}.json")
    if not os.path.exists(commit):
        raise FileNotFoundError(
            f"commit {version} missing from {log_dir} — cleaned up before "
            "this stream consumed it (raise the log retention or restart "
            "the stream from a fresh checkpoint)"
        )
    adds = []
    for line in open(commit).read().splitlines():
        if not line.strip():
            continue
        action = json.loads(line)
        if "add" in action and action["add"].get("dataChange", True):
            a = dict(action["add"])
            a["path"] = unquote(a["path"])
            adds.append(a)
    return adds


class DeltaFeedStreamReader(DataSourceStreamReader):
    def __init__(self, schema: StructType, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("delta_feed requires .option('path', <table>)")
        self.schema = schema
        self.start_version = int(options.get("startingversion", -1))
        # admission control: at most N commits per micro-batch, so a
        # restart against a long backlog drains in bounded batches
        # instead of one giant catch-up batch (maxFilesPerTrigger's
        # commit-grained analogue)
        self.max_commits = int(options.get("maxcommitspertrigger", 0)) or None
        self._progress: int | None = None  # known position, once seen

    def initialOffset(self) -> dict:
        # cold start (no checkpoint): the position IS known
        self._progress = self.start_version
        return {"version": self.start_version}

    def latestOffset(self) -> dict:
        log_dir = os.path.join(_local(self.path), "_delta_log")
        versions = _list_commit_versions(log_dir)
        tip = versions[-1] if versions else self.start_version
        # Cap commits per batch ONLY when the reader knows where the
        # stream is (cold start, or after a planned batch). On a
        # RESTART Spark holds the offset in its checkpoint and the
        # reader must not guess below it — the first post-restart batch
        # runs uncapped, then admission control resumes.
        if self.max_commits is not None and self._progress is not None:
            tip = min(tip, self._progress + self.max_commits)
        return {"version": tip}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        self._progress = int(end["version"])
        root = _local(self.path)
        log_dir = os.path.join(root, "_delta_log")
        parts: list[InputPartition] = []
        for v in range(int(start["version"]) + 1, int(end["version"]) + 1):
            for a in _commit_data_adds(log_dir, v):
                parts.append(
                    _FeedFilePartition(
                        v, root, a["path"], a.get("partitionValues", {})
                    )
                )
        return parts

    def read(self, partition: _FeedFilePartition) -> Iterator[tuple]:
        import pyarrow.parquet as pq

        fields = self.schema.fields
        types = {f.name: f.dataType.typeName() for f in fields}
        pvals = {
            c: _cast_partition_value(v, types.get(c, "string"))
            for c, v in partition.pvals.items()
        }
        table = pq.read_table(os.path.join(partition.root, partition.rel))
        present = set(table.column_names)
        for row in table.to_pylist():
            out = []
            for f in fields:
                if f.name == "_commit_version":
                    out.append(partition.version)
                elif f.name in pvals:
                    out.append(pvals[f.name])
                elif f.name in present:
                    out.append(row[f.name])
                else:
                    out.append(None)  # pre-evolution file
            yield tuple(out)

    def commit(self, end: dict) -> None:
        pass  # offsets live in Spark's checkpoint; the log is immutable


class DeltaChangeFeedDataSource(DataSource):
    """``format("delta_feed")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "delta_feed"

    def schema(self) -> StructType:
        path = self.options.get("path")
        if not path:
            raise ValueError("delta_feed requires .option('path', <table>)")
        _root, _adds, meta = _replay(path, None)
        base = StructType.fromJson(json.loads(meta["schemaString"]))
        return StructType(
            base.fields + [StructField("_commit_version", LongType())]
        )

    def streamReader(self, schema: StructType) -> DeltaFeedStreamReader:
        return DeltaFeedStreamReader(schema, self.options)
