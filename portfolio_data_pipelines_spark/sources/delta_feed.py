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
  ``(start, end]`` plans one input partition per ~``maxBytesPerTask``
  (default 4 MiB) of a commit's new data files — small files pack
  together so a cold backfill doesn't pay one Python-worker round-trip
  per file, while a commit landing 200 MB still fans out across ~50
  tasks. ``maxBytesPerTask=0`` restores strict one-file-per-task.
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

``readChangeFeed=true`` switches the source to ROW-LEVEL change-feed
mode (the streamed form of ``operators.delta_log.read_delta_cdf``):
instead of re-delivering every added row, each micro-batch emits the
net per-row changes of its commits — ``_change_type`` ∈ {insert,
update_preimage, update_postimage, delete}, with ``_commit_version``
and ``_commit_timestamp`` (batch-CDF column parity). Commits carrying
``cdc`` actions (write-side CDF, ``enable_change_data_feed``) stream
their ``_change_data`` files as ARROW BATCHES exactly like plain-mode
adds — no diff, no per-row Python conversion, O(changes) cost
regardless of how much the commit rewrote. Commits without cdc
actions (pre-enable history) fall back to reconstruction: planning
replays the log to the batch's start version (driver-side, O(log)) to
know the pre-commit live set; each such commit becomes ONE partition
whose task diffs the commit's removed files against its added files
on ``keyCols`` (required for this mode) as a Python dict diff. That
single task loads both sides of the rewrite, so it is byte-capped:
a commit whose touched files exceed ``maxReconstructBytes`` (default
256 MiB) fails planning with a clear remedy (enable CDF on the table,
or use the batch ``read_delta_cdf``) instead of an opaque task OOM.

Plain (non-CDF) mode refuses change commits (dataChange removes) by
default, as delta-spark does — planning the re-added files would
silently duplicate surviving rows. Two opt-outs, mirroring
delta-spark's options: ``ignoreDeletes=true`` tolerates DELETE-ONLY
commits (removes with zero dataChange adds, e.g. a partition drop —
nothing new to emit, so no duplicates are possible);
``ignoreChanges=true`` additionally accepts rewrite commits and their
duplicate rows. (Behavior change note: before round 10 this source
silently planned change commits' re-added files.)

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
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..operators.delta_reader import (
    _cast_partition_value,
    _commit_time_ms_external,
    _config_of,
    _dv_deleted_rows,
    _dv_of,
    _list_commit_versions,
    _local,
    _replay,
)


def _arrow_type_of_json(jtype):
    """A schema-JSON type → its arrow type (nested-field null fill for
    pre-evolution files under id mode)."""
    from pyspark.sql.pandas.types import to_arrow_type
    from pyspark.sql.types import StructType

    dt = StructType.fromJson({
        "type": "struct",
        "fields": [
            {"name": "_x", "type": jtype, "nullable": True, "metadata": {}}
        ],
    }).fields[0].dataType
    return to_arrow_type(dt)


def _align_nested_arrow(arr, jtype):
    """One nested id-mode column: the FILE's arbitrary inner names →
    the table's LOGICAL inner names, matching each struct level's
    stamped ``PARQUET:field_id`` against ``delta.columnMapping.id``.
    Zero-copy — children arrays are reused, only the type metadata is
    rebuilt. A logical field whose id is absent from the file
    null-fills (pre-evolution); arrays/maps recurse into their
    element/key/value children (r14 — structs below repeated levels
    align by id like any other; refused at stream construction through
    r13)."""
    import pyarrow as pa

    if not isinstance(jtype, dict):
        return arr
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    t = jtype.get("type")
    if t == "array" and pa.types.is_list(arr.type):
        values = _align_nested_arrow(arr.values, jtype["elementType"])
        return pa.ListArray.from_arrays(
            arr.offsets,
            values,
            mask=arr.is_null() if arr.null_count else None,
        )
    if t == "map" and pa.types.is_map(arr.type):
        keys = _align_nested_arrow(arr.keys, jtype["keyType"])
        items = _align_nested_arrow(arr.items, jtype["valueType"])
        return pa.MapArray.from_arrays(arr.offsets, keys, items)
    if t != "struct" or not pa.types.is_struct(arr.type):
        return arr
    by_id = {}
    for i in range(arr.type.num_fields):
        fl = arr.type.field(i)
        fid = (fl.metadata or {}).get(b"PARQUET:field_id")
        if fid is not None:
            by_id[int(fid)] = i
    children, fields = [], []
    for jf in jtype["fields"]:
        fid = int((jf.get("metadata") or {})["delta.columnMapping.id"])
        idx = by_id.get(fid)
        child = (
            _align_nested_arrow(arr.field(idx), jf["type"])
            if idx is not None
            else pa.nulls(len(arr), _arrow_type_of_json(jf["type"]))
        )
        children.append(child)
        fields.append(pa.field(jf["name"], child.type, True))
    mask = arr.is_null() if arr.null_count else None
    return pa.StructArray.from_arrays(children, fields=fields, mask=mask)


class _FeedFilePartition(InputPartition):
    """One task's slice of a commit: a size-bounded GROUP of the
    commit's files (``files`` = list of (rel, partitionValues)). Feed
    batches land few files → one task each; a cold backfill over a
    table of many small files packs them into ~maxBytesPerTask groups
    so per-task Python-worker overhead amortizes instead of dominating
    (measured 6.4× over the JVM read per-file at sf0.1; grouping
    recovers most of it)."""

    def __init__(self, version: int, root: str, files: list):
        self.version = version
        self.root = root
        self.files = files


class _FeedCdfPartition(InputPartition):
    """One RECONSTRUCTION-mode COMMIT in change-feed mode (no cdc
    actions — pre-enable history): the commit's added files and the
    live entries of its removed files — both sides of the row-level
    diff. One partition per commit (not per file) because the diff
    pairs rows ACROSS the two file sets; its in-task byte footprint is
    capped at planning time."""

    def __init__(
        self,
        version: int,
        root: str,
        adds: list,
        removed: list,
        ts_ms: int,
    ):
        self.version = version
        self.root = root
        self.adds = adds  # list[(rel, partitionValues)]
        self.removed = removed
        self.ts_ms = ts_ms


class _FeedCdcFilesPartition(InputPartition):
    """One task's slice of a commit's WRITE-SIDE change files (``cdc``
    actions): a size-bounded group of ``_change_data`` parquet files,
    streamed as arrow batches like plain-mode adds — the rows already
    carry ``_change_type``, so there is nothing to diff."""

    def __init__(self, version: int, root: str, files: list, ts_ms: int):
        self.version = version
        self.root = root
        self.files = files  # list[rel]
        self.ts_ms = ts_ms


def _commit_data_adds(
    log_dir: str, version: int
) -> tuple[list[dict], bool]:
    """(dataChange add actions of ONE commit (paths decoded), does the
    commit ALSO carry dataChange removes). The second flag marks a
    change commit — DELETE/UPDATE/MERGE re-add touched files (or their
    rewrites) with dataChange=true, so an append-only consumer that
    planned those adds would emit every surviving row a second time."""
    from urllib.parse import unquote

    commit = os.path.join(log_dir, f"{version:020d}.json")
    if not os.path.exists(commit):
        raise FileNotFoundError(
            f"commit {version} missing from {log_dir} — cleaned up before "
            "this stream consumed it (raise the log retention or restart "
            "the stream from a fresh checkpoint)"
        )
    adds = []
    has_dc_removes = False
    for line in open(commit).read().splitlines():
        if not line.strip():
            continue
        action = json.loads(line)
        if "add" in action and action["add"].get("dataChange", True):
            a = dict(action["add"])
            a["path"] = unquote(a["path"])
            adds.append(a)
        elif "remove" in action and action["remove"].get(
            "dataChange", True
        ):
            has_dc_removes = True
    return adds, has_dc_removes


def _fix_ts(val, type_name: str):
    """TimestampType values must reach Spark's Python DataSource layer
    tz-AWARE (Arrow refuses naive timestamps for the UTC-adjusted
    type); parquet files written with isAdjustedToUTC unset come back
    from pyarrow as naive datetimes holding UTC wall-clock values — pin
    them to UTC. ``timestamp_ntz`` stays naive by definition."""
    import datetime as dt

    if (
        type_name == "timestamp"
        and isinstance(val, dt.datetime)
        and val.tzinfo is None
    ):
        return val.replace(tzinfo=dt.timezone.utc)
    return val


def _commit_change_actions(log_dir: str, version: int) -> list[dict]:
    """ALL add/remove/cdc actions of one commit (paths decoded),
    preserving dataChange flags — the change-feed planner needs every
    side."""
    from urllib.parse import unquote

    commit = os.path.join(log_dir, f"{version:020d}.json")
    if not os.path.exists(commit):
        raise FileNotFoundError(
            f"commit {version} missing from {log_dir} — cleaned up before "
            "this stream consumed it (raise the log retention or restart "
            "the stream from a fresh checkpoint)"
        )
    out = []
    for line in open(commit).read().splitlines():
        if not line.strip():
            continue
        action = json.loads(line)
        for kind in ("add", "remove", "cdc"):
            if kind in action:
                a = dict(action[kind])
                a["path"] = unquote(a["path"])
                out.append({kind: a})
    return out


class DeltaFeedStreamReader(DataSourceStreamReader):
    def __init__(self, schema: StructType, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("delta_feed requires .option('path', <table>)")
        self.schema = schema
        self.start_version = int(options.get("startingversion", -1))
        # readChangeFeed mode: emit row-level changes (_change_type ∈
        # insert | update_preimage | update_postimage | delete) instead
        # of raw added rows; requires keyCols to pair pre/post images.
        self.cdf = str(options.get("readchangefeed", "false")).lower() == "true"
        key_opt = options.get("keycols", "")
        self.key_cols = [c.strip() for c in key_opt.split(",") if c.strip()]
        # keyCols is only needed for RECONSTRUCTION-mode commits
        # (rewrites without cdc actions); on a table whose rewrites all
        # carry write-side change files it may be omitted — planning
        # raises if a keyless reconstruction commit appears.
        # Reconstruction loads both sides of a rewrite into one task,
        # so it is byte-capped (clear error beats an opaque OOM).
        self.max_reconstruct = int(
            options.get("maxreconstructbytes", 256 * 1024 * 1024)
        )
        # name-mode column mapping: files and partitionValues carry
        # PHYSICAL names; resolve the logical→physical map once at
        # stream start (the schema is pinned for the query's lifetime,
        # Spark streaming semantics — a mid-stream rename needs a
        # restart, as in delta-spark).
        _root, _adds, meta = _replay(self.path, None)
        _cm_mode = _config_of(meta).get("delta.columnMapping.mode", "none")
        if _cm_mode in ("name", "id"):
            self.phys = {
                f["name"]: (f.get("metadata") or {}).get(
                    "delta.columnMapping.physicalName", f["name"]
                )
                for f in json.loads(meta["schemaString"])["fields"]
            }
        else:
            self.phys = None
        # id-mode tables (Iceberg conversions) resolve columns by
        # parquet FIELD ID per file — column names in the files are
        # arbitrary. Each file's columns are renamed to the table's
        # physical names by id (:meth:`_id_align`) right after the
        # pyarrow read, so the name-keyed plumbing below applies
        # unchanged (r12; refused through r11).
        if _cm_mode == "id":
            from ..operators.delta_reader import _idmode_check_shape

            _jfields = json.loads(meta["schemaString"])["fields"]
            for _f in _jfields:
                _idmode_check_shape(_f.get("type"), _f["name"])
            self.fids = {
                f["name"]: int(
                    (f.get("metadata") or {})["delta.columnMapping.id"]
                )
                for f in _jfields
            }
            # nested struct columns need per-LEVEL id alignment — keep
            # the schema-JSON fields for _id_align's recursion (r13)
            self._jfields_by_id = {
                self.fids[f["name"]]: f for f in _jfields
            }
        else:
            self.fids = None
            self._jfields_by_id = None
        # admission control: at most N commits per micro-batch, so a
        # restart against a long backlog drains in bounded batches
        # instead of one giant catch-up batch (maxFilesPerTrigger's
        # commit-grained analogue)
        self.max_commits = int(options.get("maxcommitspertrigger", 0)) or None
        # Size-based file grouping (plain mode): files of one commit
        # are bin-packed into tasks of up to this many bytes, so a
        # backfill over many small files doesn't pay one Python-worker
        # round-trip per file. 0 disables grouping (one file per task).
        self.max_bytes = int(
            options.get("maxbytespertask", 4 * 1024 * 1024)
        )
        # plain mode refuses change commits (dataChange removes) unless
        # the consumer opts into duplicates — delta-spark's
        # ignoreChanges contract. ignoredeletes is the narrower opt-out
        # (also from delta-spark): tolerate DELETE-ONLY commits
        # (dataChange removes with zero dataChange adds — e.g. a
        # partition drop), which add no rows to the feed and so cannot
        # duplicate anything; commits that REWRITE rows (removes +
        # adds, or DV re-adds) still require ignorechanges. Behavior
        # note: before round 10 plain mode silently planned the
        # re-added files of change commits; it now refuses them without
        # one of these options, matching delta-spark.
        self.ignore_changes = str(
            options.get("ignorechanges", "false")
        ).lower() == "true"
        self.ignore_deletes = str(
            options.get("ignoredeletes", "false")
        ).lower() == "true"
        self._progress: int | None = None  # known position, once seen
        self._fold_cols_cache: set | None = None  # see _fold_cols

    def _phys(self, name: str) -> str:
        return self.phys.get(name, name) if self.phys else name

    def _fold_cols(self) -> set:
        """Top-level columns with a non-UTF8_BINARY (fold-compare)
        collation, from the table's __COLLATIONS field metadata —
        resolved once per stream (the schema is pinned for the query's
        lifetime), not per planned commit."""
        if self._fold_cols_cache is None:
            _root, _adds, meta = _replay(self.path, None)
            out: set = set()
            for f in json.loads(meta["schemaString"]).get("fields", []):
                for name in ((f.get("metadata") or {}).get(
                    "__COLLATIONS"
                ) or {}).values():
                    if name.split(".", 1)[-1].upper() != "UTF8_BINARY":
                        out.add(f["name"])
            self._fold_cols_cache = out
        return self._fold_cols_cache

    @staticmethod
    def _unshred_cell(cell):
        """One parquet-level variant cell → the plain (value, metadata)
        pair. SHREDDED cells (a ``typed_value`` field present —
        VariantShredding.md) are reassembled with the external reader's
        from-spec logic and re-encoded through the spec encoder; plain
        pairs and nulls pass through untouched. Residual-only rows
        (typed_value null, value present) keep their original bytes."""
        if cell is None or "typed_value" not in cell:
            return cell
        if cell.get("typed_value") is None and cell.get("value") is not None:
            return {"value": cell["value"], "metadata": cell["metadata"]}
        from ..operators.delta_reader import (
            _shredded_value,
            _variant_metadata_keys,
        )
        from ..operators.variant import encode_variant

        keys = _variant_metadata_keys(cell["metadata"])
        py = _shredded_value(
            cell.get("value"), cell.get("typed_value"), keys
        )
        md, vb = encode_variant(py)
        return {"value": vb, "metadata": md}

    def _maybe_unshred(self, col, target_type):
        """Arrow-path hook: a struct column carrying ``typed_value``
        (a shredded variant) is rebuilt as the plain pair at the
        target type; anything else returns unchanged (zero-copy)."""
        import pyarrow as pa

        t = col.type
        if not pa.types.is_struct(t):
            return col
        names = {t.field(i).name for i in range(t.num_fields)}
        if "typed_value" not in names:
            return col
        cells = [self._unshred_cell(c) for c in col.to_pylist()]
        return pa.array(cells, type=target_type)

    def _id_align(self, table):
        """id-mode resolution: rename THIS file's columns to the
        table's physical names by matching each column's stamped
        ``PARQUET:field_id`` against ``delta.columnMapping.id`` —
        afterwards the shared name-keyed lookups apply unchanged.
        Nested struct columns additionally align each inner LEVEL by
        its stamped id, renaming to the LOGICAL inner names (r13) —
        zero-copy (children arrays are reused), so the arrow fast path
        survives. Columns without a stamped id (e.g. ``_change_type``
        in change files) keep their names. No-op on non-id tables."""
        if not self.fids:
            return table
        import pyarrow as pa

        cols, fields = [], []
        for i, f in enumerate(table.schema):
            fid = (f.metadata or {}).get(b"PARQUET:field_id")
            jf = (
                self._jfields_by_id.get(int(fid)) if fid is not None else None
            )
            if jf is None:
                fields.append(f)
                cols.append(table.column(i))
                continue
            name = self.phys[jf["name"]]
            col = table.column(i)
            if isinstance(jf["type"], dict):
                col = _align_nested_arrow(col.combine_chunks(), jf["type"])
                fields.append(pa.field(name, col.type, f.nullable))
            else:
                fields.append(pa.field(name, f.type, f.nullable, f.metadata))
            cols.append(col)
        return pa.table(cols, schema=pa.schema(fields))

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
        if not self.cdf:
            for v in range(int(start["version"]) + 1, int(end["version"]) + 1):
                adds_v, has_dc_removes = _commit_data_adds(log_dir, v)
                if (
                    has_dc_removes
                    and not self.ignore_changes
                    and not (self.ignore_deletes and not adds_v)
                ):
                    # delta-spark's streaming source errors on change
                    # commits too, unless ignoreChanges/skipChangeCommits
                    # is opted into — planning the re-added files here
                    # would silently duplicate every surviving row
                    raise ValueError(
                        f"commit {v} of {self.path} is a change commit "
                        "(DELETE/UPDATE/MERGE: dataChange removes "
                        "alongside adds); plain feed mode would emit "
                        "surviving rows twice. Use mode=cdf (exact "
                        "row-level changes), pass ignorechanges=true "
                        "to accept duplicates, or ignoredeletes=true "
                        "to tolerate delete-only commits."
                    )
                group: list = []
                group_bytes = 0
                for a in adds_v:
                    size = int(a.get("size", 0))
                    if group and (
                        self.max_bytes <= 0
                        or group_bytes + size > self.max_bytes
                    ):
                        parts.append(_FeedFilePartition(v, root, group))
                        group, group_bytes = [], 0
                    group.append(
                        (a["path"], a.get("partitionValues", {}), _dv_of(a))
                    )
                    group_bytes += size
                if group:
                    parts.append(_FeedFilePartition(v, root, group))
            return parts
        # Change-feed planning: the removed side of each commit's diff
        # comes from the PRE-commit live set, reconstructed by one log
        # replay at the batch's start version and advanced through the
        # commits — O(log) driver-side work per batch, no data reads.
        sv = int(start["version"])
        live: dict[str, dict] = {}
        if sv >= 0:
            _root, adds0, _meta = _replay(self.path, sv)
            live = dict(adds0)
        for v in range(sv + 1, int(end["version"]) + 1):
            adds_v: list = []
            removed_v: list = []
            cdc_v: list = []
            touched_bytes = 0
            for action in _commit_change_actions(log_dir, v):
                if "add" in action:
                    a = action["add"]
                    live[a["path"]] = a
                    if a.get("dataChange", True):
                        adds_v.append(
                            (a["path"], a.get("partitionValues", {}),
                             _dv_of(a))
                        )
                        touched_bytes += int(a.get("size", 0))
                elif "remove" in action:
                    r = action["remove"]
                    prev = live.pop(r["path"], None)
                    if r.get("dataChange", True) and prev is not None:
                        removed_v.append(
                            (r["path"], prev.get("partitionValues", {}),
                             _dv_of(prev))
                        )
                        touched_bytes += int(prev.get("size", 0))
                else:
                    cdc_v.append(action["cdc"])
            if cdc_v:
                # write-side change files: stream them like plain-mode
                # adds (arrow batches, size-bounded groups) — the diff
                # already happened at commit time
                ts = _commit_time_ms_external(log_dir, v)
                group: list = []
                group_bytes = 0
                for c in cdc_v:
                    size = int(c.get("size", 0))
                    if group and (
                        self.max_bytes <= 0
                        or group_bytes + size > self.max_bytes
                    ):
                        parts.append(
                            _FeedCdcFilesPartition(v, root, group, ts)
                        )
                        group, group_bytes = [], 0
                    group.append(c["path"])
                    group_bytes += size
                if group:
                    parts.append(_FeedCdcFilesPartition(v, root, group, ts))
                continue
            if not (adds_v or removed_v):
                continue
            if removed_v and adds_v:
                # keyed reconstruction: one task loads BOTH sides
                if not self.key_cols:
                    raise ValueError(
                        f"commit {v} of {self.path} rewrote files and "
                        "carries no cdc actions — pass "
                        ".option('keyCols', 'a,b') to reconstruct its "
                        "changes, or enable_change_data_feed on the "
                        "table so rewrites materialize change files"
                    )
                folded = sorted(set(self.key_cols) & self._fold_cols())
                if folded:
                    # reconstruction groups rows in a PYTHON dict — a
                    # byte-wise compare that would diverge from the
                    # table's fold (UTF8_LCASE) key semantics
                    raise ValueError(
                        f"keyCols {folded} declare a non-default "
                        "collation — reconstruction-mode CDF compares "
                        "keys byte-wise and would diverge from the "
                        "table's fold semantics; enable_change_data_feed "
                        "on the table (write-side change files carry "
                        "the rows, no diff needed) or use the batch "
                        "read_delta_cdf"
                    )
                if (
                    self.max_reconstruct > 0
                    and touched_bytes > self.max_reconstruct
                ):
                    raise ValueError(
                        f"commit {v} of {self.path} touches "
                        f"{touched_bytes} bytes; reconstruction-mode CDF "
                        "loads both sides of the rewrite into one task "
                        f"(cap {self.max_reconstruct}). Enable "
                        "change-data-feed on the table "
                        "(enable_change_data_feed) so commits carry "
                        "change files, use the batch read_delta_cdf, or "
                        "raise maxReconstructBytes explicitly."
                    )
            parts.append(
                _FeedCdfPartition(
                    v, root, adds_v, removed_v,
                    _commit_time_ms_external(log_dir, v),
                )
            )
        return parts

    def _file_rows(self, root: str, rel: str, pvals_raw: dict, fields,
                   dv=None):
        """One parquet file's rows as tuples in base-schema order, with
        partition columns restored, pre-evolution columns nulled, and
        DV'd (logically deleted) row indexes dropped."""
        import pyarrow.parquet as pq

        types = {f.name: f.dataType.typeName() for f in fields}
        # pvals_raw is keyed by PHYSICAL column name (identity when the
        # table has no mapping)
        log_by_phys = {self._phys(f.name): f.name for f in fields}
        pvals = {
            log_by_phys.get(c, c): _cast_partition_value(
                v, types.get(log_by_phys.get(c, c), "string")
            )
            for c, v in pvals_raw.items()
        }
        table = self._id_align(pq.read_table(os.path.join(root, rel)))
        present = set(table.column_names)
        rows = table.to_pylist()
        if dv is not None:
            dead = _dv_deleted_rows(root, dv)
            rows = [r for i, r in enumerate(rows) if i not in dead]
        def cell(row, f):
            v = _fix_ts(row[self._phys(f.name)], types[f.name])
            # shredded variant cells (typed_value present) reassemble
            # to the plain pair so reconstruction diffs compare like
            # with like across shredded and unshredded file versions
            if types[f.name] == "variant" and isinstance(v, dict):
                v = self._unshred_cell(v)
            return v

        for row in rows:
            yield tuple(
                pvals[f.name]
                if f.name in pvals
                else (
                    cell(row, f)
                    if self._phys(f.name) in present
                    else None
                )
                for f in fields
            )

    @staticmethod
    def _vals_eq(a: tuple, b: tuple) -> bool:
        import math

        if len(a) != len(b):
            return False
        for x, y in zip(a, b):
            if x == y:
                continue
            if (
                isinstance(x, float)
                and isinstance(y, float)
                and math.isnan(x)
                and math.isnan(y)
            ):
                continue
            return False
        return True

    def _read_cdf(self, partition: _FeedCdfPartition) -> Iterator[tuple]:
        import datetime as dt

        ts = dt.datetime.fromtimestamp(
            partition.ts_ms / 1000.0, tz=dt.timezone.utc
        )
        base_fields = [
            f
            for f in self.schema.fields
            if f.name
            not in ("_change_type", "_commit_version", "_commit_timestamp")
        ]
        key_idx = [
            i for i, f in enumerate(base_fields) if f.name in self.key_cols
        ]
        if len(key_idx) != len(self.key_cols):
            have = {f.name for f in base_fields}
            raise ValueError(
                f"keyCols {sorted(set(self.key_cols) - have)} not in table "
                "schema"
            )
        nonkey_idx = [
            i for i in range(len(base_fields)) if i not in key_idx
        ]
        v = partition.version

        def load(files) -> dict:
            out: dict = {}
            for rel, pvals, dv in files:
                for row in self._file_rows(
                    partition.root, rel, pvals, base_fields, dv
                ):
                    out[tuple(row[i] for i in key_idx)] = row
            return out

        if not partition.removed:
            for rel, pvals, dv in partition.adds:
                for row in self._file_rows(
                    partition.root, rel, pvals, base_fields, dv
                ):
                    yield row + ("insert", v, ts)
            return
        old = load(partition.removed)
        new = load(partition.adds)
        for k in sorted(old.keys() | new.keys(), key=repr):
            o, n = old.get(k), new.get(k)
            if o is None:
                yield n + ("insert", v, ts)
            elif n is None:
                yield o + ("delete", v, ts)
            elif not self._vals_eq(
                tuple(o[i] for i in nonkey_idx),
                tuple(n[i] for i in nonkey_idx),
            ):
                yield o + ("update_preimage", v, ts)
                yield n + ("update_postimage", v, ts)
            # equal images: carried over by the rewrite — not a change

    def _read_cdc_files(
        self, partition: _FeedCdcFilesPartition
    ) -> Iterator:
        """Write-side change files as arrow batches: every column
        (including partition columns) is materialized in-file under its
        physical name plus ``_change_type``;  ``_commit_version`` /
        ``_commit_timestamp`` are constants of the commit."""
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        target = to_arrow_schema(self.schema)
        for rel in partition.files:
            tbl = self._id_align(
                pq.read_table(os.path.join(partition.root, rel))
            )
            n = tbl.num_rows
            present = set(tbl.column_names)
            arrays = []
            for f in target:
                if f.name == "_commit_version":
                    arrays.append(
                        pa.repeat(pa.scalar(partition.version, f.type), n)
                    )
                elif f.name == "_commit_timestamp":
                    import datetime as dt

                    arrays.append(
                        pa.repeat(
                            pa.scalar(
                                dt.datetime.fromtimestamp(
                                    partition.ts_ms / 1000.0,
                                    tz=dt.timezone.utc,
                                ),
                                f.type,
                            ),
                            n,
                        )
                    )
                else:
                    pname = (
                        "_change_type"
                        if f.name == "_change_type"
                        else self._phys(f.name)
                    )
                    if pname in present:
                        col = tbl.column(pname).combine_chunks()
                        col = self._maybe_unshred(col, f.type)
                        if (
                            pa.types.is_timestamp(f.type)
                            and f.type.tz is not None
                            and pa.types.is_timestamp(col.type)
                            and col.type.tz is None
                        ):
                            col = pc.assume_timezone(col, f.type.tz)
                        arrays.append(col.cast(f.type))
                    else:
                        arrays.append(pa.nulls(n, f.type))  # pre-evolution
            out = pa.table(arrays, schema=target).combine_chunks()
            yield from out.to_batches()

    def read(self, partition) -> Iterator:
        if isinstance(partition, _FeedCdcFilesPartition):
            yield from self._read_cdc_files(partition)
            return
        if isinstance(partition, _FeedCdfPartition):
            yield from self._read_cdf(partition)
            return
        # Plain mode streams ARROW RECORD BATCHES, not Python tuples:
        # Spark 4's Python DataSource consumes yielded
        # pyarrow.RecordBatch objects directly, so the per-row
        # Python-object conversion (the backfill bottleneck — measured
        # 6× over a JVM read when emitting tuples) disappears; data
        # moves parquet → arrow → Spark without materializing rows.
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        target = to_arrow_schema(self.schema)
        types = {f.name: f.dataType.typeName() for f in self.schema.fields}
        for rel, pvals_raw, dv in partition.files:
            tbl = self._id_align(
                pq.read_table(os.path.join(partition.root, rel))
            )
            if dv is not None:
                # DV'd positions are logically deleted — drop them
                # before the batch leaves the task (arrow take keeps
                # the zero-copy path for the survivors)
                dead = _dv_deleted_rows(partition.root, dv)
                tbl = tbl.take(
                    pa.array(
                        [i for i in range(tbl.num_rows) if i not in dead],
                        type=pa.int64(),
                    )
                )
            n = tbl.num_rows
            present = set(tbl.column_names)
            arrays = []
            for f in target:
                pname = self._phys(f.name)  # physical lookup key
                if f.name == "_commit_version":
                    arrays.append(
                        pa.repeat(pa.scalar(partition.version, f.type), n)
                    )
                elif pname in pvals_raw:
                    v = _cast_partition_value(
                        pvals_raw[pname], types.get(f.name, "string")
                    )
                    arrays.append(pa.repeat(pa.scalar(v, f.type), n))
                elif pname in present:
                    col = tbl.column(pname).combine_chunks()
                    col = self._maybe_unshred(col, f.type)
                    if (
                        pa.types.is_timestamp(f.type)
                        and f.type.tz is not None
                        and pa.types.is_timestamp(col.type)
                        and col.type.tz is None
                    ):
                        # naive parquet timestamps hold UTC wall-clock
                        # values — pin, don't shift
                        col = pc.assume_timezone(col, f.type.tz)
                    arrays.append(col.cast(f.type))
                else:
                    arrays.append(pa.nulls(n, f.type))  # pre-evolution
            out = pa.table(arrays, schema=target).combine_chunks()
            yield from out.to_batches()

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
        cdf = str(self.options.get("readchangefeed", "false")).lower() == "true"
        extra = (
            [StructField("_change_type", StringType())] if cdf else []
        ) + [StructField("_commit_version", LongType())]
        if cdf:
            # batch-CDF column parity (read_delta_cdf emits all three)
            extra.append(StructField("_commit_timestamp", TimestampType()))
        return StructType(base.fields + extra)

    def streamReader(self, schema: StructType) -> DeltaFeedStreamReader:
        return DeltaFeedStreamReader(schema, self.options)
