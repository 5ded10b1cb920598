"""Remote-FS metadata I/O batching (r16 verdict #7).

The local direct-Python fast paths cover the bench environment; on
s3a/hdfs/abfs every Hadoop-FS call from Python is a py4j round trip
and (on object stores) a metadata RPC. These tests DISGUISE a local
table as remote — monkeypatching ``_local_path`` to always miss — and
count the calls crossing the fs handle, pinning that:

- ``_list_log_versions`` costs O(1) listings, not one ``exists`` probe
  per version;
- ``_read_text`` moves a commit file in one buffered transfer, not one
  ``readLine`` round trip per line;
- ``_replay_log`` adds no per-version existence probe on top;
- ``medallion._tail_versions`` lists once instead of probing per
  manifest version.

Also pins the r16-ADVICE ``_local_path`` gates themselves: bare paths
are local only under a file-scheme fs.defaultFS, and ``file://host/...``
URIs with a foreign authority are NOT treated as local.
"""

from __future__ import annotations

from collections import Counter

import pytest

from portfolio_data_pipelines_spark.operators import delta_log as dl
from portfolio_data_pipelines_spark.operators import medallion as med


class _CountingFS:
    """Wrap a py4j Hadoop FileSystem handle, counting method calls."""

    def __init__(self, fs):
        object.__setattr__(self, "_fs", fs)
        object.__setattr__(self, "calls", Counter())

    def __getattr__(self, name):
        attr = getattr(self._fs, name)
        if not callable(attr):
            return attr
        calls = self.calls

        def wrapped(*a, **k):
            calls[name] += 1
            return attr(*a, **k)

        return wrapped


@pytest.fixture()
def no_local_fastpath(monkeypatch):
    """Disguise every path as remote: the Hadoop branch must run."""
    monkeypatch.setattr(dl, "_local_path", lambda p: None)
    monkeypatch.setattr(med, "_local_path", lambda p: None)


def _make_table(spark, tmp_path, n_appends: int) -> str:
    path = str(tmp_path / "tbl")
    df = spark.range(10).coalesce(1).selectExpr("id", "id * 2 AS v")
    for _ in range(n_appends):
        dl.write_delta(spark, df, path)
    return path


def test_list_log_versions_lists_once(spark, tmp_path, no_local_fastpath):
    path = _make_table(spark, tmp_path, 6)
    fs, _, jvm = med._hadoop_fs(spark, path)
    cfs = _CountingFS(fs)
    versions = dl._list_log_versions(cfs, jvm, path)
    assert versions == list(range(6))
    assert cfs.calls["listStatus"] == 1
    # exists: the log-dir probe + the _last_checkpoint pointer probe —
    # NOT one per version (the r16 form made 7+ here)
    assert cfs.calls["exists"] <= 2
    assert sum(cfs.calls.values()) <= 4


def test_read_text_single_transfer(spark, tmp_path, no_local_fastpath):
    path = _make_table(spark, tmp_path, 1)
    fs, _, jvm = med._hadoop_fs(spark, path)
    cfs = _CountingFS(fs)
    text = dl._read_text(cfs, jvm, f"{path}/{dl._log_path(0)}")
    assert cfs.calls["open"] == 1
    # byte-identical with the local fast path's read
    with open(f"{path}/{dl._log_path(0)}", encoding="utf-8") as f:
        assert text == f.read().rstrip("\n")


def test_replay_log_no_per_version_probes(
    spark, tmp_path, no_local_fastpath, monkeypatch
):
    path = _make_table(spark, tmp_path, 8)
    fs, _, jvm = med._hadoop_fs(spark, path)
    cfs = _CountingFS(fs)
    monkeypatch.setattr(
        med, "_hadoop_fs", lambda s, p: (cfs, None, jvm)
    )
    monkeypatch.setattr(
        dl, "_hadoop_fs", lambda s, p: (cfs, None, jvm)
    )
    st = dl._replay_log(spark, path, None)
    assert st.version == 7
    assert len(st.adds) == 8
    # 8 commit reads (one open each) + one listing + ≤2 exists — the
    # r16 form added 8 more exists probes and ~8 readLine trips per file
    assert cfs.calls["open"] == 8
    assert cfs.calls["listStatus"] == 1
    assert cfs.calls["exists"] <= 2


def test_tail_versions_lists_once(spark, tmp_path, no_local_fastpath):
    import pyspark.sql.functions as F

    lake = str(tmp_path / "lake")
    df = spark.range(8).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 2).cast("string").alias("day"),
        F.col("id").cast("double").alias("value"),
    )
    for _ in range(3):
        med.commit_versioned(
            spark, lake, df, partition_col="day", derive_from="day"
        )
    fs, _, jvm = med._hadoop_fs(spark, lake)
    cfs = _CountingFS(fs)
    tail = med._tail_versions(cfs, jvm, lake, 0)
    assert tail == [1, 2, 3]
    assert cfs.calls["listStatus"] == 1
    assert cfs.calls["exists"] == 0


def test_local_path_gates():
    # file: URIs — empty/localhost authority is local, foreign is not
    assert med._local_path("file:///a/b") == "/a/b"
    assert med._local_path("file:/a/b") == "/a/b"
    assert med._local_path("file://localhost/a/b") == "/a/b"
    assert med._local_path("file://nas01/a/b") is None
    assert med._local_path("s3a://bucket/a") is None
    assert med._local_path("hdfs:///a/b") is None


def test_bare_path_gated_on_default_fs(monkeypatch):
    # simulate a cluster: fs.defaultFS = hdfs://... ⇒ bare paths are
    # NOT local (r16 ADVICE: the fast path would read an existing HDFS
    # table as empty and commit to the driver's local disk)
    monkeypatch.setattr(med, "_DEFAULT_FS_LOCAL", False)
    assert med._local_path("/warehouse/tbl") is None
    monkeypatch.setattr(med, "_DEFAULT_FS_LOCAL", True)
    assert med._local_path("/warehouse/tbl") == "/warehouse/tbl"
