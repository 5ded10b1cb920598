"""Liquid clustering state (public Delta protocol, clustered tables):
``enable_clustering`` records the clustering columns in the
``delta.clustering`` metadata domain and declares the ``clustering``
writer feature; OPTIMIZE with no explicit zorder_by clusters on the
recorded columns; readers need nothing (clustered tables read like any
other — pinned through both readers)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from portfolio_data_pipelines_spark.operators.delta_log import (
    clustering_columns,
    enable_clustering,
    optimize_delta,
    read_delta,
    write_delta,
)
from portfolio_data_pipelines_spark.operators.delta_reader import (
    read_delta_external,
)


def _mk(spark, tmp_path, name, n=4000):
    path = str(tmp_path / name)
    df = spark.range(n).select(
        F.col("id"),
        (F.col("id") % 97).alias("a"),
        ((F.col("id") * 31) % 89).alias("b"),
    )
    # several small files so OPTIMIZE has something to cluster
    write_delta(spark, df.repartition(6), path)
    return path


def test_enable_records_domain_and_feature(spark, tmp_path):
    path = _mk(spark, tmp_path, "t_cl")
    v = enable_clustering(spark, path, ["a", "b"])
    acts = [
        json.loads(l)
        for l in open(f"{path}/_delta_log/{v:020d}.json")
        if l.strip()
    ]
    proto = next(a["protocol"] for a in acts if "protocol" in a)
    assert {"clustering", "domainMetadata"} <= set(proto["writerFeatures"])
    assert "readerFeatures" not in proto or not set(
        proto.get("readerFeatures") or []
    ) - {"columnMapping"}
    dm = next(a["domainMetadata"] for a in acts if "domainMetadata" in a)
    assert dm["domain"] == "delta.clustering"
    assert json.loads(dm["configuration"]) == {
        "clusteringColumns": [["a"], ["b"]]
    }
    assert clustering_columns(spark, path) == ["a", "b"]
    # unknown / partition columns refused
    with pytest.raises(ValueError, match="not in schema"):
        enable_clustering(spark, path, ["nope"])


def test_optimize_clusters_on_recorded_columns(spark, tmp_path):
    path = _mk(spark, tmp_path, "t_cl_opt")
    enable_clustering(spark, path, ["a"])
    rows_before = sorted(
        tuple(r) for r in read_delta(spark, path).collect()
    )
    v = optimize_delta(spark, path)
    assert v is not None
    acts = [
        json.loads(l)
        for l in open(f"{path}/_delta_log/{v:020d}.json")
        if l.strip()
    ]
    info = next(a["commitInfo"] for a in acts if "commitInfo" in a)
    assert json.loads(info["operationParameters"]["zOrderBy"]) == ["a"]
    # rows unchanged, layout selective on `a`: after clustering, a
    # narrow `a` range plans a strict subset of the live files
    assert sorted(
        tuple(r) for r in read_delta(spark, path).collect()
    ) == rows_before
    all_files = set(read_delta(spark, path).inputFiles())
    narrow = set(
        read_delta(spark, path, predicate={"a": (0, 5)}).inputFiles()
    )
    assert narrow and len(narrow) < len(all_files)
    # both readers agree post-clustering
    names, rows = read_delta_external(path)
    assert sorted(rows) == rows_before
    # re-cluster on different columns: the next OPTIMIZE follows
    enable_clustering(spark, path, ["b"])
    v2 = optimize_delta(spark, path)
    acts2 = [
        json.loads(l)
        for l in open(f"{path}/_delta_log/{v2:020d}.json")
        if l.strip()
    ]
    info2 = next(a["commitInfo"] for a in acts2 if "commitInfo" in a)
    assert json.loads(info2["operationParameters"]["zOrderBy"]) == ["b"]


def test_describe_detail_surfaces_clustering_columns(spark, tmp_path):
    from portfolio_data_pipelines_spark.operators.delta_log import (
        describe_detail,
    )

    path = _mk(spark, tmp_path, "t_cl_desc", n=100)
    assert describe_detail(spark, path).first()["clusteringColumns"] == []
    enable_clustering(spark, path, ["b", "a"])
    row = describe_detail(spark, path).first()
    assert row["clusteringColumns"] == ["b", "a"]
    assert "clustering" in row["tableFeatures"]
