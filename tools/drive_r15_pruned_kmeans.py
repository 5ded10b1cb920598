"""Drive the r15 pruned k-means assignment from the public surface.

Checks (1) oracle parity of the two rewritten declared queries at
sf0.01 through the driver contract, (2) the pruned-vs-exact assignment
contract (full-probe equality, default-probe agreement), (3) the
operator surface (kmeans_refine / cluster_cosine_pairs) end to end.

    PYTHONPATH=/root/repo python tools/drive_r15_pruned_kmeans.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from portfolio_data_pipelines_spark.session import get_spark  # noqa: E402

spark = get_spark(master="local[4]", extra_conf={
    "spark.ui.enabled": "false", "spark.sql.shuffle.partitions": "4"})

import __spark_entry__ as e  # noqa: E402

qs, osql = e.queries(), e.oracle_sql()
SF = "/root/testdata/sf0.01"
con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
for name in ("kmeans_embedding_clusters", "semdedup_pairs"):
    pdf = qs[name](spark, SF).toPandas()
    odf = con.execute(osql[name]).df()
    cols = sorted(pdf.columns)
    a = pdf[cols].astype(str).sort_values(cols).reset_index(drop=True)
    b = odf[cols].astype(str).sort_values(cols).reset_index(drop=True)
    assert a.equals(b), name
    print(name, len(pdf), "MATCH")

from pyspark.sql import functions as F  # noqa: E402

from portfolio_data_pipelines_spark.operators.similarity import (  # noqa: E402
    assign_centroids,
    assign_centroids_pruned,
)
from portfolio_data_pipelines_spark.sources.parquet import scan_table  # noqa: E402

emb = scan_table(spark, SF, "embeddings")
cen = emb.filter(F.col("vec_id") % 53 == 0).select(
    F.col("vec_id").alias("cid"), "embedding")
exact = {(r["vec_id"], r["cid"]) for r in
         assign_centroids(emb, cen, "embedding", "vec_id", "cid").collect()}
full = {(r["vec_id"], r["cid"]) for r in
        assign_centroids_pruned(
            emb, cen, "embedding", "vec_id", "cid", nprobe=10**6).collect()}
assert full == exact, "full-probe pruning must equal exact argmax"
pruned = {r["vec_id"]: r["cid"] for r in
          assign_centroids_pruned(emb, cen, "embedding", "vec_id", "cid").collect()}
agree = sum(1 for k, v in pruned.items() if (k, v) in exact) / len(pruned)
print(f"default-probe agreement vs exact: {agree:.3f}")
assert agree >= 0.7
print("PRUNED-KMEANS DRIVE OK")
