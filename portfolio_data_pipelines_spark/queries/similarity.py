"""Similarity-search declared queries (SURVEY §2.10, milestone M5).

Query set = vectors with ``vec_id < 5``; corpus = all 500 embeddings.
Brute-force and IVF are fully deterministic (decimal-exact cosine,
deterministic centroid choice and tie-breaks) → DuckDB oracles.
Random-hyperplane LSH depends on engine-side seeded hyperplanes →
rows-only check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.similarity import cosine_topk, ivf_topk, rp_lsh_topk
from ..sources.parquet import scan_table
from . import query

#: Shared oracle scaffolding: per-element table + norms (decimal-exact).
_E_NRM = """
    e AS (
        SELECT vec_id, CAST(x AS DOUBLE) AS x, i
        FROM (SELECT vec_id, unnest(embedding) AS x,
                     generate_subscripts(embedding, 1) AS i
              FROM embeddings)
    ),
    nrm AS (
        SELECT vec_id,
               sqrt(CAST(SUM(CAST(x * x AS DECIMAL(30,12))) AS DOUBLE)) AS nv
        FROM e GROUP BY vec_id
    )
"""


@query(
    "cosine_topk_bruteforce",
    oracle=f"""
    WITH {_E_NRM},
    dots AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               CAST(SUM(CAST(q.x * c.x AS DECIMAL(30,12))) AS DOUBLE) AS dot
        FROM e q
        JOIN e c ON q.i = c.i AND q.vec_id < 5 AND c.vec_id <> q.vec_id
        GROUP BY 1, 2
    )
    SELECT query_id, neighbor_id, cosine, "rank"
    FROM (
        SELECT d.query_id, d.neighbor_id,
               d.dot / (nq.nv * nn.nv) AS cosine,
               ROW_NUMBER() OVER (
                   PARTITION BY d.query_id
                   ORDER BY d.dot / (nq.nv * nn.nv) DESC, d.neighbor_id ASC
               ) AS "rank"
        FROM dots d
        JOIN nrm nq ON d.query_id = nq.vec_id
        JOIN nrm nn ON d.neighbor_id = nn.vec_id
    )
    WHERE "rank" <= 10
    """,
)
def cosine_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 neighbors for each query vector (vec_id < 5):
    broadcast queries × full corpus scan, rank window per query."""
    emb = scan_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return cosine_topk(emb, queries, "embedding", "vec_id", k=10).orderBy(
        "query_id", "rank"
    )


@query(
    "ann_ivf_topk",
    oracle=f"""
    WITH {_E_NRM},
    cen AS (SELECT vec_id AS centroid_id FROM embeddings WHERE vec_id % 53 = 0),
    simc AS (
        SELECT v.vec_id, c.centroid_id,
               CAST(SUM(CAST(v.x * ce.x AS DECIMAL(30,12))) AS DOUBLE) AS dot
        FROM e v
        JOIN cen c ON TRUE
        JOIN e ce ON ce.vec_id = c.centroid_id AND ce.i = v.i
        GROUP BY 1, 2
    ),
    assign AS (
        SELECT vec_id, centroid_id
        FROM (
            SELECT s.vec_id, s.centroid_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY s.vec_id
                       ORDER BY s.dot / (nv.nv * nc.nv) DESC, s.centroid_id ASC
                   ) AS rk
            FROM simc s
            JOIN nrm nv ON s.vec_id = nv.vec_id
            JOIN nrm nc ON s.centroid_id = nc.vec_id
        )
        WHERE rk = 1
    ),
    dots AS (
        SELECT qa.vec_id AS query_id, ca.vec_id AS neighbor_id,
               CAST(SUM(CAST(qe.x * cev.x AS DECIMAL(30,12))) AS DOUBLE) AS dot
        FROM assign qa
        JOIN assign ca ON ca.centroid_id = qa.centroid_id AND ca.vec_id <> qa.vec_id
        JOIN e qe ON qe.vec_id = qa.vec_id
        JOIN e cev ON cev.vec_id = ca.vec_id AND cev.i = qe.i
        WHERE qa.vec_id < 5
        GROUP BY 1, 2
    )
    SELECT query_id, neighbor_id, cosine, "rank"
    FROM (
        SELECT d.query_id, d.neighbor_id,
               d.dot / (nq.nv * nn.nv) AS cosine,
               ROW_NUMBER() OVER (
                   PARTITION BY d.query_id
                   ORDER BY d.dot / (nq.nv * nn.nv) DESC, d.neighbor_id ASC
               ) AS "rank"
        FROM dots d
        JOIN nrm nq ON d.query_id = nq.vec_id
        JOIN nrm nn ON d.neighbor_id = nn.vec_id
    )
    WHERE "rank" <= 10
    """,
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-10 via an inverted-file index: deterministic centroids
    (every 53rd vec_id → 10 cells), nearest-centroid assignment, search
    restricted to the query's cell (nprobe=1). The 100 TB-shaped path:
    per-query work drops from |corpus| to |corpus|/n_cells.

    Recall caveat: the synthetic embeddings are near-uniform (max
    pairwise cosine ≈ 0.51, no cluster structure), so nprobe=1 recall
    vs brute force is ~34% here — on real clustered embeddings IVF
    recall is far higher. The oracle checks the IVF *semantics*
    (assignment + cell-restricted ranking), not recall."""
    emb = scan_table(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") % 53 == 0).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    queries = emb.filter(F.col("vec_id") < 5)
    return ivf_topk(emb, queries, centroids, "embedding", "vec_id", k=10).orderBy(
        "query_id", "rank"
    )


@query("ann_rp_lsh_topk")  # rows-only: hyperplanes are engine-side constants
def ann_rp_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-10 via random-hyperplane LSH (4 tables × 8 bits, seed 42):
    candidates share a sign-pattern bucket in any table, then exact
    cosine + rank. On the near-uniform synthetic embeddings 8-bit
    buckets are sparse (recall ~4% vs brute force); real corpora with
    angular structure need fewer bits or more tables — the operator
    exposes both knobs."""
    emb = scan_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return rp_lsh_topk(
        emb, queries, "embedding", "vec_id", dim=64, k=10, n_planes=8, n_tables=4
    ).orderBy("query_id", "rank")
