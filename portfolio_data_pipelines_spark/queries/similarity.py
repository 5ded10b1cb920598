"""Similarity-search declared queries (SURVEY §2.10, milestone M5).

Query set = vectors with ``vec_id < 5``; corpus = all 500 embeddings.
Brute-force and IVF are fully deterministic (sequential-double cosine,
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

#: Shared oracle scaffolding: vectors as DOUBLE[] + sequential-double
#: norms. ``list_dot_product`` folds left-to-right in double — the same
#: accumulation order as the Spark side's ``F.aggregate`` ⇒ bit-identical.
_E_NRM = """
    ev AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
               sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                     CAST(embedding AS DOUBLE[]))) AS nv
        FROM embeddings
    )
"""


@query(
    "cosine_topk_bruteforce",
    oracle=f"""
    WITH {_E_NRM}
    SELECT query_id, neighbor_id, cosine, "rank"
    FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               list_dot_product(q.v, c.v) / (q.nv * c.nv) AS cosine,
               ROW_NUMBER() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY list_dot_product(q.v, c.v) / (q.nv * c.nv) DESC,
                            c.vec_id ASC
               ) AS "rank"
        FROM ev q
        JOIN ev c ON q.vec_id < 5 AND c.vec_id <> q.vec_id
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
    assign AS (
        SELECT vec_id, v, nv, centroid_id
        FROM (
            SELECT e.vec_id, e.v, e.nv, c.vec_id AS centroid_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY list_dot_product(e.v, c.v) / (e.nv * c.nv) DESC,
                                c.vec_id ASC
                   ) AS rk
            FROM ev e
            JOIN ev c ON c.vec_id % 53 = 0
        )
        WHERE rk = 1
    )
    SELECT query_id, neighbor_id, cosine, "rank"
    FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               list_dot_product(q.v, c.v) / (q.nv * c.nv) AS cosine,
               ROW_NUMBER() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY list_dot_product(q.v, c.v) / (q.nv * c.nv) DESC,
                            c.vec_id ASC
               ) AS "rank"
        FROM assign q
        JOIN assign c ON c.centroid_id = q.centroid_id AND c.vec_id <> q.vec_id
        WHERE q.vec_id < 5
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


@query(
    "ann_rp_lsh_topk",
    oracle=f"""
    WITH {_E_NRM},
    planes AS (
        SELECT t, p,
               [CASE WHEN ((strpos('0123456789abcdef',
                                   substring(md5(concat_ws(':', 'rp', t, p, d)),
                                             1, 1)) - 1) & 1) = 1
                     THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END
                FOR d IN range(0, 64)] AS plane
        FROM range(0, 4) ts(t), range(0, 8) ps(p)
    ),
    buckets AS (
        SELECT e.vec_id, pl.t,
               SUM(CASE WHEN list_dot_product(e.v, pl.plane) >= 0
                        THEN (CAST(1 AS BIGINT) << pl.p) ELSE 0 END) AS bucket
        FROM ev e, planes pl
        GROUP BY e.vec_id, pl.t
    ),
    cand AS (
        SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
        FROM buckets q
        JOIN buckets c ON q.t = c.t AND q.bucket = c.bucket
        WHERE q.vec_id < 5 AND c.vec_id <> q.vec_id
    )
    SELECT query_id, neighbor_id, cosine, "rank"
    FROM (
        SELECT cand.query_id, cand.neighbor_id,
               list_dot_product(q.v, c.v) / (q.nv * c.nv) AS cosine,
               ROW_NUMBER() OVER (
                   PARTITION BY cand.query_id
                   ORDER BY list_dot_product(q.v, c.v) / (q.nv * c.nv) DESC,
                            cand.neighbor_id ASC
               ) AS "rank"
        FROM cand
        JOIN ev q ON q.vec_id = cand.query_id
        JOIN ev c ON c.vec_id = cand.neighbor_id
    )
    WHERE "rank" <= 10
    """,
)
def ann_rp_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-10 via random-hyperplane LSH (4 tables × 8 bits):
    candidates share a sign-pattern bucket in any table, then exact
    cosine + rank. Hyperplanes are md5-derived Rademacher ±1 vectors
    (r3) — deterministic in BOTH engines, so bucket assignment,
    candidate generation and ranking all replicate in the DuckDB
    oracle; r2's seeded Gaussian planes (still available via
    ``plane_dist="gaussian"``) forced a rows-only check. On the
    near-uniform synthetic embeddings 8-bit buckets are sparse (recall
    ~4% vs brute force); real corpora with angular structure need fewer
    bits or more tables — the operator exposes both knobs."""
    emb = scan_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return rp_lsh_topk(
        emb, queries, "embedding", "vec_id", dim=64, k=10, n_planes=8, n_tables=4
    ).orderBy("query_id", "rank")
