"""Deduplication declared queries (SURVEY §2.10, milestone M4).

The `documents` fixture has no exact duplicates, so the exact-dedup query
injects them deterministically (UNION ALL of every 10th doc under a
shifted id) — the operator's keep-smallest-id contract is then visible in
the output. Near-dup queries run on the natural data, which contains ~25
true trigram-Jaccard pairs ≥ 0.3 and a handful of cosine pairs ≥ 0.4.

Oracle strategy: exact methods (exact, n-gram Jaccard, embedding cosine)
have full DuckDB oracles. MinHash-LSH's *verified* output equals the
exact Jaccard answer with miss probability ≤ (1-j)^64 ≈ 1e-10 per pair
(r=1, b=64), so it shares the exact oracle. SimHash depends on xxhash64
(not available in DuckDB) → rows-only checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import (
    embedding_cosine_pairs,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
    simhash_pairs,
)
from ..sources.parquet import scan_table
from . import query

#: Exact trigram-Jaccard pair SQL — oracle for both the exact query and
#: the LSH-verified query (see module docstring for the recall argument).
_JACCARD_ORACLE = """
    WITH tri AS (
        SELECT doc_id,
               list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                              FOR i IN range(1, len(w) - 1)]) AS s
        FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
        WHERE len(w) >= 3
    )
    SELECT id_a, id_b, jaccard
    FROM (
        SELECT a.doc_id AS id_a,
               b.doc_id AS id_b,
               CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                   / CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS DOUBLE)
                   AS jaccard
        FROM tri a
        JOIN tri b ON a.doc_id < b.doc_id
    )
    WHERE jaccard >= 0.3
"""


@query(
    "exact_dedup_docs",
    oracle="""
    WITH aug AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0
    )
    SELECT doc_id, digest
    FROM (
        SELECT doc_id, md5(text) AS digest,
               ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id ASC) AS rk
        FROM aug
    )
    WHERE rk = 1
    """,
)
def exact_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup (hash-groupBy on content digest, keep smallest id).
    Input fabricates duplicates: every 10th document re-appears under
    id+100000; the output must contain only the 500 original ids."""
    docs = scan_table(spark, sf_dir, "documents").select("doc_id", "text")
    dupes = (
        docs.filter(F.col("doc_id") % 10 == 0)
        .select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    )
    aug = docs.unionByName(dupes)
    return exact_dedup(aug, "text", "doc_id").select(
        "doc_id", F.md5("text").alias("digest")
    )


@query("ngram_jaccard_dups", oracle=_JACCARD_ORACLE)
def ngram_jaccard_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-trigram Jaccard near-dup pairs (threshold 0.3) via the
    shingle inverted-index join — the verification primitive."""
    docs = scan_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.3).orderBy(
        "id_a", "id_b"
    )


@query("minhash_lsh_dups", oracle=_JACCARD_ORACLE)
def minhash_lsh_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(64)+LSH(r=1,b=64) candidates, exact-verified at Jaccard
    ≥ 0.3. Shares the exact oracle: miss probability ≤ (1-0.3)^64 ≈
    1.2e-10 per true pair. The payoff vs `ngram_jaccard_dups` is the
    join structure: bucket join over band hashes instead of the full
    shingle inverted index."""
    docs = scan_table(spark, sf_dir, "documents")
    return minhash_lsh_pairs(
        docs, "text", "doc_id", n=3, threshold=0.3, num_perm=64, rows_per_band=1
    ).orderBy("id_a", "id_b")


@query(
    "embedding_cosine_dups",
    oracle="""
    WITH ev AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
               sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                     CAST(embedding AS DOUBLE[]))) AS nv
        FROM embeddings
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           list_dot_product(a.v, b.v) / (a.nv * b.nv) AS cosine
    FROM ev a JOIN ev b ON a.vec_id < b.vec_id
    WHERE list_dot_product(a.v, b.v) / (a.nv * b.nv) >= 0.4
    """,
)
def embedding_cosine_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs: exact all-pairs cosine ≥ 0.4 with
    decimal-exact dot products (bit-identical across engines)."""
    emb = scan_table(spark, sf_dir, "embeddings")
    return embedding_cosine_pairs(emb, "embedding", "vec_id", threshold=0.4).orderBy(
        "id_a", "id_b"
    )


@query("simhash_fingerprints")  # rows-only: xxhash64 has no DuckDB equivalent
def simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash per document (word-level, xxhash64 bit votes)."""
    docs = scan_table(spark, sf_dir, "documents")
    return simhash(docs, "text", "doc_id").orderBy("doc_id")


@query("simhash_dup_pairs")  # rows-only: xxhash64 has no DuckDB equivalent
def simhash_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup candidate pairs: 16-bit-block LSH + exact
    Hamming verification (≤ 2 of 64 bits).

    Corpus caveat: word-level SimHash keys on distinct word sets; the
    fixture's 31-word vocabulary makes identical word sets common, so
    Hamming-0 collisions include docs that differ in word *order* —
    inherent to bag-of-words SimHash, which is why the Jaccard family
    above shingles on trigrams instead."""
    docs = scan_table(spark, sf_dir, "documents")
    return simhash_pairs(docs, "text", "doc_id", max_hamming=2).orderBy("id_a", "id_b")
