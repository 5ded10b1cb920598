"""Deduplication declared queries (SURVEY §2.10, milestone M4).

The `documents` fixture has no exact duplicates, so the exact-dedup query
injects them deterministically (UNION ALL of every 10th doc under a
shifted id) — the operator's keep-smallest-id contract is then visible in
the output. Near-dup queries run on the natural data, which contains ~25
true trigram-Jaccard pairs ≥ 0.3 and a handful of cosine pairs ≥ 0.4.

Oracle strategy: exact methods (exact, n-gram Jaccard, embedding cosine)
have full DuckDB oracles. MinHash-LSH's *verified* output equals the
exact Jaccard answer with miss probability ≤ (1-j)^64 ≈ 1e-10 per pair
(r=1, b=64), so it shares the exact oracle. SimHash bit votes derive
from md5 hex nibbles (identical in both engines — see
operators/dedup._md5_word_bit), so both SimHash queries are fully
oracle-checked too; at max_hamming ≤ 3 the 4×16-bit-block LSH is exact
by pigeonhole, so the pairs oracle is plain all-pairs SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import (
    dup_clusters,
    dup_span_coverage,
    dup_span_removal,
    embedding_cosine_pairs,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
    simhash_pairs,
)
from ..sources.parquet import scan_table
from . import extra_query, query

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


@extra_query("ngram_jaccard_dups", oracle=_JACCARD_ORACLE)
def ngram_jaccard_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-trigram Jaccard near-dup pairs (threshold 0.3) via the
    shingle inverted-index join — the verification primitive. Extra
    registry (r3): the declared surface keeps the capped variant — same
    operator with the scale guard on — and this uncapped form stays
    under the identical local DuckDB parity."""
    docs = scan_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(
        docs, "text", "doc_id", n=3, threshold=0.3, shared=True
    ).orderBy(
        "id_a", "id_b"
    )


#: Relative stop-shingle cap (SQL side): shingles in more than 1% of docs
#: (floor 5) are stop-shingles. An absolute cap is the wrong knob across
#: scales — with this fixture's 31-word vocabulary every shingle's document
#: frequency grows linearly with corpus size, so freq≤5 that is a pure cost
#: bound at sf0.01 empties the index entirely at sf0.1. The relative form
#: is the IR stopword convention and keeps the capped queries non-trivial
#: at every sf (25/25 pairs at sf0.01, 256/256 at sf0.1).
_REL_CAP_SQL = "greatest(5, (SELECT count(*) // 100 FROM documents))"


def _rel_cap(docs) -> int:
    """Python twin of ``_REL_CAP_SQL``: max(5, n_docs // 100). The count
    is a metadata-only parquet action; its value feeds the operator's
    absolute ``max_shingle_freq`` knob."""
    return max(5, docs.count() // 100)


def _capped_jaccard_oracle(threshold: float, max_freq: int | str = _REL_CAP_SQL) -> str:
    """Stop-shingle-capped Jaccard pair SQL: intersection counts come from
    the capped inverted index, union sizes from the full shingle sets —
    exactly the verify-stage semantics of the capped Spark operators
    (``ngram_jaccard_pairs(max_shingle_freq=...)`` and the capped
    ``minhash_lsh_pairs`` verify join)."""
    return f"""
    WITH sh AS (
        SELECT doc_id, unnest(list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                             FOR i IN range(1, len(w) - 1)])) AS shingle
        FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
        WHERE len(w) >= 3
    ),
    freq AS (SELECT shingle, COUNT(*) AS freq FROM sh GROUP BY shingle),
    kept AS (SELECT sh.doc_id, sh.shingle
             FROM sh JOIN freq USING (shingle) WHERE freq <= {max_freq}),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
        FROM kept a JOIN kept b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT id_a, id_b, jaccard
    FROM (
        SELECT id_a, id_b,
               CAST(n_inter AS DOUBLE)
                   / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
    )
    WHERE jaccard >= {threshold}
    """


@query("ngram_jaccard_dups_capped", oracle=_capped_jaccard_oracle(0.3))
def ngram_jaccard_dups_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stop-shingle-capped near-dup query: shingles shared by more
    than 5 docs are dropped from the inverted index before pairing —
    the guard that bounds the m² pair blow-up a hot shingle causes at
    100 TB. On this fixture the capped output equals the uncapped one
    (all true pairs rest on rare shingles; intersection counts use the
    capped index, union sizes the full sets — replicated in the
    oracle), demonstrating the cap is output-stable where it should be
    a pure cost optimization. The cap is document-frequency-relative
    (>1% of docs, floor 5 — see ``_REL_CAP_SQL``)."""
    docs = scan_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(
        docs, "text", "doc_id", n=3, threshold=0.3, max_shingle_freq=_rel_cap(docs),
        shared=True,
    ).orderBy("id_a", "id_b")


@query("minhash_lsh_dups", oracle=_capped_jaccard_oracle(0.3))
def minhash_lsh_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(64)+LSH(r=1,b=64) candidates, exact-verified at Jaccard
    ≥ 0.3. Miss probability ≤ (1-0.3)^64 ≈ 1.2e-10 per true pair, so the
    verified output equals the exact capped-Jaccard answer — the oracle
    is the same capped SQL the capped n-gram query uses. The payoff vs
    `ngram_jaccard_dups` is the join structure: bucket join over band
    hashes instead of the full shingle inverted index; the verify stage
    runs under the stop-shingle cap (r3), bounding the m² blow-up a hot
    shingle would cause at scale."""
    docs = scan_table(spark, sf_dir, "documents")
    return minhash_lsh_pairs(
        docs, "text", "doc_id", n=3, threshold=0.3, num_perm=64, rows_per_band=1,
        max_shingle_freq=_rel_cap(docs), shared=True,
    ).orderBy("id_a", "id_b")


@extra_query("minhash_lsh_dups_hi", oracle=_capped_jaccard_oracle(0.8))
def minhash_lsh_dups_hi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """High-threshold MinHash-LSH: r=4 rows per band, b=16 bands,
    capped Jaccard ≥ 0.8 — the config a production dedup runs when it
    only wants hard duplicates. This is the ``rows_per_band > 1`` path:
    candidates need a full band of 4 equal min-hashes, so the candidate
    doc set is sparse and the verify stage pre-prunes both exploded
    sides to it (on top of the stop-shingle cap). Shares the capped
    exact oracle at threshold 0.8: a true pair at true-Jaccard j is
    missed with probability (1-j^4)^16 — ≈1e-18 at the fixture's
    typical j≈0.98 — and the output is deterministic for the fixed
    xxhash64 seeds (fixture-verified equal to exact at every sf)."""
    docs = scan_table(spark, sf_dir, "documents")
    return minhash_lsh_pairs(
        docs, "text", "doc_id", n=3, threshold=0.8, num_perm=64, rows_per_band=4,
        max_shingle_freq=_rel_cap(docs), shared=True,
    ).orderBy("id_a", "id_b")


@query(
    "near_dup_clusters",
    oracle="""
    WITH RECURSIVE
    tri AS (
        SELECT doc_id,
               list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                              FOR i IN range(1, len(w) - 1)]) AS s
        FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
        WHERE len(w) >= 3
    ),
    pairs AS (
        SELECT id_a, id_b
        FROM (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                       / CAST(len(a.s) + len(b.s)
                              - len(list_intersect(a.s, b.s)) AS DOUBLE) AS jaccard
            FROM tri a JOIN tri b ON a.doc_id < b.doc_id
        )
        WHERE jaccard >= 0.3
    ),
    edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION
        SELECT id_b, id_a FROM pairs
    ),
    reach(id, r) AS (
        SELECT src, dst FROM edges
        UNION
        SELECT reach.id, e.dst FROM reach JOIN edges e ON reach.r = e.src
    )
    SELECT id AS doc_id, LEAST(id, MIN(r)) AS cluster_id
    FROM reach GROUP BY id
    """,
)
def near_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pair → cluster resolution (the iterative step after any pair
    generator): connected components over the exact trigram-Jaccard
    pairs by min-label propagation, each doc labeled with the smallest
    id in its component. The DuckDB oracle computes the same components
    via a recursive transitive-closure CTE — the iterative Spark loop
    must converge to the identical fixpoint. Pair generation runs under
    the stop-shingle cap (output-identical on this fixture, see
    `ngram_jaccard_dups_capped`)."""
    docs = scan_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(
        docs, "text", "doc_id", n=3, threshold=0.3, max_shingle_freq=_rel_cap(docs),
        shared=True,
    )
    return dup_clusters(pairs).orderBy("doc_id")


@extra_query(
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


def _simhash_fp_cte() -> str:
    """DuckDB CTE computing the identical SimHash fingerprint per doc.

    Bit votes replicate operators/dedup._md5_word_bit verbatim (strpos
    over the hex alphabet == Spark's instr; same substring index, same
    shift/mask). The fingerprint reassembles via a SUM of disjoint bit
    terms — bit 63 contributes the negative two's-complement constant so
    the BIGINT matches Spark's Java-wrapped shiftleft(1, 63)."""

    def bit(i: int) -> str:
        return (
            f"(((strpos('0123456789abcdef', substring(md5(w), {i // 4 + 1}, 1)) - 1)"
            f" >> {i % 4}) & 1)"
        )

    votes = ",\n               ".join(
        f"SUM(CASE WHEN {bit(i)} = 1 THEN 1 ELSE -1 END) AS b_{i}" for i in range(64)
    )
    terms = " + ".join(
        f"(CASE WHEN b_{i} > 0 THEN CAST({(1 << i) if i < 63 else -(1 << 63)} AS BIGINT)"
        f" ELSE 0 END)"
        for i in range(64)
    )
    return f"""
    words AS (
        SELECT doc_id, w
        FROM (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS w
              FROM documents)
        WHERE length(w) > 0
    ),
    tallies AS (
        SELECT doc_id,
               {votes}
        FROM words
        GROUP BY doc_id
    ),
    fp AS (
        SELECT doc_id, CAST({terms} AS BIGINT) AS simhash
        FROM tallies
    )
    """


@extra_query(
    "simhash_fingerprints",
    oracle=f"WITH {_simhash_fp_cte()} SELECT doc_id, simhash FROM fp",
)
def simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash per document (word-level, md5-derived bit votes)."""
    docs = scan_table(spark, sf_dir, "documents")
    return simhash(docs, "text", "doc_id", shared=True).orderBy("doc_id")


@query(
    "simhash_dup_pairs",
    oracle=f"""
    WITH {_simhash_fp_cte()}
    SELECT id_a, id_b, hamming
    FROM (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               bit_count(xor(a.simhash, b.simhash)) AS hamming
        FROM fp a JOIN fp b ON a.doc_id < b.doc_id
    )
    WHERE hamming <= 2
    """,
)
def simhash_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup candidate pairs: 16-bit-block LSH + exact
    Hamming verification (≤ 2 of 64 bits). At max_hamming ≤ 3 the
    4-block pigeonhole is exact, so the all-pairs oracle matches the
    blocked plan's output exactly.

    Corpus caveat: word-level SimHash keys on distinct word sets; the
    fixture's 31-word vocabulary makes identical word sets common, so
    Hamming-0 collisions include docs that differ in word *order* —
    inherent to bag-of-words SimHash, which is why the Jaccard family
    above shingles on trigrams instead."""
    docs = scan_table(spark, sf_dir, "documents")
    return simhash_pairs(docs, "text", "doc_id", max_hamming=2, shared=True).orderBy(
        "id_a", "id_b"
    )


@extra_query(
    "dedup_keep_docs",
    oracle="""
    WITH RECURSIVE
    tri AS (
        SELECT doc_id,
               list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                              FOR i IN range(1, len(w) - 1)]) AS s
        FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
        WHERE len(w) >= 3
    ),
    pairs AS (
        SELECT id_a, id_b
        FROM (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                       / CAST(len(a.s) + len(b.s)
                              - len(list_intersect(a.s, b.s)) AS DOUBLE) AS jaccard
            FROM tri a JOIN tri b ON a.doc_id < b.doc_id
        )
        WHERE jaccard >= 0.3
    ),
    edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION
        SELECT id_b, id_a FROM pairs
    ),
    reach(id, r) AS (
        SELECT src, dst FROM edges
        UNION
        SELECT reach.id, e.dst FROM reach JOIN edges e ON reach.r = e.src
    ),
    dropped AS (
        SELECT id FROM (SELECT id, LEAST(id, MIN(r)) AS c FROM reach GROUP BY id)
        WHERE c < id
    )
    SELECT doc_id, source FROM documents
    WHERE doc_id NOT IN (SELECT id FROM dropped)
    """,
)
def dedup_keep_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end near-dup dedup output: the SURVIVING corpus. Composes
    the family — capped pair generation over the shared posting index →
    cluster resolution → keep the canonical (smallest-id) member of
    every component plus all unclustered docs, via one anti-join on the
    non-canonical id set. This is the query a pretraining pipeline
    actually materializes; the pair/cluster queries above are its
    observable intermediates. Oracle recomputes survivors through the
    recursive-CTE component labels."""
    docs = scan_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(
        docs, "text", "doc_id", n=3, threshold=0.3, max_shingle_freq=_rel_cap(docs),
        shared=True,
    )
    losers = (
        dup_clusters(pairs)
        .filter(F.col("cluster_id") != F.col("doc_id"))
        .select("doc_id")
    )
    return (
        docs.join(losers, "doc_id", "left_anti")
        .select("doc_id", "source")
        .orderBy("doc_id")
    )


@query(
    "dup_span_coverage",
    oracle="""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    g AS (
        SELECT t.doc_id, u.i AS pos,
               array_to_string(list_slice(t.w, u.i + 1, u.i + 5), ' ') AS gram
        FROM t, unnest(range(0, greatest(len(t.w) - 5 + 1, 0))) AS u(i)
    ),
    dup_grams AS (
        SELECT gram FROM (
            SELECT gram, COUNT(DISTINCT doc_id) AS nd FROM g GROUP BY gram
        ) WHERE nd >= 2
    ),
    hits AS (SELECT g.doc_id, g.pos FROM g JOIN dup_grams USING (gram)),
    spans AS (SELECT doc_id, COUNT(*) AS n_dup_spans FROM hits GROUP BY doc_id),
    covered AS (
        SELECT doc_id, COUNT(*) AS covered_tokens FROM (
            SELECT DISTINCT h.doc_id, h.pos + u.k AS cp
            FROM hits h, unnest(range(0, 5)) AS u(k)
        ) GROUP BY doc_id
    )
    SELECT b.doc_id,
           len(b.w) AS n_tokens,
           COALESCE(s.n_dup_spans, 0) AS n_dup_spans,
           COALESCE(c.covered_tokens, 0) AS covered_tokens,
           COALESCE(c.covered_tokens, 0) / len(b.w) AS dup_frac
    FROM t b
    LEFT JOIN spans s USING (doc_id)
    LEFT JOIN covered c USING (doc_id)
    """,
)
def dup_span_coverage_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level exact-duplication coverage (Lee et al. 2022 substring
    dedup, at 5-gram granularity): per doc, how many token positions sit
    under a 5-gram shared with another document. Complements whole-doc
    dedup — high-coverage docs are boilerplate-heavy even when no
    doc-level near-dup fires. Positional (non-distinct) grams, so
    repeated in-doc boilerplate counts every occurrence."""
    docs = scan_table(spark, sf_dir, "documents")
    return dup_span_coverage(docs, "text", "doc_id", n=5).orderBy("doc_id")


@extra_query(
    "dedup_span_removed_docs",
    oracle="""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    g AS (
        SELECT t.doc_id, u.i AS pos,
               array_to_string(list_slice(t.w, u.i + 1, u.i + 5), ' ') AS gram
        FROM t, unnest(range(0, greatest(len(t.w) - 5 + 1, 0))) AS u(i)
    ),
    own AS (
        SELECT gram, MIN(doc_id * 1048576 + pos) AS okey FROM g GROUP BY gram
    ),
    red AS (
        SELECT g.doc_id, g.pos
        FROM g JOIN own USING (gram)
        WHERE g.doc_id * 1048576 + g.pos <> own.okey
    ),
    rem AS (
        SELECT DISTINCT doc_id, pos + u.k AS cp
        FROM red, unnest(range(0, 5)) AS u(k)
    ),
    rml AS (SELECT doc_id, list(cp) AS rm FROM rem GROUP BY doc_id)
    SELECT t.doc_id,
           len(t.w) AS n_tokens,
           COALESCE(len(r.rm), 0) AS n_removed,
           COALESCE(array_to_string(
               list_transform(
                   list_filter(range(0, len(t.w)),
                               i -> NOT COALESCE(list_contains(r.rm, i), FALSE)),
                   i -> t.w[i + 1]),
               ' '), '') AS cleaned_text
    FROM t LEFT JOIN rml r USING (doc_id)
    """,
)
def dedup_span_removed_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-dedup REWRITE (Lee et al. 2022 transform stage): every
    cross-corpus duplicated 5-gram span is removed except its first
    occurrence (smallest (doc_id, pos) owns the gram); survivors re-join
    with single spaces. Returns the cleaned corpus with per-doc removal
    counts — the metric twin is `dup_span_coverage`."""
    docs = scan_table(spark, sf_dir, "documents")
    return dup_span_removal(docs, "text", "doc_id", n=5).orderBy("doc_id")
