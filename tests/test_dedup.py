"""Unit tests for dedup operators: contracts beyond the oracle harness."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from portfolio_data_pipelines_spark.operators import dedup as dedup_ops
from portfolio_data_pipelines_spark.operators.dedup import (
    clear_shared_plans,
    embedding_cosine_pairs,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    shingle_arrays,
    simhash,
    simhash_pairs,
    word_shingles,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (3, "the quick brown fox leaps over the lazy dog"),  # near dup of 1
        (4, "completely different words appear in this sentence here now"),
        (5, "short doc"),  # < 3 words → no trigrams
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


class TestExactDedup:
    def test_keeps_smallest_id(self, docs):
        kept = exact_dedup(docs, "text", "doc_id")
        ids = {r["doc_id"] for r in kept.collect()}
        assert ids == {1, 3, 4, 5}  # doc 2 deduped against doc 1


class TestShingles:
    def test_trigram_count(self, spark):
        df = spark.createDataFrame([(1, "a b c d")], ["doc_id", "text"])
        got = {r["shingle"] for r in word_shingles(df, "text", "doc_id", 3).collect()}
        assert got == {"a b c", "b c d"}

    def test_short_doc_yields_none(self, docs):
        sh = word_shingles(docs.filter(F.col("doc_id") == 5), "text", "doc_id", 3)
        assert sh.count() == 0


class TestJaccard:
    def test_exact_pairs(self, docs):
        pairs = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in ngram_jaccard_pairs(docs, "text", "doc_id", threshold=0.3).collect()
        }
        assert (1, 2) in pairs and pairs[(1, 2)] == 1.0  # identical
        assert (1, 3) in pairs  # near-dup
        assert all(a != 4 and b != 4 for a, b in pairs)  # unrelated doc

    def test_lsh_matches_exact(self, docs):
        exact = sorted(
            map(tuple, ngram_jaccard_pairs(docs, "text", "doc_id", threshold=0.3).collect())
        )
        lsh = sorted(
            map(
                tuple,
                minhash_lsh_pairs(
                    docs, "text", "doc_id", threshold=0.3, rows_per_band=1
                ).collect(),
            )
        )
        assert lsh == exact

    def test_lsh_banded_variant_runs(self, docs):
        # r=4, b=16: the high-threshold configuration; identical docs
        # always collide (all minhashes equal).
        got = minhash_lsh_pairs(
            docs, "text", "doc_id", threshold=0.99, rows_per_band=4
        ).collect()
        assert {(r["id_a"], r["id_b"]) for r in got} == {(1, 2)}

    def test_stop_shingle_guard(self, docs):
        # max_shingle_freq=1 drops every shared shingle → no pairs survive
        got = ngram_jaccard_pairs(
            docs, "text", "doc_id", threshold=0.01, max_shingle_freq=1
        ).collect()
        assert got == []

    def test_capped_posting_form_equals_uncapped_join_form(self, docs):
        # With a cap no shingle here exceeds, the posting-list physical
        # shape must reproduce the self-join answer exactly.
        uncapped = sorted(
            map(tuple, ngram_jaccard_pairs(docs, "text", "doc_id", threshold=0.3).collect())
        )
        capped = sorted(
            map(
                tuple,
                ngram_jaccard_pairs(
                    docs, "text", "doc_id", threshold=0.3, max_shingle_freq=100
                ).collect(),
            )
        )
        assert capped == uncapped

    def test_capped_lsh_posting_verify_matches_exact(self, docs):
        exact = sorted(
            map(tuple, ngram_jaccard_pairs(docs, "text", "doc_id", threshold=0.3).collect())
        )
        for rpb in (1, 4):
            got = sorted(
                map(
                    tuple,
                    minhash_lsh_pairs(
                        docs,
                        "text",
                        "doc_id",
                        threshold=0.3,
                        rows_per_band=rpb,
                        max_shingle_freq=100,
                    ).collect(),
                )
            )
            if rpb == 1:
                # r=1,b=64: recall mode — miss probability ≤ (1-j)^64.
                assert got == exact
            else:
                # r=4: precision mode — may drop low-j pairs by design,
                # but every verified pair is exact and identical docs
                # (all 64 min-hashes equal) always collide.
                assert set(got) <= set(exact)
                assert (1, 2, 1.0) in got

    def test_posting_lists_sorted_bounded(self, docs):
        from portfolio_data_pipelines_spark.operators.dedup import shingle_postings

        rows = shingle_postings(docs, "text", "doc_id", 3, max_shingle_freq=3).collect()
        assert rows  # docs 1/2/3 share trigrams
        for r in rows:
            assert 2 <= len(r["ids"]) <= 3
            assert r["ids"] == sorted(set(r["ids"]))


class TestSharedShingleScan:
    def test_shared_output_identical_and_cache_hit(self, spark, docs):
        clear_shared_plans()
        plain = sorted(
            map(tuple, ngram_jaccard_pairs(docs, "text", "doc_id", threshold=0.3).collect())
        )
        shared = sorted(
            map(
                tuple,
                ngram_jaccard_pairs(
                    docs, "text", "doc_id", threshold=0.3, shared=True
                ).collect(),
            )
        )
        assert shared == plain
        assert len(dedup_ops._PLAN_CACHE) == 1
        # A separately-constructed but semantically identical plan hits
        # the same cache entry (keying is by analyzed-plan semanticHash).
        again = shingle_arrays(docs, "text", "doc_id", 3, shared=True)
        assert len(dedup_ops._PLAN_CACHE) == 1
        assert again.storageLevel.useMemory  # the persisted frame itself
        # Different shingle width → distinct entry.
        shingle_arrays(docs, "text", "doc_id", 2, shared=True)
        assert len(dedup_ops._PLAN_CACHE) == 2
        clear_shared_plans()
        assert len(dedup_ops._PLAN_CACHE) == 0

    def test_eviction_unpersists_oldest(self, spark, docs):
        clear_shared_plans()
        frames = [
            shingle_arrays(docs, "text", "doc_id", n, shared=True)
            for n in range(1, dedup_ops._PLAN_CACHE_MAX + 2)
        ]
        assert len(dedup_ops._PLAN_CACHE) == dedup_ops._PLAN_CACHE_MAX
        assert not frames[0].storageLevel.useMemory  # evicted → unpersisted
        assert frames[-1].storageLevel.useMemory
        clear_shared_plans()


class TestSimhash:
    def test_identical_docs_same_fingerprint(self, docs):
        fp = {r["doc_id"]: r["simhash"] for r in simhash(docs, "text", "doc_id").collect()}
        assert fp[1] == fp[2]

    def test_pairs_hamming_zero_for_dups(self, docs):
        got = {
            (r["id_a"], r["id_b"]): r["hamming"]
            for r in simhash_pairs(docs, "text", "doc_id", max_hamming=10).collect()
        }
        assert got[(1, 2)] == 0

    def test_wide_doc_no_ansi_overflow(self, spark):
        """80 000 distinct words in one doc (≈40 000 ones per bit): the
        r2 4×16-bit lane packing overflowed ANSI sum() at ≥32768 words
        voting 1 on a top-lane (shift-48) bit — a hard
        ARITHMETIC_OVERFLOW; the 3×21-bit packing is good to ~2.09M."""
        text = " ".join(f"w{i}" for i in range(80_000))
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        rows = simhash(df, "text", "doc_id").collect()
        assert len(rows) == 1 and rows[0]["simhash"] is not None


class TestEmbeddingCosine:
    def test_parallel_and_orthogonal(self, spark):
        rows = [
            (1, [1.0, 0.0, 0.0, 0.0]),
            (2, [2.0, 0.0, 0.0, 0.0]),  # parallel to 1 → cosine 1
            (3, [0.0, 1.0, 0.0, 0.0]),  # orthogonal → cosine 0
        ]
        df = spark.createDataFrame(rows, ["vec_id", "embedding"]).withColumn(
            "embedding", F.col("embedding").cast("array<float>")
        )
        got = {
            (r["id_a"], r["id_b"]): r["cosine"]
            for r in embedding_cosine_pairs(df, "embedding", "vec_id", threshold=0.5).collect()
        }
        assert got == {(1, 2): pytest.approx(1.0)}


class TestDupClusters:
    def test_components_resolve_chains(self, spark):
        from portfolio_data_pipelines_spark.operators.dedup import dup_clusters

        # path 1-2-3-4, pair 10-11, and 20-21-22 via a hub
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (20, 22)],
            "id_a bigint, id_b bigint",
        )
        got = {r["doc_id"]: r["cluster_id"] for r in dup_clusters(pairs).collect()}
        assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}

    def test_clusters_from_real_near_dup_pairs(self, spark):
        from portfolio_data_pipelines_spark.operators.dedup import (
            dup_clusters,
            ngram_jaccard_pairs,
        )
        from portfolio_data_pipelines_spark.sources.parquet import scan_table

        docs = scan_table(spark, "/root/testdata/sf0.001", "documents")
        pairs = ngram_jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.3)
        clusters = dup_clusters(pairs)
        # every clustered doc maps to the smallest id in its component:
        # cluster ids must themselves be members mapping to themselves
        rows = clusters.collect()
        by_id = {r["doc_id"]: r["cluster_id"] for r in rows}
        for doc, c in by_id.items():
            assert by_id[c] == c
            assert c <= doc

    def test_clusters_match_union_find_on_random_graph(self, spark):
        """Property check on a seeded random graph: the distributed
        min-label loop must equal a reference union-find exactly."""
        import random

        from portfolio_data_pipelines_spark.operators.dedup import dup_clusters

        rnd = random.Random(13)
        edges = [(rnd.randint(0, 120), rnd.randint(0, 120)) for _ in range(150)]
        edges = [(a, b) for a, b in edges if a != b]

        parent: dict[int, int] = {}

        def find(x: int) -> int:
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        want = {x: find(x) for x in parent}

        pairs = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
        # default (driver union-find) and forced-distributed paths must agree
        got = {r["doc_id"]: r["cluster_id"] for r in dup_clusters(pairs).collect()}
        assert got == want
        dist = {
            r["doc_id"]: r["cluster_id"]
            for r in dup_clusters(pairs, driver_threshold=0).collect()
        }
        assert dist == want

    def test_driver_threshold_boundary_both_sides(self, spark):
        """The take(threshold+1) probe (r17) must pick the driver path
        when edges == threshold and the distributed path when edges ==
        threshold + 1, with identical labels either way."""
        from portfolio_data_pipelines_spark.operators.dedup import dup_clusters

        edges = [(i, i + 1) for i in range(8)]  # one 9-node chain
        pairs = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
        want = {i: 0 for i in range(9)}
        at = {
            r["doc_id"]: r["cluster_id"]
            for r in dup_clusters(pairs, driver_threshold=len(edges)).collect()
        }
        assert at == want
        below = {
            r["doc_id"]: r["cluster_id"]
            for r in dup_clusters(
                pairs, driver_threshold=len(edges) - 1
            ).collect()
        }
        assert below == want

    def test_adversarial_chain_converges_logarithmically(self, spark):
        """A path graph is the worst case for plain label propagation
        (min label travels one hop per round → O(n) rounds). Pointer
        jumping doubles label reach per round, so a 40-node chain must
        resolve within ~log2(40)+c rounds — max_iter=8 would fail the
        r2 propagation-only loop (which needed 39) and now converges."""
        from portfolio_data_pipelines_spark.operators.dedup import dup_clusters

        n = 40
        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(n - 1)], "id_a bigint, id_b bigint"
        )
        got = {
            r["doc_id"]: r["cluster_id"]
            for r in dup_clusters(pairs, max_iter=8, driver_threshold=0).collect()
        }
        assert got == {i: 0 for i in range(n)}

    def test_raises_on_max_iter_exhaustion(self, spark):
        """Non-convergence must be an error, not silently wrong labels."""
        from portfolio_data_pipelines_spark.operators.dedup import dup_clusters

        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(29)], "id_a bigint, id_b bigint"
        )
        with pytest.raises(RuntimeError, match="did not converge"):
            dup_clusters(pairs, max_iter=2, driver_threshold=0)


def test_dup_span_coverage_semantics(spark):
    """Hand-checkable fixture: doc 1 and 2 share one exact 5-gram
    ("a b c d e" at start of both); doc 3 shares nothing. Coverage must
    mark exactly the 5 tokens under the shared gram, zero for doc 3,
    and docs shorter than n yield no spans but still appear."""
    from portfolio_data_pipelines_spark.operators.dedup import dup_span_coverage

    rows = [
        (1, "a b c d e x y z"),        # 8 tokens, dup gram at pos 0
        (2, "a b c d e q r s t"),      # 9 tokens, dup gram at pos 0
        (3, "k l m n o p"),            # 6 tokens, no shared grams
        (4, "a b c"),                  # shorter than n=5: no grams at all
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_dup_spans"], r["covered_tokens"], r["dup_frac"])
        for r in dup_span_coverage(df, "text", "doc_id", n=5).collect()
    }
    assert got[1] == (8, 1, 5, 5 / 8)
    assert got[2] == (9, 1, 5, 5 / 9)
    assert got[3] == (6, 0, 0, 0.0)
    assert got[4] == (3, 0, 0, 0.0)
