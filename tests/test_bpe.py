"""BPE subword tokenizer: distributed trainer parity vs the pure-Python
reference, columnar encoder parity (Spark expr == reference == DuckDB),
and the pure-projection plan shape of the `bpe_token_ids` query."""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from portfolio_data_pipelines_spark.operators.bpe import (
    FIXTURE_MERGES,
    FIXTURE_NUM_MERGES,
    FIXTURE_WORD_FREQS,
    bpe_encode_ids_duckdb,
    bpe_encode_ids_sql,
    bpe_encode_table,
    bpe_vocab,
    encode_word_local,
    train_bpe_local,
    train_bpe_spark,
    word_freq_table,
)

#: Words that stress the replace-chain construction: back-to-back pair
#: occurrences (the shared-delimiter trap), triple runs where the merge
#: product immediately re-pairs, and single chars.
ADVERSARIAL_WORDS = [
    "aaaa", "aaaaa", "abab", "ababab", "aab", "abba", "a", "ab",
    "banana", "bananas", "abcabcabc", "zzz",
]


def _encode_spark(spark, words: list[str], merges) -> list[list[int]]:
    df = spark.createDataFrame([(i, w) for i, w in enumerate(words)], "i long, text string")
    rows = (
        df.select("i", F.expr(bpe_encode_ids_sql("text", merges)).alias("ids"))
        .orderBy("i")
        .collect()
    )
    return [list(r["ids"]) for r in rows]


def _encode_local_ids(word: str, merges) -> list[int]:
    vocab = {t: i for i, t in enumerate(bpe_vocab(merges))}
    return [vocab.get(s, -1) for s in encode_word_local(word, merges)]


class TestLocalReference:
    def test_fixture_merges_deterministic_and_sized(self):
        again = train_bpe_local(FIXTURE_WORD_FREQS, FIXTURE_NUM_MERGES)
        assert again == FIXTURE_MERGES
        assert len(FIXTURE_MERGES) == FIXTURE_NUM_MERGES
        # merge products are unique (a merged pair never recurs), so the
        # vocab is dense: 26 base + one product per merge, minus any
        # surface-string collisions from distinct merge paths.
        vocab = bpe_vocab(FIXTURE_MERGES)
        assert len(vocab) == len(set(vocab))
        assert vocab[:26] == [chr(c) for c in range(ord("a"), ord("z") + 1)]

    def test_encode_merges_exhaustively_in_rank_order(self):
        # (a,a) then (aa,a): "aaaaa" → [aa, aa, a] → [aa, aaa]
        merges = [("a", "a"), ("aa", "a")]
        assert encode_word_local("aaaaa", merges) == ["aa", "aaa"]
        assert encode_word_local("aaaa", merges) == ["aa", "aa"]


class TestDistributedTrainer:
    def test_spark_train_matches_reference(self, spark):
        words = spark.createDataFrame(
            list(FIXTURE_WORD_FREQS.items()), "word string, freq long"
        )
        got = train_bpe_spark(words, FIXTURE_NUM_MERGES)
        assert got == FIXTURE_MERGES

    def test_train_from_corpus_word_freqs(self, spark):
        texts = ["the cat sat", "the cat", "a cat sat on the mat", "THE Cat!"]
        df = spark.createDataFrame([(t,) for t in texts], "text string")
        freqs = {r["word"]: r["freq"] for r in word_freq_table(df).collect()}
        assert freqs["the"] == 4  # lowercased, punctuation stripped
        assert freqs["cat"] == 4
        got = train_bpe_spark(word_freq_table(df), 5)
        exp = train_bpe_local(freqs, 5)
        assert got == exp

    def test_min_freq_stops_training(self, spark):
        # every word unique, freq 1 → no pair reaches min_freq=2 twice...
        # (a,t) appears in both words though, so exactly the shared pairs
        # merge and training stops when the best remaining count is 1.
        words = spark.createDataFrame(
            [("cat", 1), ("dog", 1)], "word string, freq long"
        )
        got = train_bpe_spark(words, 10, min_freq=2)
        assert got == train_bpe_local({"cat": 1, "dog": 1}, 10, min_freq=2)
        assert got == []


class TestColumnarEncoder:
    def test_spark_encoder_matches_reference_on_fixture(self, spark):
        words = list(FIXTURE_WORD_FREQS) + ADVERSARIAL_WORDS
        got = _encode_spark(spark, words, FIXTURE_MERGES)
        exp = [_encode_local_ids(w, FIXTURE_MERGES) for w in words]
        assert got == exp

    def test_spark_encoder_matches_reference_on_random_tokenizers(self, spark):
        rng = random.Random(7)
        alphabet = "ab"
        corpus = {
            "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 8))): rng.randint(1, 50)
            for _ in range(40)
        }
        merges = train_bpe_local(corpus, 12)
        assert merges  # tiny alphabet → repeated-pair merges exist
        words = list(corpus) + ADVERSARIAL_WORDS
        got = _encode_spark(spark, words, merges)
        exp = [_encode_local_ids(w, merges) for w in words]
        assert got == exp

    def test_duckdb_encoder_matches_reference(self):
        con = duckdb.connect()
        merges = [("a", "a"), ("aa", "a"), ("b", "a")]
        expr = bpe_encode_ids_duckdb("t", merges)
        words = ADVERSARIAL_WORDS
        vals = ", ".join(f"('{w}')" for w in words)
        rows = con.execute(
            f"SELECT {expr} AS ids FROM (VALUES {vals}) AS x(t)"
        ).fetchall()
        got = [r[0] for r in rows]
        exp = [_encode_local_ids(w, merges) for w in words]
        assert got == exp

    def test_multiword_doc_flattens_in_order(self, spark):
        df = spark.createDataFrame([("The cat, the bat! 42",)], "text string")
        (ids,) = df.select(
            F.expr(bpe_encode_ids_sql("text", FIXTURE_MERGES)).alias("ids")
        ).collect()[0]
        exp = [
            i
            for w in ["the", "cat", "the", "bat"]  # digits/punct excluded
            for i in _encode_local_ids(w, FIXTURE_MERGES)
        ]
        assert list(ids) == exp


def test_bpe_token_ids_plan_is_pure_projection(spark):
    """Encoding must be map-side work: no join, no hash-partition
    exchange — the only exchange is the deterministic final sort."""
    from portfolio_data_pipelines_spark.queries.text import bpe_token_ids

    df = bpe_token_ids(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "hashpartitioning" not in plan.lower()
    assert df.count() == 500


def test_bpe_token_ids_matches_oracle_sf0001(spark):
    """Full value parity at sf0.001 (sf0.01 runs in test_oracle_parity)."""
    from portfolio_data_pipelines_spark.queries import EXTRA_REGISTRY, REGISTRY, all_queries

    all_queries()
    spec = REGISTRY["bpe_token_ids"]
    got = [
        (r["doc_id"], r["n_subwords"], r["token_ids"])
        for r in spec.fn(spark, "/root/testdata/sf0.001").collect()
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    exp = [(d, n, ids) for d, n, ids in con.execute(spec.oracle).fetchall()]
    assert got == exp


def test_bpe_dedup_join_variant_equals_projection(spark):
    """The scale path (distinct-word encode + broadcast join) must return
    exactly the pure-projection result, with the expected plan shape:
    one broadcast join, no sort-merge join."""
    from portfolio_data_pipelines_spark.queries.text import (
        bpe_token_ids,
        bpe_token_ids_dedup_join,
    )

    sf = "/root/testdata/sf0.001"
    # both declared forms emit the scalar (comma-joined) id encoding
    a = [
        (r["doc_id"], r["n_subwords"], r["token_ids"])
        for r in bpe_token_ids(spark, sf).collect()
    ]
    b = [
        (r["doc_id"], r["n_subwords"], r["token_ids"])
        for r in bpe_token_ids_dedup_join(spark, sf).collect()
    ]
    assert a == b
    plan = bpe_token_ids_dedup_join(spark, sf)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_bpe_rejects_non_alpha_symbols():
    """Merge symbols are embedded in SQL literals — anything outside
    [a-z]+ must be rejected, not interpolated."""
    import pytest as _pytest

    from portfolio_data_pipelines_spark.operators.bpe import bpe_encode_ids_sql

    with _pytest.raises(ValueError, match="BPE symbols"):
        bpe_encode_ids_sql("text", [("a", "b'); drop--")])
    with _pytest.raises(ValueError, match="BPE symbols"):
        bpe_encode_ids_sql("text", [("A", "b")])


class TestScaleEncoder:
    """The chunked distinct-word join encoder (`bpe_encode_table`) — the
    path past the single-projection chain's measured limits (ANTLR
    parse StackOverflow at ~512 nested replaces; codegen fallback far
    earlier)."""

    @staticmethod
    def _synth_merges(n: int) -> list[tuple[str, str]]:
        """Deterministic valid merge list of arbitrary length: all
        letter bigrams, then progressively longer products."""
        import itertools
        import string as _string

        letters = _string.ascii_lowercase
        merges = [(a, b) for a, b in itertools.product(letters, letters)]
        prods = [a + b for a, b in merges]
        i = 0
        while len(merges) < n:
            merges.append((prods[i % len(prods)], letters[i % 26]))
            prods.append(prods[i % len(prods)] + letters[i % 26])
            i += 1
        return merges[:n]

    def test_2k_merges_parity_with_local_encoder(self, spark):
        """>=2k merges (a realistic-vocabulary order of magnitude, 4x
        past the single-projection breaking point) must encode within
        bounded wall-time and agree exactly with encode_word_local."""
        merges = self._synth_merges(2048)
        rng = random.Random(7)
        words = sorted(
            {
                "".join(rng.choice("abcdef") for _ in range(rng.randint(1, 12)))
                for _ in range(200)
            }
            | {"aaaa", "abab", "zzz", "q", "abcdefabcdef"}
        )
        df = spark.createDataFrame(
            [(i, f"{w} {w2}") for i, (w, w2) in enumerate(
                zip(words, reversed(words)))],
            "doc_id bigint, text string",
        )
        got = {
            r["doc_id"]: list(r["token_ids"])
            for r in bpe_encode_table(
                df, "text", "doc_id", merges
            ).collect()
        }
        vocab_idx = {t: i for i, t in enumerate(bpe_vocab(merges))}
        for i, (w, w2) in enumerate(zip(words, reversed(words))):
            want = [
                vocab_idx.get(s, -1)
                for s in encode_word_local(w, merges)
            ] + [
                vocab_idx.get(s, -1)
                for s in encode_word_local(w2, merges)
            ]
            assert got[i] == want, (i, w, w2)

    def test_small_merge_table_agrees_with_projection_encoder(self, spark):
        """On the fixture tokenizer the scale encoder and the declared
        single-projection encoder must produce identical ids."""
        df = spark.createDataFrame(
            [(1, "the small table"), (2, "broadcast join order"), (3, "")],
            "doc_id bigint, text string",
        )
        scale = {
            r["doc_id"]: list(r["token_ids"])
            for r in bpe_encode_table(
                df, "text", "doc_id", FIXTURE_MERGES
            ).collect()
        }
        proj = {
            r["doc_id"]: list(r["ids"])
            for r in df.selectExpr(
                "doc_id",
                f"{bpe_encode_ids_sql('text', FIXTURE_MERGES)} AS ids",
            ).collect()
        }
        assert scale == proj
        assert scale[3] == []  # wordless row keeps an empty array
