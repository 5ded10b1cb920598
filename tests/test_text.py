"""Unit semantics for the text-analysis surface (SURVEY §2.10)."""

from __future__ import annotations

from pyspark.sql import functions as F

from portfolio_data_pipelines_spark.queries.text import (
    FP_BASE,
    FP_MOD,
    FP_PREFIX,
    text_fingerprint,
    text_lang_id,
    text_quality_score,
    text_token_stats,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )


def _one_doc_path(spark, tmp_path, text, lang="en"):
    sf = tmp_path / "sf"
    sf.mkdir(exist_ok=True)
    _docs(spark, [(1, text, lang, "s0", len(text))]).write.mode("overwrite").parquet(
        str(sf / "documents.parquet")
    )
    return str(sf)


def test_token_counts(spark, tmp_path):
    row = text_token_stats(spark, _one_doc_path(spark, tmp_path, "  the cat, sat!  ")).first()
    assert row["ws_tokens"] == 3  # boundary empties dropped
    assert row["bpe_tokens"] == 5  # the / cat / , / sat / !
    assert abs(row["chars_per_token"] - 17 / 3) < 1e-12


def test_token_stats_skips_empty_docs(spark, tmp_path):
    sf = tmp_path / "sf"
    sf.mkdir()
    _docs(spark, [(1, "", "en", "s0", 0), (2, "hi there", "en", "s0", 8)]).write.parquet(
        str(sf / "documents.parquet")
    )
    rows = text_token_stats(spark, str(sf)).collect()
    assert [r["doc_id"] for r in rows] == [2]


def test_quality_score_weights(spark, tmp_path):
    # "the the" — pure alpha, all-stopword, no punctuation → maximal score.
    row = text_quality_score(spark, _one_doc_path(spark, tmp_path, "the the")).first()
    assert row["punct_ratio"] == 0.0
    assert row["stopword_ratio"] == 1.0
    expected = 0.4 * row["alpha_ratio"] + 0.3 * 1.0 + 0.3 * 1.0
    assert row["quality_score"] == expected


def test_lang_id_votes_and_und(spark, tmp_path):
    sf = tmp_path / "sf"
    sf.mkdir()
    _docs(
        spark,
        [
            (1, "the cat and the dog", "en", "s0", 19),
            (2, "der hund und die katze ist", "de", "s0", 26),
            (3, "zzz qqq xxx", "zh", "s0", 11),
        ],
    ).write.parquet(str(sf / "documents.parquet"))
    got = {(r["lang"], r["lang_pred"]): r["n_docs"] for r in text_lang_id(spark, str(sf)).collect()}
    assert got == {("en", "en"): 1, ("de", "de"): 1, ("zh", "und"): 1}


def test_fingerprint_matches_python_reference(spark, tmp_path):
    text = "hello world, rolling hash"
    row = text_fingerprint(spark, _one_doc_path(spark, tmp_path, text)).first()
    acc = 0
    for ch in text[:FP_PREFIX]:
        acc = (acc * FP_BASE + ord(ch)) % FP_MOD
    assert row["fingerprint"] == acc
    assert row["bucket"] == acc % 1024


def test_text_queries_are_udf_free(spark, sf_dir):
    # The whole text surface must stay JVM-side: no BatchEvalPython /
    # ArrowEvalPython nodes in any plan.
    for fn in (text_token_stats, text_quality_score, text_lang_id, text_fingerprint):
        plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan, fn.__name__


def test_bm25_scalars_count_tokenless_docs(spark, tmp_path):
    # Regression: n_docs/avgdl must come from the documents table, not the
    # exploded token stream — a doc with empty/whitespace-only text has no
    # tokens, and deriving the collection size from doclen diverges from
    # the oracle's COUNT(*) FROM documents on every BM25 score.
    import duckdb

    from portfolio_data_pipelines_spark.queries import EXTRA_REGISTRY, REGISTRY, _load_all

    _load_all()
    sf = tmp_path / "sf"
    sf.mkdir()
    _docs(
        spark,
        [
            (1, "hash join window hash", "en", "s0", 21),
            (2, "join join filler words here", "en", "s0", 27),
            (3, "   ", "en", "s0", 3),  # whitespace-only -> zero tokens
            (4, "", "en", "s0", 0),  # empty -> zero tokens
            (5, "window of the hash world", "en", "s0", 24),
        ],
    ).write.parquet(str(sf / "documents.parquet"))
    from portfolio_data_pipelines_spark.queries import REGISTRY

    # declared since the r12 rotation (was extra-registry)
    spec = REGISTRY["bm25_topk_docs"]
    srows = {r["doc_id"]: r["bm25"] for r in spec.fn(spark, str(sf)).collect()}
    con = duckdb.connect()
    try:
        con.sql(
            "CREATE VIEW documents AS "
            f"SELECT * FROM read_parquet('{sf}/documents.parquet/*.parquet')"
        )
        drows = {r[0]: r[4] for r in con.sql(spec.oracle).fetchall()}
    finally:
        con.close()
    assert srows == drows  # bit-exact doubles, including the n_docs=5 idf


def test_llog2_fixed_point_semantics(spark):
    """The dyadic log2: integer-exact, monotone, < 0.0861-bit error vs
    true log2 — pinned against Python math over a wide count range."""
    import math

    from portfolio_data_pipelines_spark.queries.text import LM_Q, _llog2_fx_sql

    counts = [1, 2, 3, 4, 5, 7, 8, 100, 1023, 1024, 1025, 10**6, (1 << 32) - 1]
    df = spark.createDataFrame([(c,) for c in counts], "c bigint")
    got = {
        r["c"]: r["fx"]
        for r in df.select("c", F.expr(_llog2_fx_sql("c")).alias("fx")).collect()
    }
    prev = None
    for c in counts:
        f = c.bit_length() - 1
        expected = f * LM_Q + (c * LM_Q) // (1 << f) - LM_Q
        assert got[c] == expected, c
        approx = got[c] / LM_Q
        assert abs(approx - math.log2(c)) < 0.0861, c
        if prev is not None:
            assert got[c] > prev  # strictly monotone on these counts
        prev = got[c]


def test_unigram_filter_scores_relative_rarity(spark, tmp_path):
    """A doc of corpus-common tokens must out-score a doc containing a
    rare token, and the keep flag must follow the threshold."""
    from portfolio_data_pipelines_spark.queries import EXTRA_REGISTRY, REGISTRY, _load_all

    _load_all()
    sf = tmp_path / "sf"
    sf.mkdir()
    common = "the the the the"
    rare = "the the the zyzzyva"
    _docs(
        spark,
        [(1, common, "en", "s0", len(common)), (2, rare, "en", "s0", len(rare))],
    ).write.parquet(str(sf / "documents.parquet"))
    rows = {
        r["doc_id"]: r
        for r in REGISTRY["unigram_logprob_filter"].fn(spark, str(sf)).collect()
    }
    assert rows[1]["mean_log2_prob"] > rows[2]["mean_log2_prob"]
    # "the" has c=7 of N=8: llog2 fine; both docs' flags follow threshold
    for r in rows.values():
        assert r["keep"] == (r["mean_log2_prob"] > -5.125)


def test_bigram_filter_backoff_and_ranking(spark, tmp_path):
    """Held-out bigram gate: seen-bigram docs out-score docs needing
    backoff, and n_backoff counts exactly the unseen transitions."""
    from portfolio_data_pipelines_spark.queries import EXTRA_REGISTRY, REGISTRY, _load_all

    _load_all()
    sf = tmp_path / "sf"
    sf.mkdir()
    # train (even ids): establishes "a b" and "b c" as seen bigrams
    # score (odd ids): doc 1 = all-seen transitions; doc 3 = unseen pair
    _docs(
        spark,
        [
            (0, "a b c a b c", "en", "s0", 11),
            (2, "a b c", "en", "s0", 5),
            (1, "a b c", "en", "s0", 5),  # transitions a-b, b-c: both seen
            (3, "c a q b", "en", "s0", 7),  # c-a seen? no ("c a" occurs in doc0: c a) -> seen; a-q, q-b unseen
        ],
    ).write.parquet(str(sf / "documents.parquet"))
    rows = {
        r["doc_id"]: r
        for r in REGISTRY["bigram_logprob_filter"].fn(spark, str(sf)).collect()
    }
    assert set(rows) == {1, 3}
    assert rows[1]["n_backoff"] == 0
    assert rows[3]["n_backoff"] == 2  # a-q and q-b unseen ("c a" is seen in doc 0)
    assert rows[1]["mean_log2_prob"] > rows[3]["mean_log2_prob"]


def test_token_ids_roundtrip_semantics(spark, tmp_path):
    """Encoding invariants: ids follow frequency rank (count desc, word
    asc), OOV maps to -1, and id order preserves token order."""
    from portfolio_data_pipelines_spark.queries import EXTRA_REGISTRY, REGISTRY, _load_all
    from portfolio_data_pipelines_spark.queries.text import OOV_ID

    _load_all()
    sf = tmp_path / "sf"
    sf.mkdir()
    # freq: b=3, a=2, c=1 → ids b=0, a=1, c=2 (unique words fit VOCAB_K)
    # doc 3 carries 520 unique singleton words so the 512-slot vocab
    # overflows and the OOV branch actually fires (the sf0.01 fixture
    # has <512 distinct words, so only this test covers OOV).
    rare = " ".join(f"w{i:03d}" for i in range(520))
    _docs(
        spark,
        [
            (1, "a b c b", "en", "s0", 7),
            (2, "b a", "en", "s0", 3),
            (3, rare, "en", "s0", len(rare)),
        ],
    ).write.parquet(str(sf / "documents.parquet"))
    rows = {
        r["doc_id"]: r
        for r in REGISTRY["token_ids_encoded"].fn(spark, str(sf)).collect()
    }

    def ids(r):
        # declared surface emits the comma-joined scalar encoding
        return [int(x) for x in r["token_ids"].split(",")]

    assert ids(rows[1]) == [1, 0, 2, 0]
    assert ids(rows[2]) == [0, 1]
    assert rows[1]["n_oov"] == 0 and rows[1]["n_tokens"] == 4
    # vocab: a,b,c (count>1) + the 509 lexicographically-first singletons
    # → the last 11 of doc 3's words are OOV
    assert rows[3]["n_tokens"] == 520
    assert rows[3]["n_oov"] == 520 - (512 - 3)
    assert sum(1 for i in ids(rows[3]) if i == OOV_ID) == rows[3]["n_oov"]
