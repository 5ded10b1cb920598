"""Text-analysis declared queries (SURVEY §2.10, M6 — training-data ops).

The large-scale training-data surface over the ``documents`` table:
token counting (whitespace + BPE-ish regex), quality scoring
(length/punct/stopword ratios), language-ID (stopword-vote n-gram
heuristic), and document fingerprinting (polynomial rolling hash).

All four are pure ``pyspark.sql.functions`` column expressions — JVM-side,
whole-stage-codegen, zero Python UDFs — so the scan streams through one
narrow projection stage: no shuffle except where a query aggregates.
Higher-order functions (``filter``/``transform``/``aggregate``) express the
per-token logic without leaving Tungsten.

Cross-engine exactness notes (validated bit-identical vs DuckDB at sf0.01):
- token splits filter out empty strings explicitly (Spark and DuckDB both
  keep boundary empties from ``\\s+`` splits);
- ratios are single IEEE divisions of identical integers; weighted sums
  evaluate left-to-right in both engines;
- the rolling hash accumulates ``(acc*31 + codepoint) % 1e9+7`` in BIGINT,
  bounded to a 64-char prefix so cost per row is O(1) regardless of doc
  length (at 100 TB the prefix bound is what keeps this a cheap scan).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import CPU_LIGHT_BYTES_PER_PARTITION, ensure_min_parallelism
from ..sources.parquet import scan_table
from . import extra_query, query

#: BPE-ish tokenizer: letter runs | digit runs | single non-alnum symbol.
#: Same pattern is valid Java regex (Spark) and RE2 (DuckDB oracle).
BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

#: Tiny per-language stopword lists for the vote heuristic. Overlaps
#: (es/fr share "de"/"la") are fine — ties break by fixed CASE order.
STOPWORDS = {
    "en": ("the", "a", "of", "and", "is"),
    "de": ("der", "die", "das", "und", "ist"),
    "es": ("el", "la", "de", "y", "es"),
    "fr": ("le", "la", "de", "et", "est"),
}

#: Rolling-hash parameters: classic 31-base polynomial mod a Mersenne-ish
#: prime; 64-char prefix keeps acc*31+x < 2^63 with room to spare.
FP_BASE = 31
FP_MOD = 1_000_000_007
FP_PREFIX = 64


def _ws_tokens(col: str = "text") -> Column:
    """Whitespace token array with boundary empties removed."""
    return F.filter(F.split(col, r"\s+"), lambda t: t != "")


def _ws_tokens_sql(expr: str = "text") -> str:
    return rf"list_filter(regexp_split_to_array({expr}, '\s+'), t -> t <> '')"


def _stop_hits(lang: str) -> Column:
    """Count of tokens in ``lang``'s stopword list (lower-cased match)."""
    words = STOPWORDS[lang]
    return F.size(F.filter(_ws_tokens(), lambda t: F.lower(t).isin(*words)))


def _stop_hits_sql(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return f"len(list_filter({_ws_tokens_sql()}, t -> lower(t) IN ({words})))"


@query(
    "text_token_stats",
    oracle=rf"""
    SELECT doc_id,
           n_chars,
           len({_ws_tokens_sql()}) AS ws_tokens,
           len(regexp_extract_all(text, '{BPE_PATTERN}')) AS bpe_tokens,
           CAST(n_chars AS DOUBLE)
             / len({_ws_tokens_sql()}) AS chars_per_token
    FROM documents
    WHERE n_chars > 0
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (SURVEY §2.10): whitespace tokens and a BPE-ish
    regex token count per document, plus mean token length. Narrow map-only
    plan — no shuffle; at 100 TB this is a single pass bounded by scan
    bandwidth."""
    d = scan_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    ws = F.size(_ws_tokens())
    return d.select(
        "doc_id",
        "n_chars",
        ws.alias("ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(BPE_PATTERN), F.lit(0))).alias("bpe_tokens"),
        (F.col("n_chars").cast("double") / ws).alias("chars_per_token"),
    )


#: Quality-score SQL (shared: the declared quality query AND downstream
#: corpus-composition oracles read the same scored frame).
QUALITY_SQL = rf"""
    SELECT doc_id, source, n_tokens, alpha_ratio, punct_ratio, stopword_ratio,
           0.4 * alpha_ratio
             + 0.3 * stopword_ratio
             + 0.3 * (1.0 - punct_ratio) AS quality_score
    FROM (
      SELECT doc_id,
             source,
             n_chars,
             len({_ws_tokens_sql()}) AS n_tokens,
             CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
               / n_chars AS alpha_ratio,
             CAST(length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) AS DOUBLE)
               / n_chars AS punct_ratio,
             CAST({_stop_hits_sql('en')} AS DOUBLE)
               / len({_ws_tokens_sql()}) AS stopword_ratio
      FROM documents
      WHERE n_chars > 0
    )
"""


def quality_frame(d: DataFrame) -> DataFrame:
    """Scored-document frame: (doc_id, source, n_tokens, alpha_ratio,
    punct_ratio, stopword_ratio, quality_score) for non-empty docs. The
    Spark twin of ``QUALITY_SQL`` — all ratios are single IEEE divisions
    of identical integer counts, so the score is bit-identical across
    engines and safe to ORDER BY cross-engine."""
    d = d.filter(F.col("n_chars") > 0)
    n_chars = F.col("n_chars")
    n_tokens = F.size(_ws_tokens())
    alpha = F.length(F.regexp_replace("text", "[^A-Za-z]", "")).cast("double") / n_chars
    punct = F.length(F.regexp_replace("text", r"[A-Za-z0-9\s]", "")).cast("double") / n_chars
    stop = _stop_hits("en").cast("double") / F.size(_ws_tokens())
    m = d.select(
        "doc_id",
        "source",
        n_tokens.alias("n_tokens"),
        alpha.alias("alpha_ratio"),
        punct.alias("punct_ratio"),
        stop.alias("stopword_ratio"),
    )
    return m.select(
        "*",
        (
            F.lit(0.4) * F.col("alpha_ratio")
            + F.lit(0.3) * F.col("stopword_ratio")
            + F.lit(0.3) * (F.lit(1.0) - F.col("punct_ratio"))
        ).alias("quality_score"),
    )


@query("text_quality_score", oracle=QUALITY_SQL)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring (SURVEY §2.10): length/punct/stopword ratios folded
    into one weighted score — the gating signal a pretraining pipeline
    thresholds on. See `quality_frame` for the cross-engine exactness
    argument.

    The scan is widened to cluster parallelism first (r16, guide §2.5
    input-skew): sf-scale fixtures arrive as ONE parquet split, which
    would serialize the regex-heavy ratio projection on a single core;
    at real scale the scan is already wide and the widen is a no-op."""
    return quality_frame(
        ensure_min_parallelism(scan_table(spark, sf_dir, "documents"))
    )


def _lang_vote_sql() -> str:
    hits = {lang: _stop_hits_sql(lang) for lang in STOPWORDS}
    g = "greatest(" + ", ".join(f"c_{lang}" for lang in STOPWORDS) + ")"
    cases = " ".join(f"WHEN c_{lang} = g THEN '{lang}'" for lang in STOPWORDS)
    cols = ", ".join(f"{sql} AS c_{lang}" for lang, sql in hits.items())
    return f"""
    WITH votes AS (
      SELECT doc_id, lang, {cols} FROM documents
    ), scored AS (
      SELECT doc_id, lang, {g} AS g, c_en, c_de, c_es, c_fr FROM votes
    )
    SELECT lang, CASE WHEN g = 0 THEN 'und' {cases} END AS lang_pred,
           COUNT(*) AS n_docs
    FROM scored
    GROUP BY lang, lang_pred
    ORDER BY lang, lang_pred
    """


@query("text_lang_id", oracle=_lang_vote_sql())
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID (SURVEY §2.10): stopword-vote heuristic — count
    stopword hits per candidate language, argmax with fixed tie-break
    order, 'und' when nothing fires — then confusion-matrix counts
    against the labeled ``lang`` column. One narrow projection + one
    small-key shuffle (≤ |langs|² groups) regardless of corpus size.
    The scan widens to cluster parallelism first (r16): the one-split
    fixture scan would run the 4×5-stopword vote projection on one core;
    no-op on an already-wide scan."""
    d = ensure_min_parallelism(scan_table(spark, sf_dir, "documents"))
    votes = d.select(
        "doc_id",
        "lang",
        *[_stop_hits(lang).alias(f"c_{lang}") for lang in STOPWORDS],
    )
    g = F.greatest(*[F.col(f"c_{lang}") for lang in STOPWORDS])
    pred = F.when(g == 0, F.lit("und"))
    for lang in STOPWORDS:
        pred = pred.when(F.col(f"c_{lang}") == g, F.lit(lang))
    return (
        votes.select("lang", pred.alias("lang_pred"))
        .groupBy("lang", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("lang", "lang_pred")
    )


@extra_query(
    "text_fingerprint",
    oracle=f"""
    SELECT doc_id,
           list_reduce(
             list_prepend(
               CAST(0 AS BIGINT),
               list_transform(string_split(substr(text, 1, {FP_PREFIX}), ''),
                              c -> CAST(ascii(c) AS BIGINT))),
             (acc, x) -> (acc * {FP_BASE} + x) % {FP_MOD}) AS fingerprint,
           list_reduce(
             list_prepend(
               CAST(0 AS BIGINT),
               list_transform(string_split(substr(text, 1, {FP_PREFIX}), ''),
                              c -> CAST(ascii(c) AS BIGINT))),
             (acc, x) -> (acc * {FP_BASE} + x) % {FP_MOD}) % 1024 AS bucket
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting (SURVEY §2.10): polynomial rolling hash of
    a fixed 64-char prefix, plus a 1024-way bucket — the cheap first-pass
    key for candidate duplicate grouping upstream of MinHash. Prefix bound
    keeps per-row cost O(1); the whole query is a map-only codegen stage."""
    d = scan_table(spark, sf_dir, "documents")
    fp = F.aggregate(
        F.transform(
            F.split(F.substring("text", 1, FP_PREFIX), ""),
            lambda c: F.ascii(c).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: (acc * FP_BASE + x) % FP_MOD,
    )
    return d.select(
        "doc_id",
        fp.alias("fingerprint"),
        (fp % 1024).alias("bucket"),
    )


#: Chunking geometry: 32-word windows, stride 24 (8-word overlap) — the
#: sliding-window shape used to pack documents into training sequences.
CHUNK_WORDS = 32
CHUNK_STRIDE = 24


@extra_query(
    "doc_chunks",
    oracle=rf"""
    WITH w AS (
      SELECT doc_id,
             regexp_split_to_array(trim(text), '\s+') AS w,
             len(regexp_split_to_array(trim(text), '\s+')) AS n
      FROM documents
    )
    SELECT doc_id, i AS chunk_index,
           array_to_string(
             w[i*{CHUNK_STRIDE}+1 : LEAST(i*{CHUNK_STRIDE}+{CHUNK_WORDS}, n)],
             ' ') AS chunk_text,
           LEAST(i*{CHUNK_STRIDE}+{CHUNK_WORDS}, n) - i*{CHUNK_STRIDE} AS n_words
    FROM w, LATERAL unnest(
      range(0, CAST((GREATEST(n-{CHUNK_WORDS},0)+{CHUNK_STRIDE}-1)//{CHUNK_STRIDE}+1
                    AS BIGINT))) t(i)
    WHERE n > 0
    """,
)
def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document chunking (SURVEY §2.10): overlapping sliding windows of
    CHUNK_WORDS words at CHUNK_STRIDE — the doc→training-sequence
    packing step. Array HOFs only (sequence/transform/slice/posexplode):
    the expansion happens inside each task, no shuffle; at 100 TB cost
    is scan + ~1.3× row expansion."""
    d = scan_table(spark, sf_dir, "documents")
    words = F.split(F.trim(F.col("text")), r"\s+")
    n = F.size(words)
    n_chunks = (
        F.when(n <= 0, F.lit(0))
        .otherwise((F.greatest(n - CHUNK_WORDS, F.lit(0)) + CHUNK_STRIDE - 1) / CHUNK_STRIDE + 1)
        .cast("int")
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.concat_ws(" ", F.slice(words, i * CHUNK_STRIDE + 1, CHUNK_WORDS)),
    )
    return (
        d.filter(n > 0)
        .select("doc_id", F.posexplode(chunks).alias("chunk_index", "chunk_text"), n.alias("_n"))
        .select(
            "doc_id",
            "chunk_index",
            "chunk_text",
            (
                F.least(F.col("chunk_index") * CHUNK_STRIDE + CHUNK_WORDS, F.col("_n"))
                - F.col("chunk_index") * CHUNK_STRIDE
            ).alias("n_words"),
        )
    )


@extra_query(
    "vocab_top_terms",
    oracle=rf"""
    SELECT word,
           COUNT(DISTINCT doc_id) AS doc_freq,
           COUNT(*) AS n_occurrences
    FROM (
      SELECT doc_id, unnest({_ws_tokens_sql()}) AS word FROM documents
    )
    GROUP BY word
    ORDER BY doc_freq DESC, word ASC
    LIMIT 50
    """,
)
def vocab_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary building (SURVEY §2.10): top-50 terms by document
    frequency. Explode → one shuffle on the word key with map-side
    partial counts; the distinct-doc count rides the same shuffle. At
    100 TB add a stop-shingle-style frequency floor before the topk."""
    d = scan_table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.explode(_ws_tokens()).alias("word"))
        .groupBy("word")
        .agg(
            F.count_distinct("doc_id").alias("doc_freq"),
            F.count(F.lit(1)).alias("n_occurrences"),
        )
        .orderBy(F.desc("doc_freq"), F.asc("word"))
        .limit(50)
    )


@query(
    "tfidf_top_terms_per_doc",
    oracle=rf"""
    WITH tokens AS (
      SELECT doc_id, unnest({_ws_tokens_sql()}) AS word FROM documents
    ),
    tf AS (
      SELECT doc_id, word, COUNT(*) AS cnt FROM tokens GROUP BY doc_id, word
    ),
    doclen AS (
      SELECT doc_id, COUNT(*) AS dl FROM tokens GROUP BY doc_id
    ),
    df AS (
      SELECT word, COUNT(DISTINCT doc_id) AS df FROM tokens GROUP BY word
    ),
    n AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT doc_id, word, score, "rank" FROM (
      SELECT tf.doc_id, tf.word,
             (CAST(tf.cnt AS DOUBLE) / doclen.dl)
               * (CAST(n.n_docs AS DOUBLE) / df.df) AS score,
             ROW_NUMBER() OVER (
               PARTITION BY tf.doc_id
               ORDER BY (CAST(tf.cnt AS DOUBLE) / doclen.dl)
                          * (CAST(n.n_docs AS DOUBLE) / df.df) DESC,
                        tf.word ASC) AS "rank"
      FROM tf JOIN doclen USING (doc_id) JOIN df USING (word), n
    )
    WHERE "rank" <= 3
    """,
)
def tfidf_top_terms_per_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF keyword extraction (SURVEY §2.10), top-3 terms per doc.
    Rational idf (N/df instead of log(N/df)): Spark's and DuckDB's libm
    ``ln`` differ in the last ulp on ~2.5% of inputs, so the
    deterministic ratio form keeps the oracle bit-exact; the ranking is
    monotone-equivalent. Doc-frequency table is broadcast into the
    per-doc term join."""
    d = scan_table(spark, sf_dir, "documents")
    tokens = d.select("doc_id", F.explode(_ws_tokens()).alias("word"))
    tf = tokens.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("cnt"))
    doclen = tokens.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    dfreq = tokens.groupBy("word").agg(F.count_distinct("doc_id").alias("df"))
    n_docs = d.count()  # dimension scalar; one job at plan time
    scored = (
        tf.join(doclen, "doc_id")
        .join(F.broadcast(dfreq), "word")
        .select(
            "doc_id",
            "word",
            (
                (F.col("cnt").cast("double") / F.col("dl"))
                * (F.lit(float(n_docs)) / F.col("df"))
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("word"))
    return (
        scored.select("*", F.row_number().over(w).alias("rank"))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "word", "score", "rank")
    )


@query(
    "text_repetition_filters",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(text, '\\s+'), t -> t <> '') AS w
        FROM documents
    ),
    base AS (
        SELECT doc_id, w, len(w) AS n_tokens,
               len(list_distinct(w)) AS n_distinct
        FROM toks WHERE len(w) >= 3
    ),
    bg AS (
        SELECT doc_id, unnest([w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))]) AS g
        FROM base
    ),
    bgc AS (SELECT doc_id, g, COUNT(*) AS c FROM bg GROUP BY doc_id, g),
    bga AS (SELECT doc_id, MAX(c) AS top_bg, SUM(c) AS total_bg FROM bgc GROUP BY doc_id),
    tg AS (
        SELECT doc_id,
               unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                       FOR i IN range(1, len(w) - 1)]) AS g
        FROM base
    ),
    tgc AS (SELECT doc_id, g, COUNT(*) AS c FROM tg GROUP BY doc_id, g),
    tga AS (
        SELECT doc_id,
               SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_tg,
               SUM(c) AS total_tg
        FROM tgc GROUP BY doc_id
    )
    SELECT b.doc_id,
           b.n_tokens,
           CAST(b.n_distinct AS DOUBLE) / b.n_tokens AS distinct_ratio,
           CAST(bga.top_bg AS DOUBLE) / bga.total_bg AS top_bigram_frac,
           CAST(tga.dup_tg AS DOUBLE) / tga.total_tg AS dup_trigram_frac,
           (CAST(b.n_distinct AS DOUBLE) / b.n_tokens >= 0.2
            AND CAST(bga.top_bg AS DOUBLE) / bga.total_bg <= 0.2
            AND CAST(tga.dup_tg AS DOUBLE) / tga.total_tg <= 0.3) AS keep
    FROM base b
    JOIN bga ON bga.doc_id = b.doc_id
    JOIN tga ON tga.doc_id = b.doc_id
    """,
)
def text_repetition_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality filters (SURVEY §2.10): per-doc
    distinct-token ratio, fraction of bigram positions taken by the most
    frequent word bigram, and fraction of trigram positions inside
    duplicated trigrams — the signals that catch boilerplate and
    degenerate repetition which ratio heuristics (text_quality_score)
    miss. ``keep`` folds the three thresholds into the gating decision a
    pretraining pipeline applies.

    Scale shape: n-gram construction is the shingle transform (map-side,
    POSITIONAL — not distinct), and the two count aggregations key on
    (doc_id, gram), so cardinality per key is bounded by document length
    and the shuffle distributes across docs — no global hot key at any
    corpus size. Ratios are single IEEE divisions of identical integer
    counts, so the DuckDB oracle is bit-exact (fraction-of-positions
    formulation rather than Gopher's fraction-of-characters: same
    signal, integer-exact cross-engine).

    Line-level Gopher filters (duplicate line / paragraph fraction) are
    deliberately absent: the fixture corpus is single-line documents, so
    they would be untestable constants here; the n-gram forms subsume
    them at the resolution this corpus supports.

    The scan widens to cluster parallelism first (r16): the map-side
    n-gram explode is the heavy stage and the one-split fixture scan
    would serialize it; no-op on an already-wide scan.
    """
    d = ensure_min_parallelism(scan_table(spark, sf_dir, "documents"))
    toks = d.select("doc_id", _ws_tokens().alias("w"))
    base = toks.filter(F.size("w") >= 3).select(
        "doc_id",
        "w",
        F.size("w").alias("n_tokens"),
        F.size(F.array_distinct("w")).alias("n_distinct"),
    )

    def grams(n: int) -> Column:
        return F.transform(
            F.sequence(F.lit(0), F.size("w") - n),
            lambda i: F.concat_ws(" ", F.slice("w", i + 1, n)),
        )

    bg = base.select("doc_id", F.explode(grams(2)).alias("g"))
    bga = (
        bg.groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_bg"), F.sum("c").alias("total_bg"))
    )
    tg = base.select("doc_id", F.explode(grams(3)).alias("g"))
    tga = (
        tg.groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)).alias("dup_tg"),
            F.sum("c").alias("total_tg"),
        )
    )
    distinct_ratio = F.col("n_distinct").cast("double") / F.col("n_tokens")
    top_bigram_frac = F.col("top_bg").cast("double") / F.col("total_bg")
    dup_trigram_frac = F.col("dup_tg").cast("double") / F.col("total_tg")
    return (
        base.join(bga, "doc_id")
        .join(tga, "doc_id")
        .select(
            "doc_id",
            "n_tokens",
            distinct_ratio.alias("distinct_ratio"),
            top_bigram_frac.alias("top_bigram_frac"),
            dup_trigram_frac.alias("dup_trigram_frac"),
            (
                (distinct_ratio >= 0.2)
                & (top_bigram_frac <= 0.2)
                & (dup_trigram_frac <= 0.3)
            ).alias("keep"),
        )
    )


#: BM25 retrieval constants. The idf is the *rational* Robertson form
#: (N - df + 0.5)/(df + 0.5) WITHOUT the usual log wrap: Spark's and
#: DuckDB's libm ``ln`` differ in the last ulp on a few percent of
#: inputs (same reason tfidf_top_terms_per_doc is log-free), and for a
#: fixed query the log is monotone per-term, so ranking quality is
#: preserved while every arithmetic step stays bit-identical.
BM25_TERMS = ("hash", "join", "window")
BM25_K1 = 1.2
BM25_B = 0.75


@query(
    "bm25_topk_docs",
    oracle=rf"""
    WITH tokens AS (
      SELECT doc_id, unnest({_ws_tokens_sql()}) AS word FROM documents
    ),
    doclen AS (
      SELECT doc_id, COUNT(*) AS dl FROM tokens GROUP BY doc_id
    ),
    scalars AS (
      SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
             (CAST((SELECT SUM(dl) FROM doclen) AS DOUBLE)
               / CAST((SELECT COUNT(*) FROM documents) AS DOUBLE)) AS avgdl
    ),
    tf AS (
      SELECT doc_id, word, COUNT(*) AS tf FROM tokens
      WHERE word IN ('hash', 'join', 'window')
      GROUP BY doc_id, word
    ),
    df AS (
      SELECT word, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY word
    ),
    scored AS (
      SELECT tf.doc_id, tf.word,
             (((CAST(s.n_docs AS DOUBLE) - df.df) + 0.5) / (df.df + 0.5))
               * ((CAST(tf.tf AS DOUBLE) * ({BM25_K1} + 1.0))
                  / (CAST(tf.tf AS DOUBLE)
                     + ({BM25_K1} * ((1.0 - {BM25_B})
                        + ({BM25_B} * (CAST(doclen.dl AS DOUBLE) / s.avgdl))))))
               AS term_score
      FROM tf
      JOIN doclen ON tf.doc_id = doclen.doc_id
      JOIN df ON tf.word = df.word
      CROSS JOIN scalars s
    ),
    pivoted AS (
      SELECT doc_id,
             MAX(CASE WHEN word = 'hash' THEN term_score END) AS s_hash,
             MAX(CASE WHEN word = 'join' THEN term_score END) AS s_join,
             MAX(CASE WHEN word = 'window' THEN term_score END) AS s_window
      FROM scored GROUP BY doc_id
    )
    SELECT doc_id, s_hash, s_join, s_window,
           ((COALESCE(s_hash, 0.0) + COALESCE(s_join, 0.0))
             + COALESCE(s_window, 0.0)) AS bm25
    FROM pivoted
    ORDER BY bm25 DESC, doc_id ASC
    LIMIT 20
    """,
)
def bm25_topk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k retrieval (SURVEY §2.10 — the lexical face of the
    similarity-search family; the retrieval primitive behind RAG corpus
    curation). Query terms are compile-time constants, so the token
    stream filters to |terms| words BEFORE any shuffle — the tf table
    carries at most |docs| x |terms| rows and df collapses to 3 rows
    (broadcast). Per-term scores pivot into fixed columns and sum in
    written order, so the total is evaluation-order-deterministic and
    bit-exact vs the oracle. At 100 TB: one scan for doc lengths, one
    filtered scan for tf — both map-side until the per-key rollups; the
    final top-k compiles to TakeOrderedAndProject."""
    d = scan_table(spark, sf_dir, "documents")
    tokens = d.select("doc_id", F.explode(_ws_tokens()).alias("word"))
    doclen = tokens.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    tf = (
        tokens.filter(F.col("word").isin(*BM25_TERMS))
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("word").agg(F.count_distinct("doc_id").alias("df"))
    # n_docs / avgdl come from the *documents* table, not doclen: explode
    # drops token-less docs, so deriving the collection size from doclen
    # would diverge from the oracle's COUNT(*) FROM documents whenever a
    # doc has empty/whitespace-only content. Both aggregates are 1-row
    # scalars; the combine is a broadcast cross join.
    n_docs_df = d.agg(F.count(F.lit(1)).alias("n_docs"))
    sum_dl_df = doclen.agg(F.sum("dl").alias("sum_dl"))
    scalars = (
        n_docs_df.crossJoin(F.broadcast(sum_dl_df))
        .select(
            "n_docs",
            (F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")).alias("avgdl"),
        )
    )
    k1, b = F.lit(BM25_K1), F.lit(BM25_B)
    term_score = (
        ((F.col("n_docs").cast("double") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5)))
        * (
            (F.col("tf").cast("double") * (k1 + F.lit(1.0)))
            / (
                F.col("tf").cast("double")
                + (k1 * ((F.lit(1.0) - b) + (b * (F.col("dl").cast("double") / F.col("avgdl")))))
            )
        )
    )
    scored = (
        tf.join(doclen, "doc_id")
        .join(F.broadcast(dfreq), "word")
        .crossJoin(F.broadcast(scalars))
        .select("doc_id", "word", term_score.alias("term_score"))
    )
    pivoted = scored.groupBy("doc_id").agg(
        F.max(F.when(F.col("word") == "hash", F.col("term_score"))).alias("s_hash"),
        F.max(F.when(F.col("word") == "join", F.col("term_score"))).alias("s_join"),
        F.max(F.when(F.col("word") == "window", F.col("term_score"))).alias("s_window"),
    )
    return (
        pivoted.select(
            "doc_id",
            "s_hash",
            "s_join",
            "s_window",
            (
                (F.coalesce(F.col("s_hash"), F.lit(0.0)) + F.coalesce(F.col("s_join"), F.lit(0.0)))
                + F.coalesce(F.col("s_window"), F.lit(0.0))
            ).alias("bm25"),
        )
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Unigram log-prob quality filter (KenLM-lite perplexity gate)
# ---------------------------------------------------------------------------

#: Fixed-point scale for the dyadic log2 approximation: Q20 (2^20). All
#: per-token "log-prob" terms become BIGINTs, so corpus-wide sums are
#: exact and order-independent — the same trick as CLF_DENOM in
#: operators/pipeline.py, applied to a logarithm.
LM_Q = 1_048_576
#: keep-threshold in log2-probability units: mean token log2-prob above
#: -5.125 <=> unigram perplexity below 2^5.125 ~= 35 — tuned to be
#: discriminative on the synthetic fixture (range ~[-5.3, -4.9]); real
#: corpora tune this to their KenLM-score distribution. Dyadic, so the
#: literal is the same exact double in both engines.
LM_KEEP_LOG2 = -5.125


def _flog2_sql(expr: str) -> str:
    """floor(log2(expr)) for a positive BIGINT as a CASE chain — exact in
    any SQL engine (no libm), valid for counts < 2^41."""
    cases = " ".join(f"WHEN {expr} >= {1 << k} THEN {k}" for k in range(40, 0, -1))
    return f"(CASE {cases} ELSE 0 END)"


def _llog2_fx_sql(expr: str) -> str:
    """Piecewise-linear log2 of a positive count, in exact Q20 fixed point.

    llog2(c) = f + (c / 2^f - 1) where f = floor(log2(c)) — the classic
    frexp-style approximation (max error < 0.0861 bits, monotone). Every
    step is integer-exact: POWER(2.0, f) and the multiply by 2^20 are
    exact doubles below 2^53, FLOOR snaps to the exact integer, and the
    result is a BIGINT — so Spark and DuckDB agree bit-for-bit and
    per-doc sums are order-independent. Requires expr < 2^33 (term
    frequencies; fine far beyond 100 TB corpora for the total-count via
    64-bit headroom documented at the call site)."""
    f = _flog2_sql(expr)
    return (
        f"({f} * {LM_Q} + CAST(FLOOR(CAST({expr} AS DOUBLE) * {LM_Q}.0 "
        f"/ POWER(2.0, {f})) AS BIGINT) - {LM_Q})"
    )


@query(
    "unigram_logprob_filter",
    oracle=f"""
    WITH tokens AS (
      SELECT doc_id, unnest({_ws_tokens_sql()}) AS word FROM documents
    ),
    vocab AS (
      SELECT word, COUNT(*) AS c FROM tokens GROUP BY word
    ),
    totals AS (
      SELECT {_llog2_fx_sql('SUM(c)')} AS llog_n FROM vocab
    ),
    scored AS (
      SELECT t.doc_id, {_llog2_fx_sql('v.c')} AS llog_c
      FROM tokens t JOIN vocab v ON t.word = v.word
    ),
    per_doc AS (
      SELECT doc_id, COUNT(*) AS n_tokens, SUM(llog_c) AS sum_llog_c
      FROM scored GROUP BY doc_id
    )
    SELECT doc_id, n_tokens,
           CAST(sum_llog_c - n_tokens * tt.llog_n AS BIGINT) AS logprob_fx,
           (CAST(sum_llog_c - n_tokens * tt.llog_n AS DOUBLE)
             / (CAST(n_tokens AS DOUBLE) * {LM_Q}.0)) AS mean_log2_prob,
           ((CAST(sum_llog_c - n_tokens * tt.llog_n AS DOUBLE)
             / (CAST(n_tokens AS DOUBLE) * {LM_Q}.0)) > {LM_KEEP_LOG2}) AS keep
    FROM per_doc CROSS JOIN totals tt
    ORDER BY doc_id
    """,
)
def unigram_logprob_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model quality filter (KenLM-lite; SURVEY §2.10).

    The standard perplexity gate in LLM data pipelines (CCNet/Gopher
    use a 5-gram KenLM; the unigram form is the same pipeline shape):
    train unigram counts on the corpus itself (ONE aggregation), score
    each document by its mean token log-probability, keep docs whose
    mean log2-prob clears a perplexity threshold.

    Cross-engine exactness: no libm ``ln`` anywhere. The log is the
    frexp-style dyadic approximation ``llog2(c) = f + (c/2^f - 1)`` in
    Q20 fixed point (:func:`_llog2_fx_sql` — integer-exact in both
    engines, monotone, < 0.0861-bit error), so every per-doc sum is a
    BIGINT and the single final division is one IEEE op on identical
    operands. ``log P(t) = llog2(c_t) - llog2(N)`` — scores are exact
    rationals, the perplexity ranking is preserved.

    100 TB shape: one token-explode scan feeds BOTH the vocab aggregate
    and the scoring join; the vocab (word, count) table broadcasts (a
    real deploy caps it to the top-K vocab + an OOV floor, same plan);
    per-doc rollup is one key shuffle with partial aggregation; the
    1-row totals combine is a broadcast cross join. The trained "model"
    is swappable: replace `vocab` with a read of persisted counts and
    nothing else changes.

    r16 (guide §2.3, compute on the small side): ``llog2(c)`` — an
    ~80-branch CASE chain — is evaluated once per VOCAB row before the
    broadcast, not once per corpus token after the join; the token-side
    expression is a plain column read. Same integers, same hash."""
    d = scan_table(spark, sf_dir, "documents")
    tokens = d.select("doc_id", F.explode(_ws_tokens()).alias("word"))
    vocab = tokens.groupBy("word").agg(F.count(F.lit(1)).alias("c"))
    totals = vocab.agg(F.sum("c").alias("n_total")).select(
        F.expr(_llog2_fx_sql("n_total")).alias("llog_n")
    )
    vocab_l = vocab.select("word", F.expr(_llog2_fx_sql("c")).alias("llog_c"))
    scored = tokens.join(F.broadcast(vocab_l), "word").select(
        "doc_id", "llog_c"
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"), F.sum("llog_c").alias("sum_llog_c")
    )
    logprob_fx = F.col("sum_llog_c") - F.col("n_tokens") * F.col("llog_n")
    mean = logprob_fx.cast("double") / (F.col("n_tokens").cast("double") * F.lit(float(LM_Q)))
    return (
        per_doc.crossJoin(F.broadcast(totals))
        .select(
            "doc_id",
            "n_tokens",
            logprob_fx.alias("logprob_fx"),
            mean.alias("mean_log2_prob"),
            (mean > F.lit(LM_KEEP_LOG2)).alias("keep"),
        )
        .orderBy("doc_id")
    )


#: Backoff penalty for the bigram LM: stupid backoff with alpha = 0.5,
#: i.e. exactly -1.0 in log2 — dyadic, so the penalty is the same exact
#: integer (-LM_Q) in both engines (Brants et al. 2007 use 0.4; 0.5
#: keeps the fixed-point arithmetic closed).
LM2_BACKOFF_FX = -LM_Q
#: keep-threshold (log2-prob units) for the bigram gate — dyadic
#: (-4 - 31/32), discriminative on the held-out fixture scores
#: (range ~[-5.23, -4.72]); real corpora tune to their LM distribution.
LM2_KEEP_LOG2 = -4.96875


@query(
    "bigram_logprob_filter",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id, {_ws_tokens_sql()} AS w FROM documents
    ),
    train AS (SELECT * FROM docs WHERE doc_id % 2 = 0),
    score AS (SELECT * FROM docs WHERE doc_id % 2 = 1),
    uni AS (
      SELECT word, COUNT(*) AS c
      FROM (SELECT unnest(w) AS word FROM train) GROUP BY word
    ),
    tot AS (
      SELECT {_llog2_fx_sql('(SUM(c) + COUNT(*))')} AS llog_nv FROM uni
    ),
    big AS (
      SELECT w1, w2, COUNT(*) AS c12 FROM (
        SELECT t.w[u.i + 1] AS w1, t.w[u.i + 2] AS w2
        FROM train t, unnest(range(0, greatest(len(t.w) - 1, 0))) AS u(i)
      ) GROUP BY w1, w2
    ),
    trans AS (
      SELECT s.doc_id, s.w[u.i + 1] AS w1, s.w[u.i + 2] AS w2
      FROM score s, unnest(range(0, greatest(len(s.w) - 1, 0))) AS u(i)
    ),
    scored AS (
      SELECT tr.doc_id,
             CASE WHEN b.c12 IS NOT NULL
                  THEN {_llog2_fx_sql('b.c12')} - {_llog2_fx_sql('u1.c')}
                  ELSE {LM2_BACKOFF_FX} + {_llog2_fx_sql('(COALESCE(u2.c, 0) + 1)')}
                       - tt.llog_nv
             END AS lp,
             CASE WHEN b.c12 IS NULL THEN 1 ELSE 0 END AS backoff
      FROM trans tr
      LEFT JOIN big b ON tr.w1 = b.w1 AND tr.w2 = b.w2
      LEFT JOIN uni u1 ON tr.w1 = u1.word
      LEFT JOIN uni u2 ON tr.w2 = u2.word
      CROSS JOIN tot tt
    )
    SELECT doc_id,
           COUNT(*) AS n_transitions,
           CAST(SUM(backoff) AS BIGINT) AS n_backoff,
           CAST(SUM(lp) AS BIGINT) AS logprob_fx,
           (CAST(SUM(lp) AS DOUBLE) / (CAST(COUNT(*) AS DOUBLE) * {LM_Q}.0))
             AS mean_log2_prob,
           ((CAST(SUM(lp) AS DOUBLE) / (CAST(COUNT(*) AS DOUBLE) * {LM_Q}.0))
             > {LM2_KEEP_LOG2}) AS keep
    FROM scored GROUP BY doc_id ORDER BY doc_id
    """,
)
def bigram_logprob_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out bigram LM quality gate (KenLM-lite v2; SURVEY §2.10).

    The CCNet shape: the LM is trained on a REFERENCE corpus (here the
    even doc_ids) and scores a held-out candidate corpus (the odd ones),
    so the backoff path genuinely fires on unseen bigrams — unlike a
    self-trained model where every transition trivially exists. Scoring
    is stupid backoff (Brants et al. 2007, the score KenLM's filter mode
    popularized at web scale): seen bigram → c12/c1; unseen → alpha *
    add-one unigram with alpha = 0.5 (exactly -1 in log2, so the penalty
    stays a dyadic integer).

    Same exactness machinery as :func:`unigram_logprob_filter`: every
    log is the Q20 fixed-point dyadic log2, every per-transition term a
    BIGINT, one IEEE division at the end — bit-for-bit vs DuckDB.

    100 TB shape: counts are two aggregations over the (smaller)
    reference corpus; at web scale the bigram table is count-pruned and
    either broadcast (top-K) or shuffle-joined on (w1, w2) — the
    candidate side's transitions explode map-side (arrays_zip of two
    slices, no shuffle), so the scoring join is the only wide op. The
    n_backoff column doubles as the OOV-rate diagnostic every corpus
    report wants.

    No scan widen (r17): r16 added one (together with the llog2 CASE
    hoisting that round) but a three-way A/B isolating it shows the
    widen was the hoisting's passenger, not a win — at 32 cores
    no-widen 0.97 s vs capped-widen 1.04 s vs full-widen 1.21 s, and at
    8 cores no-widen 1.07 s vs capped 1.41 s (sf0.1, min of 3 warm).
    The per-row map work here is light and the transition aggregation
    re-parallelizes at its own exchange, so the widen's extra exchange
    + materialization barrier never pays; this also restores the
    8-vs-32-core ratio to ~1.1 (was 0.72, r16 verdict item 4)."""
    d = scan_table(spark, sf_dir, "documents")
    docs = d.select("doc_id", _ws_tokens().alias("w"))
    train = docs.filter(F.col("doc_id") % 2 == 0)
    score = docs.filter(F.col("doc_id") % 2 == 1)
    uni = (
        train.select(F.explode("w").alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = uni.agg(F.sum("c").alias("n"), F.count(F.lit(1)).alias("v")).select(
        F.expr(_llog2_fx_sql("(n + v)")).alias("llog_nv")
    )
    # short-doc guard as an index slice, not a CASE WHEN — a conditional
    # around the transform disables codegen of the generator input when
    # it feeds the explode (see dedup.shingle_arrays, r16); same pairs
    pairs = F.expr(
        "transform(slice(sequence(1, size(w)), 1, greatest(size(w) - 1, 0)), "
        "i -> struct(w[i - 1] AS w1, w[i] AS w2))"
    )
    big = (
        train.select(F.explode(pairs).alias("p"))
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
    )
    trans = score.select("doc_id", F.explode(pairs).alias("p")).select(
        "doc_id", "p.w1", "p.w2"
    )
    # r16 (guide §2.3, compute on the small side): all three llog2 CASE
    # chains (~80 branches each) evaluate once per MODEL row before the
    # broadcasts — big carries llog2(c12), u1 llog2(c1), u2 llog2(c2+1)
    # — so the per-transition expression is plain arithmetic on joined
    # columns. llog2(1) = 0 exactly, so the unseen-w2 backoff term
    # COALESCEs to 0 (same integer the old per-row COALESCE(c2u,0)+1
    # chain produced). Same integers, same hash.
    big_l = big.select(
        "w1", "w2", F.expr(_llog2_fx_sql("c12")).alias("llog_c12")
    )
    u1 = uni.select(
        F.col("word").alias("w1"), F.expr(_llog2_fx_sql("c")).alias("llog_c1")
    )
    u2 = uni.select(
        F.col("word").alias("w2"),
        F.expr(_llog2_fx_sql("(c + 1)")).alias("llog_c2p"),
    )
    scored = (
        trans.join(F.broadcast(big_l), ["w1", "w2"], "left")
        .join(F.broadcast(u1), "w1", "left")
        .join(F.broadcast(u2), "w2", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            F.when(
                F.col("llog_c12").isNotNull(),
                F.col("llog_c12") - F.col("llog_c1"),
            )
            .otherwise(
                F.lit(LM2_BACKOFF_FX)
                + F.coalesce(F.col("llog_c2p"), F.lit(0).cast("long"))
                - F.col("llog_nv")
            )
            .alias("lp"),
            F.when(F.col("llog_c12").isNull(), F.lit(1)).otherwise(F.lit(0)).alias("backoff"),
        )
    )
    agg = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_transitions"),
        F.sum("backoff").cast("long").alias("n_backoff"),
        F.sum("lp").alias("logprob_fx"),
    )
    mean = F.col("logprob_fx").cast("double") / (
        F.col("n_transitions").cast("double") * F.lit(float(LM_Q))
    )
    return (
        agg.select(
            "doc_id",
            "n_transitions",
            "n_backoff",
            "logprob_fx",
            mean.alias("mean_log2_prob"),
            (mean > F.lit(LM2_KEEP_LOG2)).alias("keep"),
        )
        .orderBy("doc_id")
    )


#: Vocabulary size for the token-ID encoding demo (top-K by frequency).
VOCAB_K = 512
#: Out-of-vocabulary id — conventionally vocab_size or a sentinel; -1
#: keeps the in-vocab id space dense [0, K).
OOV_ID = -1


@query(
    "token_ids_encoded",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id, {_ws_tokens_sql()} AS w FROM documents
    ),
    tokens AS (
      SELECT d.doc_id, u.i AS pos, d.w[u.i + 1] AS word
      FROM docs d, unnest(range(0, len(d.w))) AS u(i)
    ),
    vocab AS (
      SELECT word,
             CAST(ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, word ASC) - 1
                  AS BIGINT) AS id
      FROM tokens GROUP BY word
      ORDER BY COUNT(*) DESC, word ASC
      LIMIT {VOCAB_K}
    )
    SELECT t.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(COALESCE(SUM(CASE WHEN v.id IS NULL THEN 1 END), 0) AS BIGINT)
             AS n_oov,
           array_to_string(list(COALESCE(v.id, {OOV_ID}) ORDER BY t.pos), ',')
             AS token_ids
    FROM tokens t LEFT JOIN vocab v ON t.word = v.word
    GROUP BY t.doc_id
    ORDER BY t.doc_id
    """,
)
def token_ids_encoded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary token-ID encoding (SURVEY §2.10 — the corpus → ids
    step between cleaning and the tokenizer handoff): build a top-K
    frequency vocabulary (deterministic id = rank by count desc, word
    asc) and encode every document as its id sequence, OOV → -1.

    Declared-surface contract (VERDICT r13 #2): the driver canonicalizes
    results through pandas, which cannot sort/hash list cells, so the
    id sequence is emitted as the comma-joined STRING
    ``array_to_string(ids, ',')`` — a lossless, deterministic scalar
    encoding of the exact same sequence. The array-typed form lives in
    the extra registry (``token_ids_encoded_array``), pinned equal here
    by ``tests/test_declared_surface.py``.

    Plan: the token stream is posexploded once; the K-row vocab comes
    from a count agg + top-K (the ROW_NUMBER window runs over K rows —
    a bounded dim-side op) and BROADCASTS into the encoding join; ids
    re-assemble per doc via sort_array over (pos, id) structs — no
    global sort, one doc_id shuffle. At 100 TB the vocab is a persisted
    table (BPE merges or sentencepiece output) and this query is just
    the broadcast-join + re-assemble shape with K in the millions,
    still broadcastable."""
    d = scan_table(spark, sf_dir, "documents")
    tokens = d.select(
        "doc_id", F.posexplode(_ws_tokens()).alias("pos", "word")
    )
    counts = tokens.groupBy("word").agg(F.count(F.lit(1)).alias("c"))
    top = counts.orderBy(F.desc("c"), F.asc("word")).limit(VOCAB_K)
    w = Window.orderBy(F.desc("c"), F.asc("word"))
    vocab = top.select("word", (F.row_number().over(w) - 1).cast("long").alias("id"))
    enc = tokens.join(F.broadcast(vocab), "word", "left").select(
        "doc_id",
        "pos",
        F.coalesce(F.col("id"), F.lit(OOV_ID)).cast("long").alias("id"),
    )
    return (
        enc.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum((F.col("id") == OOV_ID).cast("long")).alias("n_oov"),
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "id"))),
                    lambda s: s["id"].cast("string"),
                ),
                ",",
            ).alias("token_ids"),
        )
        .orderBy("doc_id")
    )


@extra_query(
    "token_ids_encoded_array",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id, {_ws_tokens_sql()} AS w FROM documents
    ),
    tokens AS (
      SELECT d.doc_id, u.i AS pos, d.w[u.i + 1] AS word
      FROM docs d, unnest(range(0, len(d.w))) AS u(i)
    ),
    vocab AS (
      SELECT word,
             CAST(ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, word ASC) - 1
                  AS BIGINT) AS id
      FROM tokens GROUP BY word
      ORDER BY COUNT(*) DESC, word ASC
      LIMIT {VOCAB_K}
    )
    SELECT t.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(COALESCE(SUM(CASE WHEN v.id IS NULL THEN 1 END), 0) AS BIGINT)
             AS n_oov,
           list(COALESCE(v.id, {OOV_ID}) ORDER BY t.pos) AS token_ids
    FROM tokens t LEFT JOIN vocab v ON t.word = v.word
    GROUP BY t.doc_id
    ORDER BY t.doc_id
    """,
)
def token_ids_encoded_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-typed form of :func:`token_ids_encoded` — the actual
    tokenizer-handoff payload (``token_ids ARRAY<LONG>``). Kept in the
    extra registry because array columns are ungradable by the driver's
    pandas canonicalizer (VERDICT r13 #2); the local parity harness
    canonicalizes lists itself and value-hash-checks this fully."""
    d = scan_table(spark, sf_dir, "documents")
    tokens = d.select(
        "doc_id", F.posexplode(_ws_tokens()).alias("pos", "word")
    )
    counts = tokens.groupBy("word").agg(F.count(F.lit(1)).alias("c"))
    top = counts.orderBy(F.desc("c"), F.asc("word")).limit(VOCAB_K)
    w = Window.orderBy(F.desc("c"), F.asc("word"))
    vocab = top.select("word", (F.row_number().over(w) - 1).cast("long").alias("id"))
    enc = tokens.join(F.broadcast(vocab), "word", "left").select(
        "doc_id",
        "pos",
        F.coalesce(F.col("id"), F.lit(OOV_ID)).cast("long").alias("id"),
    )
    return (
        enc.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum((F.col("id") == OOV_ID).cast("long")).alias("n_oov"),
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "id"))), lambda s: s["id"]
            ).alias("token_ids"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# BPE subword encoding (SURVEY §2.10): the subword step below
# `token_ids_encoded`'s word-level vocabulary. Merge table + encoder live
# in operators/bpe.py; the identical replace-chain construction is emitted
# for DuckDB, which is what makes this oracle a full value-hash check of
# the subword ids themselves.
# ---------------------------------------------------------------------------

from ..operators.bpe import (  # noqa: E402  (keeps the BPE block together)
    FIXTURE_MERGES,
    bpe_encode_ids_duckdb,
    bpe_encode_ids_sql,
)


@query(
    "bpe_token_ids",
    oracle=f"""
    SELECT doc_id,
           CAST(len(ids) AS BIGINT) AS n_subwords,
           array_to_string(ids, ',') AS token_ids
    FROM (
      SELECT doc_id, {bpe_encode_ids_duckdb("text", FIXTURE_MERGES)} AS ids
      FROM documents
    )
    ORDER BY doc_id
    """,
)
def bpe_token_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE subword token-id encoding of every document against the
    static fixture tokenizer (trained offline — operators/bpe.py — the
    production shape: tokenizers are trained once on a reference corpus
    and then applied to every incoming batch).

    Plan: a PURE PROJECTION — the merge table is a chain of literal
    string replaces over a delimiter-framed symbol string and the
    vocabulary is an array literal, so encoding is zero-join,
    zero-shuffle, whole-stage-codegen work; the only exchanges are the
    scan-widening repartition (below) and the deterministic final
    ORDER BY. At 100 TB this scales embarrassingly: every partition
    encodes independently at scan speed.

    The scan widens to cluster parallelism first (r16, guide §2.5
    input-skew): the replace-chain projection is the most expensive
    map stage in the suite and the sf-scale fixture arrives as ONE
    parquet split, serializing it on a single core (measured 3.8×:
    3.76 s → 0.98 s warm at sf0.1 on local[32]); on an already-wide
    scan the widen is a no-op and the pure-projection shape is
    unchanged.

    Declared-surface contract (VERDICT r13 #2): ids emitted as the
    comma-joined STRING so the driver's pandas canonicalizer can grade
    them; the array form is ``bpe_token_ids_array`` (extra registry)."""
    d = ensure_min_parallelism(scan_table(spark, sf_dir, "documents"))
    return (
        d.select(
            "doc_id",
            F.expr(bpe_encode_ids_sql("text", FIXTURE_MERGES)).alias("ids"),
        )
        .select(
            "doc_id",
            F.size("ids").cast("long").alias("n_subwords"),
            F.array_join(
                F.transform("ids", lambda x: x.cast("string")), ","
            ).alias("token_ids"),
        )
        .orderBy("doc_id")
    )


@extra_query(
    "bpe_token_ids_array",
    oracle=f"""
    SELECT doc_id,
           CAST(len(ids) AS BIGINT) AS n_subwords,
           ids AS token_ids
    FROM (
      SELECT doc_id, {bpe_encode_ids_duckdb("text", FIXTURE_MERGES)} AS ids
      FROM documents
    )
    ORDER BY doc_id
    """,
)
def bpe_token_ids_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-typed form of :func:`bpe_token_ids` (the real handoff
    payload, ``token_ids ARRAY<LONG>``) — extra registry only: array
    columns crash the driver's pandas canonicalizer (VERDICT r13 #2).
    Scan widened like the declared twin (r16) so both stay plan-equal."""
    d = ensure_min_parallelism(scan_table(spark, sf_dir, "documents"))
    return (
        d.select(
            "doc_id",
            F.expr(bpe_encode_ids_sql("text", FIXTURE_MERGES)).alias("token_ids"),
        )
        .select(
            "doc_id",
            F.size("token_ids").cast("long").alias("n_subwords"),
            "token_ids",
        )
        .orderBy("doc_id")
    )


@query(
    "bpe_token_ids_dedup_join",
    oracle=f"""
    SELECT doc_id,
           CAST(len(ids) AS BIGINT) AS n_subwords,
           array_to_string(ids, ',') AS token_ids
    FROM (
      SELECT doc_id, {bpe_encode_ids_duckdb("text", FIXTURE_MERGES)} AS ids
      FROM documents
    )
    ORDER BY doc_id
    """,
)
def bpe_token_ids_dedup_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`bpe_token_ids` by its SCALE path: words repeat heavily in any
    corpus (Zipf), so encode each DISTINCT word once and broadcast-join
    the per-word id sequences back onto the positional token stream —
    the replace chain runs O(|vocab|) times instead of O(corpus tokens).
    Same result (same oracle), pinned equal to the pure-projection
    variant in tests.

    Plan: posexplode → distinct-word agg (vocabulary-sized) → map-side
    encode → broadcast hash join (the distinct-word table is
    vocab-sized at any corpus scale) → one doc_id shuffle to re-assemble
    ordered sequences via sort_array over (pos, ids) structs. At 100 TB
    the distinct-word table is also where a persisted tokenization cache
    would live (encode once per NEW word per batch)."""
    d = scan_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.posexplode(
            F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
        ).alias("pos", "word"),
    )
    word_ids = (
        toks.select("word")
        .distinct()
        .withColumn("ids", F.expr(bpe_encode_ids_sql("word", FIXTURE_MERGES)))
    )
    return (
        toks.join(F.broadcast(word_ids), "word")
        .groupBy("doc_id")
        .agg(
            F.flatten(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "ids"))),
                    lambda s: s["ids"],
                )
            ).alias("ids")
        )
        .select(
            "doc_id",
            F.size("ids").cast("long").alias("n_subwords"),
            # declared-surface contract: scalar encoding (VERDICT r13 #2)
            F.array_join(
                F.transform("ids", lambda x: x.cast("string")), ","
            ).alias("token_ids"),
        )
        .orderBy("doc_id")
    )
