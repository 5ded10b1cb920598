"""Training-data pipeline declared queries (SURVEY §2.10 — the pretraining
corpus workflow: decontaminate → mix/sample → scrub → pack).

`src0` plays the held-out benchmark set (25 docs); the other 19 sources are
the training corpus. Declared here: the two ops whose semantics are richest
(benchmark decontamination and token-offset sequence packing); the
sampling/mixing and PII-redaction queries live in the extra registry (same
DuckDB parity contract, outside the driver's 50-query window).

Cross-engine exactness: everything in this module is integer arithmetic,
string equality, or regex replacement — no floats anywhere except the one
realized-rate division — so oracle parity is structural rather than
numerical. The sampling uniform reuses SimHash's instr-nibble md5
formulation (operators/dedup._md5_nibble) which is verbatim-replicable in
DuckDB ``strpos``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.pipeline import (
    EMAIL_RE,
    PHONE_RE,
    contamination_pairs,
    decontaminate,
    hashed_linear_score,
    pack_sequences,
    pii_redact,
    remove_boilerplate_lines,
    running_total,
    select_within_budget,
    stratified_sample,
    upsample_corpus,
    weighted_sample,
)
from ..functions import ensure_min_parallelism
from ..sources.parquet import scan_table
from . import extra_query, query
from .text import QUALITY_SQL

#: Decontamination geometry: word trigrams, ≥3 shared shingles flags a doc.
DECONTAM_NGRAM = 3
DECONTAM_MIN_OVERLAP = 3

#: Packing context length (tokens per training sequence).
CTX_LEN = 64

#: Data-mixing keep rates by source; everything unlisted keeps 1/8.
MIX_RATES = {"src1": 0.75, "src2": 0.5, "src3": 0.25}
MIX_DEFAULT = 0.125

_SHINGLE_CTE = """
    tsh AS (
        SELECT doc_id AS train_id,
               unnest(list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                     FOR i IN range(1, len(w) - 1)])) AS shingle
        FROM (SELECT doc_id, string_split(text, ' ') AS w
              FROM documents WHERE source <> 'src0')
        WHERE len(w) >= 3
    ),
    bsh AS (
        SELECT doc_id AS bench_id,
               unnest(list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                     FOR i IN range(1, len(w) - 1)])) AS shingle
        FROM (SELECT doc_id, string_split(text, ' ') AS w
              FROM documents WHERE source = 'src0')
        WHERE len(w) >= 3
    )
"""


def _split_corpus(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    docs = scan_table(spark, sf_dir, "documents")
    return docs.filter(F.col("source") != "src0"), docs.filter(F.col("source") == "src0")


@query(
    "decontam_overlap_pairs",
    oracle=f"""
    WITH {_SHINGLE_CTE}
    SELECT train_id, bench_id, COUNT(*) AS n_overlap
    FROM tsh JOIN bsh USING (shingle)
    GROUP BY train_id, bench_id
    HAVING COUNT(*) >= {DECONTAM_MIN_OVERLAP}
    """,
)
def decontam_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (SURVEY §2.10): train/benchmark doc pairs
    sharing ≥3 distinct word trigrams — the eval-leak check run before a
    pretraining launch. The benchmark shingle index is broadcast (eval
    sets are MBs, the corpus is TBs), so the corpus side never shuffles
    its text: the plan is scan → map-side join → pair aggregation."""
    train, bench = _split_corpus(spark, sf_dir)
    return contamination_pairs(
        train, bench, "text", "doc_id", n=DECONTAM_NGRAM,
        min_overlap=DECONTAM_MIN_OVERLAP, shared=True,
    ).orderBy("train_id", "bench_id")


@extra_query(
    "decontaminated_train_docs",
    oracle=f"""
    WITH {_SHINGLE_CTE},
    flagged AS (
        SELECT train_id
        FROM tsh JOIN bsh USING (shingle)
        GROUP BY train_id, bench_id
        HAVING COUNT(*) >= {DECONTAM_MIN_OVERLAP}
    )
    SELECT doc_id, source
    FROM documents
    WHERE source <> 'src0'
      AND doc_id NOT IN (SELECT train_id FROM flagged)
    """,
)
def decontaminated_train_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The surviving training corpus after decontamination: left-anti join
    against the flagged id set (12 of 475 docs drop on this fixture)."""
    train, bench = _split_corpus(spark, sf_dir)
    return (
        decontaminate(
            train, bench, "text", "doc_id", n=DECONTAM_NGRAM,
            min_overlap=DECONTAM_MIN_OVERLAP, shared=True,
        )
        .select("doc_id", "source")
        .orderBy("doc_id")
    )


@query(
    "packed_sequences",
    oracle=rf"""
    WITH t AS (
        SELECT doc_id,
               len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> ''))
                   AS n_tokens
        FROM documents
    ),
    c AS (
        SELECT doc_id, n_tokens,
               CAST(SUM(n_tokens) OVER (ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS tok_end
        FROM t WHERE n_tokens > 0
    )
    SELECT s.seq_id, doc_id,
           GREATEST(tok_end - n_tokens, s.seq_id * {CTX_LEN})
               - s.seq_id * {CTX_LEN} AS seq_offset,
           LEAST(tok_end, (s.seq_id + 1) * {CTX_LEN})
               - GREATEST(tok_end - n_tokens, s.seq_id * {CTX_LEN}) AS n_tokens
    FROM c, LATERAL unnest(range((tok_end - n_tokens) // {CTX_LEN},
                                 (tok_end - 1) // {CTX_LEN} + 1)) s(seq_id)
    """,
)
def packed_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing (SURVEY §2.10): documents laid end-to-end by
    doc_id and cut into 64-token training sequences; one row per
    (sequence, doc) overlap with the doc's token span inside that
    sequence. The global token offset is a two-phase distributed prefix
    sum (per-partition cumsum + |partitions|-row base-offset table) — the
    form that holds at 100 TB where a single ordered window would
    serialize the corpus through one task. The oracle's plain window
    cumsum is the semantic spec at fixture scale."""
    docs = scan_table(spark, sf_dir, "documents")
    return pack_sequences(docs, "text", "doc_id", ctx_len=CTX_LEN).orderBy(
        "seq_id", "doc_id"
    )


def _u16_sql(key: str) -> str:
    nib = (
        "(strpos('0123456789abcdef', substring(md5(CAST({k} AS VARCHAR)), {j}, 1)) - 1)"
    )
    return " + ".join(
        f"{nib.format(k=key, j=j + 1)} * {w}"
        for j, w in enumerate((4096, 256, 16, 1))
    )


def _mix_threshold_sql() -> str:
    cases = " ".join(
        f"WHEN '{s}' THEN {int(r * 65536)}" for s, r in MIX_RATES.items()
    )
    return f"CASE source {cases} ELSE {int(MIX_DEFAULT * 65536)} END"


@extra_query(
    "stratified_sample_docs",
    oracle=f"""
    SELECT doc_id, source
    FROM documents
    WHERE {_u16_sql('doc_id')} < {_mix_threshold_sql()}
    """,
)
def stratified_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic data mixing (SURVEY §2.10): per-source keep rates
    decided by an md5-derived uniform of the doc id — reproducible across
    runs, engines, and cluster sizes (same instr-nibble construction as
    SimHash's oracle-checked bit votes). Map-only: no shuffle, pipelines
    into the scan."""
    docs = scan_table(spark, sf_dir, "documents")
    return (
        stratified_sample(docs, "doc_id", "source", MIX_RATES, MIX_DEFAULT)
        .select("doc_id", "source")
        .orderBy("doc_id")
    )


@extra_query(
    "sample_rates_by_source",
    oracle=f"""
    SELECT source,
           COUNT(*) AS n_total,
           COUNT(*) FILTER (WHERE {_u16_sql('doc_id')} < {_mix_threshold_sql()})
               AS n_kept,
           CAST(COUNT(*) FILTER (WHERE {_u16_sql('doc_id')} < {_mix_threshold_sql()})
                AS DOUBLE) / COUNT(*) AS realized_rate
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
)
def sample_rates_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixing audit: realized vs configured keep rate per source — the
    validation a pipeline logs after sampling. One small-key shuffle."""
    docs = scan_table(spark, sf_dir, "documents")
    from ..operators.pipeline import hash_uniform16

    u = hash_uniform16(F.col("doc_id"))
    threshold = F.lit(int(MIX_DEFAULT * 65536))
    for value, rate in MIX_RATES.items():
        threshold = (
            F.when(F.col("source") == value, F.lit(int(rate * 65536)))
            .otherwise(threshold)
        )
    kept = F.sum(F.when(u < threshold, 1).otherwise(0))
    return (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            kept.alias("n_kept"),
            (kept.cast("double") / F.count(F.lit(1))).alias("realized_rate"),
        )
        .orderBy("source")
    )


@extra_query(
    "pii_redacted_docs",
    oracle=f"""
    WITH aug AS (
        SELECT doc_id,
               text || ' contact user' || CAST(doc_id AS VARCHAR)
                    || '@example.com or call 555-'
                    || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS text
        FROM documents
    )
    SELECT doc_id,
           len(regexp_extract_all(text, '{EMAIL_RE}')) AS n_emails,
           len(regexp_extract_all(
               regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g'),
               '{PHONE_RE}')) AS n_phones,
           regexp_replace(regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g'),
                          '{PHONE_RE}', '<PHONE>', 'g') AS redacted_text
    FROM aug
    """,
)
def pii_redacted_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (SURVEY §2.10): scrub emails and phone-like tokens,
    with per-doc match counts. The fixture text contains no PII, so each
    doc is first augmented with a deterministic synthetic email + phone
    (same concatenation in the oracle) — the redactor must find exactly
    those. Narrow map-only codegen pass; Java regex and RE2 agree on
    these character-class-only patterns."""
    docs = scan_table(spark, sf_dir, "documents").select("doc_id", "text")
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or call 555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ).alias("text"),
    )
    return pii_redact(aug, "text").select(
        "doc_id", "n_emails", "n_phones", "redacted_text"
    ).orderBy("doc_id")


@extra_query(
    "corpus_build_docs",
    oracle=rf"""
    WITH {_SHINGLE_CTE},
    flagged AS (
        SELECT train_id
        FROM tsh JOIN bsh USING (shingle)
        GROUP BY train_id, bench_id
        HAVING COUNT(*) >= {DECONTAM_MIN_OVERLAP}
    ),
    kept AS (
        SELECT doc_id, source, text FROM documents
        WHERE source <> 'src0'
          AND doc_id NOT IN (SELECT train_id FROM flagged)
          AND {{u16}} < {{mix}}
    )
    SELECT doc_id, source,
           len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> ''))
               AS n_tokens,
           len(regexp_extract_all(text, '{{email}}')) AS n_emails,
           len(regexp_extract_all(
               regexp_replace(text, '{{email}}', '<EMAIL>', 'g'), '{{phone}}'))
               AS n_phones,
           regexp_replace(regexp_replace(text, '{{email}}', '<EMAIL>', 'g'),
                          '{{phone}}', '<PHONE>', 'g') AS redacted_text
    FROM kept
    """.format(
        u16=_u16_sql("doc_id"),
        mix=_mix_threshold_sql(),
        email=EMAIL_RE,
        phone=PHONE_RE,
    ),
)
def corpus_build_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end corpus build a pretraining pipeline materializes:
    decontaminate (drop docs overlapping the benchmark set) → data
    mixing (deterministic per-source sampling) → PII redaction → token
    accounting. Every stage is one of the §2.10 operators above,
    composed; the whole plan is scan → broadcast semi/anti joins →
    map-only filters and regex projection — the corpus text shuffles
    nowhere. (The fixture corpus contains no natural PII, so the
    redaction counts are zero and redacted_text == text — the stage is
    still in the plan and the synthetic-PII variant `pii_redacted_docs`
    pins the scrubber itself.)"""
    train, bench = _split_corpus(spark, sf_dir)
    clean = decontaminate(
        train, bench, "text", "doc_id", n=DECONTAM_NGRAM,
        min_overlap=DECONTAM_MIN_OVERLAP, shared=True,
    )
    mixed = stratified_sample(clean, "doc_id", "source", MIX_RATES, MIX_DEFAULT)
    red = pii_redact(mixed, "text")
    from ..operators.pipeline import _ws_token_count

    return red.select(
        "doc_id",
        "source",
        _ws_token_count("text").alias("n_tokens"),
        "n_emails",
        "n_phones",
        "redacted_text",
    ).orderBy("doc_id")


@extra_query(
    "token_budget_corpus",
    oracle=f"""
    WITH q AS ({QUALITY_SQL}),
    c AS (
        SELECT doc_id, source, n_tokens, quality_score,
               CAST(SUM(n_tokens) OVER (
                   ORDER BY quality_score DESC, doc_id ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS cum_tokens
        FROM q
    )
    SELECT doc_id, source, n_tokens, quality_score, cum_tokens
    FROM c
    WHERE cum_tokens <= (SELECT CAST(SUM(n_tokens) AS BIGINT) // 2 FROM q)
    """,
)
def token_budget_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budgeted corpus selection: fill HALF the corpus token budget with
    the highest-quality documents first (quality score desc, doc_id
    tiebreak), keeping each doc while the inclusive running token total
    stays within budget — the composition step that turns per-doc quality
    scores into an actual training corpus. The running total is the
    two-phase distributed prefix sum (`select_within_budget` →
    `running_total`), never a single-task global window.

    The budget here is DERIVED from the corpus (half of
    ``sum(n_tokens)``) to keep the fixture self-contained; since r7 the
    derived scalar flows through the plan as a broadcast cross join —
    no driver ``collect()`` anywhere in the query, and the derivation's
    extra aggregate pass is the only cost vs. the production form where
    the budget is an input number ("select 500B tokens")."""
    from .text import quality_frame

    q = quality_frame(scan_table(spark, sf_dir, "documents")).select(
        "doc_id", "source", "n_tokens", "quality_score"
    )
    budget = q.agg(
        (F.floor(F.sum("n_tokens") / 2)).cast("long").alias("_budget")
    )
    return select_within_budget(
        q,
        "n_tokens",
        [F.col("quality_score").desc(), F.col("doc_id").asc()],
        budget,
        cum_col="cum_tokens",
    ).orderBy("doc_id")


@query(
    "deterministic_corpus_shuffle",
    oracle="""
    SELECT doc_id, source, shuffle_key,
           ROW_NUMBER() OVER (ORDER BY shuffle_key, doc_id) AS shuffle_pos
    FROM (
      SELECT doc_id, source,
             md5(CONCAT(CAST(doc_id AS VARCHAR), ':', 'epoch42')) AS shuffle_key
      FROM documents
    )
    """,
)
def deterministic_corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-order shuffle (SURVEY §2.10 — every
    pretraining run needs a reproducible, cluster-size-independent
    example order): shuffle position = rank of ``md5(doc_id:epoch)``.
    The key is a pure function of (doc_id, epoch constant), so the
    permutation is identical across partition counts, retries, and
    engines — rerunning an epoch or resuming mid-run reproduces the
    exact order, unlike ``rand()``-based shuffles. The global position
    is a two-phase distributed prefix count over the md5 order
    (``running_total`` with weight 1) — NOT a single-task
    ``Window.orderBy`` row_number — so every stage runs at cluster
    parallelism; md5 keys are uniform, so the range shuffle has no
    skew."""
    keyed = scan_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":"), F.lit("epoch42"))).alias(
            "shuffle_key"
        ),
    )
    return running_total(
        keyed.withColumn("_one", F.lit(1)),
        "_one",
        [F.col("shuffle_key"), F.col("doc_id")],
        out_col="shuffle_pos",
    ).select("doc_id", "source", "shuffle_key", "shuffle_pos")


@query(
    "quality_classifier_scores",
    oracle="""
    WITH tokens AS (
      SELECT doc_id,
             unnest(list_filter(regexp_split_to_array(text, '\\s+'), t -> t <> ''))
               AS word
      FROM documents
    ),
    buckets AS (
      SELECT doc_id,
               (instr('0123456789abcdef', substr(md5(word), 1, 1)) - 1)
             + (instr('0123456789abcdef', substr(md5(word), 2, 1)) - 1) * 16
             + (instr('0123456789abcdef', substr(md5(word), 3, 1)) - 1) * 256
             + (instr('0123456789abcdef', substr(md5(word), 4, 1)) - 1) * 4096
               AS bucket
      FROM tokens
    ),
    weighted AS (
      SELECT doc_id,
             (CAST((bucket * 2654435761) % 1048576 AS DOUBLE) / 1048576.0) - 0.5 AS w
      FROM buckets
    )
    SELECT doc_id,
           COUNT(*) AS n_tokens,
           SUM(w) AS margin_sum,
           SUM(w) / COUNT(*) AS margin,
           (SUM(w) / COUNT(*)) > 0.0 AS keep
    FROM weighted
    GROUP BY doc_id
    """,
)
def quality_classifier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filtering (SURVEY §2.10): hashed linear
    classifier over the documents table — see
    ``operators.pipeline.hashed_linear_score`` for the plan shape and
    the dyadic-weight trick that makes double sums exact and
    order-independent (no decimal accumulation needed).

    The scan widens to cluster parallelism first (r16): the md5-bucket
    hashing over every token is the heavy map stage and the one-split
    fixture scan would serialize it; no-op on an already-wide scan."""
    return hashed_linear_score(
        ensure_min_parallelism(scan_table(spark, sf_dir, "documents")),
        "text",
        "doc_id",
    ).orderBy("doc_id")


#: Blocked domains for the C4-style provenance gate. A real deploy reads
#: a large blocklist table and broadcast-joins it; a literal array keeps
#: the fixture query map-only with the same semantics.
BLOCKED_DOMAINS = ("ads.example.com", "spam.example.net", "tracker.example.org")
#: Synthetic source domains cycled by doc_id so the fixture (whose text
#: has no URLs) exercises both blocked and allowed paths.
AUG_DOMAINS = (
    "news.example.com",
    "ads.example.com",
    "blog.example.org",
    "spam.example.net",
    "docs.example.io",
)
#: Scheme + host extractor: group 1 is the registrable host. Character
#: classes only, so Java regex (Spark) and RE2 (DuckDB) agree.
URL_HOST_RE = r"https?://([A-Za-z0-9.-]+)"


def _aug_domain_case_sql() -> str:
    whens = " ".join(
        f"WHEN doc_id % {len(AUG_DOMAINS)} = {i} THEN '{d}'"
        for i, d in enumerate(AUG_DOMAINS)
    )
    return f"(CASE {whens} END)"


@extra_query(
    "domain_blocklist_filter",
    oracle=f"""
    WITH aug AS (
        SELECT doc_id,
               text || ' via https://' || {_aug_domain_case_sql()}
                    || '/p/' || CAST(doc_id AS VARCHAR)
                    || ' and https://mirror.example.com/x' AS text
        FROM documents
    ),
    hosts AS (
        SELECT doc_id,
               regexp_extract_all(text, '{URL_HOST_RE}', 1) AS host_list
        FROM aug
    )
    SELECT doc_id,
           len(host_list) AS n_urls,
           len(list_filter(host_list,
                           h -> h IN ('ads.example.com', 'spam.example.net',
                                      'tracker.example.org'))) AS n_blocked,
           (len(list_filter(host_list,
                            h -> h IN ('ads.example.com', 'spam.example.net',
                                       'tracker.example.org'))) = 0) AS keep
    FROM hosts
    ORDER BY doc_id
    """,
)
def domain_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-domain blocklist gate (SURVEY §2.10 — the C4/RefinedWeb
    provenance filter: drop documents citing blocklisted hosts). The
    fixture text has no URLs, so each doc is augmented with two
    deterministic synthetic URLs (one doc_id-cycled domain, one fixed
    mirror) — the same concatenation in the oracle, so the extractor
    must find exactly those.

    Plan: pure map-only codegen — ``regexp_extract_all`` pulls the host
    of every URL, a HOF filter counts blocklist hits, no shuffle at all
    (the ORDER BY is presentation). At 100 TB the literal IN-list
    becomes a broadcast anti-join against a blocklist table (millions of
    domains); the scan shape is unchanged. Same honest-augmentation
    idiom as ``pii_redacted_docs``."""
    whens = F.col("doc_id") % len(AUG_DOMAINS)
    dom = F.when(whens == 0, AUG_DOMAINS[0])
    for i, d in enumerate(AUG_DOMAINS[1:], start=1):
        dom = dom.when(whens == i, d)
    docs = scan_table(spark, sf_dir, "documents").select("doc_id", "text")
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" via https://"),
            dom,
            F.lit("/p/"),
            F.col("doc_id").cast("string"),
            F.lit(" and https://mirror.example.com/x"),
        ).alias("text"),
    )
    hosts = aug.select(
        "doc_id",
        F.regexp_extract_all("text", F.lit(URL_HOST_RE), F.lit(1)).alias("host_list"),
    )
    n_blocked = F.size(
        F.filter(F.col("host_list"), lambda h: h.isin(*BLOCKED_DOMAINS))
    )
    return (
        hosts.select(
            "doc_id",
            F.size("host_list").alias("n_urls"),
            n_blocked.alias("n_blocked"),
            (n_blocked == 0).alias("keep"),
        )
        .orderBy("doc_id")
    )
