"""Training-data pipeline operators: packing, decontamination, sampling,
redaction (operators/pipeline.py).

Oracle parity for the six declared/extra queries lives in
test_oracle_parity.py; these tests pin the operator *invariants* that the
value-hash compare can't express — packing completeness, partition-count
independence, sampling determinism and monotonicity, redaction totality.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from portfolio_data_pipelines_spark.operators.pipeline import (
    contamination_pairs,
    decontaminate,
    hash_uniform16,
    pack_sequences,
    pii_redact,
    stratified_sample,
)
from portfolio_data_pipelines_spark.sources.parquet import scan_table

SF = "/root/testdata/sf0.001"
CTX = 32


@pytest.fixture(scope="module")
def docs(spark):
    return scan_table(spark, SF, "documents")


# ---------------------------------------------------------------------------
# Sequence packing
# ---------------------------------------------------------------------------


def _token_total(docs) -> int:
    n = F.size(F.filter(F.split("text", r"\s+"), lambda t: t != ""))
    return docs.select(F.sum(n)).first()[0]


def test_packing_conserves_tokens(spark, docs):
    packed = pack_sequences(docs, "text", "doc_id", ctx_len=CTX)
    assert packed.select(F.sum("n_tokens")).first()[0] == _token_total(docs)


def test_packing_fills_every_sequence_but_last(spark, docs):
    packed = pack_sequences(docs, "text", "doc_id", ctx_len=CTX)
    per_seq = packed.groupBy("seq_id").agg(F.sum("n_tokens").alias("n")).collect()
    last = max(r["seq_id"] for r in per_seq)
    for r in per_seq:
        if r["seq_id"] != last:
            assert r["n"] == CTX, f"seq {r['seq_id']} has {r['n']} tokens"
        else:
            assert 0 < r["n"] <= CTX


def test_packing_spans_are_disjoint_and_contiguous(spark, docs):
    packed = pack_sequences(docs, "text", "doc_id", ctx_len=CTX)
    rows = packed.orderBy("seq_id", "seq_offset").collect()
    pos = {}
    for r in rows:
        expect = pos.get(r["seq_id"], 0)
        assert r["seq_offset"] == expect, f"gap in seq {r['seq_id']}"
        pos[r["seq_id"]] = expect + r["n_tokens"]


def test_packing_independent_of_partition_count(spark, docs):
    a = pack_sequences(docs, "text", "doc_id", ctx_len=CTX, n_partitions=2)
    b = pack_sequences(docs, "text", "doc_id", ctx_len=CTX, n_partitions=7)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


# ---------------------------------------------------------------------------
# Decontamination
# ---------------------------------------------------------------------------


def test_decontaminate_removes_exactly_the_flagged_ids(spark, docs):
    train = docs.filter(F.col("source") != "src0")
    bench = docs.filter(F.col("source") == "src0")
    pairs = contamination_pairs(train, bench, "text", "doc_id", n=3, min_overlap=2)
    flagged = {r["train_id"] for r in pairs.select("train_id").distinct().collect()}
    surviving = decontaminate(train, bench, "text", "doc_id", n=3, min_overlap=2)
    survivors = {r["doc_id"] for r in surviving.select("doc_id").collect()}
    all_train = {r["doc_id"] for r in train.select("doc_id").collect()}
    assert survivors == all_train - flagged
    assert flagged  # fixture must actually exercise the removal


def test_contaminated_doc_shares_shingles(spark, docs):
    train = docs.filter(F.col("source") != "src0")
    bench = docs.filter(F.col("source") == "src0")
    pair = contamination_pairs(train, bench, "text", "doc_id", n=3, min_overlap=2).first()
    texts = {
        r["doc_id"]: r["text"]
        for r in docs.filter(
            F.col("doc_id").isin(pair["train_id"], pair["bench_id"])
        ).collect()
    }

    def tris(t):
        w = t.split(" ")
        return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}

    shared = tris(texts[pair["train_id"]]) & tris(texts[pair["bench_id"]])
    assert len(shared) == pair["n_overlap"]


# ---------------------------------------------------------------------------
# Deterministic sampling
# ---------------------------------------------------------------------------


def test_hash_uniform_range_and_determinism(spark, docs):
    u = docs.select(hash_uniform16(F.col("doc_id")).alias("u"))
    lo, hi = u.select(F.min("u"), F.max("u")).first()
    assert 0 <= lo and hi < 65536
    assert u.collect() == u.collect()  # same plan, same rows, same values


def test_sampling_monotone_in_rate(spark, docs):
    small = stratified_sample(docs, "doc_id", "source", {}, 0.2)
    large = stratified_sample(docs, "doc_id", "source", {}, 0.6)
    s = {r["doc_id"] for r in small.select("doc_id").collect()}
    g = {r["doc_id"] for r in large.select("doc_id").collect()}
    assert s <= g  # same uniform, higher threshold ⇒ superset
    assert len(s) < len(g)


def test_sampling_respects_strata_rates(spark, docs):
    sampled = stratified_sample(docs, "doc_id", "source", {"src1": 1.0}, 0.0)
    kept = sampled.select("source").distinct().collect()
    assert {r["source"] for r in kept} == {"src1"}
    n_src1 = docs.filter(F.col("source") == "src1").count()
    assert sampled.count() == n_src1


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------


def test_pii_redact_scrubs_and_counts(spark):
    rows = [
        (1, "mail me at a.b+c@example.org or 555-0199 today"),
        (2, "no pii here"),
        (3, "two mails x@y.io z@w.ai and digits 123-4567"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    out = {r["id"]: r for r in pii_redact(df, "text").collect()}
    assert out[1]["n_emails"] == 1 and out[1]["n_phones"] == 1
    assert "<EMAIL>" in out[1]["redacted_text"] and "<PHONE>" in out[1]["redacted_text"]
    assert "@" not in out[1]["redacted_text"].replace("<EMAIL>", "")
    assert out[2]["n_emails"] == 0 and out[2]["redacted_text"] == "no pii here"
    assert out[3]["n_emails"] == 2 and out[3]["n_phones"] == 1


def test_pii_counts_mirror_replacement_chain(spark):
    """A phone-shaped substring inside an email local part is swallowed
    by the email replacement — n_phones must count what was actually
    redacted as <PHONE> (0 here), not raw matches on the original."""
    df = spark.createDataFrame(
        [(1, "reach x555-1234@y.com or 555-9876")], "id long, text string"
    )
    row = pii_redact(df, "text").collect()[0]
    assert row["n_emails"] == 1
    assert row["n_phones"] == 1  # only the standalone number
    assert row["redacted_text"] == "reach <EMAIL> or <PHONE>"


def test_running_total_matches_single_window_and_partition_independent(spark):
    """The two-phase prefix sum must equal a plain ordered-window cumsum
    for every row, regardless of how many range partitions the input is
    split into."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from portfolio_data_pipelines_spark.operators.pipeline import running_total

    rows = [(i, (i * 7919) % 13 + 1) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, w long")
    w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    expect = {
        r["id"]: r["cum"]
        for r in df.withColumn("cum", F.sum("w").over(w)).collect()
    }
    for nparts in (1, 3, 32):
        got = {
            r["id"]: r["cum_weight"]
            for r in running_total(
                df, "w", [F.col("id")], n_partitions=nparts
            ).collect()
        }
        assert got == expect, nparts


def test_select_within_budget_boundary_semantics(spark):
    """Inclusive running total ≤ budget: the row that first crosses the
    budget is EXCLUDED, a row landing exactly on it is KEPT, and
    priority order (not input order) decides who fills the budget."""
    from pyspark.sql import functions as F

    from portfolio_data_pipelines_spark.operators.pipeline import select_within_budget

    rows = [(1, 0.9, 4), (2, 0.8, 4), (3, 0.7, 4), (4, 0.6, 4)]
    df = spark.createDataFrame(rows, "id long, score double, w long")
    kept = {
        r["id"]
        for r in select_within_budget(
            df, "w", [F.col("score").desc(), F.col("id").asc()], budget=8
        ).collect()
    }
    assert kept == {1, 2}  # cum 4, 8 kept; 12 crosses
    kept9 = {
        r["id"]
        for r in select_within_budget(
            df, "w", [F.col("score").desc(), F.col("id").asc()], budget=9
        ).collect()
    }
    assert kept9 == {1, 2}  # 12 > 9 still excluded — no partial docs


def test_select_within_budget_dataframe_budget_cardinality(spark):
    """A DataFrame budget rides a broadcast cross join, which is only
    sound against ONE row — a multi-row budget used to silently
    duplicate every selected row. The guard lives inside the lazy plan
    (no extra evaluation of the budget derivation) and raises at
    execution time; a correct one-row derived budget still works."""
    from pyspark.sql import functions as F

    from portfolio_data_pipelines_spark.operators.pipeline import (
        select_within_budget,
    )

    rows = [(1, 0.9, 4), (2, 0.8, 4), (3, 0.7, 4), (4, 0.6, 4)]
    df = spark.createDataFrame(rows, "id long, score double, w long")
    order = [F.col("score").desc(), F.col("id").asc()]
    # derived one-row budget: half the corpus weight (= 8) keeps 2 docs
    half = df.agg((F.sum("w") / 2).alias("b"))
    kept = {r["id"] for r in select_within_budget(df, "w", order, half).collect()}
    assert kept == {1, 2}
    multi = df.select(F.col("w").cast("double").alias("b"))  # 4 rows
    with pytest.raises(Exception, match="exactly one row"):
        select_within_budget(df, "w", order, multi).collect()
    empty = half.filter(F.col("b") < 0)  # 0 rows — also not a scalar
    with pytest.raises(Exception, match="exactly one row"):
        select_within_budget(df, "w", order, empty).collect()


def test_domain_blocklist_semantics(spark, sf_dir):
    """2/5 of the synthetic domains are blocklisted; every doc gets 2
    URLs, keep iff its cycled domain is clean, and the plan is map-only
    (no Exchange before the presentation sort)."""
    from portfolio_data_pipelines_spark.queries import EXTRA_REGISTRY, _load_all

    _load_all()
    df = EXTRA_REGISTRY["domain_blocklist_filter"].fn(spark, sf_dir)
    rows = df.collect()
    assert all(r["n_urls"] == 2 for r in rows)
    for r in rows:
        blocked_cycle = r["doc_id"] % 5 in (1, 3)  # ads / spam positions
        assert r["n_blocked"] == (1 if blocked_cycle else 0)
        assert r["keep"] == (not blocked_cycle)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan  # pure codegen, no Python
