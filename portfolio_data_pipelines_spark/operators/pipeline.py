"""Training-data pipeline operators (SURVEY §2.10 — LLM-pipeline extensions).

Operators a pretraining data pipeline runs between raw documents and
training sequences, each expressed Spark-first (pure `pyspark.sql.functions`
column expressions — zero Python UDFs in this module):

- **Decontamination**: drop training docs that share ≥ k n-gram shingles
  with any benchmark/eval document (the overlap check run before every
  pretraining launch so eval sets don't leak into the corpus).
- **Sequence packing**: concat-and-split token-offset packing — documents
  are laid end-to-end in a deterministic order and cut into fixed
  ``ctx_len``-token training sequences; a doc spanning a boundary is split
  across consecutive sequences. The global token offset is a distributed
  two-phase prefix sum, NOT a single-partition window.
- **Deterministic hash sampling**: per-stratum keep/drop decided by a
  uniform value derived from ``md5(id)`` — reproducible across runs,
  engines and cluster sizes (the property that makes ablations and
  incremental re-runs possible), with per-source rates = data mixing.
- **Epoch upsampling**: fractional per-stratum repeat factors (2.5 epochs
  of wiki, 1.0 of web) realized as deterministic copy explosion — the
  other half of data mixing.
- **Weighted sampling without replacement**: Efraimidis–Spirakis A-ES
  keys over md5 uniforms + distributed top-k — proportional-to-weight
  selection in one pass.
- **Boilerplate line removal**: strip lines recurring across many
  documents (C4-style cleaning below document granularity).
- **PII redaction**: regex scrubbing of emails / phone-like tokens with
  per-doc match counts, one map-only codegen pass.

Scale notes (100 TB):
- Decontamination broadcasts the *benchmark* shingle index (benchmarks are
  MBs while the corpus is TBs) so the corpus never shuffles — the check is
  a map-side semi-join at scan bandwidth.
- Packing's only wide ops are one range repartition of (id, n_tokens)
  pairs — never the text — and a per-partition-sums aggregation whose row
  count equals the partition count. The classic single ``Window.orderBy``
  cumsum would serialize 100 TB through one task; the two-phase form keeps
  every stage at full cluster parallelism.
- Sampling and redaction are stateless map-only passes; they pipeline into
  whatever scan precedes them without adding a stage boundary.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import word_shingles

#: Email / phone shapes shared by Java regex (Spark) and RE2 (DuckDB oracle):
#: plain character classes and bounded repeats — no backrefs, no lookaround.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"[0-9]{3}-[0-9]{4}"


# ---------------------------------------------------------------------------
# Benchmark decontamination
# ---------------------------------------------------------------------------


def contamination_pairs(
    train: DataFrame,
    bench: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    min_overlap: int = 1,
    shared: bool = False,
) -> DataFrame:
    """(train_id, bench_id, n_overlap) for every train/benchmark doc pair
    sharing ≥ ``min_overlap`` distinct word n-gram shingles.

    The benchmark side is broadcast: eval sets are tiny relative to a
    pretraining corpus, so the contamination check costs one map-side
    hash-join pass over the training shingles — the corpus text itself
    never shuffles (shingles carry ≤ n words each, and only colliding
    ones reach the pair aggregation).

    ``shared=True`` memoizes+persists the train-side shingle scan (see
    ``operators.dedup.shingle_arrays``) so the flag-pairs query and the
    anti-join removal query — which both start from the identical
    filtered corpus plan — shingle it once per session.
    """
    tsh = word_shingles(train, text_col, id_col, n, shared=shared).select(
        F.col(id_col).alias("train_id"), "shingle"
    )
    bsh = word_shingles(bench, text_col, id_col, n).select(
        F.col(id_col).alias("bench_id"), "shingle"
    )
    return (
        tsh.join(F.broadcast(bsh), "shingle")
        .groupBy("train_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
        .filter(F.col("n_overlap") >= min_overlap)
    )


def decontaminate(
    train: DataFrame,
    bench: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    min_overlap: int = 1,
    shared: bool = False,
) -> DataFrame:
    """Training rows with every contaminated doc removed (left-anti join
    against the flagged id set). Same broadcast shape as
    :func:`contamination_pairs`; the anti-join key is the doc id only."""
    flagged = (
        contamination_pairs(train, bench, text_col, id_col, n, min_overlap, shared=shared)
        .select(F.col("train_id").alias(id_col))
        .distinct()
    )
    return train.join(flagged, id_col, "left_anti")


# ---------------------------------------------------------------------------
# Sequence packing (concat-and-split)
# ---------------------------------------------------------------------------


def _ws_token_count(text_col: str) -> Column:
    """Whitespace token count with boundary empties removed (matches the
    text-family convention — see queries/text.py cross-engine notes)."""
    return F.size(F.filter(F.split(text_col, r"\s+"), lambda t: t != ""))


def running_total(
    df: DataFrame,
    weight_col: str,
    order_by: list[Column],
    out_col: str = "cum_weight",
    n_partitions: int | None = None,
) -> DataFrame:
    """Inclusive running total of ``weight_col`` over an arbitrary TOTAL
    order — a **two-phase distributed prefix sum**:

    1. range-partition rows by the order expressions and cumsum *within*
       each partition (parallel across the cluster);
    2. aggregate one total per partition (rows == partition count), cumsum
       that tiny table on the driver-side single partition, and broadcast
       the per-partition base offsets back.

    A plain ``Window.orderBy(...)`` cumsum would funnel the whole input
    through one task; this form's only wide operations are the range
    shuffle of the projected rows and the |partitions|-row aggregation,
    so it holds at 100 TB. ``order_by`` must be a total order (include a
    unique tiebreak column) — with ties the split across a partition
    boundary would be arbitrary and the cumsum nondeterministic.

    The INPUT projection is localCheckpoint'ed — upstream of the range
    shuffle — because three consumers would otherwise each re-execute
    the upstream plan: the range partitioner's bound-SAMPLING job, the
    row branch, and the base-offset branch (for a text scan or an
    aggregation input that is two extra full passes; measured 2.0 s ->
    1.2 s on the 594k-distinct-value percentile frame at sf0.1). The
    range Exchange itself is computed once and reused across the two
    downstream branches (Spark's ReusedExchange; only the cheap
    per-partition window re-runs).
    """
    src = df.localCheckpoint(eager=True)
    if n_partitions is None:
        # Right-size the range shuffle to the CHECKPOINTED frame, not
        # the core count: prefix-sum inputs are usually post-aggregation
        # frames orders of magnitude smaller than the fact scan, and 32
        # near-empty range partitions cost more in task/stage overhead
        # than they buy in parallelism (measured 2.3 s → 1.5 s on the
        # 594k-row percentile frame at sf0.1). The count is ~free — src
        # is already materialized. Saturates to full parallelism at
        # ≥ 256k rows/core, so the 100 TB shape is unchanged.
        par = df.sparkSession.sparkContext.defaultParallelism
        n_partitions = max(1, min(par, -(-src.count() // 262_144)))
    part = (
        src.repartitionByRange(n_partitions, *order_by)
        .sortWithinPartitions(*order_by)
        .withColumn("_pid", F.spark_partition_id())
    )
    w_local = (
        Window.partitionBy("_pid")
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = part.withColumn(
        "_local_end", F.sum(weight_col).over(w_local)
    ).localCheckpoint(eager=True)
    # Phase 2: per-partition totals — |partitions| rows, so the global
    # cumsum window over them is trivially cheap despite being 1-task.
    w_base = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    bases = (
        local.groupBy("_pid")
        .agg(F.sum(weight_col).alias("_ptotal"))
        .withColumn("_base", F.coalesce(F.sum("_ptotal").over(w_base), F.lit(0)))
        .select("_pid", "_base")
    )
    return (
        local.join(F.broadcast(bases), "_pid")
        .withColumn(out_col, F.col("_base") + F.col("_local_end"))
        .drop("_pid", "_local_end", "_base")
    )


def exact_quantiles_by_rank(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    qs: list[float],
    n_partitions: int | None = None,
) -> DataFrame:
    """EXACT linear-interpolated quantiles per group (the
    ``percentile()`` / ``quantile_cont`` definition) computed by RANK,
    not by buffering group values: bounded memory at any scale, bit-
    identical results.

    Spark's ``percentile`` aggregate buffers every (value, count) pair
    of a group in executor memory — fine at fixture scale, a scale
    killer when one group holds billions of rows. This form never
    materializes a group:

    1. one ``groupBy(group, value)`` count — duplicates collapse here,
       so downstream stages carry DISTINCT values only;
    2. a two-phase distributed prefix sum (:func:`running_total`) over
       the (group, value) total order → each distinct value's inclusive
       cumulative count; per-group cumulative = global minus the
       group's base offset (one tiny per-group aggregate, broadcast);
    3. for each quantile q with group size n: target positions
       ``h=(n-1)q``, ``floor(h)`` and ``ceil(h)`` — the two bracketing
       order statistics are the rows whose cumulative window covers
       those ranks, found by a broadcast join of the (groups × qs × 2)-
       row target table against the distinct-value ranks;
    4. interpolate ``v_lo*(ceil(h)-h) + v_hi*(h-floor(h))`` — the exact
       expression ``percentile``/``quantile_cont`` evaluate, so results
       hash-match the in-memory aggregate.

    Wide operations: the count shuffle, the range shuffle of DISTINCT
    (group, value) pairs, and two broadcast-sized aggregates — every
    stage at full parallelism regardless of group count or group size.

    Returns one row per (group, q): ``(*group_cols, _q double,
    _quantile double)``."""
    cum = ranked_value_counts(df, group_cols, value_col,
                              n_partitions=n_partitions)
    return quantiles_from_ranked(cum, group_cols, value_col, qs)


def ranked_value_counts(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    n_partitions: int | None = None,
) -> DataFrame:
    """Step 1-2 of :func:`exact_quantiles_by_rank`, exposed so callers
    needing BOTH exact quantiles and other rank-derived facts (e.g. the
    sketch-verification ranks in ``approx_price_percentiles``) pay the
    range shuffle + prefix sum ONCE: the distinct ``(group, value)``
    frame with per-value count ``_c`` and inclusive global cumulative
    count ``_cum``. The per-partition cumsum output is materialized
    (localCheckpoint) so every consumer reuses the same rows. Unlike
    the generic :func:`running_total` (which must assume an expensive,
    already-aggregated input), this inlines a single-exchange form —
    see the inline note below."""
    gcols = list(group_cols)
    order = [F.col(c) for c in gcols] + [F.col(value_col)]
    # percentile()/quantile_cont ignore NULL values — match that
    src = df.filter(F.col(value_col).isNotNull()).select(*gcols, value_col)
    # ONE range exchange does triple duty (r13): a value-distribution
    # frame is near-distinct (594k groups from 600k lineitem rows at
    # sf0.1), so the hash-agg shuffle running_total's generic path would
    # put in front of the range shuffle combines almost nothing — it
    # only adds a full extra shuffle + checkpoint. Instead the RAW
    # projected rows range-partition directly on the total order; equal
    # keys land in one partition (RangePartitioning satisfies the
    # aggregation's clustering requirement), so the count aggregation
    # and the within-partition cumsum window run in the SAME stage with
    # no further exchange. Measured 1.9 s → 1.0 s on the sf0.1
    # percentile frame; at scale it is strictly fewer shuffled bytes
    # (one pass of (group, value) rows instead of two).
    part = (
        src.repartitionByRange(n_partitions, *order)
        if n_partitions is not None
        # no explicit count → AQE right-sizes the exchange (coalesces
        # the sf0.1 frame to a few partitions, keeps full width at scale)
        else src.repartitionByRange(*order)
    )
    cnts = part.groupBy(*gcols, value_col).agg(F.count(F.lit(1)).alias("_c"))
    # Runtime guard (r13 ADVICE): the global cumsum below is correct
    # ONLY because the aggregation reuses the range exchange
    # (RangePartitioning satisfies its ClusteredDistribution), so
    # spark_partition_id() reflects range order. A future planner
    # change inserting a hash exchange here would silently corrupt
    # every rank — fail loudly instead. Plan-string inspection only:
    # costs no job.
    plan = cnts._jdf.queryExecution().executedPlan().toString()
    n_exchanges = plan.count("Exchange")
    if n_exchanges != 1 or "rangepartitioning" not in plan:
        raise AssertionError(
            "ranked_value_counts: expected the count aggregation to "
            "reuse the single range exchange (spark_partition_id must "
            f"reflect range order); plan has {n_exchanges} exchange(s):"
            f"\n{plan}"
        )
    w_local = (
        Window.partitionBy("_pid")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Materialize the per-partition cumsum once — every consumer
    # (targets, probe joins, quantile picks) reuses these rows.
    local = (
        cnts.withColumn("_pid", F.spark_partition_id())
        .withColumn("_local_end", F.sum("_c").over(w_local))
        .localCheckpoint(eager=True)
    )
    w_base = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    bases = (
        local.groupBy("_pid")
        .agg(F.sum("_c").alias("_ptotal"))
        .withColumn("_base", F.coalesce(F.sum("_ptotal").over(w_base), F.lit(0)))
        .select("_pid", "_base")
    )
    return (
        local.join(F.broadcast(bases), "_pid")
        .withColumn("_cum", F.col("_base") + F.col("_local_end"))
        .drop("_pid", "_local_end", "_base")
    )


def quantiles_from_ranked(
    cum: DataFrame,
    group_cols: list[str],
    value_col: str,
    qs: list[float],
) -> DataFrame:
    """Steps 3-4 of :func:`exact_quantiles_by_rank` over a
    :func:`ranked_value_counts` frame."""
    gcols = list(group_cols)
    # Per-group size and base offset, both FROM the prefix-summed
    # output (its input is localCheckpoint'ed inside running_total and
    # the range Exchange is reused, so this never recomputes cnts):
    # within a group, max(_cum) is the group's last inclusive global
    # rank, so
    # base = max(_cum) − n. No per-group ordering window needed — this
    # stays fully parallel at any group cardinality.
    totals = (
        cum.groupBy(*gcols)
        .agg(F.sum("_c").alias("_n"), F.max("_cum").alias("_maxcum"))
        .withColumn("_base", F.col("_maxcum") - F.col("_n"))
    )
    # target ranks: for each (group, q), the floor/ceil order statistics
    q_lit = F.array(*[F.lit(float(q)) for q in qs])
    targets = (
        totals.select(*gcols, "_n", "_base", F.explode(q_lit).alias("_q"))
        .withColumn("_h", (F.col("_n") - 1).cast("double") * F.col("_q"))
        .withColumn("_frn", F.floor("_h").cast("long"))
        .withColumn("_crn", F.ceil("_h").cast("long"))
    )
    ranked = cum.join(F.broadcast(targets.select(
        *gcols, "_q", "_h", "_frn", "_crn", "_base"
    )), gcols)
    gcum = F.col("_cum") - F.col("_base")  # per-group inclusive rank end
    glo = gcum - F.col("_c")  # exclusive rank start
    v = F.col(value_col).cast("double")
    picked = ranked.filter(
        ((glo <= F.col("_frn")) & (F.col("_frn") < gcum))
        | ((glo <= F.col("_crn")) & (F.col("_crn") < gcum))
    ).groupBy(*gcols, "_q", "_h", "_frn", "_crn").agg(
        F.max(
            F.when((glo <= F.col("_frn")) & (F.col("_frn") < gcum), v)
        ).alias("_vlo"),
        F.max(
            F.when((glo <= F.col("_crn")) & (F.col("_crn") < gcum), v)
        ).alias("_vhi"),
    )
    exact = F.when(F.col("_frn") == F.col("_crn"), F.col("_vlo")).otherwise(
        F.col("_vlo") * (F.col("_crn").cast("double") - F.col("_h"))
        + F.col("_vhi") * (F.col("_h") - F.col("_frn").cast("double"))
    )
    return picked.select(*gcols, "_q", exact.alias("_quantile"))


def select_within_budget(
    df: DataFrame,
    weight_col: str,
    order_by: list[Column],
    budget,
    cum_col: str = "cum_weight",
    n_partitions: int | None = None,
) -> DataFrame:
    """Greedy budgeted selection: walk rows in priority order and keep
    each while the INCLUSIVE running weight stays ≤ ``budget`` — the
    corpus-composition step that fills a token budget with the
    highest-quality documents first. Distributed via `running_total`
    (two-phase prefix sum), then a map-side filter; nothing about the
    cutoff is driver-side, so the same call works when "budget" is
    trillions of tokens.

    ``budget`` is a number, or a ONE-ROW ONE-COLUMN DataFrame (a
    derived budget, e.g. ``df.agg(sum(w)/2)``): the scalar is
    broadcast-cross-joined into the filter, so a data-derived budget
    stays inside the lazy plan — no driver ``collect()`` between the
    derivation and the selection."""
    cum = running_total(
        df, weight_col, order_by, out_col=cum_col, n_partitions=n_partitions
    )
    if isinstance(budget, DataFrame):
        if len(budget.columns) != 1:
            raise ValueError(
                "a DataFrame budget must have exactly one column "
                f"(got {budget.columns})"
            )
        bcol = budget.columns[0]
        # The cross join is only sound against a ONE-ROW budget — more
        # rows would silently duplicate every selected row. The row
        # count can't be known without evaluating the (possibly
        # expensive) budget derivation, so the guard rides INSIDE the
        # lazy plan: aggregate to exactly one row and raise at execution
        # time if the input had any other cardinality (the assert_true
        # pattern — raise_error in the untaken branch costs nothing).
        btype = budget.schema[0].dataType
        budget = budget.agg(
            F.when(F.count(F.lit(1)) == 1, F.first(F.col(bcol)))
            .otherwise(
                F.raise_error(
                    F.lit(
                        "a DataFrame budget must have exactly one row "
                        f"(column {bcol})"
                    )
                ).cast(btype)
            )
            .alias(bcol)
        )
        return (
            cum.crossJoin(F.broadcast(budget))
            .filter(F.col(cum_col) <= F.col(bcol))
            .drop(bcol)
        )
    return cum.filter(F.col(cum_col) <= budget)


def pack_sequences(
    df: DataFrame,
    text_col: str,
    id_col: str,
    ctx_len: int,
    n_partitions: int | None = None,
) -> DataFrame:
    """Assign documents to fixed-size training sequences by global token
    offset: docs ordered by ``id_col`` are laid end-to-end and cut every
    ``ctx_len`` tokens. Returns one row per (sequence, doc) overlap:
    (seq_id, doc_id, seq_offset, n_tokens) — a doc that straddles a cut
    appears in consecutive sequences with complementary token spans.

    The global offset comes from `running_total`'s two-phase distributed
    prefix sum over (id, token_count) pairs — never the text — so every
    stage runs at full cluster parallelism (see `running_total` for why
    the classic single-window cumsum does not). Zero-token docs are
    dropped (they occupy no span).
    """
    toks = df.select(F.col(id_col), _ws_token_count(text_col).alias("n_tokens")).filter(
        F.col("n_tokens") > 0
    )
    spans = running_total(
        toks, "n_tokens", [F.col(id_col)], out_col="tok_end", n_partitions=n_partitions
    ).withColumn("tok_start", F.col("tok_end") - F.col("n_tokens"))
    first_seq = (F.col("tok_start") / ctx_len).cast("long")
    last_seq = ((F.col("tok_end") - 1) / ctx_len).cast("long")
    out = spans.select(
        F.col(id_col),
        "tok_start",
        "tok_end",
        F.explode(F.sequence(first_seq, last_seq)).alias("seq_id"),
    )
    seq_lo = F.col("seq_id") * ctx_len
    clip_lo = F.greatest(F.col("tok_start"), seq_lo)
    clip_hi = F.least(F.col("tok_end"), seq_lo + ctx_len)
    return out.select(
        "seq_id",
        F.col(id_col),
        (clip_lo - seq_lo).alias("seq_offset"),
        (clip_hi - clip_lo).alias("n_tokens"),
    )


# ---------------------------------------------------------------------------
# Deterministic hash sampling / data mixing
# ---------------------------------------------------------------------------


def hash_uniform16(key: Column) -> Column:
    """Uniform value in [0, 65536) derived from ``md5(key)``'s first 4 hex
    chars, folded via the instr-nibble formulation (the same construction
    as SimHash's bit votes — identical ``strpos`` SQL runs in DuckDB, so
    sampling decisions are bit-reproducible across engines)."""
    h = F.md5(key.cast("string"))

    def nib(j: int) -> Column:
        return F.instr(F.lit("0123456789abcdef"), F.substring(h, j + 1, 1)) - F.lit(1)

    return nib(0) * 4096 + nib(1) * 256 + nib(2) * 16 + nib(3)


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float,
) -> DataFrame:
    """Deterministic per-stratum sampling: keep a row iff its md5-derived
    uniform falls under the stratum's threshold. ``rates`` maps stratum
    value → keep probability; anything unlisted gets ``default_rate``.

    This is the data-mixing primitive: per-source rates reweight a corpus
    without materializing intermediate copies. Decisions depend only on
    (id, stratum) — never on partitioning, ordering, or cluster size — so
    a re-run, an incremental append, or a different engine selects the
    identical subset. Map-only; pipelines into the scan."""
    u = hash_uniform16(F.col(id_col))
    threshold = F.lit(int(default_rate * 65536))
    for value, rate in rates.items():
        threshold = (
            F.when(F.col(strata_col) == value, F.lit(int(rate * 65536)))
            .otherwise(threshold)
        )
    return df.filter(u < threshold)


def upsample_corpus(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    factors: dict[str, float],
    default_factor: float = 1.0,
    copy_col: str = "copy",
) -> DataFrame:
    """Epoch-style corpus upsampling: repeat each row ``f`` times where
    ``f`` is its stratum's (possibly fractional) factor — e.g. weight a
    high-quality source at 2.5 epochs while web text runs at 1.0.

    A row gets ``floor(f)`` guaranteed copies plus one more iff its
    md5-derived uniform falls under ``frac(f)`` — so realized epoch counts
    converge to ``f`` per stratum while every decision stays a pure
    function of (id, stratum): reproducible across runs, engines, cluster
    sizes, and incremental appends (the same property as
    :func:`stratified_sample`, whose uniform stream this deliberately
    does NOT reuse — the copy-count key is salted with ``#up`` so
    sampling and upsampling decisions are independent).

    Map-only with fan-out f̄ (the mixture's mean factor): rows explode a
    ``sequence(0, n_copies-1)`` — no shuffle, no driver state. The
    ``copy`` index makes downstream shuffles treat copies as distinct
    rows and gives sequence packing a deterministic total order.
    ``f < 1`` strata downsample (0 or 1 copies) — the operator subsumes
    integer-epoch repetition and fractional mixing in one pass.
    """
    u = hash_uniform16(F.concat(F.col(id_col).cast("string"), F.lit("#up")))
    n_copies = F.lit(int(default_factor)) + (
        u < F.lit(int((default_factor % 1.0) * 65536))
    ).cast("int")
    for value, f in factors.items():
        n = F.lit(int(f)) + (u < F.lit(int((f % 1.0) * 65536))).cast("int")
        n_copies = F.when(F.col(strata_col) == value, n).otherwise(n_copies)
    return (
        df.withColumn("_n_copies", n_copies)
        .filter(F.col("_n_copies") > 0)
        .withColumn(copy_col, F.explode(F.sequence(F.lit(0), F.col("_n_copies") - 1)))
        .drop("_n_copies")
    )


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    key_col: str = "_wrs_key",
) -> DataFrame:
    """Weighted random sampling WITHOUT replacement (Efraimidis–Spirakis
    A-ES): each row draws key ``ln(u) / w`` (u uniform in (0,1), w its
    weight) and the k largest keys win — inclusion probability
    proportional to weight, exactly one pass, no sequential draw.

    The uniform is md5-derived (``#wrs``-salted id), so the "random"
    sample is deterministic and engine-reproducible. The top-k is
    ``orderBy(key desc, id).limit(k)`` → TakeOrderedAndProject: every
    partition keeps its local k, only k-row heaps reach the driver —
    no global sort, holds at any corpus size.

    Cross-engine caveat (documented, not hidden): ``ln`` is the one
    non-integer step in the sampling family; JVM ``Math.log`` and libm
    may differ in the last ulp, which could flip the k-th/(k+1)-th
    boundary only if two keys agree to ~1e-15 relative — vanishingly
    unlikely for distinct (u, w) pairs, and the key column itself is
    dropped from the output.
    """
    u = (
        hash_uniform16(F.concat(F.col(id_col).cast("string"), F.lit("#wrs"))) + 1
    ).cast("double") / F.lit(65537.0)
    keyed = df.withColumn(key_col, F.log(u) / F.col(weight_col).cast("double"))
    return (
        keyed.orderBy(F.col(key_col).desc(), F.col(id_col))
        .limit(k)
        .drop(key_col)
    )


# ---------------------------------------------------------------------------
# Boilerplate line removal (C4/RefinedWeb-style corpus cleaning)
# ---------------------------------------------------------------------------


def remove_boilerplate_lines(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_docs: int = 3,
    line_sep: str = "\n",
) -> DataFrame:
    """Strip lines that recur across ≥ ``min_docs`` distinct documents —
    the C4/RefinedWeb boilerplate pass that removes cookie banners,
    navigation chrome, and license footers which exact- and near-dedup
    (document-granular) cannot touch.

    Returns the input columns plus ``n_lines_kept``, ``n_lines_removed``
    and ``cleaned_text`` (surviving lines re-joined in original order; a
    fully-boilerplate doc yields an empty string, not a dropped row —
    the caller decides whether to filter).

    Plan shape (100 TB): lines posexplode map-side; the boilerplate set
    is a (line)-keyed two-level aggregation — distinct (line, doc) pairs
    collapse map-side first, then per-line doc counts, so a line
    appearing 10⁹ times feeds partial aggregates, never one buffer. The
    surviving-line reassembly anti-joins the exploded lines against the
    boilerplate set (hash join on the line value — a hot boilerplate
    line's rows spread across its hash partition) and regroups by doc
    with ``array_sort`` on (pos, line) structs restoring order. Two
    shuffles total (boilerplate agg, doc regroup), both on bounded keys;
    document text crosses the wire once as its own lines.
    """
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), line_sep)).alias("_pos", "_line"),
    )
    boiler = (
        lines.select(id_col, "_line")
        .distinct()
        .groupBy("_line")
        .agg(F.count(F.lit(1)).alias("_n_docs"))
        .filter(F.col("_n_docs") >= min_docs)
        .select("_line")
    )
    kept = (
        lines.join(boiler, "_line", "left_anti")
        .groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_pos", "_line"))),
                    lambda s: s["_line"],
                ),
                line_sep,
            ).alias("cleaned_text"),
            F.count(F.lit(1)).alias("n_lines_kept"),
        )
    )
    totals = lines.groupBy(id_col).agg(F.count(F.lit(1)).alias("_n_lines"))
    return (
        df.join(totals, id_col, "left")
        .join(kept, id_col, "left")
        .select(
            *df.columns,
            F.coalesce("n_lines_kept", F.lit(0)).alias("n_lines_kept"),
            (F.coalesce("_n_lines", F.lit(0)) - F.coalesce("n_lines_kept", F.lit(0))).alias(
                "n_lines_removed"
            ),
            F.coalesce("cleaned_text", F.lit("")).alias("cleaned_text"),
        )
    )


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------


def pii_redact(df: DataFrame, text_col: str) -> DataFrame:
    """Scrub emails and phone-like tokens from ``text_col``, appending
    per-doc match counts. One narrow codegen pass: counts come from
    ``regexp_extract_all`` sizes, the scrub from two chained
    ``regexp_replace`` — both engines apply replacement globally (Spark by
    default, DuckDB via the 'g' flag in the oracle).

    Counts mirror the replacement chain exactly: emails are counted on
    the original text, phones on the email-redacted intermediate — so
    ``n_phones`` equals the number of ``<PHONE>`` markers actually
    emitted. (Counting both on the original would over-count a
    phone-shaped substring inside an email local part, e.g.
    ``x555-1234@y.com``, which the email replacement swallows.)"""
    emails = F.size(F.regexp_extract_all(text_col, F.lit(EMAIL_RE), F.lit(0)))
    email_scrubbed = F.regexp_replace(text_col, EMAIL_RE, "<EMAIL>")
    phones = F.size(F.regexp_extract_all(email_scrubbed, F.lit(PHONE_RE), F.lit(0)))
    redacted = F.regexp_replace(email_scrubbed, PHONE_RE, "<PHONE>")
    return df.select(
        "*",
        emails.alias("n_emails"),
        phones.alias("n_phones"),
        redacted.alias("redacted_text"),
    )


# ---------------------------------------------------------------------------
# Hashed-linear quality classifier (fastText-style columnar inference)
# ---------------------------------------------------------------------------

#: Hashing-trick feature space: 4 md5 hex nibbles = 16 bits = 65536 buckets.
CLF_BUCKETS = 65536
#: Knuth multiplicative constant mapping bucket → pseudo-weight.
CLF_MIX = 2654435761
#: Weight denominator — a power of two, so every weight k/2^20 - 0.5 is an
#: exact dyadic rational: doc-level double sums are EXACT (≤ 30 mantissa
#: bits used) and therefore order-independent without decimal accumulation.
CLF_DENOM = 1048576


def _bucket_expr(word: Column) -> Column:
    """16-bit feature bucket from the first 4 md5 hex nibbles of a token.

    Same instr-on-hex idiom as SimHash (operators/dedup._md5_nibble) —
    md5 is the one hash both Spark and DuckDB expose with identical
    output, so classifier scores are fully oracle-checkable.
    """
    h = F.md5(word)
    nib = lambda j: F.instr(F.lit("0123456789abcdef"), F.substring(h, j + 1, 1)) - F.lit(1)  # noqa: E731
    return nib(0) + nib(1) * 16 + nib(2) * 256 + nib(3) * 4096


def hashed_linear_score(
    df: DataFrame, text_col: str, id_col: str, threshold: float = 0.0
) -> DataFrame:
    """Score documents with a hashed linear model — model inference as a
    pure columnar plan (SURVEY §2.10: the model-based quality-filter
    stage every pretraining pipeline runs after the heuristic gates).

    The fastText recipe: token → hashing-trick bucket → weight lookup →
    mean over tokens → threshold. Weights here are a deterministic
    function of the bucket (``(bucket * CLF_MIX) % 2^20 / 2^20 - 0.5``)
    standing in for trained parameters; swapping in a real model is a
    broadcast join (or ``transform``-over-literal-array lookup) against
    a weights table keyed by bucket — identical plan shape.

    Scale: explode → map-side weight computation → one aggregation
    shuffle on ``id_col`` with partial sums. No weight table is
    shuffled (the weight is computed in-line; a trained table would
    broadcast). Returns (id, n_tokens, margin_sum, margin, keep);
    ``margin`` is the raw linear margin, not a sigmoid — exact
    cross-engine, monotone-equivalent for thresholding (libm ``exp``
    differs in last-ulp between engines).
    """
    tokens = df.select(
        F.col(id_col), F.explode(F.filter(F.split(text_col, r"\s+"), lambda t: t != "")).alias("_w")
    )
    weight = (
        ((_bucket_expr(F.col("_w")) * F.lit(CLF_MIX)) % F.lit(CLF_DENOM)).cast("double")
        / F.lit(float(CLF_DENOM))
    ) - F.lit(0.5)
    return (
        tokens.select(id_col, weight.alias("_weight"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("_weight").alias("margin_sum"),
        )
        .select(
            id_col,
            "n_tokens",
            "margin_sum",
            (F.col("margin_sum") / F.col("n_tokens")).alias("margin"),
            (F.col("margin_sum") / F.col("n_tokens") > F.lit(threshold)).alias("keep"),
        )
    )
