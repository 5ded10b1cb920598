"""Similarity search over embedding columns (SURVEY §2.10).

Three strategies over ``array<float>`` vectors:

- **Brute-force top-k** (`cosine_topk`): broadcast the query set, score
  every (query, candidate) pair, window-rank per query. Exact; the
  correctness baseline. Cost O(|queries|·|corpus|) — fine when the query
  set is small and broadcastable, which is the common batch-scoring case.
- **IVF top-k** (`ivf_topk`): inverted-file index with deterministic
  centroids — each vector is assigned to its nearest centroid once; a
  query only scores vectors in its own centroid's cell (nprobe=1).
  Recall < 1 by construction, but fully deterministic, so it has an
  exact oracle. At 100 TB this is the shape that works: the assignment
  is one broadcast-join pass, cells are hash-partitioned, and each query
  touches |corpus|/n_centroids candidates.
- **Random-hyperplane LSH top-k** (`rp_lsh_topk`): sign-projection
  buckets from a seeded hyperplane set; candidates share a bucket in
  any of L tables. Engine-side only (the hyperplanes are engine
  constants) → rows-only check.

All cosine math uses sequential-double dot products (see dedup._dot_seq)
— the same left-to-right accumulation DuckDB's list_dot_product does —
so results are bit-identical across engines and partition orders.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import CPU_LIGHT_BYTES_PER_PARTITION, ensure_min_parallelism
from .dedup import _dot_seq, _dot_seq_sql


def _q(col: str) -> str:
    """Backtick-quote a column name for embedding in SQL strings."""
    return f"`{col}`"


def _with_norm(df: DataFrame, vec_col: str) -> DataFrame:
    # Corpus-side math (norms, bucket hashes, candidate dots) must not be
    # serialized onto the 1-2 partitions a small single-file scan yields.
    # Norms/bucket hashes are CPU-light per byte: bound the widen by
    # input size (r17 A/B: semdedup 1.65→1.28 s at 32 cores, flat at 8);
    # a real-scale scan already exceeds the floor, so this is a no-op.
    return ensure_min_parallelism(
        df, bytes_per_partition=CPU_LIGHT_BYTES_PER_PARTITION
    ).withColumn(
        "_norm", F.expr(f"sqrt({_dot_seq_sql(_q(vec_col), _q(vec_col))})")
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k neighbors per query vector.

    Returns (query_id, neighbor_id, cosine, rank), rank 1..k, ties broken
    by neighbor id. The query side is broadcast — at scale the corpus
    never shuffles; scoring is a map-side nested-loop over the broadcast
    queries, then one shuffle of k·|queries| rows for the rank window.
    """
    c = _with_norm(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_vc"),
        F.col("_norm").alias("_nc"),
    )
    q = _with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_vq"),
        F.col("_norm").alias("_nq"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", F.expr(f"{_dot_seq_sql('_vc', '_vq')} / (_nc * _nq)"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _centroids_row(centroids: DataFrame, vec_col: str, centroid_id_col: str) -> DataFrame:
    """Collapse the centroid set to ONE row holding an array of
    (cid, vector, norm) structs — the broadcastable IVF "index". Order
    inside the array is irrelevant: the argmax below uses a total order
    (sim DESC, cid ASC), so the result is order-independent."""
    cen = centroids.withColumn("_ncen", F.sqrt(_dot_seq(F.col(vec_col), F.col(vec_col))))
    return cen.agg(
        F.collect_list(
            F.struct(
                F.col(centroid_id_col).alias("cid"),
                F.col(vec_col).alias("v"),
                F.col("_ncen").alias("n"),
            )
        ).alias("_cens")
    )


def _centroid_scores_sql(vec_col: str) -> str:
    """SQL for the (sim, -cid) struct per centroid in the broadcast
    ``_cens`` array; lexicographic struct order == highest sim with
    smallest-cid tie-break. Requires ``_norm``. A string (one parse)
    rather than Column-API lambdas — construction cost, r16."""
    dot = _dot_seq_sql(_q(vec_col), "x.v")
    return (
        f"transform(_cens, x -> struct("
        f"{dot} / (_norm * x.n) AS s, -x.cid AS negcid))"
    )


def _nearest_centroid(
    df_with_cens: DataFrame,
    vec_col: str,
    centroid_id_col: str,
    sim_col: str | None = None,
) -> DataFrame:
    """Per-row nearest-centroid argmax, fully map-side.

    ``transform`` scores every centroid in the broadcast array;
    ``array_max`` over (sim, -cid) structs picks highest sim with
    smallest-cid tie-break (struct comparison is lexicographic). No
    aggregation, no shuffle, no re-join — each corpus row computes its
    own assignment inside whole-stage codegen. Requires ``_norm`` and
    the ``_cens`` array column; drops ``_cens`` on the way out.

    ``sim_col`` (optional) also keeps the winning cosine — the 1-D
    "distance to centroid" projection downstream candidate windows sort
    on (`cluster_cosine_pairs`).
    """
    best = F.expr(f"array_max({_centroid_scores_sql(vec_col)})")
    out = df_with_cens.withColumn(
        centroid_id_col, (-best.getField("negcid")).cast("long")
    )
    if sim_col is not None:
        out = out.withColumn(sim_col, best.getField("s"))
    return out.drop("_cens")


def _probe_centroids(
    df_with_cens: DataFrame, vec_col: str, centroid_id_col: str, nprobe: int
) -> DataFrame:
    """Explode each query row into its ``nprobe`` nearest cells.

    Same map-side scoring as `_nearest_centroid`; the top-P cells come
    from sorting the (sim, -cid) structs descending and slicing — still
    zero shuffle, one output row per probed cell. Each corpus vector
    lives in exactly one cell, so probing P distinct cells can never
    produce duplicate (query, neighbor) candidates.
    """
    top = F.expr(
        f"slice(reverse(array_sort({_centroid_scores_sql(vec_col)})), "
        f"1, {int(nprobe)})"
    )
    return (
        df_with_cens.withColumn("_probe", F.explode(top))
        .withColumn(centroid_id_col, (-F.col("_probe.negcid")).cast("long"))
        .drop("_cens", "_probe")
    )


def assign_centroids(
    corpus: DataFrame,
    centroids: DataFrame,
    vec_col: str,
    id_col: str,
    centroid_id_col: str = "centroid_id",
    sim_col: str | None = None,
) -> DataFrame:
    """Assign every vector to its nearest centroid by cosine (IVF build).

    Zero-shuffle: the centroid set collapses to a single broadcast row
    (`_centroids_row`) and each corpus row computes its argmax map-side
    (`_nearest_centroid`) — r1's form aggregated per id and re-joined
    the corpus on id, an avoidable corpus-sized shuffle join.
    Deterministic tie-break on centroid id. Output: corpus columns +
    ``centroid_id``.
    """
    c = _with_norm(corpus, vec_col).join(
        F.broadcast(_centroids_row(centroids, vec_col, centroid_id_col))
    )
    return _nearest_centroid(c, vec_col, centroid_id_col, sim_col=sim_col).drop("_norm")


#: Coarse cells probed per point by the pruned assignment. 2 (not 1)
#: so a point near a coarse-cell boundary still sees both sides'
#: fine centroids — the standard IVF recall/cost knob.
PRUNED_ASSIGN_NPROBE = 2

#: Centroid count at or above which ``pruned="auto"`` (the
#: `kmeans_refine` default) switches from the exact brute-force argmax
#: to the two-level pruned one. The pruned form's asymptotic win
#: (O(√k) vs O(k) dot products per row) only pays past the fixed cost
#: of its heavier per-row expression (sort/slice/flatten over struct
#: arrays carrying the fine vectors): measured at dim=64 on local[32],
#: brute force is still ~1.7× faster at k≈95 (sf0.1's k = n/53 seeding)
#: while the pruned form is ~5× faster at k≈950 (the 10× soak) — the
#: crossover sits between, so 192 wins both measured regimes.
PRUNED_ASSIGN_MIN_K = 192


def _hierarchy_row(
    centroids: DataFrame, vec_col: str, centroid_id_col: str
) -> DataFrame:
    """Collapse the centroid set to ONE broadcastable row holding a
    two-level (coarse → fine) index: an array of coarse structs
    ``(ccid, cv, cn, fines)`` where ``fines`` is the array of fine
    centroids ``(cid, v, n)`` whose nearest coarse centroid is this one.

    Deterministic construction (the oracle-replicable contract):
    rank the k centroids by cid ascending; coarse = every m-th by rank
    with ``m = ceil(k / ceil(sqrt(k)))`` (so ~√k coarse cells); each
    fine centroid maps to its nearest coarse by cosine with the usual
    (sim DESC, ccid ASC) tie-break. Every step is tiny — k rows — and
    the expensive part (fine→coarse argmax) is the existing map-side
    `_nearest_centroid` over a broadcast coarse array: O(k·√k·dim)
    total, negligible next to the corpus assignment it prunes.
    """
    cen = centroids.select(
        F.col(centroid_id_col).cast("long").alias("cid"),
        F.col(vec_col).alias("v"),
    ).withColumn("n", F.sqrt(_dot_seq(F.col("v"), F.col("v"))))
    # k-row metadata windows: the centroid table is the index artifact
    # (k ≪ n rows), so a single-task rank over it is driver-scale work,
    # the same stance as the Delta file-list handling.
    ranked = cen.withColumn(
        "_rk0", F.row_number().over(Window.orderBy("cid")) - 1
    )
    stats = cen.agg(F.count(F.lit(1)).alias("_k")).select(
        F.ceil(F.col("_k") / F.ceil(F.sqrt(F.col("_k")))).cast("long").alias("_m")
    )
    ranked = ranked.join(F.broadcast(stats))
    coarse = ranked.filter(F.col("_rk0") % F.col("_m") == 0).select(
        F.col("cid").alias("_ccid"),
        F.col("v").alias("_cv"),
        F.col("n").alias("_cn"),
    )
    coarse_row = coarse.agg(
        F.collect_list(
            F.struct(
                F.col("_ccid").alias("cid"),
                F.col("_cv").alias("v"),
                F.col("_cn").alias("n"),
            )
        ).alias("_cens")
    )
    f2c = _nearest_centroid(
        ranked.select("cid", "v", "n")
        .withColumn("_norm", F.col("n"))
        .join(F.broadcast(coarse_row)),
        "v",
        "_ccid",
    ).drop("_norm")
    groups = f2c.groupBy("_ccid").agg(
        F.collect_list(F.struct("cid", "v", "n")).alias("_fines")
    )
    return groups.join(F.broadcast(coarse), "_ccid").agg(
        F.collect_list(
            F.struct(
                F.col("_ccid").alias("ccid"),
                F.col("_cv").alias("cv"),
                F.col("_cn").alias("cn"),
                F.col("_fines").alias("fines"),
            )
        ).alias("_hier")
    )


def _nearest_centroid_pruned(
    df_with_hier: DataFrame,
    vec_col: str,
    centroid_id_col: str,
    nprobe: int = PRUNED_ASSIGN_NPROBE,
    sim_col: str | None = None,
) -> DataFrame:
    """Per-row nearest-centroid argmax restricted to the fine centroids
    of the row's ``nprobe`` nearest coarse cells — still fully map-side
    (the `_hier` array is broadcast), but O(√k + nprobe·k/√k) ≈ O(√k)
    dot products per row instead of `_nearest_centroid`'s O(k).

    Approximate relative to the exact argmax (a point whose true
    nearest fine centroid lives in an unprobed coarse cell gets its
    best probed one), but FULLY deterministic: coarse probing uses the
    same (sim DESC, ccid ASC) total order as `_probe_centroids`, fine
    argmax the same (sim, -cid) struct max as `_nearest_centroid`, so
    the rule replicates bit-for-bit in a SQL oracle. Requires ``_norm``
    and ``_hier``; drops ``_hier`` on the way out. Built as one SQL
    parse (r16) — the Column-API lambda form cost hundreds of py4j
    round trips to CONSTRUCT per call.
    """
    coarse_dot = _dot_seq_sql(_q(vec_col), "h.cv")
    fine_dot = _dot_seq_sql(_q(vec_col), "x.v")
    scored = (
        "transform(_hier, h -> struct("
        f"{coarse_dot} / (_norm * h.cn) AS s, "
        "-h.ccid AS negcid, h.fines AS fines))"
    )
    probes = f"slice(reverse(array_sort({scored})), 1, {int(nprobe)})"
    cands = f"flatten(transform({probes}, p -> p.fines))"
    best = F.expr(
        f"array_max(transform({cands}, x -> struct("
        f"{fine_dot} / (_norm * x.n) AS s, -x.cid AS negcid)))"
    )
    out = df_with_hier.withColumn(
        centroid_id_col, (-best.getField("negcid")).cast("long")
    )
    if sim_col is not None:
        out = out.withColumn(sim_col, best.getField("s"))
    return out.drop("_hier")


def _probe_centroids_pruned(
    df_with_hier: DataFrame,
    vec_col: str,
    centroid_id_col: str,
    nprobe: int,
    coarse_nprobe: int = PRUNED_ASSIGN_NPROBE,
) -> DataFrame:
    """Explode each query row into its ``nprobe`` nearest FINE cells
    under the two-level pruned rule — the pruned twin of
    `_probe_centroids`: candidate fines come from the ``coarse_nprobe``
    nearest coarse cells only, then the top ``nprobe`` by the usual
    (sim DESC, cid ASC) total order. For ``nprobe=1`` this is exactly
    `_nearest_centroid_pruned`'s argmax, so a query vector that is also
    a corpus member probes the SAME cell the corpus assignment gave it.
    Requires ``_norm`` and ``_hier``."""
    coarse_dot = _dot_seq_sql(_q(vec_col), "h.cv")
    fine_dot = _dot_seq_sql(_q(vec_col), "x.v")
    scored = (
        "transform(_hier, h -> struct("
        f"{coarse_dot} / (_norm * h.cn) AS s, "
        "-h.ccid AS negcid, h.fines AS fines))"
    )
    probes = f"slice(reverse(array_sort({scored})), 1, {int(coarse_nprobe)})"
    cands = f"flatten(transform({probes}, p -> p.fines))"
    top = F.expr(
        f"slice(reverse(array_sort(transform({cands}, x -> struct("
        f"{fine_dot} / (_norm * x.n) AS s, -x.cid AS negcid)))), "
        f"1, {int(nprobe)})"
    )
    return (
        df_with_hier.withColumn("_probe", F.explode(top))
        .withColumn(centroid_id_col, (-F.col("_probe.negcid")).cast("long"))
        .drop("_hier", "_probe")
    )


def assign_centroids_pruned(
    corpus: DataFrame,
    centroids: DataFrame,
    vec_col: str,
    id_col: str,
    centroid_id_col: str = "centroid_id",
    sim_col: str | None = None,
    nprobe: int = PRUNED_ASSIGN_NPROBE,
) -> DataFrame:
    """`assign_centroids` with two-level (coarse → fine) pruning — the
    scale form when the centroid count k grows with the corpus (the
    SemDeDup seeding shape, k ∝ n): per-row cost drops from O(k·dim)
    to O(√k·dim), total assignment from O(n²·dim/53) to O(n^1.5·dim)
    at k = n/53. Same zero-shuffle plan shape (one broadcast row, all
    scoring inside whole-stage codegen); memory still holds all k
    centroids in the broadcast — beyond broadcast limits the assignment
    becomes a shuffle join keyed on the coarse cell (each point
    repartitioned to its nprobe coarse cells, fines co-partitioned),
    which this two-level construction is the direct precursor of.
    """
    c = _with_norm(corpus, vec_col).join(
        F.broadcast(_hierarchy_row(centroids, vec_col, centroid_id_col))
    )
    return _nearest_centroid_pruned(
        c, vec_col, centroid_id_col, nprobe=nprobe, sim_col=sim_col
    ).drop("_norm")


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 10,
    centroid_id_col: str = "centroid_id",
    nprobe: int = 1,
    pruned: bool | str = "auto",
) -> DataFrame:
    """Approximate top-k via an inverted-file index.

    The corpus is assigned to its nearest centroid; each query scores
    candidates in its ``nprobe`` nearest cells (recall rises with
    nprobe; nprobe = n_centroids degenerates to exact brute force —
    asserted as a property test). Deterministic end to end (given
    deterministic centroids), hence oracle-checkable.

    ``pruned`` picks the assignment/probing rule exactly like
    `kmeans_refine`: ``"auto"`` (default) uses the exact brute-force
    argmax below `PRUNED_ASSIGN_MIN_K` centroids and the two-level
    coarse→fine index at or above it. With k ∝ n centroids (the
    declared every-53rd-id seeding) brute-force assignment is
    O(n·k·dim) = O(n²·dim/53) — the r16 10× soak measured 12.8× wall
    at 10× rows once the small-k base stopped hiding it; the pruned
    rule drops per-row work to O(√k·dim). Queries probe through the
    SAME rule (`_probe_centroids_pruned`), so a query that is also a
    corpus member lands in its own cell under either rule, and the
    whole switch replicates in the SQL oracle from a seed-count CTE.

    Plan shape: assignment and probing are map-side (broadcast centroid
    array or two-level index), the cell join broadcasts the probed
    query set, so the corpus never shuffles until the final rank window
    — which moves only scored candidate rows (nprobe·|corpus|/n_cells
    per query), not vectors. The norm computed for assignment is reused
    for scoring (one `_with_norm` per side).
    """
    if pruned == "auto":
        from .dedup import _memo_scalar, _plan_key as _pk

        pruned = (
            _memo_scalar(_pk(centroids, "seed_count"), centroids.count)
            >= PRUNED_ASSIGN_MIN_K
        )
    if pruned:
        idx_row = F.broadcast(
            _hierarchy_row(centroids, vec_col, centroid_id_col)
        )
        c = _nearest_centroid_pruned(
            _with_norm(corpus, vec_col).join(idx_row), vec_col, centroid_id_col
        )
        q = _probe_centroids_pruned(
            _with_norm(queries, vec_col).join(idx_row),
            vec_col, centroid_id_col, nprobe,
        )
    else:
        cen_row = F.broadcast(
            _centroids_row(centroids, vec_col, centroid_id_col)
        )
        c = _nearest_centroid(
            _with_norm(corpus, vec_col).join(cen_row), vec_col, centroid_id_col
        )
        q = _probe_centroids(
            _with_norm(queries, vec_col).join(cen_row),
            vec_col, centroid_id_col, nprobe,
        )
    c = c.select(
        F.col(centroid_id_col),
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_vc"),
        F.col("_norm").alias("_nc"),
    )
    q = q.select(
        F.col(centroid_id_col),
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_vq"),
        F.col("_norm").alias("_nq"),
    )
    scored = (
        c.join(F.broadcast(q), centroid_id_col)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", F.expr(f"{_dot_seq_sql('_vc', '_vq')} / (_nc * _nq)"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def kmeans_refine(
    corpus: DataFrame,
    seeds: DataFrame,
    vec_col: str,
    id_col: str,
    n_iter: int = 2,
    cluster_id_col: str = "cluster_id",
    exact: bool = True,
    sim_col: str | None = None,
    pruned: bool | str = "auto",
) -> DataFrame:
    """Deterministic Lloyd (k-means) refinement over cosine assignment.

    ``n_iter`` rounds of: map-side nearest-centroid assignment
    (broadcast centroid array, zero shuffle — `_nearest_centroid`) then
    per-dimension mean recomputation; returns the corpus assigned to the
    final refined centroids as (corpus columns + ``cluster_id_col``).
    Cluster labels are the seed ids, stable across rounds. Empty cells
    drop out of the centroid set (their label can never be assigned
    again) — standard Lloyd behavior.

    ``exact=True`` computes each mean as a sequential left-to-right
    double fold over the cell's values ordered by ``id_col`` — the same
    accumulation DuckDB's ``list_dot_product`` does — so assignments are
    bit-reproducible across engines and partition orders, at the cost of
    a ``collect_list`` buffer of one double per cell member per
    dimension. ``exact=False`` uses plain ``sum`` (map-side partial
    aggregation, no per-group buffer) — the 100 TB form; means then
    differ across runs at the ULP level, which can flip an assignment
    only for points equidistant to that precision.

    ``pruned`` picks the assignment rule. **The default, "auto",
    decides from the data**: brute-force exact argmax when the initial
    seed count k₀ < `PRUNED_ASSIGN_MIN_K`, two-level pruned above —
    so assignments ARE the exact argmax for the common small-fixed-k
    caller (the pre-r15 semantics; r15 briefly defaulted every caller
    to the approximate rule, flagged by the r15 advisor) and switch to
    the approximate-but-scale-safe rule exactly where brute force
    stops being viable. The decision is a single k₀ threshold fixed
    for ALL rounds (including the final assignment), computed once per
    call via ``seeds.count()`` — a seed-table-sized job, negligible
    next to the n_iter corpus scans, and deterministic, so a SQL
    oracle replicates the same switch from ``COUNT(*)`` over the seed
    CTE. ``pruned=True`` forces `assign_centroids_pruned`: the
    two-level coarse→fine index cuts per-row work from O(k·dim) to
    O(√k·dim), which is what makes k ∝ n seeding (the SemDeDup shape)
    survive scale — brute-force assignment at k = n/53 is
    O(n²·dim/53) per round (r14's measured 6.86× wall at 10× rows).
    The pruning rule is deterministic (see `_hierarchy_row`), so the
    pruned form stays oracle-checkable; it is approximate relative to
    the exact argmax only for points whose true nearest centroid hides
    outside their 2 nearest coarse cells. ``pruned=False`` forces the
    exact brute-force argmax — right when k is small and fixed.

    Scale shape: per round, one corpus scan (assignment is map-side) +
    one (cell, dim)-keyed aggregation shuffle whose row count is
    |corpus|·dim regardless of skew; the centroid table stays k rows and
    is re-broadcast each round. Rounds are a fixed small constant —
    k-means for corpus bucketing (SemDeDup) needs 1-3, not convergence.
    """
    if pruned == "auto":
        # Session-memoized (the same lifetime as the centroid index the
        # count guards): the resolution costs one seed-table count per
        # distinct seed plan, not one per call.
        from .dedup import _memo_scalar, _plan_key as _pk

        pruned = (
            _memo_scalar(_pk(seeds, "seed_count"), seeds.count)
            >= PRUNED_ASSIGN_MIN_K
        )
    assign = assign_centroids_pruned if pruned else assign_centroids

    def _refine_centroids() -> DataFrame:
        cen = seeds.select(
            F.col(cluster_id_col).cast("long").alias(cluster_id_col),
            F.col(vec_col),
        )
        for _ in range(n_iter):
            assigned = assign(
                corpus, cen, vec_col, id_col, cluster_id_col
            )
            ex = assigned.select(
                cluster_id_col,
                F.col(id_col).alias("_id"),
                F.posexplode(F.col(vec_col)).alias("_pos", "_val"),
            ).withColumn("_val", F.col("_val").cast("double"))
            if exact:
                dims = ex.groupBy(cluster_id_col, "_pos").agg(
                    F.array_sort(
                        F.collect_list(F.struct("_id", "_val"))
                    ).alias("_sv")
                )
                mean = (
                    F.aggregate(
                        F.col("_sv"), F.lit(0.0),
                        lambda acc, x: acc + x["_val"],
                    )
                    / F.size("_sv")
                ).alias("_m")
                means = dims.select(cluster_id_col, "_pos", mean)
            else:
                means = ex.groupBy(cluster_id_col, "_pos").agg(
                    (F.sum("_val") / F.count("_val")).alias("_m")
                )
            # k-row table: checkpoint eagerly so each round's plan is
            # flat (O(1) lineage per round — the dup_clusters pattern)
            # instead of nesting every previous round's corpus scan
            # into the next.
            cen = means.groupBy(cluster_id_col).agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_pos", "_m"))),
                    lambda x: x["_m"],
                ).alias(vec_col)
            ).localCheckpoint(eager=True)
        return cen

    # The refined centroid TABLE (k rows) is the reusable index-level
    # artifact — the expensive part is the n_iter corpus scans +
    # (cell, dim) shuffles that build it, which the clustering query
    # and SemDeDup would otherwise each pay for the same
    # (corpus, seeds) input. Same session-scoped memo as the dedup
    # family's shingle/signature indexes (cleared together by
    # clear_shared_plans).
    from .dedup import _memo_persist, _plan_key

    cen = _memo_persist(
        _plan_key(
            corpus, "kmeans_centroids", seeds.semanticHash(), vec_col,
            id_col, n_iter, exact, cluster_id_col, pruned,
        ),
        _refine_centroids,
    )
    return assign(corpus, cen, vec_col, id_col, cluster_id_col, sim_col=sim_col)


def cluster_cosine_pairs(
    corpus: DataFrame,
    seeds: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float = 0.4,
    n_iter: int = 2,
    cluster_id_col: str = "cluster_id",
    max_cell_candidates: int = 256,
    pruned: bool | str = "auto",
) -> DataFrame:
    """SemDeDup-shaped embedding near-dup pairs: k-means-bucket the
    corpus (`kmeans_refine`), then exact cosine only WITHIN each
    cluster, with a pinned per-row candidate bound. Output
    (id_a, id_b, cosine), id_a < id_b, cosine ≥ threshold.

    This is the scale path beside the all-pairs correctness baseline
    (dedup.embedding_cosine_pairs): candidate pairs drop from O(n²) to
    O(Σ|cell|·W) where W = ``max_cell_candidates``. Within each cell,
    rows sort by (cosine-to-centroid DESC, id ASC) — a deterministic 1-D
    projection along the "distance to centroid" axis, the SortingLSH
    trick — and each row pairs only with the next W rows in that order.
    For cells of ≤ W+1 members the window covers every pair, so the
    operator is exact in-cell dedup (the declared fixtures' cells are
    ≤ 64 ≪ 256: output identical to the unbounded form); above that the
    window caps work at |cell|·W instead of |cell|²/2 — a skewed or
    degenerate mega-cell (all vectors near one centroid) can no longer
    go quadratic. Recall contract: a pair is found iff its two members
    share a cell AND sit within W positions of each other in the cell's
    centroid-similarity order — near-dups have near-equal centroid
    cosines, so they sort adjacent and survive any W ≥ 1 unless W/2
    other vectors tie between them.

    Fully deterministic (total sort order, sequential-double cosines) →
    oracle-checkable at every scale. Reference analogue: SemDeDup
    (Abbas et al. 2023) — cluster embeddings, dedup within cluster.
    """
    assigned = kmeans_refine(
        corpus, seeds, vec_col, id_col, n_iter=n_iter,
        cluster_id_col=cluster_id_col, sim_col="_csim", pruned=pruned,
    )
    # Both pair-join sides read the assignment; checkpoint the (id, vec,
    # cell, norm, rank) projection once so the final map-side assignment
    # pass runs once, not twice (at scale: persist this projection
    # MEMORY_AND_DISK — it is the reusable "index" artifact, ~vector
    # width per row, the same stance as the dedup family's shared index).
    # The rank window shuffles by cell — the same partitioning the pair
    # join needs anyway, and cells stay bounded when seeds scale with the
    # corpus (the declared shape), so no single task sees more than a
    # cell.
    w = Window.partitionBy(cluster_id_col).orderBy(F.desc("_csim"), F.asc(id_col))
    ranked = (
        assigned.withColumn(
            "_norm", F.expr(f"sqrt({_dot_seq_sql(_q(vec_col), _q(vec_col))})")
        )
        .withColumn("_rk", F.row_number().over(w))
        .localCheckpoint(eager=True)
    )
    # Band-bucketed window join: rows carry bucket = floor((rank-1)/W);
    # a pair within W positions spans at most adjacent buckets, so the
    # b side explodes to (own bucket, own bucket - 1) and the join key
    # is (cell, bucket). The hash join then ENUMERATES only O(|cell|·W)
    # candidates — a plain cell equi-join would materialize |cell|²
    # candidate rows before the rank filter could drop them, quadratic
    # again for a mega-cell even with the cosine math deferred.
    wdw = max_cell_candidates
    a = ranked.select(
        F.col(cluster_id_col),
        F.col(id_col).alias("_ida"),
        F.col(vec_col).alias("_va"),
        F.col("_norm").alias("_na"),
        F.col("_rk").alias("_rka"),
        F.floor((F.col("_rk") - 1) / wdw).alias("_band"),
    )
    b = ranked.select(
        F.col(cluster_id_col),
        F.col(id_col).alias("_idb"),
        F.col(vec_col).alias("_vb"),
        F.col("_norm").alias("_nb"),
        F.col("_rk").alias("_rkb"),
        F.explode(
            F.array(
                F.floor((F.col("_rk") - 1) / wdw),
                F.floor((F.col("_rk") - 1) / wdw) - 1,
            )
        ).alias("_band"),
    )
    return (
        a.join(b, [cluster_id_col, "_band"])
        .filter(
            (F.col("_rkb") > F.col("_rka"))
            & (F.col("_rkb") <= F.col("_rka") + max_cell_candidates)
        )
        .withColumn(
            "cosine", F.expr(f"{_dot_seq_sql('_va', '_vb')} / (_na * _nb)")
        )
        .filter(F.col("cosine") >= threshold)
        .select(
            F.least("_ida", "_idb").alias("id_a"),
            F.greatest("_ida", "_idb").alias("id_b"),
            "cosine",
        )
    )


def quantize_embeddings(
    corpus: DataFrame,
    vec_col: str,
    id_col: str,
    out_col: str = "qvec",
) -> DataFrame:
    """Symmetric per-dimension int8 scalar quantization: each dimension
    d gets scale_d = 127 / max|v_d| over the corpus, and every component
    quantizes to ``floor(v * scale + 0.5)`` ∈ [-127, 127] — 4× smaller
    vectors (and integer SIMD dot products) for ANN candidate scoring,
    the standard memory-bandwidth lever at corpus scale (FAISS SQ8).

    Returns corpus rows + ``out_col`` (array<int>) + ``_scales``
    (array<double>, identical on every row — the broadcast dequant
    table). Deterministic end to end: per-dim max is order-independent,
    and ``floor(x + 0.5)`` is explicit half-up rounding — unlike
    ``round()``, whose half-even/half-away convention differs between
    engines — so quantized codes replicate bit-for-bit in SQL.

    Plan shape: one (dim)-keyed aggregation over posexploded components
    (map-side partial max, |dim| result rows collapse to ONE broadcast
    array row), then a map-side zip of each vector with the scales
    array. The corpus never shuffles.
    """
    ex = ensure_min_parallelism(
        corpus, bytes_per_partition=CPU_LIGHT_BYTES_PER_PARTITION
    ).select(F.posexplode(F.col(vec_col)).alias("_pos", "_val"))
    scales = (
        ex.groupBy("_pos")
        .agg(F.max(F.abs(F.col("_val").cast("double"))).alias("_amax"))
        .select("_pos", (F.lit(127.0) / F.col("_amax")).alias("_s"))
        .groupBy()
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_s"))), lambda x: x["_s"]
            ).alias("_scales")
        )
    )
    q = F.zip_with(
        F.col(vec_col),
        F.col("_scales"),
        lambda v, s: F.floor(v.cast("double") * s + F.lit(0.5)).cast("int"),
    )
    return corpus.join(F.broadcast(scales)).withColumn(out_col, q)


def quantized_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 10,
) -> DataFrame:
    """Top-k by int8-quantized cosine: both sides quantize against the
    CORPUS per-dimension scales, candidates score with integer dot
    products (exact — no float accumulation at all in the hot loop), and
    the cosine estimate divides by the integer norms. Rank ties break on
    neighbor id.

    The integer dot product is the at-scale payoff: 4× less memory
    traffic than double vectors and exact associativity (sums of ints
    are order-independent), so the scoring stage is both faster AND
    deterministic without sequential-fold tricks. Recall vs exact cosine
    is the quantization error — bounded, per component, by half a
    quantization step (pinned in tests).
    """
    qc = quantize_embeddings(corpus, vec_col, id_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col("qvec").alias("_qc"),
        F.col("_scales"),
    )
    # Queries quantize with the corpus scales carried on each corpus row
    # (identical on all rows — the broadcast dequant table).
    qq = (
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_vq"))
        .join(F.broadcast(qc.select("_scales").limit(1)))
        .select(
            "query_id",
            F.zip_with(
                F.col("_vq"),
                F.col("_scales"),
                lambda v, s: F.floor(v.cast("double") * s + F.lit(0.5)).cast("int"),
            ).alias("_qq"),
        )
    )

    def idot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x * y).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    scored = (
        qc.drop("_scales")
        .join(F.broadcast(qq), F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "qcosine",
            idot(F.col("_qc"), F.col("_qq"))
            / F.sqrt(
                idot(F.col("_qc"), F.col("_qc")) * idot(F.col("_qq"), F.col("_qq"))
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("qcosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "qcosine", "rank")
    )


def rademacher_planes(
    spark, dim: int, n_planes: int, n_tables: int
) -> DataFrame:
    """Deterministic ±1 (Rademacher) hyperplanes: component (t, p, d) is
    +1 iff the low bit of md5('rp:t:p:d')'s first hex nibble is set.

    Rademacher entries are a standard random-projection distribution
    (Achlioptas 2003: sign projections preserve the Johnson-Lindenstrauss
    guarantees of Gaussian ones), and deriving them from md5 — which
    DuckDB evaluates identically (strpos == instr over the same hex
    alphabet, the SimHash construction) — makes the whole LSH pipeline
    cross-engine reproducible: buckets, candidates and ranks gain a full
    SQL oracle instead of a rows-only check. Built as expressions, not
    literals: one row per (table, plane), the plane array materialized by
    ``transform`` over the dimension index.
    """
    t_df = spark.range(n_tables).select(F.col("id").cast("int").alias("t"))
    p_df = spark.range(n_planes).select(F.col("id").cast("int").alias("p"))

    def sign(d):
        h = F.md5(F.concat_ws(":", F.lit("rp"), F.col("t"), F.col("p"), d))
        bit = (
            F.instr(F.lit("0123456789abcdef"), F.substring(h, 1, 1)) - F.lit(1)
        ).bitwiseAND(F.lit(1))
        return F.when(bit == 1, F.lit(1.0)).otherwise(F.lit(-1.0))

    return t_df.crossJoin(p_df).select(
        "t",
        "p",
        F.transform(F.sequence(F.lit(0), F.lit(dim - 1)), sign).alias("plane"),
    )


def rp_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    dim: int,
    k: int = 10,
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
    plane_dist: str = "rademacher",
) -> DataFrame:
    """Approximate top-k via random-hyperplane (sign) LSH.

    ``n_tables`` independent tables of ``n_planes`` hyperplanes each;
    a vector's bucket in a table is the sign pattern of its projections.
    Query candidates = corpus vectors sharing a bucket in ANY table,
    then exact cosine + rank. Collision probability per table for angle
    θ is (1-θ/π)^n_planes — tune n_planes/n_tables for the recall/cost
    point.

    ``plane_dist`` picks the hyperplane family: ``"rademacher"``
    (default) uses md5-derived ±1 planes — deterministic across engines,
    so the full query is oracle-checkable; ``"gaussian"`` uses seeded
    Gaussian planes (engine-side constants, rows-only checkable).
    """
    spark = corpus.sparkSession
    # Planes as a broadcast 32-row dimension in long format, instead of
    # 32 literal 64-float arrays compiled into the plan: the expression
    # tree stays small, projections run as one crossJoin map stage, and
    # candidate matching becomes a hash equi-join on (table, bucket)
    # instead of an OR-of-equalities nested-loop predicate.
    if plane_dist == "rademacher":
        planes_df = rademacher_planes(spark, dim, n_planes, n_tables)
    elif plane_dist == "gaussian":
        rng = np.random.RandomState(seed)
        planes = rng.standard_normal((n_tables, n_planes, dim))
        planes_df = spark.createDataFrame(
            [
                (t, p, [float(x) for x in planes[t, p]])
                for t in range(n_tables)
                for p in range(n_planes)
            ],
            "t int, p int, plane array<double>",
        )
    else:
        raise ValueError(f"unknown plane_dist {plane_dist!r}")

    def buckets(df: DataFrame, out_id: str) -> DataFrame:
        bit = F.expr(
            f"CASE WHEN {_dot_seq_sql(_q(vec_col), 'plane')} >= 0 "
            "THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END"
        )
        return (
            df.crossJoin(F.broadcast(planes_df))
            .select(F.col(id_col).alias(out_id), "t", "p", bit.alias("_bit"))
            # shiftleft() takes a literal count, so shift via expr on p.
            .select(out_id, "t", F.expr("shiftleft(_bit, p)").alias("_term"))
            .groupBy(out_id, "t")
            .agg(F.sum("_term").alias("_bucket"))
        )

    # The corpus bucket projection does n_tables·n_planes·dim
    # multiply-adds per row and arrives as a 1-split scan at sf scale —
    # serialized on one core without a widen (r17: 1.13 s → 0.32 s at
    # sf0.1/32c with the input-size-bounded widen, which also beat the
    # full 32-way widen's 0.47 s). The query side stays unwidened: it
    # is a small filtered frame that broadcasts.
    candidates = (
        buckets(
            ensure_min_parallelism(
                corpus, bytes_per_partition=CPU_LIGHT_BYTES_PER_PARTITION
            ),
            "neighbor_id",
        )
        .join(F.broadcast(buckets(queries, "query_id")), ["t", "_bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )

    c = _with_norm(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_vc"),
        F.col("_norm").alias("_nc"),
    )
    q = _with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_vq"),
        F.col("_norm").alias("_nq"),
    )
    scored = (
        candidates.join(c, "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .withColumn("cosine", F.expr(f"{_dot_seq_sql('_vc', '_vq')} / (_nc * _nq)"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
