"""Unit tests for similarity-search operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from portfolio_data_pipelines_spark.operators.similarity import (
    assign_centroids,
    cosine_topk,
    ivf_topk,
    rp_lsh_topk,
)


@pytest.fixture(scope="module")
def vectors(spark):
    # Three tight clusters along axes, plus the query near cluster 0.
    rows = [
        (0, [1.0, 0.05, 0.0, 0.0]),
        (1, [1.0, 0.1, 0.0, 0.0]),
        (2, [0.9, 0.0, 0.1, 0.0]),
        (10, [0.0, 1.0, 0.05, 0.0]),
        (11, [0.0, 1.0, 0.1, 0.0]),
        (20, [0.0, 0.0, 1.0, 0.05]),
        (21, [0.0, 0.05, 1.0, 0.0]),
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding"]).withColumn(
        "embedding", F.col("embedding").cast("array<float>")
    )


class TestBruteForce:
    def test_topk_order_and_exclusion(self, vectors):
        q = vectors.filter(F.col("vec_id") == 0)
        got = cosine_topk(vectors, q, "embedding", "vec_id", k=3).collect()
        assert [r["neighbor_id"] for r in got] == [1, 2, 10]  # cluster 0 first
        assert all(r["query_id"] == 0 for r in got)
        assert [r["rank"] for r in got] == [1, 2, 3]
        assert got[0]["cosine"] > got[1]["cosine"] > got[2]["cosine"]


class TestIVF:
    def test_assignment_groups_clusters(self, vectors):
        cents = vectors.filter(F.col("vec_id").isin(0, 10, 20)).select(
            F.col("vec_id").alias("centroid_id"), "embedding"
        )
        a = {
            r["vec_id"]: r["centroid_id"]
            for r in assign_centroids(vectors, cents, "embedding", "vec_id").collect()
        }
        assert a[1] == 0 and a[2] == 0
        assert a[11] == 10
        assert a[21] == 20

    def test_ivf_subset_of_bruteforce_cell(self, vectors):
        cents = vectors.filter(F.col("vec_id").isin(0, 10, 20)).select(
            F.col("vec_id").alias("centroid_id"), "embedding"
        )
        q = vectors.filter(F.col("vec_id") == 0)
        got = ivf_topk(vectors, q, cents, "embedding", "vec_id", k=5).collect()
        # nprobe=1: only cluster-0 members are candidates
        assert {r["neighbor_id"] for r in got} == {1, 2}


class TestRpLsh:
    def test_near_identical_always_found(self, vectors):
        q = vectors.filter(F.col("vec_id") == 0)
        got = rp_lsh_topk(
            vectors, q, "embedding", "vec_id", dim=4, k=3, n_planes=4, n_tables=4
        ).collect()
        # vec 1 is ~identical in direction to the query: identical sign
        # pattern in every table → guaranteed candidate and rank 1.
        assert got and got[0]["neighbor_id"] == 1

    def test_deterministic_across_runs(self, vectors):
        q = vectors.filter(F.col("vec_id") < 2)
        a = sorted(map(tuple, rp_lsh_topk(vectors, q, "embedding", "vec_id", dim=4).collect()))
        b = sorted(map(tuple, rp_lsh_topk(vectors, q, "embedding", "vec_id", dim=4).collect()))
        assert a == b


def test_ivf_nprobe_recall_monotone_and_exact_at_full_probe(spark):
    """Recall vs brute force rises with nprobe, and probing every cell
    makes IVF exactly equal to the brute-force top-k."""
    from pyspark.sql import functions as F

    from portfolio_data_pipelines_spark.operators.similarity import cosine_topk, ivf_topk
    from portfolio_data_pipelines_spark.sources.parquet import scan_table

    emb = scan_table(spark, "/root/testdata/sf0.01", "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    centroids = emb.filter(F.col("vec_id") % 53 == 0).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    n_cells = centroids.count()
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, queries, "embedding", "vec_id", k=10).collect()
    }

    recalls = []
    for nprobe in (1, 3, n_cells):
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in ivf_topk(
                emb, queries, centroids, "embedding", "vec_id", k=10, nprobe=nprobe
            ).collect()
        }
        recalls.append(len(got & exact) / len(exact))
    assert recalls[0] <= recalls[1] <= recalls[2], recalls
    assert recalls[1] > recalls[0]  # more probes find strictly more here
    assert recalls[2] == 1.0  # full probe == brute force


def test_semdedup_pairs_subset_of_allpairs_baseline(spark):
    """Cluster-bucketed pairs must be a SUBSET of the exact all-pairs
    result at the same threshold (bucketing can only lose cross-cell
    pairs, never invent or rescore one), and every surviving pair's
    cosine must be bit-identical to the baseline's."""
    from pyspark.sql import functions as F

    from portfolio_data_pipelines_spark.operators.dedup import embedding_cosine_pairs
    from portfolio_data_pipelines_spark.operators.similarity import cluster_cosine_pairs
    from portfolio_data_pipelines_spark.sources.parquet import scan_table

    emb = scan_table(spark, "/root/testdata/sf0.001", "embeddings")
    seeds = emb.filter(F.col("vec_id") % 53 == 0).select(
        F.col("vec_id").alias("cluster_id"), "embedding"
    )
    base = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_cosine_pairs(emb, "embedding", "vec_id", 0.4).collect()
    }
    got = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in cluster_cosine_pairs(
            emb, seeds, "embedding", "vec_id", threshold=0.4, n_iter=2
        ).collect()
    }
    assert got, "no within-cell pairs at all"
    assert set(got) <= set(base)
    for k, v in got.items():
        assert v == base[k], (k, v, base[k])


def test_semdedup_cell_size_bound_is_enforced(spark):
    """The r12→r13 pinned contract: per-row in-cell candidates are
    bounded at W = max_cell_candidates even when one degenerate cell
    swallows the whole corpus. Fixture: 40 near-identical vectors (one
    tight cone → ONE cell, every pair above threshold). With W ≥ |cell|
    the windowed form must equal exact all-pairs; with W < |cell| the
    output must be (a) a strict subset, (b) exactly the pairs within W
    positions of each other in the cell's (centroid-cosine, id) order —
    i.e. per-row pair count ≤ W, so a mega-cell costs |cell|·W, not
    |cell|²/2."""
    from portfolio_data_pipelines_spark.operators.similarity import (
        cluster_cosine_pairs,
    )

    n = 40
    rows = [(i, [1.0, 0.001 * i, 0.0005 * (i % 7), 0.0]) for i in range(n)]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"]).withColumn(
        "embedding", F.col("embedding").cast("array<float>")
    )
    seeds = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("cluster_id"), "embedding"
    )

    def pairs(w):
        return {
            (r["id_a"], r["id_b"])
            for r in cluster_cosine_pairs(
                emb, seeds, "embedding", "vec_id", threshold=0.9, n_iter=1,
                max_cell_candidates=w,
            ).collect()
        }

    exact = pairs(n)  # W ≥ |cell| - 1 → every in-cell pair
    assert len(exact) == n * (n - 1) // 2  # cone fixture: all pairs ≥ 0.9
    capped = pairs(5)
    assert capped < exact  # strict subset — the window dropped pairs
    # Per-row candidate bound: no row participates in > 2W pairs
    # (W successors + W predecessors in the cell order).
    from collections import Counter

    cnt = Counter()
    for a, b in capped:
        cnt[a] += 1
        cnt[b] += 1
    assert max(cnt.values()) <= 2 * 5
    # Linear work shape: |capped| ≤ |cell| · W, far below the quadratic count.
    assert len(capped) <= n * 5


def test_kmeans_exact_and_approx_modes_agree(spark):
    """exact=True (sequential-fold means) and exact=False (partial-agg
    sums) may differ at the ULP level, but on this fixture no point is
    equidistant to that precision — assignments must be identical. Also
    pins basic sanity: every vector labeled, labels drawn from the seed
    ids, >1 cluster used."""
    from pyspark.sql import functions as F

    from portfolio_data_pipelines_spark.operators.similarity import kmeans_refine
    from portfolio_data_pipelines_spark.sources.parquet import scan_table

    emb = scan_table(spark, "/root/testdata/sf0.001", "embeddings")
    seeds = emb.filter(F.col("vec_id") % 53 == 0).select(
        F.col("vec_id").alias("cluster_id"), "embedding"
    )
    seed_ids = {r["cluster_id"] for r in seeds.select("cluster_id").collect()}

    def labels(exact):
        rows = kmeans_refine(
            emb, seeds, "embedding", "vec_id", n_iter=2, exact=exact
        ).select("vec_id", "cluster_id").collect()
        return {r["vec_id"]: r["cluster_id"] for r in rows}

    a, b = labels(True), labels(False)
    assert len(a) == emb.count()
    assert set(a.values()) <= seed_ids
    assert len(set(a.values())) > 1
    assert a == b


def test_quantization_error_bounded_and_topk_overlaps_exact(spark):
    """Dequantized components must sit within half a quantization step
    of the original (|v - q/s| ≤ 0.5/s per dimension), codes must stay
    in [-127, 127], and the quantized top-10 must substantially overlap
    the exact cosine top-10 (the whole point of SQ8 is that ranking
    survives 8-bit codes)."""
    from pyspark.sql import functions as F

    from portfolio_data_pipelines_spark.operators.similarity import (
        cosine_topk,
        quantize_embeddings,
        quantized_topk,
    )
    from portfolio_data_pipelines_spark.sources.parquet import scan_table

    emb = scan_table(spark, "/root/testdata/sf0.001", "embeddings")
    qrows = quantize_embeddings(emb, "embedding", "vec_id").select(
        "vec_id", "embedding", "qvec", "_scales"
    ).collect()
    for r in qrows[:50]:
        for v, q, s in zip(r["embedding"], r["qvec"], r["_scales"]):
            assert -127 <= q <= 127, (r["vec_id"], q)
            assert abs(float(v) - q / s) <= 0.5 / s + 1e-12

    queries = emb.filter(F.col("vec_id") < 5)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, queries, "embedding", "vec_id", k=10).collect()
    }
    quant = {
        (r["query_id"], r["neighbor_id"])
        for r in quantized_topk(emb, queries, "embedding", "vec_id", k=10).collect()
    }
    overlap = len(exact & quant) / len(exact)
    # The synthetic embeddings are near-uniform (pairwise cosines packed
    # into a narrow band), so 8-bit rank flips are far more likely than
    # on real clustered embeddings — 0.7 is the honest floor here.
    assert overlap >= 0.7, overlap


def test_pruned_assignment_exact_at_full_probe(spark):
    """With nprobe ≥ the coarse-cell count, the pruned argmax sees every
    fine centroid, so it must equal the exact brute-force assignment
    bit-for-bit (cid AND winning cosine)."""
    from portfolio_data_pipelines_spark.operators.similarity import (
        assign_centroids,
        assign_centroids_pruned,
    )
    from portfolio_data_pipelines_spark.sources.parquet import scan_table

    emb = scan_table(spark, "/root/testdata/sf0.001", "embeddings")
    cen = emb.filter(F.col("vec_id") % 53 == 0).select(
        F.col("vec_id").alias("cid"), "embedding"
    )
    exact = {
        (r["vec_id"], r["cid"], r["sim"])
        for r in assign_centroids(
            emb, cen, "embedding", "vec_id", "cid", sim_col="sim"
        ).select("vec_id", "cid", "sim").collect()
    }
    full = {
        (r["vec_id"], r["cid"], r["sim"])
        for r in assign_centroids_pruned(
            emb, cen, "embedding", "vec_id", "cid", sim_col="sim", nprobe=10**6
        ).select("vec_id", "cid", "sim").collect()
    }
    assert full == exact


def test_pruned_assignment_contract_and_quality(spark):
    """Default nprobe=2 pruning: every vector gets a label drawn from
    the centroid set, the winning cosine is the true cosine to that
    centroid (bit-identical to a direct recompute), and agreement with
    the exact argmax stays high (near-boundary points are the only
    legitimate divergences)."""
    from portfolio_data_pipelines_spark.operators.dedup import _dot_seq
    from portfolio_data_pipelines_spark.operators.similarity import (
        assign_centroids,
        assign_centroids_pruned,
    )
    from portfolio_data_pipelines_spark.sources.parquet import scan_table

    emb = scan_table(spark, "/root/testdata/sf0.001", "embeddings")
    cen = emb.filter(F.col("vec_id") % 53 == 0).select(
        F.col("vec_id").alias("cid"), "embedding"
    )
    cids = {r["cid"] for r in cen.select("cid").collect()}
    pr = assign_centroids_pruned(
        emb, cen, "embedding", "vec_id", "cid", sim_col="sim"
    )
    # winning cosine must be the genuine sequential-double cosine to the
    # assigned centroid — recompute via a join and compare bit-for-bit
    cn = cen.select(
        "cid",
        F.col("embedding").alias("_cv"),
        F.sqrt(_dot_seq(F.col("embedding"), F.col("embedding"))).alias("_cn"),
    )
    chk = pr.join(cn, "cid").withColumn(
        "_resim",
        _dot_seq(F.col("embedding"), F.col("_cv"))
        / (F.sqrt(_dot_seq(F.col("embedding"), F.col("embedding"))) * F.col("_cn")),
    )
    rows = chk.select("vec_id", "cid", "sim", "_resim").collect()
    assert len(rows) == emb.count()
    for r in rows:
        assert r["cid"] in cids
        assert r["sim"] == r["_resim"], (r["vec_id"], r["sim"], r["_resim"])
    exact = {
        r["vec_id"]: r["cid"]
        for r in assign_centroids(emb, cen, "embedding", "vec_id", "cid").collect()
    }
    got = {r["vec_id"]: r["cid"] for r in rows}
    agree = sum(1 for k, v in got.items() if exact[k] == v) / len(got)
    # The synthetic embeddings are near-uniform (pairwise cosines packed
    # into a narrow band — every point is a near-boundary point), the
    # worst case for coarse pruning; real clustered embeddings agree far
    # more. 0.7 is the honest floor here, matching the SQ8 test's stance.
    assert agree >= 0.7, agree


def test_kmeans_auto_switch_picks_rule_by_seed_count(spark, monkeypatch):
    """r16: the default ``pruned="auto"`` resolves from the seed count —
    exact brute-force argmax below PRUNED_ASSIGN_MIN_K (assignments
    identical to ``pruned=False``), the two-level pruned rule at or
    above it (identical to ``pruned=True``). Library callers with a
    small fixed k therefore get exact assignments by default again
    (the r15 advisor flag)."""
    from portfolio_data_pipelines_spark.operators import similarity as sim
    from portfolio_data_pipelines_spark.sources.parquet import scan_table

    emb = scan_table(spark, "/root/testdata/sf0.01", "embeddings")
    seeds = emb.filter(F.col("vec_id") % 53 == 0).select(
        F.col("vec_id").alias("cluster_id"), "embedding"
    )

    def labels(pruned):
        rows = sim.kmeans_refine(
            emb, seeds, "embedding", "vec_id", n_iter=2, pruned=pruned
        ).select("vec_id", "cluster_id").collect()
        return {r["vec_id"]: r["cluster_id"] for r in rows}

    # k ≈ 10 here, far below the default threshold: auto == exact
    assert seeds.count() < sim.PRUNED_ASSIGN_MIN_K
    assert labels("auto") == labels(False)
    # force the threshold below k: auto == pruned
    monkeypatch.setattr(sim, "PRUNED_ASSIGN_MIN_K", 1)
    assert labels("auto") == labels(True)


def test_kmeans_gated_oracle_lockstep_in_pruned_regime(spark, duck, monkeypatch):
    """r16: the k0-gated oracle CTE must replicate the PRUNED branch
    too, not just the small-k brute branch the sf0.01 parity suite
    exercises. Force the auto threshold below the fixture's k so Spark
    runs the two-level pruned assignment, regenerate the oracle SQL
    (``_kmeans_cte`` reads the threshold at call time), and demand
    bit-identical (vec_id, cluster_id) labels through the gate."""
    from portfolio_data_pipelines_spark.operators import similarity as sim
    from portfolio_data_pipelines_spark.queries.similarity import _kmeans_cte
    from portfolio_data_pipelines_spark.sources.parquet import scan_table

    monkeypatch.setattr(sim, "PRUNED_ASSIGN_MIN_K", 2)
    emb = scan_table(spark, "/root/testdata/sf0.01", "embeddings")
    seeds = emb.filter(F.col("vec_id") % 53 == 0).select(
        F.col("vec_id").alias("cluster_id"), "embedding"
    )
    assert seeds.count() >= 2  # the pruned branch is the live one
    got = {
        r["vec_id"]: r["cluster_id"]
        for r in sim.kmeans_refine(
            emb, seeds, "embedding", "vec_id", n_iter=2
        ).select("vec_id", "cluster_id").collect()
    }
    sql = f"WITH {_kmeans_cte(2)} SELECT vec_id, cid AS cluster_id FROM a3"
    want = {r[0]: r[1] for r in duck.sql(sql).fetchall()}
    assert got == want


def test_ivf_auto_switch_and_gated_oracle_lockstep(spark, duck, monkeypatch):
    """r16: `ivf_topk` takes the same k-threshold auto-switch as
    `kmeans_refine` (with k ∝ n centroids the brute-force assignment is
    O(n²·dim/53) — the 10× soak measured 12.8× wall before the switch).
    Below the threshold auto == the exact rule (the regime every driver
    SF grades); with the threshold forced down, BOTH the corpus
    assignment and the query probe take the pruned rule and the
    k0-gated oracle (`_kmeans_cte(0)` — assignment to the raw seeds)
    must stay bit-identical through the gate."""
    from portfolio_data_pipelines_spark.operators import similarity as sim
    from portfolio_data_pipelines_spark.queries.similarity import _kmeans_cte
    from portfolio_data_pipelines_spark.sources.parquet import scan_table

    emb = scan_table(spark, "/root/testdata/sf0.01", "embeddings")
    cen = emb.filter(F.col("vec_id") % 53 == 0).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    queries = emb.filter(F.col("vec_id") < 5)

    def topk(pruned):
        rows = sim.ivf_topk(
            emb, queries, cen, "embedding", "vec_id", k=10, pruned=pruned
        ).collect()
        return sorted((r["query_id"], r["rank"], r["neighbor_id"], r["cosine"]) for r in rows)

    # k ≈ 10 « threshold: auto == exact (the driver-graded regime)
    assert cen.count() < sim.PRUNED_ASSIGN_MIN_K
    assert topk("auto") == topk(False)
    # force the pruned branch live in BOTH engines and demand lockstep
    monkeypatch.setattr(sim, "PRUNED_ASSIGN_MIN_K", 2)
    got = topk("auto")
    assert got == topk(True)
    sql = f"""
    WITH {_kmeans_cte(0)}
    SELECT query_id, neighbor_id, cosine, "rank"
    FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               list_dot_product(q.v, c.v) / (q.nv * c.nv) AS cosine,
               ROW_NUMBER() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY list_dot_product(q.v, c.v) / (q.nv * c.nv) DESC,
                            c.vec_id ASC
               ) AS "rank"
        FROM a1 q JOIN a1 c ON c.cid = q.cid AND c.vec_id <> q.vec_id
        WHERE q.vec_id < 5
    )
    WHERE "rank" <= 10
    """
    want = sorted((r[0], r[3], r[1], r[2]) for r in duck.sql(sql).fetchall())
    assert got == want
