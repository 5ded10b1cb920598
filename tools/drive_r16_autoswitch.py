"""Drive the r16 centroid-assignment auto-switch from the public surface.

Three stages, all through the library's public API + the driver contract:

1. sf0.01 (k ≈ 10 < PRUNED_ASSIGN_MIN_K): the declared
   ``kmeans_embedding_clusters`` / ``semdedup_pairs`` queries must run
   the EXACT brute-force assignment — pinned by comparing against
   ``kmeans_refine(pruned=False)`` — and still match their (gated)
   DuckDB oracles bit-for-bit.
2. Threshold forced to 2: the same queries flip to the pruned rule
   (``pruned=True`` agreement) and the REGENERATED oracle SQL
   (``_kmeans_cte`` reads the threshold at call time) still matches —
   the pruned branch of the UNION-ALL gate is live and lockstep.
3. The two rules genuinely differ somewhere on this fixture (otherwise
   stages 1-2 would be vacuous) — or, if they agree everywhere, say so.

Run from /tmp with PYTHONPATH=/root/repo:
    PYTHONPATH=/root/repo python /root/repo/tools/drive_r16_autoswitch.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from portfolio_data_pipelines_spark.operators import similarity as sim  # noqa: E402
from portfolio_data_pipelines_spark.operators.dedup import (  # noqa: E402
    clear_shared_plans,
)
from portfolio_data_pipelines_spark.queries import REGISTRY, _load_all  # noqa: E402
from portfolio_data_pipelines_spark.queries.similarity import _kmeans_cte  # noqa: E402
from portfolio_data_pipelines_spark.session import get_spark  # noqa: E402
from portfolio_data_pipelines_spark.sources.parquet import scan_table  # noqa: E402

SF = "/root/testdata/sf0.01"


def main() -> None:
    _load_all()
    spark = get_spark(
        master="local[8]",
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.sql.shuffle.partitions": "8",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    duck = duckdb.connect()
    for t in ("embeddings",):
        duck.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )

    emb = scan_table(spark, SF, "embeddings")
    seeds = emb.filter(F.col("vec_id") % 53 == 0).select(
        F.col("vec_id").alias("cluster_id"), "embedding"
    )
    k0 = seeds.count()
    assert k0 < sim.PRUNED_ASSIGN_MIN_K, (k0, sim.PRUNED_ASSIGN_MIN_K)

    def labels(pruned):
        clear_shared_plans()
        rows = sim.kmeans_refine(
            emb, seeds, "embedding", "vec_id", n_iter=2, pruned=pruned
        ).select("vec_id", "cluster_id").collect()
        return {r["vec_id"]: r["cluster_id"] for r in rows}

    # stage 1: small-k auto == exact, and the declared query matches the
    # gated oracle through the driver contract
    auto, exact = labels("auto"), labels(False)
    assert auto == exact, "auto below threshold must be the exact argmax"
    clear_shared_plans()
    got = {
        (r["vec_id"], r["cluster_id"])
        for r in REGISTRY["kmeans_embedding_clusters"].fn(spark, SF).collect()
    }
    want = set(
        duck.sql(REGISTRY["kmeans_embedding_clusters"].oracle).fetchall()
    )
    assert got == want, "declared query vs gated oracle (brute branch live)"
    print(f"stage 1 OK: k0={k0} < {sim.PRUNED_ASSIGN_MIN_K}, auto==exact, "
          "oracle green")

    # stage 2: force the threshold under k0 — pruned branch goes live in
    # BOTH engines (the oracle SQL is regenerated at call time)
    orig = sim.PRUNED_ASSIGN_MIN_K
    sim.PRUNED_ASSIGN_MIN_K = 2
    try:
        auto2, pruned = labels("auto"), labels(True)
        assert auto2 == pruned, "auto above threshold must be the pruned rule"
        sql = f"WITH {_kmeans_cte(2)} SELECT vec_id, cid AS cluster_id FROM a3"
        want2 = {tuple(r) for r in duck.sql(sql).fetchall()}
        assert set(auto2.items()) == want2, "pruned branch lockstep"
    finally:
        sim.PRUNED_ASSIGN_MIN_K = orig
    print("stage 2 OK: pruned branch live and lockstep through the gate")

    # stage 3: the switch is not vacuous on this fixture?
    diff = sum(1 for k in exact if exact[k] != pruned[k])
    print(f"stage 3: rules differ on {diff}/{len(exact)} assignments "
          f"({'genuine switch' if diff else 'fixture too easy — rules agree'})")
    print("AUTOSWITCH DRIVE OK")


if __name__ == "__main__":
    main()
