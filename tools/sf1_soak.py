"""sf0.1 -> sf1.0-replica soak of the heaviest declared queries (r10
verdict #8): convert the 10x-replica extrapolations into MEASURED
scaling exponents for SCALE.md.

Builds a 10x materialized replica of the four fact tables under /tmp
(semantics-preserving, so ground truth per row is scale-invariant and
any super-linear growth is the operator's fault, not the data's):

- ``lineitem``: l_orderkey offset per replica (key cardinality scales,
  value distributions identical);
- ``events``: event_id/user_id offset per replica (distinct users scale
  10x; same day range, so rows-per-day scales — the realistic shape);
- ``documents``: the dedup harness's rotated-alphabet scheme (replica 0
  original; each replica keeps the SAME internal duplicate structure in
  a disjoint shingle space — see tools/scale_harness.py docstring);
- ``embeddings``: vec_id offset + a per-(replica, dimension)
  deterministic sign flip — cosine structure WITHIN a replica is
  preserved exactly (norms unchanged, pairwise dots unchanged), while
  cross-replica cosines scramble toward 0, so near-dup density per
  vector is scale-invariant.

Dimension tables are symlinked unreplicated.

Each query runs cold+warm (second-of-two) at the base sf and at the
replica; stdout gets ONE JSON line with per-query seconds and ratios.

    PYTHONPATH=/root/repo python tools/sf1_soak.py \
        [--base /root/testdata/sf0.1] [--replicas 10] [--cpus 32]
"""

from __future__ import annotations

import argparse
import json
import os
import string
import sys
import time
from functools import reduce

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from portfolio_data_pipelines_spark.session import get_spark  # noqa: E402
from portfolio_data_pipelines_spark.sources.parquet import scan_table  # noqa: E402

# Far above any id-shifting arithmetic inside the queries themselves
# (delta_cdf_merge_replace inserts event_id + 1e8 rows: a 1e8 stride
# made those collide with the next replica's band -> duplicate merge
# keys, correctly refused by merge_delta).
ID_STRIDE = 10_000_000_000

#: the heaviest declared queries by the r11 bench, plus the scale-path
#: twin (semdedup_pairs) of the one deliberately-quadratic baseline
QUERIES = [
    "approx_price_percentiles",
    "stats_price_qty_corr",
    "stats_quantity_quantiles",
    "streaming_daily_mart",
    "delta_cdf_merge_replace",
    "minhash_lsh_dups",
    "near_dup_clusters",
    "decontam_overlap_pairs",
    "simhash_dup_pairs",
    "embedding_cosine_dups",  # documented quadratic baseline
    "semdedup_pairs",  # its bucketed scale path
    # r13 rotation: the newly-declared heavies need measured exponents
    "bpe_token_ids",
    "token_ids_encoded",
    "dup_span_coverage",
    "unigram_logprob_filter",
    "deterministic_corpus_shuffle",
    "delta_rowtracking_mart",
    # r14 rotation + new surfaces
    "kmeans_embedding_clusters",
    "bigram_logprob_filter",
    "bpe_token_ids_dedup_join",
    "delta_dv_delete_mart",
    "delta_identity_mart",
    "delta_iceberg_compat_mart",
    "delta_below_array_mart",
    # r15 rotation + pruned-assignment queries
    "delta_lcase_merge_mart",
    "delta_nested_idmode_mart",
    "lateness_priority_q12",
    "text_repetition_filters",
    "quality_classifier_scores",
    # r16 rotation (soaked BEFORE declaration — the r15 pattern)
    "delta_variant_mart",
    "delta_dv_purged_mart",
    "delta_gencol_pruned_mart",
    "text_lang_id",
    "text_quality_score",
    "small_qty_revenue_q17",
]


def build_replica(spark, base: str, out: str, k: int) -> None:
    os.makedirs(out, exist_ok=True)
    alpha = string.ascii_lowercase

    def union(parts):
        return reduce(lambda a, b: a.unionByName(b), parts)

    li = scan_table(spark, base, "lineitem")
    union([
        li.withColumn("l_orderkey", F.col("l_orderkey") + i * ID_STRIDE)
        for i in range(k)
    ]).write.mode("overwrite").parquet(f"{out}/lineitem.parquet")

    ev = scan_table(spark, base, "events")
    union([
        ev.withColumn("event_id", F.col("event_id") + i * ID_STRIDE)
        .withColumn("user_id", F.col("user_id") + i * ID_STRIDE)
        for i in range(k)
    ]).write.mode("overwrite").parquet(f"{out}/events.parquet")

    docs = scan_table(spark, base, "documents")
    union([
        docs.select(
            (F.col("doc_id") + i * ID_STRIDE).alias("doc_id"),
            F.translate(
                F.col("text"), alpha, alpha[i:] + alpha[:i]
            ).alias("text"),
            "lang", "source", "n_chars",
        )
        for i in range(k)
    ]).write.mode("overwrite").parquet(f"{out}/documents.parquet")

    emb = scan_table(spark, base, "embeddings")
    union([
        emb.select(
            (F.col("vec_id") + i * ID_STRIDE).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x, j: x * F.when(
                    (F.pmod(F.hash(F.lit(i) * 7919 + j), F.lit(2)) == 0)
                    | (F.lit(i) == 0),
                    F.lit(1.0),
                ).otherwise(F.lit(-1.0)).cast("float"),
            ).alias("embedding"),
            "label",
        )
        for i in range(k)
    ]).write.mode("overwrite").parquet(f"{out}/embeddings.parquet")

    for t in ("region", "nation", "customer", "supplier", "part", "orders"):
        dst = f"{out}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{base}/{t}.parquet", dst)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--replicas", type=int, default=10)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get(
        "SPARK_GRAFT_CPUS", os.cpu_count() or 4)))
    ap.add_argument("--skip", nargs="*", default=[])
    ap.add_argument(
        "--only", nargs="*", default=None,
        help="soak just these queries (any registered name — rotation "
        "candidates get their scale evidence BEFORE being declared)",
    )
    args = ap.parse_args()

    spark = get_spark(
        app_name="sf1-soak",
        master=f"local[{args.cpus}]",
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    rep = f"/tmp/pdp_sf_replica_x{args.replicas}"
    if not os.path.exists(f"{rep}/embeddings.parquet"):
        t0 = time.perf_counter()
        build_replica(spark, args.base, rep, args.replicas)
        print(f"replica built in {time.perf_counter()-t0:.1f}s",
              file=sys.stderr)

    from portfolio_data_pipelines_spark import queries as q

    q._load_all()
    fns = {**{n: s.fn for n, s in q.REGISTRY.items()},
           **{n: s.fn for n, s in q.EXTRA_REGISTRY.items()}}

    out: dict[str, dict] = {}
    for name in (args.only if args.only is not None else QUERIES):
        if name in args.skip:
            continue
        fn = fns[name]
        rec: dict[str, float] = {}
        for label, sf_dir in (("base", args.base), ("x10", rep)):
            cold = warm = None
            for r in range(2):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite").save()
                dt = time.perf_counter() - t0
                cold = cold if cold is not None else dt
                warm = dt
                # drop leaked localCheckpoint blocks between runs (the
                # bench does the same — see bench.drop_leaked_blocks);
                # at 10x the gram/index checkpoints are GBs per run
                for jrdd in spark.sparkContext._jsc.getPersistentRDDs().values():
                    rr = jrdd.rdd()
                    if rr.isLocallyCheckpointed():
                        rr.unpersist(False)
            rec[f"{label}_cold"] = round(cold, 2)
            rec[f"{label}_warm"] = round(warm, 2)
        rec["warm_ratio"] = round(rec["x10_warm"] / rec["base_warm"], 2)
        out[name] = rec
        print(f"{name}: {rec}", file=sys.stderr)

    print(json.dumps({"replicas": args.replicas, "cpus": args.cpus,
                      "queries": out}))


if __name__ == "__main__":
    main()
