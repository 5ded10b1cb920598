"""TPC-H scale-sensitivity harness: replicate the FACT tables 10× and
measure how the heaviest join topologies actually grow — plus direct
evidence that the stats-driven join planner (operators/cbo.stats_join)
flips build sides when a dimension outgrows the broadcast threshold.

Fact replication (id-offset on the order key, dims untouched) preserves
join semantics exactly: every replica's lineitem↔orders pairs are
internal to the replica, dim keys fan out 10× more fact rows each —
the realistic way a warehouse scales. Measured per query (the 5 most
expensive TPC-H shapes by topology): warm wall-clock at 1× and N×;
sub-quadratic growth is the contract (quadratic would read ~N²×).

Build-side flip evidence: a second synthetic layout replicates the
SUPPLIER dim with offset keys until its parquet size crosses Spark's
10 MB broadcast threshold. The added suppliers match no lineitem, so
inner-join results are IDENTICAL — but `stats_join` must now refuse to
broadcast supplier and force the merge path for the known-oversized
build side (operators/cbo.py:179). The harness asserts the plan shape
actually changes (SortMergeJoin appears / broadcasts drop) for Q9 and
Q21, and that Q9's rows stay invariant.

Writes ONE JSON line to stdout; progress goes to stderr.

    python tools/tpch_scale_harness.py [--base /root/testdata/sf0.1]
        [--replicas 10] [--fat-dim-copies 600]

`tests/test_tpch_scale.py` runs this at sf0.01 as the slow-marked
regression; the sf0.1 run is recorded in SCALE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time
from functools import reduce

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from portfolio_data_pipelines_spark.plans.signature import (  # noqa: E402
    plan_shape_signature,
)
from portfolio_data_pipelines_spark.queries import (  # noqa: E402
    EXTRA_REGISTRY,
    REGISTRY,
    _load_all,
)
from portfolio_data_pipelines_spark.session import get_spark  # noqa: E402

#: Keeps replica order keys disjoint from any realistic base id space.
ID_STRIDE = 1_000_000_000

#: The 5 heaviest TPC-H topologies in the family (multi-fact joins,
#: semi+anti chains, decorrelated aggregates).
QUERIES = [
    "product_profit_q9",
    "waiting_suppliers_q21",
    "market_share_q8",
    "volume_shipping_q7",
    "large_volume_customers_q18",
]

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _specs():
    _load_all()
    return {**REGISTRY, **EXTRA_REGISTRY}


def _link_base(base: str, out: str, skip: set[str]) -> None:
    os.makedirs(out, exist_ok=True)
    for t in TABLES:
        if t not in skip:
            os.symlink(f"{base}/{t}.parquet", f"{out}/{t}.parquet")


def build_fact_replicated_dir(spark, base: str, out: str, replicas: int) -> None:
    """Replicate orders+lineitem ``replicas``× with disjoint order keys;
    every other table is the 1× original (symlinked)."""
    _link_base(base, out, skip={"orders", "lineitem"})
    for t, key in (("orders", "o_orderkey"), ("lineitem", "l_orderkey")):
        df = spark.read.parquet(f"{base}/{t}.parquet")
        parts = [
            df.withColumn(key, F.col(key) + F.lit(i * ID_STRIDE))
            for i in range(replicas)
        ]
        reduce(lambda a, b: a.unionByName(b), parts).write.mode(
            "overwrite"
        ).parquet(f"{out}/{t}.parquet")


def build_fat_dim_dir(spark, base: str, out: str, copies: int) -> int:
    """Replicate SUPPLIER with offset keys (replica 0 keeps the
    original keys, the rest match no fact rows) until its on-disk bytes
    cross the broadcast threshold. Replication is one cross join with a
    broadcast range (not an N-way union: plan size stays O(1) at any
    copy count); since dictionary encoding compresses replicated
    columns hard, the copy count doubles until the WRITTEN size
    actually exceeds the threshold. Returns the final byte size."""
    from portfolio_data_pipelines_spark.operators.cbo import (
        DEFAULT_BROADCAST_BYTES,
    )

    _link_base(base, out, skip={"supplier"})
    sup = spark.read.parquet(f"{base}/supplier.parquet")
    dest = f"{out}/supplier.parquet"

    def write_copies(k: int) -> int:
        reps = F.broadcast(
            spark.range(k).select(F.col("id").alias("_r"))
        )
        (
            sup.crossJoin(reps)
            .withColumn(
                "s_suppkey", F.col("s_suppkey") + F.col("_r") * ID_STRIDE
            )
            .drop("_r")
            .repartition(8)
            .write.mode("overwrite")
            .parquet(dest)
        )
        return sum(
            os.path.getsize(os.path.join(r, f))
            for r, _d, fs in os.walk(dest)
            for f in fs if f.endswith(".parquet")
        )

    size = write_copies(copies)
    while size <= int(1.2 * DEFAULT_BROADCAST_BYTES):
        copies *= 2
        print(f"fat dim only {size} B — doubling to {copies} copies",
              file=sys.stderr)
        size = write_copies(copies)
    return size


def _warm_time(spark, fn, sf_dir: str) -> float:
    def once() -> float:
        t0 = time.monotonic()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.monotonic() - t0

    once()
    return round(once(), 3)


def _join_counts(sig: list[str]) -> dict:
    return {
        "smj": sum(1 for t in sig if t.startswith("SortMergeJoin")),
        "bhj": sum(1 for t in sig if t.startswith("BroadcastHashJoin")),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--replicas", type=int, default=10)
    ap.add_argument("--fat-dim-copies", type=int, default=600)
    args = ap.parse_args()

    spark = get_spark(
        app_name="tpch-scale-harness",
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_HEAP", "24g"),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    specs = _specs()

    out: dict = {"base": args.base, "replicas": args.replicas}
    with tempfile.TemporaryDirectory() as tmp:
        big = os.path.join(tmp, "big")
        fat = os.path.join(tmp, "fat")
        print("replicating facts ...", file=sys.stderr)
        build_fact_replicated_dir(spark, args.base, big, args.replicas)
        print("inflating supplier dim ...", file=sys.stderr)
        out["fat_supplier_bytes"] = build_fat_dim_dir(
            spark, args.base, fat, args.fat_dim_copies
        )

        t1, tn = {}, {}
        for name in QUERIES:
            fn = specs[name].fn
            t1[name] = _warm_time(spark, fn, args.base)
            tn[name] = _warm_time(spark, fn, big)
            print(f"{name}: 1x={t1[name]}s {args.replicas}x={tn[name]}s",
                  file=sys.stderr)
        out["t_1x"], out["t_nx"] = t1, tn
        out["ratios"] = {
            q: (round(tn[q] / t1[q], 2) if t1[q] else None) for q in QUERIES
        }

        # Build-side flip: same queries planned against the fat-dim dir.
        flip: dict = {}
        for name in ("product_profit_q9", "waiting_suppliers_q21"):
            fn = specs[name].fn
            base_sig = plan_shape_signature(fn(spark, args.base))
            fat_sig = plan_shape_signature(fn(spark, fat))
            b, f_ = _join_counts(base_sig), _join_counts(fat_sig)
            flip[name] = {
                "base": b,
                "fat": f_,
                "flipped": f_["smj"] > b["smj"] and f_["bhj"] < b["bhj"],
            }
            print(f"{name}: flip {b} -> {f_}", file=sys.stderr)
        out["build_side_flip"] = flip

        # Result invariance: the padded suppliers match no lineitem, so
        # Q9's output must be identical against the fat-dim layout.
        q9 = specs["product_profit_q9"].fn
        rows_base = [tuple(r) for r in q9(spark, args.base).collect()]
        rows_fat = [tuple(r) for r in q9(spark, fat).collect()]
        out["q9_invariant_under_fat_dims"] = rows_base == rows_fat

    print(json.dumps(out))


if __name__ == "__main__":
    main()
