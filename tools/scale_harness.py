"""Scale-sensitivity harness: measure how the capped dedup / decontam
family actually grows from 1× to 10× data — the empirical check behind
SCALE.md's "candidate growth is ~linear, not quadratic" claims.

The 10× corpus is synthesized from the base ``documents`` table by
id-offset union of 10 replicas, each with a replica-specific rotated
alphabet (``translate(text, a..z, rotated)``): replica 0 is the original
corpus and every other replica has the SAME internal duplicate structure
but a disjoint shingle space. That makes the ground truth scale-
invariant — true near-dup density per document is identical at both
scales — so any superlinear growth in candidates or runtime is the
operator's fault, not the data's. (Replicating verbatim would instead
make every doc a 10-way duplicate and force a quadratic ground truth —
measuring the data, not the algorithm.)

Measured per scale:
- ``jaccard_candidates`` — posting-list pair rows of the capped inverted
  index (Σ over shingles of C(doc_freq, 2)): the real candidate workload
  of the exact path, BEFORE any aggregation.
- ``jaccard_pairs`` / ``lsh_pairs`` — verified near-dup outputs, with the
  document-frequency-relative stop-shingle cap (>1% of docs, floor 5),
  the same policy the declared queries use.
- ``contam_pairs`` — corpus×benchmark overlap pairs against a FIXED
  50-doc benchmark (broadcast index): output should be scale-INVARIANT
  (only replica 0 can match), while cost tracks the corpus scan.
- warm wall-clock seconds for each.

Writes ONE JSON line to stdout (machine-readable; everything else goes
to stderr). Usage:

    python tools/scale_harness.py [--base /root/testdata/sf0.1] [--replicas 10]

Run standalone to refresh the SCALE.md table; `tests/test_scale_sensitivity.py`
runs it as a subprocess and asserts the ratios.
"""

from __future__ import annotations

import argparse
import json
import os
import string
import sys
import tempfile
import time
from functools import reduce

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from portfolio_data_pipelines_spark.operators.dedup import (  # noqa: E402
    _posting_pairs,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    shingle_postings,
)
from portfolio_data_pipelines_spark.operators.pipeline import (  # noqa: E402
    contamination_pairs,
)
from portfolio_data_pipelines_spark.session import get_spark  # noqa: E402
from portfolio_data_pipelines_spark.sources.parquet import scan_table  # noqa: E402

#: Keeps replica doc_ids disjoint from any realistic base id space.
ID_STRIDE = 100_000_000


def replicate(docs: DataFrame, k: int) -> DataFrame:
    """k replicas with offset ids and rotated-alphabet text (replica 0 is
    the original); see module docstring for why rotation, not verbatim."""
    alpha = string.ascii_lowercase
    parts = [
        docs.select(
            (F.col("doc_id") + i * ID_STRIDE).alias("doc_id"),
            F.translate(F.col("text"), alpha, alpha[i:] + alpha[:i]).alias("text"),
        )
        for i in range(k)
    ]
    return reduce(lambda a, b: a.unionByName(b), parts)


def rel_cap(n_docs: int) -> int:
    """The document-frequency-relative stop-shingle cap the declared
    queries use: shingles in >1% of docs (floor 5) are dropped."""
    return max(5, n_docs // 100)


def measure(spark, corpus: DataFrame, bench: DataFrame) -> dict:
    n_docs = corpus.count()
    cap = rel_cap(n_docs)
    out: dict = {"n_docs": n_docs, "cap": cap}

    t0 = time.monotonic()
    out["jaccard_candidates"] = _posting_pairs(
        shingle_postings(corpus, "text", "doc_id", 3, cap)
    ).count()
    out["t_candidates"] = round(time.monotonic() - t0, 3)

    t0 = time.monotonic()
    out["jaccard_pairs"] = ngram_jaccard_pairs(
        corpus, "text", "doc_id", n=3, threshold=0.3, max_shingle_freq=cap
    ).count()
    out["t_jaccard"] = round(time.monotonic() - t0, 3)

    t0 = time.monotonic()
    out["lsh_pairs"] = minhash_lsh_pairs(
        corpus, "text", "doc_id", n=3, threshold=0.3, max_shingle_freq=cap
    ).count()
    out["t_lsh"] = round(time.monotonic() - t0, 3)

    t0 = time.monotonic()
    out["contam_pairs"] = contamination_pairs(
        corpus, bench, "text", "doc_id", n=3, min_overlap=5
    ).count()
    out["t_contam"] = round(time.monotonic() - t0, 3)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--replicas", type=int, default=10)
    args = ap.parse_args()

    spark = get_spark(
        app_name="scale-harness",
        extra_conf={
            "spark.ui.enabled": "false",
            # local-mode JVM holds all executor threads: size the heap
            # for the 10x corpus (a cluster would spread this across
            # executors; 16g over 32 threads = 512m/task, modest).
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_HEAP", "24g"),
        },
    )
    docs = scan_table(spark, args.base, "documents").select("doc_id", "text")
    bench = docs.filter(F.col("doc_id") < 50).select("doc_id", "text")
    bench.cache().count()

    with tempfile.TemporaryDirectory() as tmp:
        # Land the synthetic corpus as parquet so both scales are scans,
        # not one scan vs one in-memory union (apples to apples).
        big_path = os.path.join(tmp, f"docs_{args.replicas}x.parquet")
        replicate(docs, args.replicas).write.parquet(big_path)
        big = spark.read.parquet(big_path)

        # JIT / file-cache warmup, then measure 1x and Nx.
        docs.count(), big.count()
        print("measuring 1x ...", file=sys.stderr)
        r1 = measure(spark, docs, bench)
        print(f"1x: {r1}", file=sys.stderr)
        print(f"measuring {args.replicas}x ...", file=sys.stderr)
        rn = measure(spark, big, bench)
        print(f"{args.replicas}x: {rn}", file=sys.stderr)

    ratios = {
        k: (round(rn[k] / r1[k], 2) if r1[k] else None)
        for k in ("jaccard_candidates", "jaccard_pairs", "lsh_pairs",
                  "t_candidates", "t_jaccard", "t_lsh", "t_contam")
    }
    print(json.dumps({
        "base": args.base, "replicas": args.replicas,
        "scale_1x": r1, "scale_nx": rn, "ratios": ratios,
        "contam_invariant": rn["contam_pairs"] == r1["contam_pairs"],
    }))


if __name__ == "__main__":
    main()
