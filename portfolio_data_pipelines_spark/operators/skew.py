"""Skew-mitigation operators (SURVEY §4 / SCALE.md).

AQE's skew-join splitting (enabled in the session factory) handles most
skew at runtime, but it only splits *sort-merge* join partitions. When a
handful of hot keys dominate a shuffled join or aggregation, **salting**
is the explicit fix: spread each hot key over N sub-keys so no single
task owns the whole key.

Correctness contract: a salted join produces exactly the rows of the
plain join (the salt is an internal routing key), so the operator is
oracle-checkable against ordinary SQL.

``tests/test_skew_aqe.py`` pins the AQE counterpart: the runtime
``skew=true`` SMJ rewrite fires on the same skewed fixture and is
row-identical to :func:`salted_join` — and documents where the manual
salt is still required (skewed AGGREGATIONS, which AQE never splits;
stats-invisible post-broadcast skew; anti/semi shapes AQE can't split).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with an N-way salt on the join key.

    The skewed (left) side gets a deterministic salt
    ``xxhash64(key...) pmod N``; the build (right) side is replicated N
    times via an exploded salt array. The shuffle then distributes each
    hot key over N partitions instead of one. Cost: right side ×N — use
    for a *moderately sized* right side with a skewed left; for tiny
    right sides just broadcast instead.

    Only left-preserving join types are allowed: replicating the right
    side N times would emit each unmatched right row once per salt under
    right/full-outer semantics, breaking the produces-the-plain-join
    contract above.
    """
    allowed = {"inner", "left", "leftouter", "leftsemi", "semi", "leftanti", "anti"}
    if how.lower().replace("_", "") not in allowed:
        raise ValueError(
            f"salted_join supports left-preserving joins only (got how={how!r}); "
            "right/full outer would duplicate unmatched right rows per salt"
        )
    keys = [on] if isinstance(on, str) else list(on)
    salt = F.pmod(F.xxhash64(*[F.col(k) for k in keys]), F.lit(n_salts))
    lt = left.withColumn("__salt", salt.cast("int"))
    rt = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = lt.join(rt, keys + ["__salt"], how)
    return out.drop("__salt")
