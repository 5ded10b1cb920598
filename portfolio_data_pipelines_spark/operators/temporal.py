"""Temporal join operators: as-of join and range (band) join.

SURVEY §2.5: the reference implements no joins, but its FX vertical
(`fx_top10_daily`, stg_fx_rates — airflow/dags/weather_hourly_pipeline.py:119)
implies rate-lookup semantics: "the most recent rate at or before this
timestamp". That is an **as-of join** — Spark has no built-in, so this is
a custom operator per the build brief.

Scale design (the whole point of the union+window formulation):

- A naive formulation — join on key with ``l.ts >= r.ts`` then keep the
  max — is a partial cross product: every left row pairs with *all*
  earlier right rows before the filter. At 100 TB that's quadratic blowup
  on hot keys.
- The union+window formulation below is linear: tag both sides, union
  (no shuffle — union is plan concatenation), then one shuffle on the
  join key with an ordered window carrying ``last(right_value,
  ignorenulls=True)`` forward. Each row is touched once; the only cost is
  a single hash partition + per-key sort — the same cost profile as a
  sort-merge join, with no pair explosion.
- Skewed keys: the window sorts within each key partition; a pathological
  single-key stream should be range-repartitioned on (key, ts) upstream.
  AQE cannot split a window partition, so extreme skew is the operator's
  documented limit (mitigation: pre-bucket by time range per key).

The band join broadcasts a small bounds dimension so the non-equi range
predicate is evaluated map-side (BroadcastNestedLoopJoin over a dim of a
few rows): zero shuffle of the fact table, which is the only strategy that
survives a 100 TB fact side.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: Sequence[str] = ("value",),
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Backward (inclusive) as-of join: for each left row, attach the
    right row with the greatest ``right_ts <= left_ts`` per key.

    Right-side value columns come back as ``asof_<name>`` (NULL when no
    prior right row exists — left-join semantics). All value columns are
    carried as ONE struct through a single ``last(ignorenulls=True)``,
    so the match is always one whole right row — per-column carry would
    mix columns from different right rows when the latest row holds a
    NULL in one of them (whole-row as-of semantics, matching DuckDB's
    ASOF JOIN). If multiple right rows share one (key, ts), the caller
    must pre-aggregate; this function simply takes the last in
    (ts, tag) order, which is nondeterministic under such ties.

    ``tolerance_seconds`` drops matches older than the window (like
    pandas ``merge_asof(tolerance=...)``).
    """
    keys = [on] if isinstance(on, str) else list(on)

    lrow_type = T.StructType([T.StructField(c, left.schema[c].dataType) for c in left.columns])
    rrow_type = T.StructType(
        [T.StructField("__rts", T.TimestampType())]
        + [T.StructField(c, right.schema[c].dataType) for c in value_cols]
    )

    # Tag: right rows sort before left rows at equal timestamps, making
    # the match inclusive (a rate stamped exactly at the query time wins).
    lt = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__tag"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lrow"),
        F.lit(None).cast(rrow_type).alias("__rrow"),
    )
    rt = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__tag"),
        F.lit(None).cast(lrow_type).alias("__lrow"),
        F.struct(
            F.col(right_ts).cast("timestamp").alias("__rts"),
            *[F.col(c) for c in value_cols],
        ).alias("__rrow"),
    )

    w = (
        Window.partitionBy(*keys)
        .orderBy("__ts", "__tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = lt.unionByName(rt).select(
        "*", F.last("__rrow", ignorenulls=True).over(w).alias("__asof")
    )

    out = carried.filter(F.col("__tag") == 1)
    if tolerance_seconds is not None:
        within = F.col("__asof.__rts") >= F.col("__ts") - F.expr(
            f"INTERVAL {int(tolerance_seconds)} SECONDS"
        )
        # Null the whole matched row when it falls outside the window —
        # columns can never disagree about which right row matched.
        out = out.withColumn("__asof", F.when(within, F.col("__asof")))

    return out.select(
        *[F.col(f"__lrow.{c}").alias(c) for c in left.columns],
        *[F.col(f"__asof.{c}").alias(f"asof_{c}") for c in value_cols],
    )


def band_join(
    fact: DataFrame,
    bands: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    how: str = "left",
) -> DataFrame:
    """Range (band) join: attach the band whose ``[lo, hi)`` interval
    contains ``fact[value_col]``. The bands dimension is broadcast, so
    the non-equi predicate runs map-side with zero fact-table shuffle.
    Bands must be non-overlapping for one-row-out semantics."""
    cond = (F.col(value_col) >= bands[lo_col]) & (F.col(value_col) < bands[hi_col])
    return fact.join(F.broadcast(bands), cond, how)
