"""Declared-surface contract (VERDICT r13 #2): everything in REGISTRY must
be gradable by the DRIVER's canonicalizer, not just the local harness.

The driver compares Spark vs oracle by loading both results into pandas,
sorting columns by name, ``sort_values`` over all columns, stringifying,
and hashing. Two failure classes slipped through r13 because the local
harness (`tests/test_oracle_parity.py`) canonicalizes via ``fetchall()``
and handles lists itself:

1. **Container columns** — pandas ``sort_values`` factorizes object
   columns through a hash table; a list/dict cell raises
   ``TypeError: unhashable type`` (the exact CORRECTNESS_r13 traceback
   for ``token_ids_encoded`` / ``bpe_token_ids``). Declared outputs must
   be scalar-typed; array forms live in EXTRA_REGISTRY.
2. **DuckDB HUGEINT** — ``SUM(BIGINT)`` is HUGEINT; DuckDB's ``.df()``
   (the driver's fetch path) coerces HUGEINT to float64, so an
   un-CAST oracle aggregate stringifies ``860.0`` against Spark's
   ``860`` and hash-mismatches every row (``unigram_logprob_filter``
   in r13). Oracles must CAST integer aggregates to BIGINT.

This module pins both: a static schema gate over every declared query,
and a full driver-canon replica comparison (duckdb ``.df()`` → pandas on
the oracle side, ``toPandas()`` on the Spark side) at sf0.001. Run on the
r13 pre-fix code, both r13 failure classes reproduce red here.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import types as T

from portfolio_data_pipelines_spark.queries import REGISTRY, _load_all

_load_all()

SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"

DECLARED = sorted(REGISTRY)
DECLARED_WITH_ORACLE = sorted(n for n in REGISTRY if REGISTRY[n].oracle)

_CONTAINER = (T.ArrayType, T.MapType, T.StructType)


@pytest.mark.parametrize("name", DECLARED)
def test_declared_schema_is_scalar_only(spark, name):
    """No declared query may emit Array/Map/Struct columns — the driver's
    pandas ``sort_values`` crashes on unhashable cells (r13: two reds)."""
    df = REGISTRY[name].fn(spark, SF_SMALL)  # schema is lazy — no execution
    bad = [f.name for f in df.schema.fields if isinstance(f.dataType, _CONTAINER)]
    assert not bad, (
        f"{name}: container-typed columns {bad} are ungradable by the driver "
        f"canonicalizer; encode as scalars (array_join) and keep the array "
        f"form in EXTRA_REGISTRY"
    )


def _driver_canon(df: pd.DataFrame) -> list[tuple]:
    """Replicate the driver's canonicalization: sort columns by name,
    sort_values over all columns, stringify every cell.

    Crucially this consumes a *pandas* frame — on the oracle side produced
    by duckdb ``.df()``, which is where HUGEINT→float64 happens — so a
    type-class divergence between engines shows up here exactly as it does
    at the driver gate."""
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort")

    def cell(v):
        # pd.isna covers None, float NaN, and NaT (a NULL timestamp from
        # either engine); declared columns are scalar-only so no array
        # ambiguity here.
        if v is None or pd.isna(v):
            return "NULL"
        if isinstance(v, float):
            return repr(v)
        # duckdb .df() materializes DATE as datetime64 midnight while Spark
        # toPandas keeps datetime.date — the driver gate tolerates this
        # (date-keyed queries were green in r13), so fold midnight → date.
        if isinstance(v, pd.Timestamp):
            if v.tzinfo is None and v == v.normalize():
                return v.date().isoformat()
            return v.isoformat(sep=" ")
        if isinstance(v, dt.datetime):
            if v.tzinfo is None and v.time() == dt.time(0, 0):
                return v.date().isoformat()
            return v.isoformat(sep=" ")
        if isinstance(v, dt.date):
            return v.isoformat()
        return str(v)

    return [tuple(cell(v) for v in row) for row in df.itertuples(index=False)]


@pytest.mark.parametrize("name", DECLARED_WITH_ORACLE)
def test_declared_query_survives_driver_canon(spark, duck, name):
    """Full driver-canon replica at sf0.01 — the driver's own scale
    (float expressions like corr() can differ by 1 ULP at other SFs, so
    the replica must grade exactly where the driver does): Spark
    ``toPandas()`` vs DuckDB ``.df()`` (NOT fetchall — .df() is what
    coerces HUGEINT), both through the same pandas sort/stringify. A
    mismatch here predicts a CORRECTNESS hash mismatch at the gate."""
    spec = REGISTRY[name]
    spark_pdf = spec.fn(spark, SF_ORACLE).toPandas()
    oracle_pdf = duck.sql(spec.oracle).df()

    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: column mismatch {list(spark_pdf.columns)} vs "
        f"{list(oracle_pdf.columns)}"
    )
    s = _driver_canon(spark_pdf)
    d = _driver_canon(oracle_pdf)
    assert len(s) == len(d), f"{name}: row count {len(s)} vs {len(d)}"
    if s != d:
        diffs = [(a, b) for a, b in zip(s, d) if a != b][:3]
        raise AssertionError(
            f"{name}: driver-canon mismatch (often an un-CAST HUGEINT "
            f"aggregate in the oracle). First diffs: {diffs}"
        )


# ---------------------------------------------------------------------------
# Rotation-eligibility gate over the EXTRA registry (r16): a rotation
# into the declared window should never be the first time a query meets
# the driver's canonicalizer. Every extra-registry oracle query whose
# schema is already scalar-only gets the same driver-canon replica as
# the declared set — so the whole candidate pool is pre-validated and a
# future rotation is a decorator swap, not a discovery exercise.
# Container-schema extras (the deliberate array forms) are exempt: they
# are not rotation candidates as-is and are covered by the fetchall
# parity harness (tests/test_oracle_parity.py) instead.
# ---------------------------------------------------------------------------

from portfolio_data_pipelines_spark.queries import EXTRA_REGISTRY  # noqa: E402

EXTRA_WITH_ORACLE = sorted(n for n in EXTRA_REGISTRY if EXTRA_REGISTRY[n].oracle)


def _scalar_only(spark, name) -> bool:
    df = EXTRA_REGISTRY[name].fn(spark, SF_SMALL)
    return not any(
        isinstance(f.dataType, _CONTAINER) for f in df.schema.fields
    )


@pytest.mark.parametrize("name", EXTRA_WITH_ORACLE)
def test_rotation_candidate_survives_driver_canon(spark, duck, name):
    spec = EXTRA_REGISTRY[name]
    if not _scalar_only(spark, name):
        pytest.skip(f"{name}: container schema — not rotation-eligible as-is")
    spark_pdf = spec.fn(spark, SF_ORACLE).toPandas()
    oracle_pdf = duck.sql(spec.oracle).df()
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: column mismatch {list(spark_pdf.columns)} vs "
        f"{list(oracle_pdf.columns)}"
    )
    s = _driver_canon(spark_pdf)
    d = _driver_canon(oracle_pdf)
    assert len(s) == len(d), f"{name}: row count {len(s)} vs {len(d)}"
    if s != d:
        diffs = [(a, b) for a, b in zip(s, d) if a != b][:3]
        raise AssertionError(
            f"{name}: driver-canon mismatch — fix BEFORE any rotation "
            f"(often an un-CAST HUGEINT aggregate). First diffs: {diffs}"
        )
