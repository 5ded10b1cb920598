"""Property-based tests (hypothesis) for the invariants the example
tests can only spot-check: codec roundtrips over arbitrary images, the
salted-join == plain-join contract, and the fixed-point log2 bound.

Spark-touching properties cap max_examples low (each example is a job);
the pure-Python codec properties run wide."""

from __future__ import annotations

import math

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.test_multimodal import _bmp_bytes, _gif_bytes, _png_bytes, _ppm_bytes


@st.composite
def rgb_images(draw, max_h=12, max_w=12):
    h = draw(st.integers(1, max_h))
    w = draw(st.integers(1, max_w))
    seed = draw(st.integers(0, 2**31 - 1))
    return np.random.RandomState(seed).randint(0, 256, (h, w, 3), dtype=np.uint8)


@given(img=rgb_images(), filter_seed=st.integers(0, 2**31 - 1))
@settings(max_examples=40, deadline=None)
def test_png_roundtrip_any_image_any_filters(img, filter_seed):
    from portfolio_data_pipelines_spark.operators.multimodal import decode_image

    rs = np.random.RandomState(filter_seed)
    filters = [int(f) for f in rs.randint(0, 5, img.shape[0])]
    assert np.array_equal(decode_image(_png_bytes(img, filters=filters)), img)


@given(img=rgb_images())
@settings(max_examples=25, deadline=None)
def test_ppm_bmp_roundtrip_any_image(img):
    from portfolio_data_pipelines_spark.operators.multimodal import decode_image

    assert np.array_equal(decode_image(_ppm_bytes(img)), img)
    assert np.array_equal(decode_image(_bmp_bytes(img)), img)


@given(
    h=st.integers(1, 14),
    w=st.integers(1, 14),
    ncolors=st.sampled_from([2, 4, 7, 16, 64, 256]),
    seed=st.integers(0, 2**31 - 1),
    interlaced=st.booleans(),
)
@settings(max_examples=40, deadline=None)
def test_gif_roundtrip_any_palette_any_shape(h, w, ncolors, seed, interlaced):
    from portfolio_data_pipelines_spark.operators.multimodal import decode_image

    rs = np.random.RandomState(seed)
    palette = rs.randint(0, 256, (ncolors, 3), dtype=np.uint8)
    idx = rs.randint(0, ncolors, (h, w), dtype=np.uint8)
    got = decode_image(_gif_bytes(idx, palette, interlaced=interlaced))
    assert np.array_equal(got, palette[idx])


@given(counts=st.lists(st.integers(1, (1 << 40) - 1), min_size=1, max_size=60))
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_llog2_exact_and_bounded_property(spark, counts):
    """For ANY positive count < 2^40: the Spark-evaluated Q20 dyadic
    log2 equals the integer-exact Python formula and sits within 0.0861
    bits of true log2."""
    from pyspark.sql import functions as F

    from portfolio_data_pipelines_spark.queries.text import LM_Q, _llog2_fx_sql

    df = spark.createDataFrame([(c,) for c in counts], "c bigint")
    got = {r["c"]: r["fx"] for r in df.select("c", F.expr(_llog2_fx_sql("c")).alias("fx")).collect()}
    for c in counts:
        f = c.bit_length() - 1
        assert got[c] == f * LM_Q + (c * LM_Q) // (1 << f) - LM_Q
        assert abs(got[c] / LM_Q - math.log2(c)) < 0.0861


@given(
    left_keys=st.lists(st.integers(0, 5), min_size=0, max_size=30),
    right_keys=st.lists(st.integers(0, 5), min_size=0, max_size=10),
    n_salts=st.integers(1, 8),
    how=st.sampled_from(["inner", "left", "left_semi", "left_anti"]),
)
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_salted_join_equals_plain_join_property(spark, left_keys, right_keys, n_salts, how):
    """The salt is an internal routing key: for ANY key multiset on
    either side, any salt count, and any left-preserving join type, the
    salted join's rows equal the plain join's."""
    from portfolio_data_pipelines_spark.operators.skew import salted_join

    left = spark.createDataFrame(
        [(k, i) for i, k in enumerate(left_keys)] or [(None, None)], "k int, lv int"
    ).filter("k IS NOT NULL OR lv IS NOT NULL" if left_keys else "false")
    right = spark.createDataFrame(
        [(k, i * 10) for i, k in enumerate(right_keys)] or [(None, None)], "k int, rv int"
    ).filter("k IS NOT NULL OR rv IS NOT NULL" if right_keys else "false")
    got = sorted(tuple(r) for r in salted_join(left, right, on="k", n_salts=n_salts, how=how).collect())
    want = sorted(tuple(r) for r in left.join(right, "k", how).collect())
    assert got == want


def test_properties_file_importable():
    # guards against helper-encoder signature drift in test_multimodal
    assert callable(_png_bytes) and callable(_gif_bytes)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
