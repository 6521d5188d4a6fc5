"""Codec tests: numpy round-trip properties + Spark compress/decompress."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from workbook_exporter_fe_spark.functions.codecs import (
    dod_decode,
    dod_encode,
    gorilla_decode,
    gorilla_encode,
)
from workbook_exporter_fe_spark.functions.spark_codecs import (
    compress_tier,
    decompress_chunks,
    encode_ratio,
)
from workbook_exporter_fe_spark.operators.tiers import rollup_tier1


@given(
    st.lists(
        st.floats(allow_nan=True, allow_infinity=True, width=64),
        min_size=0,
        max_size=300,
    )
)
@settings(max_examples=200, deadline=None)
def test_gorilla_roundtrip_property(vals):
    v = np.array(vals, dtype=np.float64)
    dec = gorilla_decode(gorilla_encode(v), len(v))
    assert dec.tobytes() == v.tobytes()  # bit-exact incl. NaN payloads, ±0


@given(
    st.lists(
        st.integers(min_value=-(2**62), max_value=2**62), min_size=0, max_size=300
    )
)
@settings(max_examples=200, deadline=None)
def test_dod_roundtrip_property(ts):
    t = np.array(ts, dtype=np.int64)
    dec = dod_decode(dod_encode(t), len(t))
    assert np.array_equal(dec, t)


def test_gorilla_edge_bits():
    v = np.array([np.nan, 0.0, -0.0, np.inf, -np.inf, 5e-324, 1.7976931348623157e308])
    dec = gorilla_decode(gorilla_encode(v), len(v))
    assert dec.tobytes() == v.tobytes()


def test_dod_regular_series_compresses_hard():
    t = np.arange(0, 86400, 60, dtype=np.int64)  # one day of 1m buckets
    enc = dod_encode(t)
    assert len(enc) < len(t)  # >8x better than raw (1 bit/point + header)
    assert np.array_equal(dod_decode(enc, len(t)), t)


@pytest.mark.usefixtures("spark")
def test_spark_compress_roundtrip(spark, events):
    t1 = rollup_tier1(events).cache()
    chunks = compress_tier(t1, value_col="avg_v").cache()
    back = decompress_chunks(chunks, value_col="avg_v")
    orig = t1.select("source", "bucket_ts", "avg_v")
    assert back.exceptAll(orig).count() == 0
    assert orig.exceptAll(back).count() == 0
    # chunk bookkeeping: points preserved, ratio < 1 (beats raw 16B/point)
    ratios = encode_ratio(chunks).collect()
    total_points = sum(r["points"] for r in ratios)
    assert total_points == t1.count()
    # weighted overall ratio beats raw (tiny segments are header-dominated,
    # so assert the aggregate, not per-source)
    overall = sum(r["encoded_bytes"] for r in ratios) / (16.0 * total_points)
    assert overall < 1.0
