"""seasonal_decompose: classical additive decomposition pinned against a
pure-python reference implementing the identical definition (centered MA
width period+1, per-phase means of the detrended series, residual)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from workbook_exporter_fe_spark.operators.seasonal import seasonal_decompose

PERIOD = 4
WIDTH = PERIOD + 1  # even period -> symmetric window


def _series(src: str, n: int = 60) -> list[float]:
    """Deterministic: trend + fixed seasonal pattern + small "noise"."""
    season = {"a": [5.0, -1.0, -3.0, -1.0], "b": [2.0, 0.0, -2.0, 0.0]}[src]
    out = []
    for i in range(n):
        noise = ((i * 2654435761 + ord(src[0])) % 13 - 6) / 10.0
        out.append(round(0.25 * i + season[i % PERIOD] + noise, 2))
    return out


def _reference(vals: list[float], scale: int = 100):
    """trend/seasonal/resid per the module's exact-int definition."""
    x = [round(v * scale) for v in vals]
    n = len(x)
    half = WIDTH // 2
    trend, det = [], []
    for i in range(n):
        lo, hi = i - half, i + half
        if lo < 0 or hi >= n:
            trend.append(None)
            det.append(None)
        else:
            s = sum(x[lo : hi + 1])
            trend.append(round(s / WIDTH / scale, 6))
            det.append(WIDTH * x[i] - s)
    ph_num = {}
    ph_n = {}
    for i, d in enumerate(det):
        if d is not None:
            p = i % PERIOD
            ph_num[p] = ph_num.get(p, 0) + d
            ph_n[p] = ph_n.get(p, 0) + 1
    seasonal = [
        round(ph_num[i % PERIOD] / WIDTH / ph_n[i % PERIOD] / scale, 6)
        for i in range(n)
    ]
    resid = [
        None
        if trend[i] is None
        else round(x[i] / scale - trend[i] - seasonal[i], 6)
        for i in range(n)
    ]
    return trend, seasonal, resid


@pytest.fixture(scope="module")
def hourly(spark):
    rows = [
        (s, i, v)
        for s in ("a", "b")
        for i, v in enumerate(_series(s))
    ]
    return spark.createDataFrame(
        rows, "source string, idx int, avg_v double"
    ).select(
        "source",
        F.timestamp_seconds(F.lit(1700000000) + F.col("idx") * 3600).alias(
            "bucket_ts"
        ),
        "idx",
        "avg_v",
    )


def test_seasonal_decompose_matches_reference(spark, hourly):
    out = seasonal_decompose(hourly, period=PERIOD).collect()
    by_key = {(r.source, r.idx): r for r in out}
    for src in ("a", "b"):
        vals = _series(src)
        trend, seasonal, resid = _reference(vals)
        for i in range(len(vals)):
            r = by_key[(src, i)]
            assert r.phase == i % PERIOD
            assert r.trend == pytest.approx(trend[i]) if trend[i] is not None else r.trend is None
            assert r.seasonal == pytest.approx(seasonal[i])
            if resid[i] is None:
                assert r.resid is None
            else:
                assert r.resid == pytest.approx(resid[i])


def test_seasonal_reconstruction_identity(spark, hourly):
    """Where the window is full: trend + seasonal + resid == value (6 dp)."""
    out = seasonal_decompose(hourly, period=PERIOD).filter(
        F.col("trend").isNotNull()
    )
    bad = out.filter(
        F.abs(F.col("trend") + F.col("seasonal") + F.col("resid") - F.col("avg_v"))
        > 1e-6
    ).count()
    assert bad == 0


def test_seasonal_edges_null(spark, hourly):
    """First/last half-window rows have no trend (centered MA not full)."""
    out = seasonal_decompose(hourly, period=PERIOD)
    n = 60
    half = WIDTH // 2
    rows = {(r.source, r.idx): r.trend for r in out.collect()}
    for src in ("a", "b"):
        for i in list(range(half)) + list(range(n - half, n)):
            assert rows[(src, i)] is None
