"""asof_join vs pandas.merge_asof — semantics pinned against pandas itself
(backward/forward, tolerance, by-key, unmatched rows)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from workbook_exporter_fe_spark.operators.asof import asof_join


@pytest.fixture(scope="module")
def frames(spark):
    rng = np.random.default_rng(11)
    base = pd.Timestamp("2026-01-01")
    left = pd.DataFrame(
        {
            "source": rng.choice(["a", "b", "c"], 400),
            "event_ts": base + pd.to_timedelta(rng.integers(0, 3600, 400), unit="s"),
            "lv": rng.normal(size=400).round(3),
        }
    )
    right = pd.DataFrame(
        {
            "source": rng.choice(["a", "b", "c"], 150),
            "event_ts": base + pd.to_timedelta(rng.integers(0, 3600, 150), unit="s"),
            "rv": rng.normal(size=150).round(3),
            "tag": [f"t{i}" for i in range(150)],
        }
    )
    # merge_asof requires unique-ish sorted keys; drop duplicate (key, ts)
    # on the right so "the" as-of match is well-defined on both engines
    right = right.drop_duplicates(["source", "event_ts"])
    sl = spark.createDataFrame(left)
    sr = spark.createDataFrame(right)
    return left, right, sl, sr


def _expected(left, right, direction, tolerance=None):
    kw = {"tolerance": pd.Timedelta(seconds=tolerance)} if tolerance else {}
    return pd.merge_asof(
        left.sort_values("event_ts"),
        right.sort_values("event_ts"),
        on="event_ts",
        by="source",
        direction=direction,
        **kw,
    )


def _norm(df):
    return sorted(
        (
            r["source"],
            pd.Timestamp(r["event_ts"]).isoformat(),
            r["lv"],
            None if r["rv"] is None or (isinstance(r["rv"], float) and np.isnan(r["rv"])) else round(r["rv"], 3),
            r["tag"] if isinstance(r["tag"], str) else None,
        )
        for r in df
    )


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_matches_pandas(spark, frames, direction):
    left, right, sl, sr = frames
    got = asof_join(sl, sr, on="event_ts", by="source", direction=direction, suffix="")
    want = _expected(left, right, direction)
    g = _norm(r.asDict() for r in got.select("source", "event_ts", "lv", F.col("rv"), F.col("tag")).collect())
    w = _norm(want[["source", "event_ts", "lv", "rv", "tag"]].to_dict("records"))
    assert g == w


def test_asof_tolerance(spark, frames):
    left, right, sl, sr = frames
    got = asof_join(
        sl, sr, on="event_ts", by="source", direction="backward",
        tolerance_sec=120, suffix="",
    )
    want = _expected(left, right, "backward", tolerance=120)
    g = _norm(r.asDict() for r in got.select("source", "event_ts", "lv", F.col("rv"), F.col("tag")).collect())
    w = _norm(want[["source", "event_ts", "lv", "rv", "tag"]].to_dict("records"))
    assert g == w
    # the tolerance genuinely nulls some matches
    n_all = _expected(left, right, "backward")["rv"].notna().sum()
    n_tol = want["rv"].notna().sum()
    assert n_tol < n_all
