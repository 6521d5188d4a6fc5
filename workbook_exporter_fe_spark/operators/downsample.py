"""Visual/archival downsampling of tier series beyond plain re-aggregation.

Two classic time-series reducers the tier cascade (sum/min/max/cnt
re-aggregation, operators/tiers.py) does not cover:

- ``downsample_minmax``: per coarse bucket keep the extreme POINTS (argmin
  and argmax rows, original timestamps preserved) — the shape-preserving
  reducer for threshold/spike analysis. Pure DataFrame ops: a
  lexicographic ``min``/``max`` over a (value, fine_ts) STRUCT per bucket
  (deterministic under ties, unlike ``min_by``), one partial-aggregating
  groupBy, no window, no Python — full codegen speed at any scale. NULL
  values participate in the struct ordering (Spark sorts NULL first in
  ``min``-struct comparisons), so a NULL-v row can win the min — callers
  that want NULLs ignored (min_by semantics) must filter them first.
- ``lttb``: Largest-Triangle-Three-Buckets (Steinarsson 2013), the
  standard fixed-budget downsample for plotting: picks, per bucket, the
  point forming the largest triangle with the previously selected point
  and the next bucket's centroid. Selection is inherently sequential per
  series, so it runs as `applyInPandas` per source with a numpy inner
  loop — the correct Spark shape: series-parallel across sources, one
  bounded pandas group each (a plot-budget downsample is applied to ONE
  series' points at a time; the tier tables it reads are already
  orders of magnitude below tier-0).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from workbook_exporter_fe_spark.operators.tiers import TIER_TRUNC


def downsample_minmax(
    tier: DataFrame, to: str = "1h", value_col: str = "avg_v",
    key: str = "source",
) -> DataFrame:
    """(key, bucket_ts, ts_min, v_min, ts_max, v_max) per coarse bucket:
    the argmin/argmax POINTS with their original fine timestamps.

    Deterministic under value ties (min_by/arg_min leave tie order to
    partition order): the aggregate is a lexicographic min/max over the
    (value, fine_ts) STRUCT — tied minima resolve to the earliest point,
    tied maxima to the latest, identically on any engine/partitioning
    (the q21 gate hash-checks this against a row_number oracle)."""
    src = tier.select(
        F.col(key),
        F.date_trunc(TIER_TRUNC[to], F.col("bucket_ts")).alias("bucket_ts"),
        F.col("bucket_ts").alias("fine_ts"),
        F.col(value_col).alias("v"),
    )
    return (
        src.groupBy(key, "bucket_ts")
        .agg(
            F.min(F.struct("v", "fine_ts")).alias("_mn"),
            F.max(F.struct("v", "fine_ts")).alias("_mx"),
        )
        .select(
            key,
            "bucket_ts",
            F.col("_mn.fine_ts").alias("ts_min"),
            F.col("_mn.v").alias("v_min"),
            F.col("_mx.fine_ts").alias("ts_max"),
            F.col("_mx.v").alias("v_max"),
        )
    )


def _lttb_indices(ts: np.ndarray, vs: np.ndarray, n_out: int) -> np.ndarray:
    """Classic LTTB selection: first + last always kept; one point per
    middle bucket maximizing the triangle area with the previous selected
    point and the NEXT bucket's centroid."""
    n = len(ts)
    if n_out >= n:
        return np.arange(n)
    if n_out < 3:
        return np.array([0, n - 1])
    # bucket edges over the middle points [1, n-1)
    edges = np.linspace(1, n - 1, n_out - 1).astype(np.int64)
    out = np.empty(n_out, dtype=np.int64)
    out[0] = 0
    a = 0  # previously selected index
    for i in range(n_out - 2):
        lo, hi = edges[i], edges[i + 1]
        nlo, nhi = edges[i + 1], (edges[i + 2] if i + 2 < len(edges) else n)
        # next bucket centroid (last bucket's "next" is the final point)
        cx = ts[nlo:nhi].mean() if nhi > nlo else ts[n - 1]
        cy = vs[nlo:nhi].mean() if nhi > nlo else vs[n - 1]
        bx, by = ts[lo:hi], vs[lo:hi]
        # 2x triangle area with fixed vertices (ts[a], vs[a]) and (cx, cy)
        area = np.abs(
            (ts[a] - cx) * (by - vs[a]) - (ts[a] - bx) * (cy - vs[a])
        )
        a = lo + int(np.argmax(area))
        out[i + 1] = a
    out[-1] = n - 1
    return out


def lttb(
    tier: DataFrame, n_out: int, value_col: str = "avg_v", key: str = "source"
) -> DataFrame:
    """(key, bucket_ts, value_col) — at most ``n_out`` points per series,
    LTTB-selected. Rows keep their original timestamps and values (LTTB
    selects points, never synthesizes them)."""
    out_schema = f"{key} string, bucket_ts timestamp, {value_col} double"

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("bucket_ts")
        ts = pdf["bucket_ts"].astype("int64").to_numpy(dtype=np.float64)
        vs = pdf[value_col].to_numpy(dtype=np.float64)
        idx = _lttb_indices(ts, vs, n_out)
        return pdf.iloc[idx][[key, "bucket_ts", value_col]]

    pruned = tier.select(key, F.col("bucket_ts").cast("timestamp"), value_col)
    return pruned.groupBy(key).applyInPandas(run, schema=out_schema)
