"""Mergeable fixed-bin histogram tiers + histogram-quantile estimation.

The reference generates Prometheus scrape configs
(/root/reference/workbook_exporter-fe.py — every exporter block is a
scrape target); the Prometheus-native distribution aggregate is the
fixed-bucket histogram, merged across scrapes and queried with
histogram_quantile(). This module supplies that tier class beside the
exact KLL path (operators/tiers.py):

- ``histogram_tier1``: per (source, 1m-bucket, bin) counts. Bin counts
  are plain sums — fully decomposable, so coarser tiers re-sum this tier
  (same continuous-aggregate contract as sum/min/max/cnt), and unlike
  KLL/HLL sketch bytes the tier is human-readable and SQL-queryable.
- ``histogram_reaggregate``: re-sum to 1h/1d.
- ``histogram_quantile``: PromQL-style quantile from cumulative bin
  counts with linear interpolation inside the containing bin — exact
  rank selection of the bin, deterministic interpolation within it.

Scale design: binning is one `width_bucket`-style integer expression in
the scan stage; the groupBy partial-aggregates map-side, and the shuffle
carries (source, bucket_ts, bin:int, partial_count) — bounded by
#bins × #buckets × #sources regardless of event count. The quantile
finalizer runs on the tier table (orders of magnitude smaller than
tier-0) with one small window per (source, bucket).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .tiers import TIER_TRUNC


def bin_expr(value_col: str, lo: float, hi: float, n_bins: int):
    """0-based bin id; underflow → -1, overflow → n_bins (PromQL +Inf)."""
    v = F.col(value_col)
    width = (hi - lo) / n_bins
    raw = F.floor((v - F.lit(lo)) / F.lit(width)).cast("int")
    return (
        F.when(v < lo, F.lit(-1))
        .when(v >= hi, F.lit(n_bins))
        .otherwise(raw)
    )


def histogram_tier1(
    events: DataFrame,
    lo: float,
    hi: float,
    n_bins: int = 32,
    value_col: str = "v",
    tier: str = "1m",
) -> DataFrame:
    """(source, bucket_ts, bin, n): per-bucket fixed-bin value histogram."""
    bucket = F.date_trunc(TIER_TRUNC[tier], F.col("event_ts")).alias("bucket_ts")
    return (
        events.select(
            "source", bucket, bin_expr(value_col, lo, hi, n_bins).alias("bin")
        )
        .groupBy("source", "bucket_ts", "bin")
        .agg(F.count("*").alias("n"))
    )


def histogram_reaggregate(hist: DataFrame, to: str) -> DataFrame:
    """Re-sum bin counts to a coarser bucket — never rescans tier-0."""
    bucket = F.date_trunc(TIER_TRUNC[to], F.col("bucket_ts")).alias("bucket_ts")
    return hist.groupBy("source", bucket, "bin").agg(F.sum("n").alias("n"))


def histogram_quantile(
    hist: DataFrame, q: float, lo: float, hi: float, n_bins: int
) -> DataFrame:
    """(source, bucket_ts, q{q}) estimated from cumulative bin counts.

    PromQL semantics: find the first bin whose cumulative count reaches
    q·total, then interpolate linearly inside it. Underflow bin (-1)
    clamps to ``lo``; the overflow bin clamps to ``hi`` (PromQL returns
    the highest finite bound for +Inf buckets)."""
    width = (hi - lo) / n_bins
    w = (
        Window.partitionBy("source", "bucket_ts")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy("source", "bucket_ts")
    cum = hist.withColumn("cum", F.sum("n").over(w)).withColumn(
        "total", F.sum("n").over(wall)
    )
    rank = F.col("total") * q
    hit = cum.filter(F.col("cum") >= rank)
    first_hit = (
        hit.withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("source", "bucket_ts").orderBy("bin")
            ),
        )
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    prev_cum = F.col("cum") - F.col("n")
    frac = (rank - prev_cum) / F.col("n")
    b = F.col("bin")
    est = (
        F.when(b < 0, F.lit(lo))
        .when(b >= n_bins, F.lit(hi))
        .otherwise(F.lit(lo) + (b + frac) * F.lit(width))
    )
    alias = f"q{int(q * 100)}"
    return first_hit.select(
        "source", "bucket_ts", F.round(est, 6).alias(alias), "total"
    )
