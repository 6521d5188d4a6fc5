"""Gap-fill: bucket spine generation, LOCF, and linear interpolation.

A tier table has one row per (source, bucket_ts) *with data*; gap-fill
densifies it to every bucket in each source's [min, max] range and fills
missing values:

- ``locf``: last-observation-carried-forward via
  ``last(v, ignorenulls=True)`` over an unbounded-preceding window.
- ``interpolate``: linear between the previous and next observed points
  (prev/next value+ts via last/first ignorenulls windows), LOCF at the
  trailing edge, next-value at the leading edge.

The spine is `sequence(min_bucket, max_bucket, interval)` + `explode` —
generated per source from a tiny aggregate, then left-joined to actuals.

Scale design: windows partition by source and order by bucket — tier tables
are already orders of magnitude smaller than tier-0 (one row per minute per
source), so even a year of 1m buckets is ~525k rows per source: a single
window partition is fine. For very long ranges, segment time (e.g. by day)
and overlap one bucket so the prev/next lookups cross segment edges
correctly (SURVEY §7 risk 2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_INTERVAL = {"1m": "interval 1 minute", "1h": "interval 1 hour", "1d": "interval 1 day"}


def bucket_spine(tier: DataFrame, step: str = "1m", key: str = "source") -> DataFrame:
    """One row per (source, bucket_ts) for every bucket in each source's range."""
    return (
        tier.groupBy(key)
        .agg(F.min("bucket_ts").alias("lo"), F.max("bucket_ts").alias("hi"))
        .select(
            key,
            F.explode(
                F.sequence(F.col("lo"), F.col("hi"), F.expr(_INTERVAL[step]))
            ).alias("bucket_ts"),
        )
    )


def densify(tier: DataFrame, step: str = "1m", value_cols: list[str] | None = None, key: str = "source") -> DataFrame:
    """Left-join the spine to actuals; adds `filled` = true for gap rows."""
    value_cols = value_cols or [c for c in tier.columns if c not in (key, "bucket_ts")]
    spine = bucket_spine(tier, step, key)
    joined = spine.join(tier, [key, "bucket_ts"], "left")
    return joined.withColumn("filled", F.col(value_cols[0]).isNull())


def locf(dense: DataFrame, value_col: str = "avg_v", key: str = "source") -> DataFrame:
    """Fill nulls with the last non-null value per source (ordered by bucket)."""
    w = (
        Window.partitionBy(key)
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return dense.withColumn(
        value_col, F.last(value_col, ignorenulls=True).over(w)
    )


def interpolate(dense: DataFrame, value_col: str = "avg_v", key: str = "source") -> DataFrame:
    """Linear interpolation of nulls between observed neighbours per source.

    out = prev + (next - prev) * (t - t_prev) / (t_next - t_prev);
    trailing gaps fall back to LOCF, leading gaps to the next value.
    """
    # Both lookups use RUNNING frames (unbounded-preceding → current), which
    # Spark evaluates in O(n) per partition; "next non-null" runs over the
    # DESCENDING order instead of an unbounded-FOLLOWING frame, which Spark
    # recomputes from scratch per row — O(n²) and ~300× slower in practice.
    wb = (
        Window.partitionBy(key)
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy(key)
        .orderBy(F.col("bucket_ts").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    v = F.col(value_col)
    ts_obs = F.when(v.isNotNull(), F.col("bucket_ts"))
    prev_v = F.last(v, ignorenulls=True).over(wb)
    next_v = F.last(v, ignorenulls=True).over(wf)
    prev_t = F.last(ts_obs, ignorenulls=True).over(wb).cast("double")
    next_t = F.last(ts_obs, ignorenulls=True).over(wf).cast("double")
    t = F.col("bucket_ts").cast("double")
    frac = (t - prev_t) / (next_t - prev_t)
    filled = (
        F.when(v.isNotNull(), v)
        .when(prev_v.isNull(), next_v)  # leading gap
        .when(next_v.isNull(), prev_v)  # trailing gap → LOCF
        .otherwise(prev_v + (next_v - prev_v) * frac)
    )
    return dense.withColumn(value_col, filled)
