"""Classical seasonal decomposition over regular tier series.

Additive decompose of a regularly-bucketed series (tier-1/2 output) into
trend + seasonal + residual — the moving-average method (the "classical
decomposition" underlying STL, Hyndman & Athanasopoulos §3.4):

- trend: centered moving average of width ``period`` (period+1 when even,
  so the window is symmetric); NULL until the window is full — a bounded
  ROW frame, O(1)-per-row, partition-parallel per series;
- seasonal: the per-phase mean of the detrended series (phase = bucket
  index mod period), broadcast-joined back (period × n_series rows);
- resid: value − trend − seasonal.

Cross-engine exactness (driver-gate discipline): values int64-scale by
``scale``; the trend numerator is an exact integer window sum and the
per-phase seasonal numerator is the exact integer sum of
(width·x − window_sum) over the phase — both denominators are constants —
so every emitted float is a FIXED chain of correctly-rounded IEEE ops
(int→double casts, one multiply, divides, round) that DuckDB reproduces
bit-for-bit. No float accumulates across rows anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def seasonal_decompose(
    t1: DataFrame,
    period: int,
    value_col: str = "avg_v",
    key: str = "source",
    ts_col: str = "bucket_ts",
    scale: int = 100,
) -> DataFrame:
    """Add ``phase``, ``trend``, ``seasonal``, ``resid`` to a regular
    per-``key`` series (one row per bucket, no gaps — run gap-fill first).

    resid is defined against the ROUNDED trend/seasonal (6 dp), keeping
    the whole output reproducible as exact-int + fixed-IEEE arithmetic.
    """
    width = period + 1 if period % 2 == 0 else period
    half = width // 2
    wseq = Window.partitionBy(key).orderBy(ts_col)
    wc = wseq.rowsBetween(-half, half)
    x = F.round(F.col(value_col) * scale).cast("long")
    d = (
        t1.withColumn("_sd_x", x)
        .withColumn("_sd_i", F.row_number().over(wseq) - 1)
        .withColumn("phase", (F.row_number().over(wseq) - 1) % period)
        .withColumn("_sd_s", F.sum("_sd_x").over(wc))
        .withColumn("_sd_n", F.count("_sd_x").over(wc))
    )
    full = F.col("_sd_n") == width
    # detrended numerator: width·x − S (exact int64; denominator = width)
    det_num = F.when(full, width * F.col("_sd_x") - F.col("_sd_s"))
    d = d.withColumn("_sd_det", det_num)
    ph = (
        d.filter(F.col("_sd_det").isNotNull())
        .groupBy(key, "phase")
        .agg(
            F.sum("_sd_det").alias("_ph_num"),
            F.count("*").alias("_ph_n"),
        )
    )
    j = d.join(F.broadcast(ph), [key, "phase"], "left")
    trend = F.when(
        full,
        F.round(
            F.col("_sd_s").cast("double") / float(width) / float(scale), 6
        ),
    )
    seasonal = F.round(
        F.col("_ph_num").cast("double")
        / float(width)
        / F.col("_ph_n").cast("double")
        / float(scale),
        6,
    )
    out = (
        j.withColumn("trend", trend)
        .withColumn("seasonal", seasonal)
        .withColumn(
            "resid",
            F.round(
                F.col("_sd_x").cast("double") / float(scale)
                - F.col("trend")
                - F.col("seasonal"),
                6,
            ),
        )
    )
    return out.drop("_sd_x", "_sd_i", "_sd_s", "_sd_n", "_sd_det", "_ph_num", "_ph_n")
