"""Time-series engine queries over the driver `events` table + oracles.

These exercise the engine's own operators (tiers, gapfill, codecs) through
the driver's correctness gate: the events table plays tier-0 (key =
event_type aliased to `source`, ts = ts, v = value), so every tier/gap-fill
semantic is DuckDB-checkable. The synthetic `sequences` corpus (FIXTURES F1)
is covered separately by pytest fixtures — it doesn't exist as a DuckDB view.

Float parity: per-bucket sums go through decimal casts (see registry.py);
avg_v is the exact sum divided by the exact count, rounded to 6dp on both
sides; LOCF/interpolation then operate on identical doubles.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from workbook_exporter_fe_spark.operators.gapfill import densify, interpolate, locf

from .registry import _t, query

# Shared SQL fragment: tier-1 over events with decimal-exact sums.
_T1_SQL = """
  SELECT event_type AS source, date_trunc('minute', ts) AS bucket_ts,
         SUM(CAST(ROUND(value * 100) AS BIGINT)) / 100.0 AS sum_v,
         MIN(value) AS min_v, MAX(value) AS max_v, COUNT(*) AS cnt
  FROM events GROUP BY 1, 2
"""


def _tier1(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").select(
        F.col("event_type").alias("source"),
        F.col("ts").alias("event_ts"),
        F.col("value").alias("v"),
    )
    # int64-scaled exact sum (see registry._isum): order-independent like
    # the decimal path but stays inside whole-stage codegen
    exact = ev.groupBy(
        "source", F.date_trunc("minute", "event_ts").alias("bucket_ts")
    ).agg(
        (F.sum(F.round(F.col("v") * 100).cast("long")) / 100.0).alias("sum_v"),
        F.min("v").alias("min_v"),
        F.max("v").alias("max_v"),
        F.count("*").alias("cnt"),
    )
    return exact


@query(
    "q20_tier1_1m",
    f"""
    SELECT source, bucket_ts, sum_v, min_v, max_v, cnt,
           ROUND(sum_v / cnt, 6) AS avg_v
    FROM ({_T1_SQL})
    """,
)
def q20_tier1_1m(spark, sf_dir):
    t1 = _tier1(spark, sf_dir)
    return t1.withColumn("avg_v", F.round(F.col("sum_v") / F.col("cnt"), 6))


@query(
    "q21_tier2_1h",
    f"""
    SELECT source, date_trunc('hour', bucket_ts) AS bucket_ts,
           CAST(ROUND(SUM(CAST(sum_v AS DECIMAL(28,6))), 6) AS DOUBLE) AS sum_v,
           MIN(min_v) AS min_v, MAX(max_v) AS max_v, CAST(SUM(cnt) AS BIGINT) AS cnt,
           ROUND(CAST(ROUND(SUM(CAST(sum_v AS DECIMAL(28,6))), 6) AS DOUBLE) / SUM(cnt), 6) AS avg_v
    FROM ({_T1_SQL}) GROUP BY 1, 2
    """,
)
def q21_tier2_1h(spark, sf_dir):
    t1 = _tier1(spark, sf_dir)
    t2 = t1.groupBy(
        "source", F.date_trunc("hour", "bucket_ts").alias("bucket_ts")
    ).agg(
        F.round(F.sum(F.col("sum_v").cast("decimal(28,6)")), 6).cast("double").alias("sum_v"),
        F.min("min_v").alias("min_v"),
        F.max("max_v").alias("max_v"),
        F.sum("cnt").alias("cnt"),
    )
    return t2.withColumn("avg_v", F.round(F.col("sum_v") / F.col("cnt"), 6))


@query(
    "q22_tier3_1d",
    f"""
    SELECT source, CAST(date_trunc('day', bucket_ts) AS TIMESTAMP) AS bucket_ts,
           CAST(ROUND(SUM(CAST(sum_v AS DECIMAL(28,6))), 6) AS DOUBLE) AS sum_v,
           MIN(min_v) AS min_v, MAX(max_v) AS max_v, CAST(SUM(cnt) AS BIGINT) AS cnt
    FROM ({_T1_SQL}) GROUP BY 1, 2
    """,
)
def q22_tier3_1d(spark, sf_dir):
    t1 = _tier1(spark, sf_dir)
    return t1.groupBy(
        "source", F.date_trunc("day", "bucket_ts").alias("bucket_ts")
    ).agg(
        F.round(F.sum(F.col("sum_v").cast("decimal(28,6)")), 6).cast("double").alias("sum_v"),
        F.min("min_v").alias("min_v"),
        F.max("max_v").alias("max_v"),
        F.sum("cnt").alias("cnt"),
    )


_DENSE_SQL = f"""
  WITH t1 AS (
    SELECT source, bucket_ts, ROUND(sum_v / cnt, 6) AS avg_v FROM ({_T1_SQL})
  ), rng AS (
    SELECT source, MIN(bucket_ts) AS lo, MAX(bucket_ts) AS hi FROM t1 GROUP BY source
  ), spine AS (
    SELECT source, UNNEST(generate_series(lo, hi, INTERVAL 1 MINUTE)) AS bucket_ts FROM rng
  ), dense AS (
    SELECT s.source, s.bucket_ts, t.avg_v, t.avg_v IS NULL AS filled
    FROM spine s LEFT JOIN t1 t USING (source, bucket_ts)
  )
"""


@query(
    "q23_gapfill_locf",
    _DENSE_SQL
    + """
    SELECT source, bucket_ts,
           last_value(avg_v IGNORE NULLS) OVER (
             PARTITION BY source ORDER BY bucket_ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS avg_v,
           filled
    FROM dense
    """,
)
def q23_gapfill_locf(spark, sf_dir):
    t1 = _tier1(spark, sf_dir).select(
        "source", "bucket_ts", F.round(F.col("sum_v") / F.col("cnt"), 6).alias("avg_v")
    )
    dense = densify(t1, "1m", value_cols=["avg_v"])
    return locf(dense, "avg_v").select("source", "bucket_ts", "avg_v", "filled")


@query(
    "q24_gapfill_interp",
    _DENSE_SQL
    + """
    SELECT source, bucket_ts,
           CASE WHEN avg_v IS NOT NULL THEN avg_v
                WHEN prev_v IS NULL THEN next_v
                WHEN next_v IS NULL THEN prev_v
                ELSE prev_v + (next_v - prev_v) * ((epoch(bucket_ts) - prev_t) / (next_t - prev_t))
           END AS avg_v,
           filled
    FROM (
      SELECT *,
             last_value(avg_v IGNORE NULLS) OVER wb AS prev_v,
             first_value(avg_v IGNORE NULLS) OVER wf AS next_v,
             last_value(CASE WHEN avg_v IS NOT NULL THEN epoch(bucket_ts) END IGNORE NULLS) OVER wb AS prev_t,
             first_value(CASE WHEN avg_v IS NOT NULL THEN epoch(bucket_ts) END IGNORE NULLS) OVER wf AS next_t
      FROM dense
      WINDOW wb AS (PARTITION BY source ORDER BY bucket_ts
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wf AS (PARTITION BY source ORDER BY bucket_ts
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    """,
)
def q24_gapfill_interp(spark, sf_dir):
    t1 = _tier1(spark, sf_dir).select(
        "source", "bucket_ts", F.round(F.col("sum_v") / F.col("cnt"), 6).alias("avg_v")
    )
    dense = densify(t1, "1m", value_cols=["avg_v"])
    return interpolate(dense, "avg_v").select("source", "bucket_ts", "avg_v", "filled")


# Retention: tier-specific expiry as a pure filter against the watermark
# (operators/retention.py) — partition-prunable at table level.
@query(
    "q26_retention",
    f"""
    WITH t1 AS ({_T1_SQL}),
         wm AS (SELECT MAX(bucket_ts) AS w FROM t1)
    SELECT t1.* FROM t1, wm WHERE t1.bucket_ts > wm.w - INTERVAL 12 HOUR
    """,
)
def q26_retention(spark, sf_dir):
    from workbook_exporter_fe_spark.operators.retention import apply_retention

    t1 = _tier1(spark, sf_dir)
    return apply_retention(t1, "interval 12 hours")


# Codec round-trip through the gate: compress tier-1 per (source, day)
# segment with DoD+Gorilla, decompress, return points. Binary payloads are
# not SQL-expressible → the decompressed POINTS are compared instead: the
# oracle is simply tier-1 itself, so a bit-exact codec is the only way the
# hashes match.
@query(
    "q27_codec_roundtrip",
    f"""
    SELECT source, bucket_ts, ROUND(sum_v / cnt, 6) AS avg_v FROM ({_T1_SQL})
    """,
)
def q27_codec_roundtrip(spark, sf_dir):
    from workbook_exporter_fe_spark.functions.spark_codecs import (
        compress_tier,
        decompress_chunks,
    )

    t1 = _tier1(spark, sf_dir).select(
        "source", "bucket_ts", F.round(F.col("sum_v") / F.col("cnt"), 6).alias("avg_v")
    )
    chunks = compress_tier(t1, value_col="avg_v")
    points = decompress_chunks(chunks, value_col="avg_v")
    # tier tables are timestamp_ntz; re-align the decoded TIMESTAMP type
    return points.select(
        "source", F.col("bucket_ts").cast("timestamp_ntz").alias("bucket_ts"), "avg_v"
    )


# Structured Streaming tier-1 through the correctness gate: the same
# windowed aggregation as q20 executed as a streaming query (parquet file
# source -> complete-mode memory sink, processAllAvailable). Complete mode
# retains all window state, so the streamed result must equal the batch
# tier-1 exactly — the oracle IS q20's SQL, making the streaming path
# oracle-checked rather than rows-only.
_STREAM_SEQ = iter(range(1_000_000))


@query(
    "q51_stream_tier1",
    f"""
    SELECT source, bucket_ts, sum_v, min_v, max_v, cnt,
           ROUND(sum_v / cnt, 6) AS avg_v
    FROM ({_T1_SQL})
    """,
)
def q51_stream_tier1(spark, sf_dir):
    import hashlib
    import os

    src = f"{sf_dir}/events.parquet"
    static = spark.read.parquet(src)
    # FileStreamSource requires a directory; stage the single-file driver
    # table into a cached temp dir once per sf_dir.
    staged = "/tmp/spark_graft_stream_src_" + hashlib.md5(src.encode()).hexdigest()[:12]
    if not os.path.exists(f"{staged}/_SUCCESS"):
        static.write.mode("overwrite").parquet(staged)
    stream = spark.readStream.schema(static.schema).parquet(staged)
    ev = stream.select(
        F.col("event_type").alias("source"),
        F.col("ts").alias("event_ts"),
        F.col("value").alias("v"),
    )
    agg = ev.groupBy("source", F.window("event_ts", "1 minute").alias("win")).agg(
        F.round(F.sum(F.col("v").cast("decimal(28,6)")), 6).cast("double").alias("sum_v"),
        F.min("v").alias("min_v"),
        F.max("v").alias("max_v"),
        F.count("*").alias("cnt"),
    )
    name = f"q51_stream_run_{next(_STREAM_SEQ)}"
    q = (
        agg.writeStream.outputMode("complete").format("memory").queryName(name).start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name).select(
        "source",
        F.col("win.start").alias("bucket_ts"),
        "sum_v",
        "min_v",
        "max_v",
        "cnt",
        F.round(F.col("sum_v") / F.col("cnt"), 6).alias("avg_v"),
    )


# Custom stateful streaming operator through the gate (rows-only: explicit
# applyInPandasWithState running totals are not SQL-expressible; pytest
# pins exact values in tests/test_tableio_stateful.py).
@query("q56_stateful_running_stats")
def q56_stateful_running_stats(spark, sf_dir):
    import hashlib
    import os

    from workbook_exporter_fe_spark.streaming.stateful import running_source_stats

    src = f"{sf_dir}/events.parquet"
    static = spark.read.parquet(src)
    staged = "/tmp/spark_graft_stream_src_" + hashlib.md5(src.encode()).hexdigest()[:12]
    if not os.path.exists(f"{staged}/_SUCCESS"):
        static.write.mode("overwrite").parquet(staged)
    ev = spark.readStream.schema(static.schema).parquet(staged).select(
        F.col("event_type").alias("source"),
        F.col("ts").cast("timestamp").alias("event_ts"),
        F.col("value").alias("v"),
    )
    stats = running_source_stats(ev)
    name = f"q56_stateful_run_{next(_STREAM_SEQ)}"
    q = stats.writeStream.outputMode("update").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


# Distinct-count tiers. q60 is the exact path (oracle-checked); q61 is the
# scale path — tier-1 HLL sketches merged upward (hll_union_agg) so coarser
# tiers never rescan tier-0 (COUNT DISTINCT is not decomposable; per-
# register-max sketch union is). Rows-only: DuckDB's approx_count_distinct
# is a different HLL implementation, so estimates cannot hash-match;
# tests/test_hll_tiers.py pins the ≤2% accuracy envelope vs exact.
@query(
    "q60_distinct_rollup",
    """
    SELECT event_type AS source,
           date_trunc('hour', ts) AS bucket_ts,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           COUNT(*) AS cnt
    FROM events GROUP BY 1, 2
    """,
)
def q60_distinct_rollup(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy(
        F.col("event_type").alias("source"),
        F.date_trunc("hour", "ts").alias("bucket_ts"),
    ).agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count("*").alias("cnt"),
    )


@query("q61_hll_distinct_cascade")
def q61_hll_distinct_cascade(spark, sf_dir):
    from workbook_exporter_fe_spark.operators.tiers import (
        distinct_sketch_finalize,
        distinct_sketch_reaggregate,
        distinct_sketch_tier1,
    )

    ev = _t(spark, sf_dir, "events").select(
        F.col("event_type").alias("source"),
        F.col("ts").alias("event_ts"),
        F.col("user_id").cast("string").alias("doc_id"),
    )
    t1 = distinct_sketch_tier1(ev)
    t2 = distinct_sketch_reaggregate(t1, "1h")
    return distinct_sketch_finalize(t2)


# Mergeable percentiles: tier-1 KLL sketches merged to 1h, finalized as
# p50/p95/p99 (rows-only for the same reason as q61 — sketch estimates are
# implementation-specific; tests/test_hll_tiers.py pins the rank-error
# envelope vs exact percentile). q48 remains the exact oracle-checked path.
@query("q62_kll_quantile_cascade")
def q62_kll_quantile_cascade(spark, sf_dir):
    from workbook_exporter_fe_spark.operators.tiers import (
        quantile_sketch_finalize,
        quantile_sketch_reaggregate,
        quantile_sketch_tier1,
    )

    ev = _t(spark, sf_dir, "events").select(
        F.col("event_type").alias("source"),
        F.col("ts").alias("event_ts"),
        F.col("value").alias("v"),
    )
    t1 = quantile_sketch_tier1(ev)
    t2 = quantile_sketch_reaggregate(t1, "1h")
    return quantile_sketch_finalize(t2)


# Theta-sketch set algebra between consecutive buckets: returning vs new
# distinct users per (source, hour). Rows-only (sketch estimates);
# tests/test_hll_tiers.py pins them against exact set intersection/
# difference at sf0.01.
@query("q63_theta_churn")
def q63_theta_churn(spark, sf_dir):
    from workbook_exporter_fe_spark.operators.tiers import (
        bucket_churn,
        theta_bucket_sketches,
    )

    ev = _t(spark, sf_dir, "events").select(
        F.col("event_type").alias("source"),
        F.col("ts").alias("event_ts"),
        F.col("user_id").cast("string").alias("doc_id"),
    )
    return bucket_churn(theta_bucket_sketches(ev, tier="1h"))


# Segmented gap-fill (the scale path: (source, segment)-parallel windows +
# per-segment carry summaries) checked against the SAME oracles as the
# plain operators — the segmentation must be invisible in the results.
@query(
    "q64_gapfill_locf_segmented",
    _DENSE_SQL
    + """
    SELECT source, bucket_ts,
           last_value(avg_v IGNORE NULLS) OVER (
             PARTITION BY source ORDER BY bucket_ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS avg_v,
           filled
    FROM dense
    """,
)
def q64_gapfill_locf_segmented(spark, sf_dir):
    from workbook_exporter_fe_spark.operators.gapfill import locf_segmented

    t1 = _tier1(spark, sf_dir).select(
        "source", "bucket_ts", F.round(F.col("sum_v") / F.col("cnt"), 6).alias("avg_v")
    )
    dense = densify(t1, "1m", value_cols=["avg_v"])
    return locf_segmented(dense, "avg_v", segment="1h").select(
        "source", "bucket_ts", "avg_v", "filled"
    )


@query(
    "q65_gapfill_interp_segmented",
    _DENSE_SQL
    + """
    SELECT source, bucket_ts,
           CASE WHEN avg_v IS NOT NULL THEN avg_v
                WHEN prev_v IS NULL THEN next_v
                WHEN next_v IS NULL THEN prev_v
                ELSE prev_v + (next_v - prev_v) * ((epoch(bucket_ts) - prev_t) / (next_t - prev_t))
           END AS avg_v,
           filled
    FROM (
      SELECT *,
             last_value(avg_v IGNORE NULLS) OVER wb AS prev_v,
             first_value(avg_v IGNORE NULLS) OVER wf AS next_v,
             last_value(CASE WHEN avg_v IS NOT NULL THEN epoch(bucket_ts) END IGNORE NULLS) OVER wb AS prev_t,
             first_value(CASE WHEN avg_v IS NOT NULL THEN epoch(bucket_ts) END IGNORE NULLS) OVER wf AS next_t
      FROM dense
      WINDOW wb AS (PARTITION BY source ORDER BY bucket_ts
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wf AS (PARTITION BY source ORDER BY bucket_ts
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    """,
)
def q65_gapfill_interp_segmented(spark, sf_dir):
    from workbook_exporter_fe_spark.operators.gapfill import interpolate_segmented

    t1 = _tier1(spark, sf_dir).select(
        "source", "bucket_ts", F.round(F.col("sum_v") / F.col("cnt"), 6).alias("avg_v")
    )
    dense = densify(t1, "1m", value_cols=["avg_v"])
    return interpolate_segmented(dense, "avg_v", segment="1h").select(
        "source", "bucket_ts", "avg_v", "filled"
    )
