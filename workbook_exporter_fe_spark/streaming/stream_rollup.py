"""Structured Streaming tier-1 rollup: the continuous-aggregate front end.

The batch engine's incremental story (anti-join + merge against the sink,
reference :1741-1767) is exactly what Structured Streaming formalizes:
windowed aggregation with a watermark for late tier-0 events, and a
`foreachBatch` sink that merge-upserts finalized buckets into the tier
table — the same idempotent (source, bucket_ts)-keyed merge the batch
pipeline uses, so batch and streaming write the identical table.

Scale: state is one row per open (source, 1m-window); the watermark bounds
state size (late events beyond it are dropped); `foreachBatch` + the
keyed merge gives effectively-once sink semantics with the checkpoint dir
providing exactly-once progress tracking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EVENT_SCHEMA = "source string, event_ts timestamp, v double, doc_id string"


def stream_tier1(
    events: DataFrame, watermark: str = "10 minutes", bucket: str = "1 minute"
) -> DataFrame:
    """Streaming DataFrame of tier-1 rows (same schema as batch rollup)."""
    return (
        events.withWatermark("event_ts", watermark)
        .groupBy(F.col("source"), F.window("event_ts", bucket).alias("win"))
        .agg(
            F.sum("v").alias("sum_v"),
            F.min("v").alias("min_v"),
            F.max("v").alias("max_v"),
            F.count("v").alias("cnt"),
        )
        .select(
            "source",
            F.col("win.start").alias("bucket_ts"),
            "sum_v",
            "min_v",
            "max_v",
            "cnt",
            (F.col("sum_v") / F.col("cnt")).alias("avg_v"),
        )
    )


def stream_sessions(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour",
    key: str = "source",
) -> DataFrame:
    """Streaming sessionization via Spark's native ``session_window``:
    dynamic-length merging windows per key, closed ``gap`` after the last
    event, finalized by the watermark (state for a session is dropped once
    the watermark passes its close — bounded state for unbounded keys,
    which the fixed tumbling window of ``stream_tier1`` cannot express).

    Same schema in batch: calling this on a static DataFrame (no watermark
    needed) computes identical sessions — pinned by
    tests/test_streaming.py against the window-scan batch formulation
    the gate's q46 uses."""
    grouped = events
    if events.isStreaming:
        grouped = events.withWatermark("event_ts", watermark)
    return (
        grouped.groupBy(F.col(key), F.session_window("event_ts", gap).alias("sess"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum("v").alias("sum_v"),
        )
        .select(
            key,
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "n_events",
            "sum_v",
        )
    )


def stream_to_tier_table(
    events: DataFrame, table_path: str, checkpoint_dir: str,
    watermark: str = "10 minutes", bucket: str = "1 minute",
):
    """Append-mode streaming query merging finalized buckets into the tier
    table (idempotent keyed merge per micro-batch)."""
    from workbook_exporter_fe_spark.operators.merge import merge_upsert_path

    t1 = stream_tier1(events, watermark, bucket)

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        merge_upsert_path(
            batch_df.sparkSession, table_path, batch_df, ["source", "bucket_ts"]
        )

    return (
        t1.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(sink)
        .start()
    )


def stream_tiers_from_snapshot_log(
    spark, table_root: str, tier1_path: str, checkpoint_dir: str,
    watermark: str = "10 minutes", bucket: str = "1 minute",
):
    """Continuous tier-1 maintenance by TAILING the tier-0 SnapshotTable.

    The batch consumer (plans/pipeline.py run_from_snapshots) polls
    ``changes()`` per call; this is the same loop as a standing
    Structured Streaming query over the ``snapshot_log`` source
    (sources/snapshot_source.py): offsets are snapshot sequences, each
    micro-batch reads only the files the producer appended, and the
    foreachBatch keyed merge keeps the tier table idempotent — so a
    restarted query replays from Spark's checkpoint without
    double-counting buckets. Compactions on the producer side are
    invisible (replace snapshots are skipped by the source)."""
    from workbook_exporter_fe_spark.sources import snapshot_source

    snapshot_source.register(spark)
    events = (
        spark.readStream.format(snapshot_source.FORMAT_NAME).load(table_root)
    )
    if dict(events.dtypes).get("event_ts") == "timestamp_ntz":
        # watermarks need a plain timestamp; sessions are UTC-pinned
        events = events.withColumn(
            "event_ts", F.col("event_ts").cast("timestamp")
        )
    return stream_to_tier_table(
        events, tier1_path, checkpoint_dir, watermark, bucket
    )
