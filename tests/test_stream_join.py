"""Streaming dedup (dropDuplicatesWithinWatermark) + stream-stream
interval join: streamed results must equal the batch formulation."""

from __future__ import annotations

from pyspark.sql import functions as F

from workbook_exporter_fe_spark.streaming.stream_join import (
    stream_dedup,
    stream_interval_join,
)
from workbook_exporter_fe_spark.streaming.stream_rollup import EVENT_SCHEMA


def _run_to_memory(df, name, mode="append"):
    q = df.writeStream.outputMode(mode).format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return df.sparkSession.table(name)


def test_stream_dedup_drops_redeliveries(spark, events, tmp_path):
    src = str(tmp_path / "events")
    base = events.select(
        "source", F.col("event_ts").cast("timestamp"), "v", "doc_id"
    ).limit(2000)
    # land the batch TWICE (simulated at-least-once redelivery)
    base.write.mode("overwrite").parquet(src)
    base.write.mode("append").parquet(src)
    assert spark.read.parquet(src).count() == 2 * base.count()

    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
    got = _run_to_memory(stream_dedup(stream), "dedup_stream")
    want = stream_dedup(spark.read.parquet(src))  # batch fallback path
    assert got.count() == base.count()
    gset = {tuple(r) for r in got.collect()}
    wset = {tuple(r) for r in want.collect()}
    assert gset == wset


def test_stream_interval_join_matches_batch(spark, events, tmp_path):
    lsrc, rsrc = str(tmp_path / "left"), str(tmp_path / "right")
    left = events.select(
        "source", F.col("event_ts").cast("timestamp"), "v", "doc_id"
    ).limit(1500)
    # right stream: the same keyed stream shifted forward 90s (so each left
    # row has a deterministic set of in-interval partners)
    right = left.select(
        "source",
        (F.col("event_ts") + F.expr("interval 90 seconds")).alias("r_ts"),
        F.col("v").alias("r_v"),
        F.col("doc_id").alias("r_doc"),
    )
    left.write.mode("overwrite").parquet(lsrc)
    right.write.mode("overwrite").parquet(rsrc)

    ls = spark.readStream.schema(EVENT_SCHEMA).parquet(lsrc)
    rs = spark.readStream.schema(
        "source string, r_ts timestamp, r_v double, r_doc string"
    ).parquet(rsrc)
    got = _run_to_memory(
        stream_interval_join(ls, rs, after="5 minutes"), "ij_stream"
    )
    want = stream_interval_join(
        spark.read.parquet(lsrc), spark.read.parquet(rsrc), after="5 minutes"
    )
    assert got.count() == want.count() > 0
    cols = ["source", "event_ts", "doc_id", "r_ts", "r_doc"]
    gset = {tuple(r) for r in got.select(cols).collect()}
    wset = {tuple(r) for r in want.select(cols).collect()}
    assert gset == wset
