"""Streaming ingestion dedup + stream-stream interval joins.

Two more Structured Streaming building blocks the batch engine's
semantics map onto (SURVEY §2: O15/O19's re-read-sink-and-append is the
batch emulation of stateful streaming; these are the streaming-native
forms for the remaining batch idioms):

- ``stream_dedup``: at-least-once sources (Kafka-style replays, file
  redelivery) deduplicated by key within a watermark —
  ``dropDuplicatesWithinWatermark`` keeps per-key state only until the
  watermark passes, so state is bounded by the lateness budget rather
  than the key universe (plain ``dropDuplicates`` on a stream retains
  EVERY key forever — a state leak at corpus scale).
- ``stream_interval_join``: two event streams joined on a key within a
  time interval (the streaming form of the batch binned interval join in
  operators/interval.py). Both sides carry watermarks and the join
  condition bounds event-time distance, so Spark can expire join state:
  each side holds only rows newer than (other side's watermark − bound).

Batch equivalence is part of the contract: running the same relations as
static DataFrames through the same predicates yields identical rows
(pinned in tests/test_stream_join.py), which is what makes backfill
(batch) + tail (stream) safe to mix on one table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_dedup(
    events: DataFrame,
    keys: list[str] | None = None,
    ts_col: str = "event_ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Drop redelivered duplicates by key within the watermark window.

    On a streaming DataFrame uses ``dropDuplicatesWithinWatermark`` so the
    dedup state expires; on a static DataFrame falls back to plain
    ``dropDuplicates`` (batch backfill path, same keys)."""
    keys = keys or ["source", "doc_id"]
    if events.isStreaming:
        return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            keys
        )
    return events.dropDuplicates(keys)


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "source",
    left_ts: str = "event_ts",
    right_ts: str = "r_ts",
    before: str = "0 seconds",
    after: str = "5 minutes",
    watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join rows of ``right`` to each ``left`` row with the same key and
    ``right_ts ∈ [left_ts - before, left_ts + after]``.

    Streaming inputs get watermarks on both sides; the interval condition
    is what lets Spark bound join state (each side's buffered rows expire
    once the other watermark passes the reachable window). Column names
    must be disjoint apart from ``key`` — rename upstream."""
    cond = (
        (left[key] == right[key])
        & (
            F.col(right_ts)
            >= F.col(left_ts) - F.expr(f"interval {before}")
        )
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"interval {after}"))
    )
    lw = left.withWatermark(left_ts, watermark) if left.isStreaming else left
    rw = right.withWatermark(right_ts, watermark) if right.isStreaming else right
    return lw.join(rw, cond, how).drop(right[key])
