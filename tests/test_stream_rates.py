"""Streaming counter-rate via transformWithStateInPandas (Spark 4 stateful
v2): multi-micro-batch replay must equal the batch lag-window operator —
the cross-batch ValueState supplies exactly the predecessors the batch
window sees."""

from __future__ import annotations

import math
import os
import time

import pytest
from pyspark.sql import functions as F

from workbook_exporter_fe_spark.operators.rates import rate as batch_rate

ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)

# transformWithStateInPandas speaks protobuf between the JVM state server
# and the Python driver worker; this container ships no google.protobuf
# (and installs are off-limits), so the execution test is gated. The
# operator itself is real and runs wherever pyspark's [connect]/protobuf
# extra is present.
_HAS_PROTOBUF = True
try:  # pragma: no cover - environment probe
    from google.protobuf import descriptor  # noqa: F401
except ImportError:
    _HAS_PROTOBUF = False

needs_protobuf = pytest.mark.skipif(
    not _HAS_PROTOBUF,
    reason="transformWithStateInPandas needs google.protobuf (not in container)",
)


@pytest.fixture()
def rocksdb_state(spark):
    key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(key, None)
    spark.conf.set(key, ROCKSDB)
    yield
    if old is None:
        spark.conf.unset(key)
    else:
        spark.conf.set(key, old)


@needs_protobuf
def test_stream_counter_rate_equals_batch(spark, events, tmp_path, rocksdb_state):
    from workbook_exporter_fe_spark.streaming.stateful import stream_counter_rate

    src = str(tmp_path / "events")
    os.makedirs(src)
    base = (
        events.select("source", F.col("event_ts").cast("timestamp"), "v", "doc_id")
        .orderBy("event_ts", "doc_id")
        .limit(3000)
        .toPandas()
    )
    # three time-ordered files with strictly increasing mtimes → the file
    # source replays them as three micro-batches in time order
    n = len(base)
    for i, lo in enumerate(range(0, n, n // 3 + 1)):
        chunk = base.iloc[lo : lo + n // 3 + 1]
        path = f"{src}/part-{i}.parquet"
        chunk.to_parquet(path, index=False)
        t = time.time() - 100 + i * 10
        os.utime(path, (t, t))

    stream = (
        spark.readStream.schema("source string, event_ts timestamp, v double, doc_id string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = stream_counter_rate(stream)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("rate_stream")
        .start()
    )
    try:
        q.processAllAvailable()
        # at least two progress events → the state really crossed batches
        assert len(q.recentProgress) >= 3
    finally:
        q.stop()

    got = {
        (r["source"], r["doc_id"]): (r["delta"], r["rate_ps"])
        for r in spark.table("rate_stream").collect()
    }
    want_df = batch_rate(
        spark.createDataFrame(base), tiebreak=["doc_id"]
    ).select("source", "doc_id", "delta", "rate_ps")
    want = {
        (r["source"], r["doc_id"]): (r["delta"], r["rate_ps"])
        for r in want_df.collect()
    }
    assert set(got) == set(want)

    def same(a, b):
        a_null = a is None or (isinstance(a, float) and math.isnan(a))
        b_null = b is None or (isinstance(b, float) and math.isnan(b))
        if a_null or b_null:
            return a_null and b_null
        return math.isclose(a, b, rel_tol=1e-12)

    for k, (gd, gr) in got.items():
        wd, wr = want[k]
        assert same(gd, wd) and same(gr, wr), (k, gd, wd, gr, wr)


class _FakeValueState:
    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = v


def test_processor_kernel_cross_batch_continuity():
    """Not gated on protobuf: drive the StatefulProcessor kernel directly
    with a fake ValueState across three 'micro-batches' and pin the result
    to the sequential reference recurrence."""
    import pandas as pd

    from workbook_exporter_fe_spark.streaming.stateful import _rate_processor_cls

    proc = _rate_processor_cls()()
    proc._last = _FakeValueState()

    vals = [5.0, 7.5, 7.0, 9.0, 1.0, 3.0, 2.5, 8.0, 8.0]  # two resets inside
    ts = pd.date_range("2026-01-01", periods=len(vals), freq="15s")
    docs = [f"d{i:03d}" for i in range(len(vals))]
    out = []
    for lo in (0, 3, 6):  # three batches
        pdf = pd.DataFrame(
            {
                "event_ts": ts[lo : lo + 3],
                "doc_id": docs[lo : lo + 3],
                "v": vals[lo : lo + 3],
            }
        )
        for res in proc.handleInputRows(("s0",), iter([pdf]), None):
            out.append(res)
    got = pd.concat(out, ignore_index=True)
    assert list(got["source"].unique()) == ["s0"]
    # reference recurrence over the full series
    import math

    prev = None
    for i, row in got.iterrows():
        v = vals[i]
        if prev is None:
            assert math.isnan(row["delta"]) and math.isnan(row["rate_ps"])
        else:
            want = v - prev if v >= prev else v
            assert row["delta"] == want
            assert row["rate_ps"] == want / 15.0
        prev = v
    # state carries the last sample for a future batch
    assert proc._last.get()[1] == vals[-1]
