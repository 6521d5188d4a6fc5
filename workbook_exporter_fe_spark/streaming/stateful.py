"""Custom stateful streaming operator: applyInPandasWithState.

Running per-source statistics (count / running sum / watermark-high) kept in
explicit state across micro-batches — the streaming generalization of the
reference's cross-request mutable state (the global port counter + the
output-file-as-state pattern, reference :1664-1667, :1732-1767), with state
made explicit, keyed, and fault-tolerant instead of hidden in globals.

Scale: state is one tuple per source (64 sources → trivially bounded);
GroupStateTimeout is left off because the key domain is fixed. For unbounded
key domains use event-time timeout + watermark eviction.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "source string, batch_events long, total_events long, total_v double, max_ts timestamp"
STATE_SCHEMA = "total_events long, total_v double"


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    total_events, total_v = state.get if state.exists else (0, 0.0)
    batch_events, batch_v, max_ts = 0, 0.0, None
    for pdf in pdfs:
        batch_events += len(pdf)
        batch_v += float(pdf["v"].sum())
        m = pdf["event_ts"].max()
        max_ts = m if max_ts is None else max(max_ts, m)
    total_events += batch_events
    total_v += batch_v
    state.update((total_events, total_v))
    yield pd.DataFrame(
        {
            "source": [key[0]],
            "batch_events": [batch_events],
            "total_events": [total_events],
            "total_v": [total_v],
            "max_ts": [max_ts],
        }
    )


def running_source_stats(events):
    """Streaming DF of per-source running totals (update-mode output)."""
    return events.groupBy("source").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# transformWithStateInPandas (Spark 4 arbitrary-stateful-processing v2):
# streaming counter-rate. The batch operator (operators/rates.py:
# counter_deltas) needs each sample's predecessor; across micro-batches the
# predecessor of a batch's FIRST sample lives in the previous batch, so the
# stateful processor keeps one (last_ts, last_v) tuple per source in a
# ValueState (RocksDB-backed) and the in-batch part stays vectorized numpy.
# State is O(1) per key — the minimal-state streaming form of the lag
# window, same contract as the batch op (pinned equal in
# tests/test_stream_rates.py across multi-batch replays).
# ---------------------------------------------------------------------------

RATE_OUTPUT_SCHEMA = (
    "source string, event_ts timestamp, doc_id string, v double, "
    "delta double, rate_ps double"
)


def _rate_processor_cls():
    """Deferred import: StatefulProcessor only exists on Spark ≥ 4.0."""
    import numpy as np
    from pyspark.sql.streaming import StatefulProcessor

    class CounterRateProcessor(StatefulProcessor):
        def init(self, handle):
            self._last = handle.getValueState(
                "last", "last_ts timestamp, last_v double"
            )

        def handleInputRows(self, key, rows, timerValues):
            pdf = pd.concat(list(rows), ignore_index=True)
            if len(pdf) == 0:
                return
            pdf = pdf.sort_values(["event_ts", "doc_id"], kind="mergesort")
            pdf = pdf.reset_index(drop=True)
            prev = self._last.get() if self._last.exists() else None
            pv = pdf["v"].shift(1)
            pt = pdf["event_ts"].shift(1)
            if prev is not None:
                pv.iloc[0] = prev[1]
                pt.iloc[0] = pd.Timestamp(prev[0])
            v = pdf["v"].to_numpy(dtype=float)
            prev_v = pv.to_numpy(dtype=float)
            delta = np.where(v >= prev_v, v - prev_v, v)
            delta = np.where(np.isnan(prev_v), np.nan, delta)
            dt = (pdf["event_ts"] - pt).dt.total_seconds().to_numpy()
            rate = np.where(dt > 0, delta / dt, np.nan)
            out = pd.DataFrame(
                {
                    "source": key[0],
                    "event_ts": pdf["event_ts"],
                    "doc_id": pdf["doc_id"],
                    "v": v,
                    "delta": delta,
                    "rate_ps": rate,
                }
            )
            self._last.update(
                (pdf["event_ts"].iloc[-1].to_pydatetime(), float(v[-1]))
            )
            yield out

        def close(self):
            pass

    return CounterRateProcessor


def stream_counter_rate(events):
    """Streaming counter rate via transformWithStateInPandas.

    ``events`` is a streaming DF (source, event_ts, v, doc_id); output adds
    reset-adjusted delta and per-second rate, with cross-batch continuity
    from the per-source ValueState. Requires the RocksDB state store
    provider (set by tests; the default HDFS-backed store does not support
    transformWithState) and `google.protobuf` in the Python env (the JVM
    state server speaks protobuf to the Python driver worker; this
    container ships without it, so the end-to-end test is gated and the
    processor kernel is pinned directly in tests/test_stream_rates.py)."""
    proc = _rate_processor_cls()()
    return events.groupBy("source").transformWithStateInPandas(
        statefulProcessor=proc,
        outputStructType=RATE_OUTPUT_SCHEMA,
        outputMode="Append",
        timeMode="None",
    )
