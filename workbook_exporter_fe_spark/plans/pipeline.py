"""The tier-cascade pipeline: resumable, manifest-tracked, idempotent.

Replaces the reference's output-file-as-state pattern (re-read the YAML,
anti-join, merge, rewrite — /root/reference/workbook_exporter-fe.py:1732-1767)
with explicit *table* state:

- every stage writes a partitioned parquet tier table via an idempotent
  merge keyed on (source, bucket_ts) — re-running a completed stage is a
  no-op on the data;
- a JSON-lines **manifest** records per-stage lineage + metrics (rows
  in/out, per-source partition rows, encode ratio, watermark position,
  wall time) — the engine's equivalent of an Iceberg metadata table;
- **resume**: a stage whose manifest entry is `done` for the same run
  fingerprint is skipped; a crash mid-stage leaves either no output swap
  (staging dir) or a completed entry, so re-running converges.

Scale: stages communicate only through partitioned tables; the manifest is
tiny driver-side JSON (one row per stage × source), so no collect() of data
ever happens. On a real cluster the manifest becomes an Iceberg table and
the staging-swap becomes a MERGE INTO snapshot commit.
"""

from __future__ import annotations

import datetime as _dt
import json
import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from workbook_exporter_fe_spark.functions.spark_codecs import compress_tier
from workbook_exporter_fe_spark.operators.eventize import eventize
from workbook_exporter_fe_spark.operators.merge import merge_upsert_path
from workbook_exporter_fe_spark.operators.tiers import reaggregate, rollup_tier1


@dataclass
class Manifest:
    """Append-only JSON-lines stage ledger (driver-side, tiny)."""

    path: str
    entries: list[dict] = field(default_factory=list)

    def __post_init__(self):
        if os.path.exists(self.path):
            with open(self.path) as f:
                self.entries = [json.loads(line) for line in f if line.strip()]

    def done(self, run_fp: str, stage: str) -> bool:
        return any(
            e["run_fp"] == run_fp and e["stage"] == stage and e["status"] == "done"
            for e in self.entries
        )

    def last_watermark(self, stage: str):
        """Most recent recorded watermark for a stage (any run), parsed back
        to a datetime — the cross-run frontier for the late-event bound."""
        from datetime import datetime

        best = None
        for e in self.entries:
            if e.get("stage") != stage or e.get("status") != "done":
                continue
            raw = e.get("watermark")
            if not raw or raw == "None":
                continue
            try:
                ts = datetime.fromisoformat(str(raw))
            except ValueError:
                continue
            if best is None or ts > best:
                best = ts
        return best

    def record(self, **entry) -> None:
        entry.setdefault("ts", time.time())
        self.entries.append(entry)
        os.makedirs(os.path.dirname(self.path), exist_ok=True)
        with open(self.path, "a") as f:
            f.write(json.dumps(entry, default=str) + "\n")


_PY_EPOCH = _dt.datetime(1970, 1, 1)


def _parse_ts(x) -> _dt.datetime:
    return _dt.datetime.fromisoformat(x) if isinstance(x, str) else x


# calendar arithmetic on the naive datetime, NOT .timestamp():
# .timestamp() reads a naive datetime in the host's LOCAL zone, while the
# Spark-side window literals are interpreted in the UTC-pinned session —
# on a non-UTC host the two would disagree and backfill would delete and
# recompute the wrong tier buckets (shifted by the UTC offset)
def _floor(ts: _dt.datetime, sec: int) -> _dt.datetime:
    e = int((ts - _PY_EPOCH).total_seconds())
    return _PY_EPOCH + _dt.timedelta(seconds=e - e % sec)


def _ceil(ts: _dt.datetime, sec: int) -> _dt.datetime:
    e = int((ts - _PY_EPOCH).total_seconds())
    return _PY_EPOCH + _dt.timedelta(seconds=e + (-e) % sec)


def _per_source_counts(df: DataFrame) -> dict[str, int]:
    return {r["source"]: r["n"] for r in df.groupBy("source").agg(F.count("*").alias("n")).collect()}


class TierPipeline:
    """sequences → tier-0 events → 1m → 1h → 1d → compressed chunks."""

    def __init__(
        self,
        spark: SparkSession,
        out_dir: str,
        salt_buckets: int = 0,
        value_col: str = "avg_v",
        with_sketches: bool = False,
        late_delay: str | None = None,
        with_anomaly: bool = False,
    ):
        self.spark = spark
        self.out = out_dir
        self.salt_buckets = salt_buckets
        self.value_col = value_col
        self.with_sketches = with_sketches
        self.late_delay = late_delay
        self.with_anomaly = with_anomaly
        self.manifest = Manifest(os.path.join(out_dir, "_manifest", "manifest.jsonl"))

    def _stage(self, run_fp: str, stage: str, build, out_path: str, keys: list[str]):
        """Run one stage idempotently: skip if done, else build → merge → log."""
        if self.manifest.done(run_fp, stage):
            return self.spark.read.parquet(out_path)
        t0 = time.perf_counter()
        df = build()
        # tier tables are (source, …)-keyed → partition-scoped merge: only
        # the sources present in this batch are rewritten
        merge_upsert_path(
            self.spark, out_path, df, keys,
            partition_col="source" if "source" in keys else None,
        )
        result = self.spark.read.parquet(out_path)
        # one job for both stage metrics (count + watermark), not two scans
        wm_col = keys[-1] if "bucket_ts" not in keys else "bucket_ts"
        rows_out, wm = result.agg(F.count("*"), F.max(wm_col)).collect()[0]
        self.manifest.record(
            run_fp=run_fp,
            stage=stage,
            status="done",
            rows_out=rows_out,
            partitions=_per_source_counts(result) if "source" in result.columns else {},
            watermark=str(wm),
            wall_sec=round(time.perf_counter() - t0, 3),
        )
        return result

    def run(self, sequences: DataFrame, run_fp: str) -> dict[str, DataFrame]:
        """Execute (or resume) the full cascade; returns the tier tables."""
        out: dict[str, DataFrame] = {}

        events = self._stage(
            run_fp,
            "t0_eventize",
            lambda: eventize(sequences).select("source", "event_ts", "v", "doc_id"),
            f"{self.out}/events",
            ["source", "doc_id"],
        )
        out["events"] = events

        if self.late_delay:
            # batch watermark: events behind (high-water - delay) never
            # reach the rollup, so finalized buckets stay finalized under
            # out-of-order re-deliveries (operators/retention.py). The
            # frontier is monotone ACROSS runs: the last manifest-recorded
            # watermark is fed back in, so replaying old data can never
            # lower the cutoff and reopen finalized buckets.
            from workbook_exporter_fe_spark.operators.retention import (
                bound_late_events,
            )

            prior_wm = self.manifest.last_watermark("late_bound")
            events, wm = bound_late_events(events, self.late_delay, prior_wm=prior_wm)
            if not self.manifest.done(run_fp, "late_bound"):
                self.manifest.record(
                    run_fp=run_fp,
                    stage="late_bound",
                    status="done",
                    rows_out=events.count(),
                    watermark=str(wm),
                    wall_sec=0.0,
                )

        t1 = self._stage(
            run_fp,
            "tier1_1m",
            lambda: rollup_tier1(events, salt_buckets=self.salt_buckets),
            f"{self.out}/tier1",
            ["source", "bucket_ts"],
        )
        out["tier1"] = t1

        t2 = self._stage(
            run_fp, "tier2_1h", lambda: reaggregate(t1, "1h"), f"{self.out}/tier2",
            ["source", "bucket_ts"],
        )
        out["tier2"] = t2

        t3 = self._stage(
            run_fp, "tier3_1d", lambda: reaggregate(t2, "1d"), f"{self.out}/tier3",
            ["source", "bucket_ts"],
        )
        out["tier3"] = t3

        if self.with_sketches:
            # Non-decomposable aggregates (distinct keys, percentiles) ride
            # beside the sum/min/max tiers as mergeable sketch tables —
            # coarser tiers re-merge sketches, never rescan tier-0.
            from workbook_exporter_fe_spark.operators.tiers import (
                sketch_reaggregate,
                sketch_tier1,
            )

            s1 = self._stage(
                run_fp,
                "sketch1_1m",
                lambda: sketch_tier1(events),
                f"{self.out}/sketch1",
                ["source", "bucket_ts"],
            )
            out["sketch1"] = s1
            s2 = self._stage(
                run_fp,
                "sketch2_1h",
                lambda: sketch_reaggregate(s1, "1h"),
                f"{self.out}/sketch2",
                ["source", "bucket_ts"],
            )
            out["sketch2"] = s2
            out["sketch3"] = self._stage(
                run_fp,
                "sketch3_1d",
                lambda: sketch_reaggregate(s2, "1d"),
                f"{self.out}/sketch3",
                ["source", "bucket_ts"],
            )

        if self.with_anomaly:
            # Rolling z-score outlier tier beside tier-1 (operators/rates):
            # per-(source, bucket) flag from a bounded trailing frame over
            # the tier table — tier-sized input, one window pass.
            from workbook_exporter_fe_spark.operators.rates import anomaly_zscore

            out["anomaly1"] = self._stage(
                run_fp,
                "anomaly_1m",
                lambda: anomaly_zscore(
                    t1.select("source", "bucket_ts", "avg_v"), n=30, threshold=3.0
                ),
                f"{self.out}/anomaly1",
                ["source", "bucket_ts"],
            )

        chunks_path = f"{self.out}/chunks"
        if not self.manifest.done(run_fp, "compress"):
            t0c = time.perf_counter()
            chunks = compress_tier(t1, value_col=self.value_col)
            merge_upsert_path(
                self.spark, chunks_path, chunks, ["source", "segment_start"],
                partition_col="source",
            )
            persisted = self.spark.read.parquet(chunks_path)
            # ONE aggregate action for all chunk metrics — per-chunk
            # collect() would pull (source, segment)-granular rows to the
            # driver (millions at 100 TB) and a separate count() would
            # re-read the table
            m = persisted.agg(
                F.sum("n_points").alias("points"),
                F.sum(
                    F.octet_length("ts_payload")
                    + F.octet_length("v_payload")
                ).alias("encoded_bytes"),
                F.count("*").alias("rows"),
            ).first()
            pts, enc = m["points"] or 0, m["encoded_bytes"] or 0
            self.manifest.record(
                run_fp=run_fp,
                stage="compress",
                status="done",
                rows_out=m["rows"],
                points=pts,
                encode_ratio=round(enc / (16.0 * pts), 4) if pts else None,
                wall_sec=round(time.perf_counter() - t0c, 3),
            )
        out["chunks"] = self.spark.read.parquet(chunks_path)
        self._write_metrics_table()
        return out

    def backfill(self, events: DataFrame, start, end, run_fp: str) -> dict:
        """Correction backfill: REPLACE every tier bucket in [start, end)
        with a recompute from the supplied events.

        This is the repair path the additive refresh (`run_incremental`)
        cannot express: additive merges can only ADD partial aggregates,
        but a correction (bad scrape, re-ingested day, retracted docs)
        must also delete what is no longer there. Semantics: within the
        window the tables become exactly what a from-scratch run over
        ``events`` would produce — tier-1 buckets in the minute-aligned
        window are replaced wholesale; the hour/day buckets COVERING the
        window are recomputed from the post-merge tier-1 over their full
        extent (so a partial-hour backfill still yields exact hours); the
        (source, day) chunk segments overlapping the window are
        re-encoded the same way. Outside the window nothing changes, and
        backfilling with identical data is a bit-exact no-op (pinned in
        tests). Each table swap is the recoverable staged pattern; at
        100 TB with day-partitioned tiers every window replace becomes a
        partition DELETE+INSERT instead of the table rewrite here.

        ``start``/``end``: ISO strings or datetimes, inclusive/exclusive.
        Returns per-table replaced-row counts for the manifest.
        """
        lo, hi = _parse_ts(start), _parse_ts(end)
        if hi <= lo:
            raise ValueError("backfill needs end > start")
        t0 = time.perf_counter()

        def _win(df, ts_col, a, b):
            c = F.col(ts_col).cast("timestamp")
            return df.filter((c >= F.lit(a)) & (c < F.lit(b)))

        def _replace_window(path: str, new_rows: DataFrame, ts_col: str,
                            a, b) -> int:
            import shutil

            if os.path.exists(path):
                c = F.col(ts_col).cast("timestamp")
                keep = self.spark.read.parquet(path).filter(
                    ~((c >= F.lit(a)) & (c < F.lit(b)))
                )
                merged = keep.unionByName(new_rows.select(*keep.columns))
            else:
                merged = new_rows
            n_new = new_rows.count()
            staging = path + ".staging"
            merged.write.mode("overwrite").parquet(staging)
            if os.path.exists(path):
                os.rename(path, path + "__old")
                os.rename(staging, path)
                shutil.rmtree(path + "__old")
            else:
                os.rename(staging, path)
            return n_new

        stats: dict = {}
        lo_m, hi_m = _floor(lo, 60), _ceil(hi, 60)
        t1_slice = rollup_tier1(
            _win(events, "event_ts", lo_m, hi_m),
            salt_buckets=self.salt_buckets,
        )
        stats["tier1"] = _replace_window(
            f"{self.out}/tier1", t1_slice, "bucket_ts", lo_m, hi_m
        )
        t1 = self.spark.read.parquet(f"{self.out}/tier1")

        lo_h, hi_h = _floor(lo, 3600), _ceil(hi, 3600)
        t2_slice = reaggregate(_win(t1, "bucket_ts", lo_h, hi_h), "1h")
        stats["tier2"] = _replace_window(
            f"{self.out}/tier2", t2_slice, "bucket_ts", lo_h, hi_h
        )
        t2 = self.spark.read.parquet(f"{self.out}/tier2")

        lo_d, hi_d = _floor(lo, 86400), _ceil(hi, 86400)
        t3_slice = reaggregate(_win(t2, "bucket_ts", lo_d, hi_d), "1d")
        stats["tier3"] = _replace_window(
            f"{self.out}/tier3", t3_slice, "bucket_ts", lo_d, hi_d
        )

        chunks_path = f"{self.out}/chunks"
        if os.path.exists(chunks_path):
            ch_slice = compress_tier(
                _win(t1, "bucket_ts", lo_d, hi_d), value_col=self.value_col
            )
            stats["chunks"] = _replace_window(
                chunks_path, ch_slice, "segment_start", lo_d, hi_d
            )

        self.manifest.record(
            run_fp=run_fp,
            stage="backfill",
            status="done",
            window=[str(lo), str(hi)],
            rows_out=sum(stats.values()),
            partitions=stats,
            wall_sec=round(time.perf_counter() - t0, 3),
        )
        return stats

    def verify(self) -> dict:
        """Cross-tier invariant audit over the STORED tables; records a
        `verify` row in the manifest and returns the check dict.

        The data-quality checks a continuous-aggregate pipeline must keep
        true at all times (north rule: every emitted point matches across
        tiers; resumable tables must stay internally consistent):

        - tier2 == reaggregate(tier1, '1h') and tier3 == reaggregate(tier2,
          '1d'), bit-for-bit (decomposability is not assumed — it is
          re-checked against what is on disk);
        - chunks decode back to tier-1's finalized values exactly (codec
          round-trip on the stored bytes, not in-memory ones);
        - no duplicate (source, bucket_ts) keys in any tier (merge
          idempotency held).
        Each check is one exceptAll/groupBy job over tier-sized tables.

        After an ``expire_tiers`` run the tiers deliberately cover
        different horizons (fine tiers expire first), so each cross-tier
        check is scoped to the range where BOTH tiers are retained: the
        fine tier's recorded cutoff (operators/retention.read_cutoffs),
        rounded UP to the next full coarse bucket so partially-expired
        boundary buckets are excluded. A never-expired store verifies the
        full range, as before.
        """
        from datetime import timedelta

        from workbook_exporter_fe_spark.functions.spark_codecs import (
            decompress_chunks,
        )
        from workbook_exporter_fe_spark.operators.retention import read_cutoffs

        r = self.spark.read
        t1 = r.parquet(f"{self.out}/tier1")
        t2 = r.parquet(f"{self.out}/tier2")
        t3 = r.parquet(f"{self.out}/tier3")
        cuts = read_cutoffs(self.out)
        checks: dict = {}

        def _equal(a: DataFrame, b: DataFrame) -> bool:
            cols = sorted(a.columns)
            a, b = a.select(*cols), b.select(*cols)
            return (
                a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()
            )

        def _ceil(cut, unit: str):
            """Smallest coarse-bucket start fully above the cutoff."""
            if unit == "1h":
                floor = cut.replace(minute=0, second=0, microsecond=0)
                return floor + timedelta(hours=1)
            floor = cut.replace(hour=0, minute=0, second=0, microsecond=0)
            return floor + timedelta(days=1)

        def _scope(fine, coarse, fine_cut, unit):
            if fine_cut is None:
                return fine, coarse
            lo = _ceil(fine_cut, unit)
            trunc = "hour" if unit == "1h" else "day"
            return (
                fine.filter(F.date_trunc(trunc, "bucket_ts") >= F.lit(lo)),
                coarse.filter(F.col("bucket_ts") >= F.lit(lo)),
            )

        s1, s2 = _scope(t1, t2, cuts.get("tier1"), "1h")
        checks["tier2_equals_reagg_tier1"] = _equal(s2, reaggregate(s1, "1h"))
        s2b, s3 = _scope(t2, t3, cuts.get("tier2"), "1d")
        checks["tier3_equals_reagg_tier2"] = _equal(s3, reaggregate(s2b, "1d"))

        chunks = r.parquet(f"{self.out}/chunks")
        decoded = decompress_chunks(chunks, value_col=self.value_col).select(
            "source",
            F.col("bucket_ts").cast(dict(t1.dtypes)["bucket_ts"]).alias("bucket_ts"),
            self.value_col,
        )
        stored = t1.select("source", "bucket_ts", self.value_col)
        t1_cut = cuts.get("tier1")
        if t1_cut is not None:
            # chunks keep whole (source, day) segments; compare only rows
            # the expired tier-1 still holds (strict > matches
            # apply_retention's filter)
            decoded = decoded.filter(F.col("bucket_ts") > F.lit(t1_cut))
            stored = stored.filter(F.col("bucket_ts") > F.lit(t1_cut))
        checks["chunks_roundtrip_tier1"] = _equal(decoded, stored)

        for name, tier in (("tier1", t1), ("tier2", t2), ("tier3", t3)):
            dups = (
                tier.groupBy("source", "bucket_ts")
                .count()
                .filter(F.col("count") > 1)
                .isEmpty()
            )
            checks[f"{name}_keys_unique"] = dups
        checks["ok"] = all(checks.values())
        self.manifest.record(
            run_fp="verify", stage="verify",
            status="done" if checks["ok"] else "FAILED", **{
                k: v for k, v in checks.items() if k != "ok"
            },
        )
        return checks

    def run_incremental(self, events: DataFrame, run_fp: str) -> dict[str, DataFrame]:
        """Incremental refresh from a tier-0 EVENT batch (production shape:
        events carry real timestamps; the eventize stage of `run` is the
        synthetic-corpus stand-in).

        Every tier combines ADDITIVELY (merge_tier_additive_path): a batch
        carrying partial data for an existing bucket adds into it instead
        of replacing it, so N incremental batches produce bit-identical
        tiers to one full run (pinned by tests/test_pipeline.py). Only the
        work proportional to the BATCH happens:

        - events upsert by (source, doc_id) — partition-scoped;
        - tier1/2/3: the batch's partial rollups additively merged
          (re-aggregation of partials is itself decomposable, so the
          cascade never reads the merged tier below);
        - chunks: only the (source, day) segments the batch touched are
          re-encoded from the merged tier-1 and upserted.
        """
        import time as _time

        from workbook_exporter_fe_spark.operators.merge import (
            merge_tier_additive_path,
        )

        out: dict[str, DataFrame] = {}
        if self.late_delay:
            from workbook_exporter_fe_spark.operators.retention import (
                bound_late_events,
            )

            prior_wm = self.manifest.last_watermark("late_bound")
            events, wm = bound_late_events(events, self.late_delay, prior_wm=prior_wm)
            if not self.manifest.done(run_fp, "late_bound"):
                self.manifest.record(
                    run_fp=run_fp, stage="late_bound", status="done",
                    rows_out=events.count(), watermark=str(wm), wall_sec=0.0,
                )

        def _stage_inc(stage: str, path: str, keys: list[str], apply):
            if self.manifest.done(run_fp, stage):
                return self.spark.read.parquet(path)
            t0 = _time.perf_counter()
            apply(path, keys)
            result = self.spark.read.parquet(path)
            wm_col = "bucket_ts" if "bucket_ts" in keys else keys[-1]
            rows_out, wm = result.agg(F.count("*"), F.max(wm_col)).collect()[0]
            self.manifest.record(
                run_fp=run_fp, stage=stage, status="done", rows_out=rows_out,
                watermark=str(wm),
                wall_sec=round(_time.perf_counter() - t0, 3),
            )
            return result

        out["events"] = _stage_inc(
            "t0_events_inc", f"{self.out}/events", ["source", "doc_id"],
            lambda p, k: merge_upsert_path(
                self.spark, p, events, k, partition_col="source"
            ),
        )

        partial1 = rollup_tier1(events, salt_buckets=self.salt_buckets)
        out["tier1"] = _stage_inc(
            "tier1_inc", f"{self.out}/tier1", ["source", "bucket_ts"],
            lambda p, k: merge_tier_additive_path(self.spark, p, partial1, k),
        )
        partial2 = reaggregate(partial1, "1h")
        out["tier2"] = _stage_inc(
            "tier2_inc", f"{self.out}/tier2", ["source", "bucket_ts"],
            lambda p, k: merge_tier_additive_path(self.spark, p, partial2, k),
        )
        partial3 = reaggregate(partial2, "1d")
        out["tier3"] = _stage_inc(
            "tier3_inc", f"{self.out}/tier3", ["source", "bucket_ts"],
            lambda p, k: merge_tier_additive_path(self.spark, p, partial3, k),
        )

        # re-encode ONLY the (source, day) segments this batch touched,
        # reading exact merged values from tier-1
        chunks_path = f"{self.out}/chunks"
        if not self.manifest.done(run_fp, "compress_inc"):
            t0c = _time.perf_counter()
            affected = partial1.select(
                "source", F.date_trunc("day", "bucket_ts").alias("_seg")
            ).distinct()
            t1 = out["tier1"].withColumn(
                "_seg", F.date_trunc("day", "bucket_ts")
            )
            sliced = t1.join(F.broadcast(affected), ["source", "_seg"]).drop("_seg")
            chunks = compress_tier(sliced, value_col=self.value_col)
            merge_upsert_path(
                self.spark, chunks_path, chunks, ["source", "segment_start"],
                partition_col="source",
            )
            self.manifest.record(
                run_fp=run_fp, stage="compress_inc", status="done",
                rows_out=self.spark.read.parquet(chunks_path).count(),
                wall_sec=round(_time.perf_counter() - t0c, 3),
            )
        # rolling-anomaly tier: windows are NOT additive (trailing 30-row
        # frames), so recompute — but only the SOURCES this batch touched,
        # reading the merged tier-1 (partition-scoped upsert keeps every
        # untouched source's files in place).
        if self.with_anomaly and not self.manifest.done(run_fp, "anomaly_inc"):
            from workbook_exporter_fe_spark.operators.rates import anomaly_zscore

            t0a = _time.perf_counter()
            touched = partial1.select("source").distinct()
            recomputed = anomaly_zscore(
                out["tier1"]
                .join(F.broadcast(touched), "source")
                .select("source", "bucket_ts", "avg_v"),
                n=30,
                threshold=3.0,
            )
            merge_upsert_path(
                self.spark, f"{self.out}/anomaly1", recomputed,
                ["source", "bucket_ts"], partition_col="source",
            )
            self.manifest.record(
                run_fp=run_fp, stage="anomaly_inc", status="done",
                rows_out=self.spark.read.parquet(f"{self.out}/anomaly1").count(),
                wall_sec=round(_time.perf_counter() - t0a, 3),
            )
        if self.with_anomaly:
            out["anomaly1"] = self.spark.read.parquet(f"{self.out}/anomaly1")

        out["chunks"] = self.spark.read.parquet(chunks_path)
        self._write_metrics_table()
        return out

    def run_from_snapshots(self, table) -> dict[str, DataFrame] | None:
        """Catch the tiers up to a SnapshotTable of tier-0 events
        (sources/snapshots.py) — the engine's "consume the Iceberg
        table incrementally" loop.

        The manifest records the last CONSUMED snapshot sequence; each
        call reads only the rows appended since (``table.changes`` — the
        manifest file-set diff, no re-scan of consumed files) and folds
        them through ``run_incremental`` (additive merges, so N catch-up
        calls ≡ one full run bit-for-bit). Returns None when there is
        nothing new — a no-op heartbeat, no Spark job beyond the driver-
        side manifest read. A non-append snapshot in the gap raises
        ``IncrementalScanBreak`` (see snapshots.py): additive tiers
        cannot un-merge rewritten history, so the caller rebuilds.

        Crash-safety: the consumed-sequence row is recorded AFTER
        ``run_incremental`` completes; a crash mid-refresh replays the
        same change range under the same run fingerprint, and the
        per-stage manifest rows make the replay skip finished stages.
        """
        cur = table.current_sequence()
        last = 0
        for e in self.manifest.entries:
            if (
                e.get("stage") == "snapshot_consume"
                and e.get("status") == "done"
            ):
                last = max(last, int(e.get("sequence", 0)))
        if cur == last:
            return None
        batch = table.changes(last, cur)
        run_fp = f"snap:{last + 1}-{cur}"
        out = self.run_incremental(batch, run_fp)
        self.manifest.record(
            run_fp=run_fp,
            stage="snapshot_consume",
            status="done",
            sequence=cur,
            consumed_from=last,
        )
        return out

    def _write_metrics_table(self) -> None:
        """Mirror the JSONL manifest as a queryable parquet metrics table —
        the hive-fallback analog of the north rule's Iceberg metadata
        table (on Iceberg, this becomes an append to a metadata table)."""
        rows = [
            {
                "run_fp": e.get("run_fp"),
                "stage": e.get("stage"),
                "status": e.get("status"),
                "rows_out": e.get("rows_out"),
                "watermark": str(e.get("watermark")),
                "wall_sec": float(e.get("wall_sec", 0.0)),
                "encode_ratio": float(e["encode_ratio"]) if e.get("encode_ratio") is not None else None,
                "partitions_json": json.dumps(e.get("partitions", {})),
                "ts": float(e.get("ts", 0.0)),
            }
            for e in self.manifest.entries
        ]
        if not rows:
            return
        schema = (
            "run_fp string, stage string, status string, rows_out long, "
            "watermark string, wall_sec double, encode_ratio double, "
            "partitions_json string, ts double"
        )
        self.spark.createDataFrame(rows, schema=schema).write.mode(
            "overwrite"
        ).parquet(f"{self.out}/_manifest/metrics")


def publish_snapshot_tiers(
    spark: SparkSession,
    out: str,
    tier_names: tuple[str, ...] = ("tier1", "tier2", "tier3"),
    changed: DataFrame | None = None,
    spec: tuple[str, ...] = ("day(bucket_ts)", "source"),
) -> dict:
    """Publish the pipeline's parquet tier dirs as SnapshotTables with
    hidden partitioning ``[day(bucket_ts), source]`` — the SERVING store
    (r5, VERDICT r4 item #3).

    The pipeline's own parquet dirs stay the resumable working state;
    this snapshots them under ``{out}/snapshot_tiers/{tier}`` so the
    PromQL MetricStore's lazy loader (run_rules.build_store) can prune
    files from the manifest alone: a query_range over one day of a
    year-long tier-1 opens ~that day's files (per-file min/max stats AND
    the day() partition transform both skip, before Spark lists
    anything). A full publish is one ``overwrite`` commit — prior
    publishes stay time-travelable and expire via normal snapshot
    retention.

    ``changed`` (r5): a relation carrying the rows FOLDED this run —
    any (source, some timestamp column) shape, e.g. the incremental
    batch's events. With it (and an already-published store), each
    tier's publish becomes a DYNAMIC PARTITION OVERWRITE
    (SnapshotTable.overwrite_partitions) touching only the changed
    partitions: a batch that landed 3 days × 5 sources republishes
    those partitions, never the tier — the O(delta) publish a 100 TB
    continuous aggregate needs.

    Delta scoping is TUPLE-correct for any ``spec``: the batch rows are
    re-expressed as (source, bucket_ts) proxies and pushed through the
    SPEC'S OWN derived partition columns, and the delta is every tier
    row whose partition tuple matches — never a raw (source, day)
    filter. That matters for bucketed specs: with ``bucket(64; source)``
    a partition holds MANY sources, and overwrite_partitions replaces
    whole partitions, so the delta must carry the untouched
    bucket-mates' rows too (pinned in tests). day()/month() scoping is
    sound for every tier granularity because 1m/1h/1d buckets truncate
    WITHIN the event's calendar unit; an hour() spec field would not
    cover tier-3's day-floored buckets, so it forces a full republish.

    ``spec`` sets the partition layout at FIRST publish (an existing
    store keeps its own spec property). At bounded source cardinality
    the default [day(bucket_ts), source] is right; at web-scale source
    cardinality use ``('day(bucket_ts)', 'bucket(64, source)')`` so the
    partition count stays day-bounded.
    """
    from workbook_exporter_fe_spark.sources.partitioning import (
        PCOL_PREFIX,
        parse_spec,
        partition_columns,
    )
    from workbook_exporter_fe_spark.sources.snapshots import SnapshotTable

    proxy = None
    if changed is not None:
        ts_col = "event_ts" if "event_ts" in changed.columns else "bucket_ts"
        proxy = changed.select(
            F.col("source"),
            F.col(ts_col).cast("timestamp").alias("bucket_ts"),
        )
    info: dict = {}
    for name in tier_names:
        src = f"{out}/{name}"
        if not os.path.exists(src):
            continue
        root = f"{out}/snapshot_tiers/{name}"
        table = SnapshotTable(spark, root)
        if table.current_sequence() == 0:
            table.set_properties(**{"partition.spec": list(spec)})
        df = spark.read.parquet(src)
        fields = parse_spec(
            list(table.properties().get("partition.spec") or [])
        )
        scoped = (
            proxy is not None
            and table.current_sequence() > 0
            and fields
            and all(f.transform != "hour" for f in fields)
        )
        if scoped:
            pcols = [PCOL_PREFIX + f.name for f in fields]
            tuples = (
                proxy.select(*partition_columns(proxy, fields)).distinct()
            )
            delta = (
                df.select("*", *partition_columns(df, fields))
                .join(F.broadcast(tuples), pcols, "left_semi")
                .drop(*pcols)
            )
            rep = table.overwrite_partitions(
                delta, summary={"published_from": src}
            )
            info[name] = {
                "root": root,
                "sequence": rep["sequence"],
                "files": len(table.snapshot()["files"]),
                "partitions_replaced": rep["partitions"],
                "files_replaced": rep["files_replaced"],
            }
            continue
        seq = table.commit(
            df, mode="overwrite", summary={"published_from": src}
        )
        info[name] = {
            "root": root,
            "sequence": seq,
            "files": len(table.snapshot()["files"]),
        }
    return info
