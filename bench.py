#!/usr/bin/env python
"""Benchmark harness (driver contract: one JSON line on stdout).

Headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS], plus the engine's north metric: tier-1 rollup
throughput (rolled-up points/sec) over a deterministic synthetic sequences
corpus materialized once (untimed) under /tmp.

Each query is fully materialized through the `noop` sink (no driver
collect, no metadata-only count shortcuts). Timing excludes SparkSession
startup.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from workbook_exporter_fe_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SEQ_N = int(os.environ.get("SPARK_GRAFT_BENCH_SEQ_N", "20000000"))
WORK = os.environ.get("SPARK_GRAFT_BENCH_DIR", "/tmp/spark_graft_bench")

HEADLINE = [
    "q01_scan_agg",
    "q03_join_dims",
    "q13_multibranch_union",
    "q20_tier1_1m",
    "q21_tier23_reagg",
    "q23_gapfill",
    "q64_gapfill_segmented",
    "q61_sketch_cascades",
    "q27_codec_roundtrip",
    "q28_embedding_neardup",
    "q30_dedup_exact",
    "q31_minhash_lsh_pairs",
    "q32_jaccard_pairs",
    "q33_simhash",
    "q34_ann_topk",
    "q55_sequence_packing",
    "q40_cube_rollup_gsets",
    "q46_sessionize",
    "q71_counter_rate",
]


# Quiet-box sentinel values (sec) for queries whose CODE has been frozen
# since round 3 — the r3 artifact was captured on an idle box
# (BENCH/PLANS.md). If these inflate in lockstep the box is contended and
# the capture must not become the round artifact (r4 lesson: the committed
# JSON showed untouched queries at ~1.5× and poisoned the round-over-round
# comparison).
SENTINELS = {
    "q01_scan_agg": 0.606,
    "q03_join_dims": 0.521,
    "q27_codec_roundtrip": 1.911,
}
SENTINEL_RATIO_MAX = 1.2   # VERDICT r4: >1.2× lockstep inflation = do not commit
CONTROL_SCALING_MIN = 0.85


def _cpu_work(_i: int) -> float:
    t0 = time.perf_counter()
    x = 0
    for i in range(8_000_000):
        x += i * i % 7
    return time.perf_counter() - t0


def _contention_control() -> dict:
    """CPU-availability probe, independent of Spark: per-process time of a
    fixed pure-python loop, solo vs 8-way parallel (medians of ≥3 each).
    On an idle box the 8-way median matches solo (scaling ≈ 1.0); external
    load inflates the parallel legs. Run BEFORE the SparkSession exists."""
    import multiprocessing as mp

    with mp.Pool(1) as p:
        s = sorted(p.map(_cpu_work, range(3)))
    solo = s[len(s) // 2]
    with mp.Pool(8) as p:
        par = sorted(p.map(_cpu_work, range(24)))
    med = par[len(par) // 2]
    return {
        "control_solo_sec": round(solo, 4),
        "control_par8_median_sec": round(med, 4),
        "control_scaling": round(solo / med, 3) if med else None,
    }


def _materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _prepare_corpus(spark) -> tuple[str, int]:
    """Generate + eventize the synthetic corpus once (untimed); cache on disk.

    Corpus is keyed by (n, cpus-independent content): datagen is
    deterministic, so any prior materialization with the same n is valid.
    """
    from workbook_exporter_fe_spark.operators.eventize import eventize
    from workbook_exporter_fe_spark.sources.datagen import gen_sequences

    path = f"{WORK}/events_n{SEQ_N}"
    marker = f"{path}/_SUCCESS"
    if not os.path.exists(marker):
        seq = gen_sequences(spark, SEQ_N, seed=42)
        ev = eventize(seq).select("source", "event_ts", "v", "doc_id")
        # ranged layout: scan-balanced + time-contiguous (BENCH/BASELINE.md)
        (
            ev.repartitionByRange(max(CPUS * 4, 8), "source", "event_ts")
            .write.mode("overwrite")
            .option("parquet.block.size", 16 * 1024 * 1024)
            .parquet(path)
        )
    return path, SEQ_N


def main() -> None:
    control = _contention_control()  # before the JVM exists
    spark = get_spark(app_name="bench", cores=CPUS, shuffle_partitions=CPUS)
    import workbook_exporter_fe_spark.plans.registry as registry  # noqa: F401
    import workbook_exporter_fe_spark.plans.registry_olap  # noqa: F401
    import workbook_exporter_fe_spark.plans.registry_timeseries  # noqa: F401
    import workbook_exporter_fe_spark.plans.registry_trainingdata  # noqa: F401
    import workbook_exporter_fe_spark.plans.registry_workbook  # noqa: F401

    from workbook_exporter_fe_spark.operators.tiers import rollup_tier1

    timings: dict[str, float] = {}

    # North metric: tier-1 rollup over the synthetic corpus. The input is
    # pinned in Spark storage first: this sandbox VM drops the OS page
    # cache unpredictably, and the metric is the rollup's throughput, not
    # the sandbox disk's.
    events_path, n_events = _prepare_corpus(spark)
    ev = spark.read.parquet(events_path).persist()
    def _best_of(df_fn, runs: int = 2) -> float:
        """Discard one warmup (plan compilation, codegen JIT, page cache),
        then report the best of `runs` — the recorded per-round numbers
        otherwise carry ~30% single-shot noise.

        Two stabilizers against one long-lived JVM timing 20 queries
        back-to-back (measured: single queries spiking 5-10× on isolated
        runs with no external load): a System.gc() before each query's
        timing loop so a concurrent old-gen collection from the PREVIOUS
        query's garbage doesn't land inside this query's window, and an
        adaptive extra run when the timed samples disagree by >2× (a
        sustained stall poisoning both samples gets a third chance)."""
        spark.sparkContext._jvm.System.gc()
        _materialize(df_fn())
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            _materialize(df_fn())
            samples.append(time.perf_counter() - t0)
        if max(samples) > 2 * min(samples):
            t0 = time.perf_counter()
            _materialize(df_fn())
            samples.append(time.perf_counter() - t0)
        return min(samples)

    t1 = rollup_tier1(ev)
    flagship_sec = _best_of(lambda: t1)
    timings["flagship_tier1_rollup"] = round(flagship_sec, 3)
    rolled_points = t1.count()

    for name in HEADLINE:
        fn = registry.QUERIES[name]
        timings[name] = round(_best_of(lambda: fn(spark, SF_DIR)), 3)

    total = round(sum(timings.values()), 3)
    sent = {
        q: {"sec": timings[q], "quiet_sec": ref,
            "ratio": round(timings[q] / ref, 3)}
        for q, ref in SENTINELS.items() if q in timings
    }
    ratios = [s["ratio"] for s in sent.values()]
    # contended when the CPU control degrades OR the majority of frozen
    # sentinel queries inflate past the do-not-commit line in lockstep
    contended = bool(
        (control["control_scaling"] or 0) < CONTROL_SCALING_MIN
        or (ratios and sorted(ratios)[len(ratios) // 2] > SENTINEL_RATIO_MAX)
    )
    out = {
        "metric": "headline wall-clock (flagship tier-1 rollup + operator suite)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "cpus": CPUS,
        "flagship": {
            "input_events": n_events,
            "rolled_points": rolled_points,
            "events_per_sec": round(n_events / flagship_sec),
            "rolled_points_per_sec": round(rolled_points / flagship_sec),
        },
        "contended": contended,
        "contention": {**control, "sentinels": sent},
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
