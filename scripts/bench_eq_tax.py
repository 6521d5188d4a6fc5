#!/usr/bin/env python
"""Merge-on-read masked-scan tax vs outstanding equality-delete entries
— the r5 BENCH leg for VERDICT r4 item #8: the curve that justifies
``auto_maintain``'s ``max_delete_entries`` default.

Builds a snapshot table (2M rows across 32 files), applies equality
deletes ONE ENTRY at a time (each entry = one delete_eq commit against
a handful of keys), and times a full scan at each outstanding-entry
count; then runs the auto_maintain compaction and times the reset scan.

Usage: python scripts/bench_eq_tax.py    # one JSON line
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from workbook_exporter_fe_spark.session import get_spark  # noqa: E402
from workbook_exporter_fe_spark.sources.snapshots import (  # noqa: E402
    SnapshotTable,
)

N_ROWS = 2_000_000
N_FILES = 32
ENTRY_COUNTS = [0, 1, 2, 4, 8, 16, 32]


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    spark = get_spark(
        app_name="bench_eq_tax", cores=cpus, shuffle_partitions=cpus
    )
    root = "/tmp/spark_graft_bench/eq_tax_tbl"
    shutil.rmtree(root, ignore_errors=True)
    table = SnapshotTable(spark, root)
    table.commit(
        spark.range(N_ROWS)
        .select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 97).cast("double").alias("v"),
        )
        .repartition(N_FILES)
    )

    def scan_sec() -> float:
        best = float("inf")
        table.read().write.format("noop").mode("overwrite").save()  # warm
        for _ in range(2):
            t = time.perf_counter()
            table.read().write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t)
        return round(best, 3)

    # curve A: entries with NO interleaved appends — every entry's
    # anchor covers all data, so the read MERGES them per key-column
    # set into one anti-join (the documented steady-state optimization)
    curve_merged = []
    applied = 0
    next_key = 10
    for target in ENTRY_COUNTS:
        while applied < target:
            table.delete_eq([next_key, next_key + 1], eq_cols=["doc_id"])
            next_key += 2
            applied += 1
        curve_merged.append({"entries": applied, "scan_sec": scan_sec()})

    # curve B: the CDC-upsert shape — each delete is followed by an
    # append, so later files postdate earlier anchors and every entry
    # becomes a SCOPED anti-join of its own (dseq-conditional). This is
    # the growth r4's upsert bench observed; the operator's tax curve.
    shutil.rmtree(root, ignore_errors=True)
    table = SnapshotTable(spark, root)
    table.commit(
        spark.range(N_ROWS)
        .select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 97).cast("double").alias("v"),
        )
        .repartition(N_FILES)
    )
    curve_scoped = []
    applied = 0
    next_key = 10
    for target in ENTRY_COUNTS:
        while applied < target:
            table.delete_eq([next_key, next_key + 1], eq_cols=["doc_id"])
            table.commit(
                spark.range(1).select(
                    (F.lit(10_000_000) + F.col("id") + next_key)
                    .alias("doc_id"),
                    F.lit(0.0).alias("v"),
                )
            )
            next_key += 2
            applied += 1
        curve_scoped.append({"entries": applied, "scan_sec": scan_sec()})

    from workbook_exporter_fe_spark.sources.maintenance import auto_maintain

    t0 = time.perf_counter()
    report = auto_maintain(table)
    compact_sec = round(time.perf_counter() - t0, 3)
    after = scan_sec()
    print(json.dumps({
        "rows": N_ROWS,
        "files": N_FILES,
        "cpus": cpus,
        "curve_merged_entries": curve_merged,
        "curve_scoped_entries": curve_scoped,
        "auto_maintain_actions": [a.get("action") for a in
                                  report.get("actions", [])],
        "compact_sec": compact_sec,
        "scan_after_compact_sec": after,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
