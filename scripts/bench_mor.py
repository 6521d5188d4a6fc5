#!/usr/bin/env python
"""Measured effect of merge-on-read position deletes vs copy-on-write.

The claim: a scattered small delete on a large table should cost the
matching rows' POSITIONS, not a rewrite of every touched file. With a
0.1%-scattered predicate every file contains matches, so CoW rewrites
the whole table while MoR writes one kilobyte-scale vector — and the
read-side tax of the mask is then measured honestly, before and after
the compaction that materializes it.

Prints one JSON line and (with --splice) rewrites the owned section of
BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MARKER = "## Row-level deletes: merge-on-read vs copy-on-write (measured)"


def _table_bytes(t) -> int:
    return sum(f["bytes"] for f in t.snapshot()["files"])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=8_000_000)
    ap.add_argument("--files", type=int, default=32)
    ap.add_argument("--root", default="/tmp/spark_graft_bench/mor_tbl")
    ap.add_argument("--splice", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from workbook_exporter_fe_spark.session import get_spark
    from workbook_exporter_fe_spark.sources.snapshots import SnapshotTable

    spark = get_spark(app_name="bench_mor", cores=16, shuffle_partitions=16)

    def build(root: str) -> SnapshotTable:
        shutil.rmtree(root, ignore_errors=True)
        t = SnapshotTable(spark, root)
        df = spark.range(args.rows).select(
            F.col("id"),
            F.md5(F.col("id").cast("string")).alias("payload"),
            (F.col("id") % 97).cast("double").alias("v"),
        )
        t.commit(df.repartition(args.files))
        return t

    # scattered predicate hitting every file: id % 1000 == 0 (0.1%)
    pred = "id % 1000 = 0"
    n_del = args.rows // 1000

    cow = build(args.root + "_cow")
    bytes_before = _table_bytes(cow)
    t0 = time.perf_counter()
    cow.delete_where(pred)
    w_cow = time.perf_counter() - t0
    cow_sum = cow.snapshot()["summary"]

    mor = build(args.root + "_mor")
    t0 = time.perf_counter()
    mor.delete_where(pred, mode="mor")
    w_mor = time.perf_counter() - t0
    mor_m = mor.snapshot()
    dv_bytes = sum(
        os.path.getsize(p) for d in mor_m["deletes"] for p in d["paths"]
    )

    def read_wall(t) -> float:
        t0 = time.perf_counter()
        t.read().agg(F.sum("v"), F.count("*")).collect()
        return time.perf_counter() - t0

    r_cow = min(read_wall(cow) for _ in range(3))
    r_masked = min(read_wall(mor) for _ in range(3))
    # bin-pack into 4x larger files (same-count compaction is a no-op
    # by design — the early-exit guard)
    t0 = time.perf_counter()
    mor.compact(target_file_bytes=max(1, 4 * bytes_before // args.files))
    w_compact = time.perf_counter() - t0
    r_compacted = min(read_wall(mor) for _ in range(3))
    assert not mor.snapshot().get("deletes")

    out = {
        "rows": args.rows,
        "files": args.files,
        "rows_deleted": n_del,
        "table_bytes": bytes_before,
        "cow": {"wall_s": round(w_cow, 2),
                "files_rewritten": cow_sum["files_rewritten"],
                "bytes_rewritten": _table_bytes(cow)},
        "mor": {"wall_s": round(w_mor, 2), "vector_bytes": dv_bytes,
                "read_masked_s": round(r_masked, 2),
                "compact_s": round(w_compact, 2),
                "read_compacted_s": round(r_compacted, 2)},
        "read_cow_s": round(r_cow, 2),
    }
    print(json.dumps(out))

    if args.splice:
        from scripts.bench_scaling import _splice_section

        section = f"""{MARKER}

Setup: {args.rows:,} rows in {args.files} files
({bytes_before / 2**20:.0f} MB), a scattered retention delete matching
{n_del:,} rows (0.1%, ``{pred}``) that touches EVERY file — the worst
case for copy-on-write and the design case for Iceberg-v2-style
position delete vectors (sources/snapshots.py delete_where(mode=)):

| quantity | copy-on-write | merge-on-read |
|---|---|---|
| delete wall (s) | {round(w_cow, 2)} | {round(w_mor, 2)} |
| data bytes written | {_table_bytes(cow) / 2**20:.0f} MB (full rewrite) | **{dv_bytes / 1024:.0f} KB** (one sorted vector) |
| subsequent full-scan agg (s, best of 3) | {round(r_cow, 2)} | {round(r_masked, 2)} (masked) / {round(r_compacted, 2)} (after compaction) |

Wall-clock is a draw at this scale — both paths are dominated by the
position/containment scan and driver scheduling. The real signal is the
BYTES column: the MoR delete writes
~{max(1, round(_table_bytes(cow) / max(1, dv_bytes))):,}× less data, and
write volume — not wall — is what scales with table size (a 100 TB
table's CoW delete rewrites terabytes; its MoR delete still writes
kilobytes). The read-side mask (one anti-join against the
broadcast-sized vector) costs a measurable but bounded tax, and one
``compact()`` ({round(w_compact, 2)}s here) materializes the deletes and
retires the vector — the standard MoR lifecycle: cheap deletes
accumulate, maintenance amortizes them. At 100 TB the gap is the whole
point: GDPR/retention deletes of scattered rows become
kilobyte-per-commit operations instead of table-window rewrites, and
the compaction that pays the rewrite cost runs on YOUR schedule, sized
by ``where_bounds``, not on the delete's critical path.
"""
        _splice_section(MARKER, section)

    spark.stop()


if __name__ == "__main__":
    main()
