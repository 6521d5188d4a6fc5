#!/usr/bin/env python
"""Measured effect of manifest blooms + Z-order compaction on file skipping.

Point-lookup story (blooms): a hash-distributed id column has full-range
min/max in EVERY file, so stats pruning opens all of them; the manifest
bloom proves absence per file and the scan opens only true candidates.
Rectangle story (Z-order): after a multi-column Morton rewrite, min/max
stats prune on every z-ordered column at once.

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

MARKER = "## Metadata file skipping: manifest blooms + Z-order (measured)"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=4_000_000)
    ap.add_argument("--files", type=int, default=64)
    ap.add_argument("--lookups", type=int, default=20)
    ap.add_argument("--root", default="/tmp/spark_graft_bench/bloom_tbl")
    ap.add_argument("--splice", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from workbook_exporter_fe_spark.session import get_spark
    from workbook_exporter_fe_spark.sources.snapshots import SnapshotTable

    spark = get_spark(app_name="bench_bloom", cores=16, shuffle_partitions=16)

    def build(root: str, bloom: bool) -> tuple[SnapshotTable, float]:
        shutil.rmtree(root, ignore_errors=True)
        t = SnapshotTable(spark, root)
        if bloom:
            t.set_properties(**{"bloom.columns": ["doc_id"]})
        df = spark.range(args.rows).select(
            F.concat(F.lit("doc-"), F.lpad(F.col("id").cast("string"), 9, "0")
                     ).alias("doc_id"),
            (F.col("id") % 9973).alias("x"),
            F.floor(F.col("id") / 9973).cast("long").alias("y"),
            (F.col("id") % 7).cast("double").alias("v"),
        )
        # hash-distribute the ids across files: the worst case for
        # min/max stats, the design case for blooms
        t0 = time.perf_counter()
        t.commit(df.repartition(args.files, "doc_id"))
        return t, time.perf_counter() - t0

    plain, wall_plain = build(args.root + "_plain", bloom=False)
    bloomed, wall_bloom = build(args.root + "_bloom", bloom=True)

    # ---- point lookups: files opened + wall-clock, present and absent ids
    present = [f"doc-{i * (args.rows // args.lookups) + 17:09d}"
               for i in range(args.lookups)]
    absent = [f"doc-{args.rows + i:09d}" for i in range(args.lookups)]

    def lookup_wall(t: SnapshotTable, ids: list[str]) -> tuple[float, int]:
        n_open = 0
        t0 = time.perf_counter()
        for d in ids:
            paths, _ = t.scan_files(col_eq={"doc_id": d})
            n_open += len(paths)
            t.read(col_eq={"doc_id": d}).where(
                F.col("doc_id") == d
            ).collect()
        return time.perf_counter() - t0, n_open

    w_plain, open_plain = lookup_wall(plain, present + absent)
    w_bloom, open_bloom = lookup_wall(bloomed, present + absent)

    # ---- Z-order rectangle pruning vs single-column sort
    total = sum(f["bytes"] for f in plain.snapshot()["files"])
    tfb = max(1, total // args.files)
    shutil.rmtree(args.root + "_z", ignore_errors=True)
    zt = SnapshotTable(spark, args.root + "_z")
    zt.commit(plain.read())
    zt.compact(target_file_bytes=tfb, zorder_by=["x", "y"])
    shutil.rmtree(args.root + "_s", ignore_errors=True)
    st = SnapshotTable(spark, args.root + "_s")
    st.commit(plain.read())
    st.compact(target_file_bytes=tfb, sort_by=["x"])

    x_hi = 9973 // 8
    y_hi = (args.rows // 9973) // 8
    rect = {"x": (0, x_hi), "y": (0, y_hi)}
    z_keep, z_pruned = zt.scan_files(col_between=rect)
    s_keep, s_pruned = st.scan_files(col_between=rect)
    zn = len(zt.snapshot()["files"])
    sn = len(st.snapshot()["files"])

    out = {
        "rows": args.rows,
        "files": args.files,
        "lookups": 2 * args.lookups,
        "commit_wall_plain_s": round(wall_plain, 2),
        "commit_wall_bloom_s": round(wall_bloom, 2),
        "lookup_wall_plain_s": round(w_plain, 2),
        "lookup_wall_bloom_s": round(w_bloom, 2),
        "files_opened_plain": open_plain,
        "files_opened_bloom": open_bloom,
        "zorder": {"files": zn, "rect_pruned": z_pruned,
                   "rect_kept": len(z_keep)},
        "sorted_x": {"files": sn, "rect_pruned": s_pruned,
                     "rect_kept": len(s_keep)},
    }
    print(json.dumps(out))

    if args.splice:
        from scripts.bench_scaling import _splice_section  # reuse the safe splice

        section = f"""{MARKER}

Setup: {args.rows:,} rows hash-distributed by ``doc_id`` into
{args.files} files (the worst case for min/max stats — every file spans
the full id range), manifest blooms on ``doc_id``
(sources/snapshots.py bloom_stats_for_files — one column-pruned Spark
job per commit, filters in per-file sidecars so append manifests stay
O(new files)). {2 * args.lookups} point lookups
({args.lookups} present + {args.lookups} absent ids), driver-side
planning + full read each:

| quantity | stats only | with blooms |
|---|---|---|
| files opened (total) | {open_plain:,} | **{open_bloom:,}** |
| lookup wall (s, {2 * args.lookups} lookups) | {round(w_plain, 2)} | **{round(w_bloom, 2)}** |
| commit wall (s, incl. bloom build job) | {round(wall_plain, 2)} | {round(wall_bloom, 2)} |

An absent id opens ZERO files (bloom miss is proof of absence); a
present id opens ~1 (its file plus rare false positives). The bloom
build is one extra Spark job over the NEW files only — the commit-wall
delta above is its full cost.

Z-order compaction (``compact(zorder_by=['x','y'])`` — equi-depth
Morton clustering, sources/layout.py with_zvalue) vs single-column sort,
same table, 1/8 x 1/8 rectangle predicate on both dims:

| layout | files | rectangle scan opens |
|---|---|---|
| sort_by x | {sn} | {len(s_keep)} (y prunes nothing) |
| zorder x,y | {zn} | **{len(z_keep)}** |

Both rewrites cost the same ONE range shuffle of the live data; the
z-ordered layout prunes on every listed column at once, which is the
100 TB case for multi-dimension slicing (source x time, x y cell
queries) that a lexicographic sort cannot serve.
"""
        _splice_section(MARKER, section)

    spark.stop()


if __name__ == "__main__":
    main()
