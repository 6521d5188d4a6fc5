#!/usr/bin/env python
"""Full-republish vs dynamic-partition-overwrite publish cost as the
tier grows — the r5 evidence that the incremental tier publish is
O(delta), not O(table).

Builds a day(bucket_ts)/source-partitioned serving store at increasing
table sizes (days × 8 sources, hourly tier-1 rows) and, at each size,
times (a) a FULL overwrite republish and (b) a dynamic partition
overwrite of ONE day's delta, recording wall time and bytes written.

Usage: python scripts/bench_publish.py    # one JSON line
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

T0 = 1700006400  # midnight-aligned
DAY = 86400
N_SRC = 8
ROWS_PER_DAY_SRC = 1440  # one row per minute — tier-1 shaped


def _tier(spark, days, v_base=0):
    n = days * N_SRC * ROWS_PER_DAY_SRC
    return spark.range(n).select(
        F.concat(F.lit("s"), (F.col("id") % N_SRC).cast("string"))
        .alias("source"),
        F.timestamp_seconds(
            T0 + (F.col("id") / N_SRC).cast("long") * 60
        ).alias("bucket_ts"),
        (F.col("id") + v_base).cast("double").alias("sum_v"),
    )


def _tree_bytes(root: str) -> int:
    total = 0
    for d, _, fs in os.walk(root):
        for f in fs:
            total += os.path.getsize(os.path.join(d, f))
    return total


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    spark = get_spark(
        app_name="bench_publish", cores=cpus, shuffle_partitions=cpus
    )
    out = {"rows_per_day": N_SRC * ROWS_PER_DAY_SRC, "cpus": cpus,
           "sizes": []}
    for days in (10, 30, 90):
        root = f"/tmp/spark_graft_bench/pub_{days}d"
        shutil.rmtree(root, ignore_errors=True)
        t = SnapshotTable(spark, root)
        t.set_properties(**{"partition.spec": ["day(bucket_ts)", "source"]})
        t.commit(_tier(spark, days))
        b0 = _tree_bytes(root)

        full = _tier(spark, days, v_base=10_000_000)
        t0 = time.perf_counter()
        t.commit(full, mode="overwrite")
        full_sec = time.perf_counter() - t0
        full_bytes = _tree_bytes(root) - b0

        # one day's delta (the last day, all sources)
        delta = full.filter(
            F.col("bucket_ts")
            >= F.timestamp_seconds(F.lit(T0 + (days - 1) * DAY))
        )
        b1 = _tree_bytes(root)
        t0 = time.perf_counter()
        rep = t.overwrite_partitions(delta)
        dpo_sec = time.perf_counter() - t0
        dpo_bytes = _tree_bytes(root) - b1
        out["sizes"].append({
            "days": days,
            "table_rows": days * N_SRC * ROWS_PER_DAY_SRC,
            "full_republish_sec": round(full_sec, 3),
            "full_bytes_written": full_bytes,
            "dpo_1day_sec": round(dpo_sec, 3),
            "dpo_bytes_written": dpo_bytes,
            "dpo_partitions_replaced": rep["partitions"],
            "dpo_files_replaced": rep["files_replaced"],
        })
        shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
