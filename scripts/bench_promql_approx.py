#!/usr/bin/env python
"""Exact vs approx (production-mode) PromQL window functions at 10× the
q20 gate tier size — the r5 BENCH note for VERDICT r4 item #6.

Builds a deterministic tier-1-shaped store (20 sources × 5,000 minutes
= 100,000 buckets ≈ 10× q20's 9,788-row tier), then times each heavy
function in both modes (noop materialization, best of 2 after warmup).

Usage: python scripts/bench_promql_approx.py   # one JSON line
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from workbook_exporter_fe_spark.plans.promql import (  # noqa: E402
    MetricStore,
    promql,
)
from workbook_exporter_fe_spark.session import get_spark  # noqa: E402

T0 = 1700000000
N_SRC = 20
N_MIN = 5000

EXPRS = {
    "mad15m": "mad_over_time(tok[15m])",
    "hw15m": "holt_winters(tok[15m], 0.5, 0.25)",
    "q90_15m": "quantile_over_time(0.9, tok[15m])",
    "avg15m": "avg_over_time(tok[15m])",  # scalar-aggregate control
}


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    spark = get_spark(
        app_name="bench_promql_approx", cores=cpus, shuffle_partitions=cpus
    )
    sin_ = [
        float(100 + 20 * math.sin(2 * math.pi * i / 60)) for i in range(60)
    ]
    df = (
        spark.range(N_SRC * N_MIN)
        .select(
            F.concat(F.lit("s"), (F.col("id") % N_SRC).cast("string"))
            .alias("source"),
            F.timestamp_seconds(
                T0 + (F.col("id") / N_SRC).cast("long") * 60
            ).alias("bucket_ts"),
            (
                F.element_at(
                    F.array(*[F.lit(x) for x in sin_]),
                    ((F.col("id") / N_SRC).cast("long") % 60 + 1).cast("int"),
                )
                + (F.col("id") % 7).cast("double")
            ).alias("sum_v"),
        )
        .persist()
    )
    df.count()
    store = MetricStore().register(
        "tok", df, labels=("source",), ts_col="bucket_ts", value_col="sum_v"
    )

    def timed(expr: str, mode: str) -> float:
        fn = lambda: promql(store, expr, mode=mode)  # noqa: E731
        fn().write.format("noop").mode("overwrite").save()  # warmup
        best = float("inf")
        for _ in range(2):
            t = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t)
        return round(best, 3)

    out: dict = {
        "rows": N_SRC * N_MIN, "sources": N_SRC, "cpus": cpus, "results": {},
    }
    for key, expr in EXPRS.items():
        exact = timed(expr, "exact")
        approx = timed(expr, "approx")
        out["results"][key] = {
            "exact_sec": exact,
            "approx_sec": approx,
            "speedup": round(exact / approx, 2) if approx else None,
        }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
