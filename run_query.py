#!/usr/bin/env python
"""Evaluate one PromQL expression over tier tables — the ad-hoc query CLI.

run_rules.py is the scheduled loop (recording/alerting rules materialized
incrementally); this is its interactive sibling: point it at tier tables
(plain parquet dirs or SnapshotTable roots — autodetected, same loader),
give it an expression, get rows. Two evaluation shapes, matching the
PromQL front-end (plans/promql.py):

- **instant** (default): the expression on its native grid — the stored
  bucket timestamps (engine deviation 1).
- **range** (``--range START..END --step 5m [--lookback 5m]``): the
  Prometheus ``/api/v1/query_range`` shape — the native evaluation
  resampled onto an explicit grid via the one-window marker-trick as-of
  (promql.query_range). Naive ISO bounds are read as UTC, like every
  other CLI here.

Metrics come from repeatable ``--metric`` specs or the same YAML
``metrics:`` section run_rules.py reads (``--config``).

Usage:
    python run_query.py --metric tokens_sum=/tmp/t/tier1:sum_v \
        --promql 'avg_over_time(tokens_sum[15m])' --limit 10
    python run_query.py --config rules.yaml \
        --promql 'rate(tokens_sum[5m])' \
        --range '2024-01-01T00:00:00..2024-01-02T00:00:00' --step 5m \
        --out /tmp/answer
    spark-submit --py-files wexfe_spark.zip run_query.py --promql ...

Output: JSON lines on stdout (``--limit`` rows, value-descending ties
broken by labels for determinism), or a parquet dir with ``--out`` (the
full result, no driver collect — the 100 TB-safe path).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _parse_metric(spec: str) -> dict:
    """NAME=PATH[:VALUECOL[:LABEL1+LABEL2]] → metrics-section entry."""
    name, _, rest = spec.partition("=")
    if not name or not rest:
        raise ValueError(f"bad --metric {spec!r} (NAME=PATH[:VALUECOL])")
    path, _, tail = rest.partition(":")
    value, _, labels = tail.partition(":")
    return {
        "name": name.strip(),
        "table": path.strip(),
        "value": value.strip() or "value",
        "labels": labels.split("+") if labels else ["source"],
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--metric", action="append", default=[],
        help="NAME=PATH[:VALUECOL[:LABEL1+LABEL2]] (repeatable); PATH is a "
        "parquet dir or SnapshotTable root",
    )
    ap.add_argument(
        "--config", help="YAML with a metrics: section (run_rules.py shape)"
    )
    ap.add_argument("--promql", required=True, help="the expression")
    ap.add_argument(
        "--range", dest="range_",
        help="START..END (ISO, naive = UTC, or epoch seconds) — evaluate "
        "as a range query on an explicit grid instead of the native grid",
    )
    ap.add_argument("--step", default="1m")
    ap.add_argument("--lookback", default="5m")
    ap.add_argument(
        "--mode", choices=("exact", "approx"), default="exact",
        help="approx = decomposable production variants of "
        "mad_over_time/quantile_over_time/holt_winters (envelope-pinned; "
        "exact is the oracle-replayable default)",
    )
    ap.add_argument("--out", help="write the FULL result as parquet here")
    ap.add_argument(
        "--limit", type=int, default=20,
        help="rows printed to stdout without --out",
    )
    ap.add_argument("--cores", default=os.environ.get("SPARK_GRAFT_CPUS", "*"))
    args = ap.parse_args()
    if not args.metric and not args.config:
        ap.error("no metrics: pass --metric and/or --config")

    from workbook_exporter_fe_spark.plans.promql import promql, query_range
    from workbook_exporter_fe_spark.session import get_spark

    from run_rules import _epoch, build_store  # same loader + UTC rule

    spark = get_spark(app_name="run_query", cores=args.cores)
    cfg: dict = {"metrics": [_parse_metric(s) for s in args.metric]}
    if args.config:
        import yaml

        with open(args.config) as fh:
            cfg["metrics"] = list(
                yaml.safe_load(fh).get("metrics", [])
            ) + cfg["metrics"]
    store = build_store(spark, cfg)

    if args.range_:
        start, _, end = args.range_.partition("..")
        if not end:
            ap.error("--range needs 'START..END'")
        df = query_range(
            store, args.promql, _epoch(start), _epoch(end),
            step=args.step, lookback=args.lookback, mode=args.mode,
        )
    else:
        df = promql(store, args.promql, mode=args.mode)

    if args.out:
        df.write.mode("overwrite").parquet(args.out)
        rep = {"out": args.out,
               "rows": spark.read.parquet(args.out).count()}
        if store.pruning_stats:
            # SnapshotTable-backed metrics: what the manifest pruned
            rep["pruning"] = store.pruning_stats
        print(json.dumps(rep))
        return
    from pyspark.sql import functions as F

    labels = [c for c in df.columns if c not in ("ts", "value")]
    rows = df.orderBy(
        F.col("value").desc_nulls_last(), *labels, "ts"
    ).limit(args.limit).collect()
    for r in rows:
        d = r.asDict()
        if d.get("ts") is not None:
            d["ts"] = d["ts"].isoformat()
        print(json.dumps(d, default=str))
    if store.pruning_stats:
        print(json.dumps({"pruning": store.pruning_stats}))


if __name__ == "__main__":
    main()
