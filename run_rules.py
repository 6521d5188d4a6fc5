#!/usr/bin/env python
"""Evaluate a prometheus-style rules file over tier tables, incrementally.

The reference generates scrape configs; the operational loop its users
run on the resulting metrics is a rules file (recording + alerting)
evaluated on a schedule. This CLI is that loop, batch-style: metrics map
to tier tables (plain parquet dirs or SnapshotTables — autodetected),
rules compile through the PromQL front-end (plans/promql.py), and each
rule's output lands in its own SnapshotTable under --out via the
lookback-restricted incremental refresh (plans/rules.py
RuleMaterializer) — re-running is idempotent and each refresh reads only
watermark-minus-lookback of history.

Config (YAML):

    metrics:
      - name: tokens_sum          # PromQL metric name
        table: /path/to/tier1     # parquet dir or SnapshotTable root
        labels: [source]
        ts: bucket_ts
        value: sum_v
    groups:
      - name: capacity
        rules:
          - record: job:tokens:avg15m
            expr: avg_over_time(tokens_sum[15m])
          - alert: TokensHot
            expr: job:tokens:avg15m > 5000
            for: 5m
            step: 1m
          - alert: TokensDead            # dead-metric (absent) alarm:
            expr: absent(tokens_sum)     # fires when NO series reports
            for: 5m                      # needs an explicit grid —
            step: 1m                     # absence is unobservable on the
            lookback: 90s                # native grid (see promql.py
            start: 2024-01-01T00:00:00   # absent_range); naive ISO bounds
            end: 2024-01-31T00:00:00     # are read as UTC

Usage:
    python run_rules.py --config rules.yaml --out /path/rules_out
    spark-submit --py-files wexfe_spark.zip run_rules.py --config ...
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _is_snapshot_root(path: str) -> bool:
    """SnapshotTable-vs-plain-parquet dispatch, in ONE place."""
    return os.path.exists(
        os.path.join(path, "metadata", "version-hint.text")
    )


def _snapshot_loader(spark, path: str, ts_col: str, name: str, store):
    """Bounded loader for a SnapshotTable-backed metric: a prune window
    becomes a manifest ``col_between`` on the bucket-timestamp column, so
    min/max stats AND hidden-partitioning transforms (day(bucket_ts))
    skip files before Spark lists anything. Records what it pruned in
    ``store.pruning_stats[name]``."""
    import datetime as _dt

    from workbook_exporter_fe_spark.sources.snapshots import SnapshotTable

    table = SnapshotTable(spark, path)

    def loader(bounds):
        if bounds is None:
            return table.read()
        lo, hi = bounds
        iso = lambda e: _dt.datetime.fromtimestamp(  # noqa: E731
            max(int(e), 0), _dt.timezone.utc
        ).replace(tzinfo=None).isoformat()
        cb = {ts_col: (iso(lo), iso(hi))}
        st = {"window": [iso(lo), iso(hi)]}
        out = table.read(col_between=cb, stats=st)  # ONE manifest prune
        store.pruning_stats[name] = st
        return out

    return loader


def build_store(spark, cfg: dict):
    from workbook_exporter_fe_spark.plans.promql import MetricStore

    store = MetricStore()
    for m in cfg.get("metrics", []):
        path = m["table"]
        kw = dict(
            labels=tuple(m.get("labels", ["source"])),
            ts_col=m.get("ts", "bucket_ts"),
            value_col=m.get("value", "value"),
        )
        if _is_snapshot_root(path):
            store.register_lazy(
                m["name"],
                _snapshot_loader(spark, path, kw["ts_col"], m["name"], store),
                **kw,
            )
        else:
            store.register(m["name"], spark.read.parquet(path), **kw)
    return store


def _epoch(x) -> int:
    """YAML grid bound → epoch seconds, timezone-independently (naive ISO
    strings are UTC — never the host zone; same rule the backfill CLI
    applies)."""
    if isinstance(x, (int, float)):
        return int(x)
    s = str(x).strip()
    import calendar
    import datetime as _dt

    # ISO first: fromisoformat accepts compact dates like '20240101',
    # which float() would silently misread as epoch 20,240,101 (≈1970).
    # Numeric-string epochs (HTTP params arrive as strings) are the
    # fallback for anything ISO rejects, e.g. '1700000000'.
    try:
        return calendar.timegm(_dt.datetime.fromisoformat(s).timetuple())
    except ValueError:
        pass
    try:
        return int(float(s))
    except ValueError:
        raise ValueError(
            f"bad time bound {x!r}: need epoch seconds or ISO-8601"
        ) from None


def build_rules(cfg: dict):
    import re

    from workbook_exporter_fe_spark.plans.promql import duration_seconds
    from workbook_exporter_fe_spark.plans.rules import (
        AbsentAlertingRule,
        AlertingRule,
        RecordingRule,
    )

    rules = []
    for group in cfg.get("groups", []):
        for r in group.get("rules", []):
            if "record" in r:
                rules.append(RecordingRule(r["record"], r["expr"]))
            elif "alert" in r:
                for_s = duration_seconds(r["for"]) if "for" in r else 0.0
                step_s = (
                    duration_seconds(r["step"]) if "step" in r else 60.0
                )
                m = re.fullmatch(r"absent\((.*)\)", r["expr"].strip())
                if m:
                    # dead-metric alert: needs the explicit grid
                    if "start" not in r or "end" not in r:
                        raise ValueError(
                            f"absent() alert {r['alert']!r} needs "
                            "start/end grid bounds"
                        )
                    rules.append(
                        AbsentAlertingRule(
                            r["alert"],
                            m.group(1),
                            start=_epoch(r["start"]),
                            end=_epoch(r["end"]),
                            for_s=for_s,
                            step_s=step_s,
                            lookback_s=duration_seconds(r["lookback"])
                            if "lookback" in r else 300.0,
                        )
                    )
                else:
                    rules.append(
                        AlertingRule(
                            r["alert"], r["expr"],
                            for_s=for_s, step_s=step_s,
                        )
                    )
            else:
                raise ValueError(f"rule needs 'record' or 'alert': {r}")
    return rules


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True, help="rules YAML")
    ap.add_argument("--out", required=True, help="rule-output snapshot root")
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "8"))
    ap.add_argument(
        "--follow", type=float, metavar="SECONDS",
        help="re-evaluate every SECONDS (the prometheus evaluation_interval "
        "loop): each pass re-resolves the metric tables, so appends and new "
        "snapshots become visible, and the lookback-restricted refresh makes "
        "every pass incremental. Ctrl-C to stop.",
    )
    ap.add_argument(
        "--max-evals", type=int, default=0,
        help="with --follow: stop after N evaluation passes (0 = forever)",
    )
    args = ap.parse_args()

    import yaml

    from workbook_exporter_fe_spark.plans.rules import RuleMaterializer
    from workbook_exporter_fe_spark.session import get_spark

    with open(args.config) as f:
        cfg = yaml.safe_load(f)
    spark = get_spark(app_name="run_rules", cores=int(args.cpus))
    rules = build_rules(cfg)
    mat = RuleMaterializer(spark, args.out)

    def one_pass():
        # rebuild the store each pass: tables re-resolve, so producer
        # appends / new snapshots are visible to this evaluation
        stats = mat.refresh(build_store(spark, cfg), rules)
        print(json.dumps({"rules": stats, "out": args.out}), flush=True)

    if args.follow:
        import time as _time

        n = 0
        try:
            while True:
                one_pass()
                n += 1
                if args.max_evals and n >= args.max_evals:
                    break
                _time.sleep(args.follow)
        except KeyboardInterrupt:
            pass
    else:
        one_pass()
    spark.stop()


if __name__ == "__main__":
    main()
