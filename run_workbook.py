#!/usr/bin/env python
"""CLI: the reference's end-user workflow, end to end.

The reference app's lifecycle (SURVEY §3): upload a workbook → pick
exporters → POST /process → download the merged YAML. This CLI is that
workflow without the Flask shell:

    python run_workbook.py --input workbook.csv --out output.yaml
    python run_workbook.py --input wb.xlsx --exporters exporter_cms,exporter_linux \
        --out output.yaml --add-snmp-args
    python run_workbook.py --input wb.csv --out output.yaml   # again: merges

Re-running merges into the existing document per (exporter, hostname) —
the reference's write_yaml update semantics (:1758-1767) — and
``--add-snmp-args`` prepends the literal trap_extra_args header
(``add_snmp_args``, reference :1593-1618). The per-exporter host counts in
the JSON summary are the reference's "Total number of hosts processed"
flash messages (:1726).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="workbook .csv or .xlsx")
    ap.add_argument("--out", required=True, help="output YAML document path")
    ap.add_argument(
        "--exporters", default="all",
        help="comma-separated exporter names, or 'all' (really all — "
        "the reference's 'all' list drops 15 exporters; see SURVEY App. A)",
    )
    ap.add_argument("--preamble-rows", type=int, default=7)
    ap.add_argument("--sheet", default="Sheet2", help="Excel sheet name")
    ap.add_argument("--add-snmp-args", action="store_true",
                    help="prepend the trap_extra_args header line (O22); an "
                    "existing header is preserved on merge either way")
    ap.add_argument("--no-merge", action="store_true",
                    help="overwrite instead of merging into an existing document")
    ap.add_argument("--default-listen-port", type=int, default=6001)
    ap.add_argument("--cores", default=os.environ.get("SPARK_GRAFT_CPUS", "*"))
    args = ap.parse_args()

    from workbook_exporter_fe_spark.plans.workbook_run import (
        run_workbook_pipeline,
    )
    from workbook_exporter_fe_spark.session import get_spark

    spark = get_spark(app_name="run_workbook", cores=args.cores)
    try:
        summary = run_workbook_pipeline(
            spark,
            args.input,
            args.out,
            exporters=args.exporters,
            default_listen_port=args.default_listen_port,
            add_snmp_args=args.add_snmp_args,
            merge=not args.no_merge,
            sheet=args.sheet,
            preamble_rows=args.preamble_rows,
        )
    except ValueError as e:
        raise SystemExit(str(e))
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
