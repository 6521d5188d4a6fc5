"""The reference's end-user workflow as one callable: workbook in,
merged YAML document out.

Shared by ``run_workbook.py`` (CLI) and ``run_server.py`` (the HTTP
facade mirroring the reference's Flask endpoints). The reference's
EP2 execution path (workbook_exporter-fe.py:1781-1922 run_exporters)
re-reads the CSV from disk once per exporter and re-reads the output
YAML once per ROW; here the workbook is read once, every selected
exporter spec runs over the same DataFrame, and the union is written
through the ordered-YAML sink in one merge pass.
"""

from __future__ import annotations


def run_workbook_pipeline(
    spark,
    input_path: str,
    out_path: str,
    exporters: str | list[str] = "all",
    default_listen_port: int = 6001,
    add_snmp_args: bool = False,
    merge: bool = True,
    sheet: str = "Sheet2",
    preamble_rows: int = 7,
) -> dict:
    """Run the selected exporters over one workbook and write/merge the
    YAML document at ``out_path``. Returns the per-exporter distinct
    host counts (the reference's "Total number of hosts processed"
    flash messages, :1726).

    ``exporters`` is 'all' (really all — the reference's 'all' list
    drops 15 exporters, SURVEY Appendix A), a comma-separated string,
    or a list of names. Unknown names raise ValueError before any work.
    """
    from workbook_exporter_fe_spark.operators.workbook import (
        EXPORTER_SPECS,
        run_exporter,
    )
    from workbook_exporter_fe_spark.sinks.yaml_sink import (
        write_yaml_document,
    )
    from workbook_exporter_fe_spark.sources.workbook_io import (
        read_workbook_csv,
        read_workbook_excel,
    )

    if isinstance(exporters, str):
        names = (
            sorted(EXPORTER_SPECS)
            if exporters == "all"
            else [n.strip() for n in exporters.split(",") if n.strip()]
        )
    else:
        names = sorted(EXPORTER_SPECS) if "all" in exporters else list(exporters)
    unknown = [n for n in names if n not in EXPORTER_SPECS]
    if unknown:
        raise ValueError(f"unknown exporters: {unknown}")
    if not names:
        raise ValueError("no exporters selected")

    if input_path.lower().endswith((".xlsx", ".xls")):
        wb = read_workbook_excel(
            spark, input_path, sheet=sheet, preamble_rows=preamble_rows
        )
    else:
        wb = read_workbook_csv(spark, input_path, preamble_rows=preamble_rows)

    long_parts = [
        run_exporter(
            wb, EXPORTER_SPECS[n], default_port_base=default_listen_port
        )
        for n in names
    ]
    long_rows = long_parts[0]
    for p in long_parts[1:]:
        long_rows = long_rows.unionByName(p)

    write_yaml_document(
        long_rows,
        out_path,
        merge_existing=merge,
        snmp_args=True if add_snmp_args else None,
    )
    hosts = {
        r["exporter"]: r["n"]
        for r in long_rows.select("exporter", "hostname")
        .distinct()
        .groupBy("exporter")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    return {"out": out_path, "hosts_processed": hosts, "exporters": len(names)}
