"""Workbook ingest: CSV/Excel → Spark DataFrame with the column contract.

The reference reads CSV with `skiprows=6` and Excel Sheet2 (reference
:1703-1714); the shipped dummy workbook actually has 7 preamble lines
(SURVEY §5 quirk), so the skip count is a parameter here. Spark's CSV
reader has no skiprows, and workbooks are KB-sized control inputs — so
ingest goes pandas → Arrow → createDataFrame (the O2 ingest-side
conversion), normalizing the awkward dtypes (TRUE/NaN booleans, float
ports) once at the boundary. Data-plane tables never take this path.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

BOOL_COLS = ["http_2xx", "icmp", "ssh-banner", "tcp-connect", "SNMP", "Exporter_SSL"]
PORT_COLS = ["OS-Listen-Port", "App-Listen-Port", "TCP_Connect_Port",
             "App-Listen-Port-1", "App-Listen-Port-2", "App-Listen-Port-3"]
# column-contract string columns: pandas infers all-NaN columns as float64,
# which would make Spark coerce when/otherwise branches to DOUBLE (ANSI cast
# failure on literal defaults like 'maas') — pin them to string.
STRING_COLS = ["comm_string", "ssh_username", "ssh_password", "jmx_ports",
               "snmp_version", "snmp_user", "snmp_password", "h2xx_url",
               "Hostnames", "FQDN", "IP Address", "Location", "Country",
               "Environment", "Domain", "Exporter_name_os", "Exporter_name_app"]


def read_workbook_csv(
    spark: SparkSession, path: str, preamble_rows: int = 6
) -> DataFrame:
    pdf = pd.read_csv(path, skiprows=preamble_rows, low_memory=False)
    return _normalize(spark, pdf)


def read_workbook_excel(
    spark: SparkSession, path: str, sheet: str = "Sheet2", preamble_rows: int = 6
) -> DataFrame:
    pdf = pd.read_excel(path, sheet_name=sheet, skiprows=range(preamble_rows))
    return _normalize(spark, pdf)


def _normalize(spark: SparkSession, pdf: pd.DataFrame) -> DataFrame:
    pdf = pdf.copy()
    for c in BOOL_COLS:
        if c in pdf.columns:
            pdf[c] = pdf[c].map(
                lambda v: "True" if (v is True or str(v).upper() == "TRUE") else None
            )
    for c in pdf.columns:
        if c in PORT_COLS:
            pdf[c] = pd.to_numeric(pdf[c], errors="coerce")
        elif c in STRING_COLS or pdf[c].dtype == object:
            pdf[c] = pdf[c].astype("string")
    if "snmp_version" in pdf.columns:
        # numeric-inferred versions stringify as '2.0'/'3.0' — normalize
        pdf["snmp_version"] = pdf["snmp_version"].str.replace(r"\.0$", "", regex=True)
    return spark.createDataFrame(pdf)
