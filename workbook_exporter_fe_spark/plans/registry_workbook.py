"""Oracle-checked queries for the workbook exporter engine (O13/O17/O23).

A deterministic synthetic workbook is derived from the `customer` driver
table identically in Spark and SQL, then run through the spec-driven
exporter engine; the DuckDB oracle re-states the exporter semantics in SQL.
This puts the reference-parity layer itself behind the driver's value-hash
gate (the golden-fixture test in tests/test_workbook_golden.py covers the
full 27-exporter catalog against the reference's own artifact).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from workbook_exporter_fe_spark.operators.workbook import EXPORTER_SPECS, run_exporter

from .registry import _t, query

_WB_SQL = """
  SELECT 'host-' || CAST(c_custkey AS VARCHAR) AS "Hostnames",
         'host-' || CAST(c_custkey AS VARCHAR) || '.test.org' AS "FQDN",
         '10.0.' || CAST(c_custkey // 250 AS VARCHAR) || '.' || CAST(c_custkey % 250 AS VARCHAR) AS "IP Address",
         c_mktsegment AS "Location",
         'GB' AS "Country",
         CASE c_custkey % 4 WHEN 0 THEN 'exporter_cms' WHEN 1 THEN 'exporter_gateway'
                            WHEN 2 THEN 'exporter_tcti' END AS "Exporter_name_app",
         CASE WHEN c_custkey % 10 <> 0 THEN 3000 + c_custkey % 1000 END AS "App-Listen-Port",
         CASE WHEN c_custkey % 5 = 0 THEN c_name END AS "ssh_username",
         CASE WHEN c_custkey % 2 = 0 THEN '8490,8491' END AS "jmx_ports",
         CASE WHEN c_custkey % 7 = 0 THEN 'comm-' || CAST(c_custkey AS VARCHAR) END AS "comm_string"
  FROM customer
"""


def _workbook(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    return c.select(
        F.concat(F.lit("host-"), k.cast("string")).alias("Hostnames"),
        F.concat(F.lit("host-"), k.cast("string"), F.lit(".test.org")).alias("FQDN"),
        F.concat(
            F.lit("10.0."), (k / 250).cast("long").cast("string"), F.lit("."), (k % 250).cast("string")
        ).alias("IP Address"),
        F.col("c_mktsegment").alias("Location"),
        F.lit("GB").alias("Country"),
        F.when(k % 4 == 0, "exporter_cms")
        .when(k % 4 == 1, "exporter_gateway")
        .when(k % 4 == 2, "exporter_tcti")
        .alias("Exporter_name_app"),
        F.when(k % 10 != 0, (F.lit(3000) + k % 1000)).alias("App-Listen-Port"),
        F.when(k % 5 == 0, F.col("c_name")).alias("ssh_username"),
        F.when(k % 2 == 0, F.lit("8490,8491")).alias("jmx_ports"),
        F.when(k % 7 == 0, F.concat(F.lit("comm-"), k.cast("string"))).alias("comm_string"),
    )


@query(
    "q16_workbook_generic",
    f"""
    WITH wb AS ({_WB_SQL}),
    cms AS (
      SELECT *, COALESCE("App-Listen-Port",
               6000 + ROW_NUMBER() OVER (PARTITION BY "App-Listen-Port" IS NULL
                                         ORDER BY "Hostnames")) AS lp
      FROM wb WHERE "Exporter_name_app" = 'exporter_cms'
    )
    SELECT 'exporter_cms' AS exporter, "Hostnames" AS hostname,
           CAST(NULL AS VARCHAR) AS entry_key, f.field, f.value
    FROM cms, LATERAL (VALUES
      ('ip_address', "IP Address"),
      ('listen_port', CAST(lp AS VARCHAR)),
      ('location', "Location"),
      ('country', "Country"),
      ('username', COALESCE("ssh_username", 'root')),
      ('password', 'ENC')) AS f(field, value)
    """,
)
def q16_workbook_generic(spark, sf_dir):
    wb = _workbook(spark, sf_dir)
    return run_exporter(wb, EXPORTER_SPECS["exporter_cms"])


@query(
    "q17_workbook_explode_ports",
    f"""
    WITH wb AS ({_WB_SQL}),
    tcti AS (
      SELECT *, UNNEST(CASE WHEN "jmx_ports" IS NOT NULL
                            THEN string_split("jmx_ports", ',')
                            ELSE ['8080','8081'] END) AS port
      FROM wb WHERE "Exporter_name_app" = 'exporter_tcti'
    )
    SELECT 'exporter_tcti' AS exporter, "FQDN" AS hostname,
           port AS entry_key, f.field, f.value
    FROM tcti, LATERAL (VALUES
      ('ip_address', "IP Address"),
      ('location', "Location"),
      ('country', "Country")) AS f(field, value)
    """,
)
def q17_workbook_explode_ports(spark, sf_dir):
    wb = _workbook(spark, sf_dir)
    return run_exporter(wb, EXPORTER_SPECS["exporter_tcti"])


@query(
    "q18_workbook_gateway_snmp",
    f"""
    WITH wb AS ({_WB_SQL}),
    gw AS (
      SELECT *, COALESCE("App-Listen-Port",
               6000 + ROW_NUMBER() OVER (PARTITION BY "App-Listen-Port" IS NULL
                                         ORDER BY "Hostnames")) AS lp
      FROM wb WHERE "Exporter_name_app" = 'exporter_gateway'
    )
    SELECT 'exporter_gateway' AS exporter, "Hostnames" AS hostname,
           "IP Address" AS entry_key, f.field, f.value
    FROM gw, LATERAL (VALUES
      ('listen_port', CAST(lp AS VARCHAR)),
      ('location', "Location"),
      ('country', "Country"),
      ('snmp_version', '2'),
      ('community', COALESCE("comm_string", 'ENC'))) AS f(field, value)
    """,
)
def q18_workbook_gateway_snmp(spark, sf_dir):
    wb = _workbook(spark, sf_dir)
    return run_exporter(wb, EXPORTER_SPECS["exporter_gateway"])
