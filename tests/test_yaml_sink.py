"""YAML compat sink (O21/O22) + exporter field fidelity (genesyscloud /
baas / weblm).

Byte-level golden parity: dummy_data.csv → engine → ordered YAML document;
for every (hostname, entry) present in both the golden document and the
engine output, the yaml-rendered entry must be BYTE-IDENTICAL for every
section whose golden field order is self-consistent (linux, cms, windows,
gateway, tcti). The blackbox section's golden predates the reference code
(its own entries disagree on field order: location-first vs module-first),
so it is compared as unordered field dicts.
"""

from __future__ import annotations

import yaml
import pytest

from pyspark.sql import functions as F

GOLDEN = "/root/reference/dummy_data/example_output.yaml"
CSV = "/root/reference/dummy_data/dummy_data.csv"

BYTE_SECTIONS = [
    "exporter_linux",
    "exporter_cms",
    "exporter_windows",
    "exporter_gateway",
    "exporter_tcti",
]


@pytest.fixture(scope="module")
def engine_doc(spark):
    from workbook_exporter_fe_spark.operators.workbook import run_exporters
    from workbook_exporter_fe_spark.sinks.yaml_sink import to_yaml_document
    from workbook_exporter_fe_spark.sources.workbook_io import read_workbook_csv

    df = read_workbook_csv(spark, CSV, preamble_rows=7)
    return to_yaml_document(run_exporters(df, BYTE_SECTIONS + ["exporter_blackbox"]))


@pytest.fixture(scope="module")
def golden_doc():
    return yaml.safe_load(open(GOLDEN))


def _render(entry: dict) -> str:
    return yaml.dump(entry, allow_unicode=True, sort_keys=False, default_flow_style=False)


def test_golden_byte_parity_two_level_sections(engine_doc, golden_doc):
    checked = 0
    for section in BYTE_SECTIONS:
        g_hosts = golden_doc.get(section, {})
        e_hosts = engine_doc.get(section, {})
        for host, g_body in g_hosts.items():
            if host not in e_hosts:
                continue  # stale golden host (pre-golden CSV revision)
            e_body = e_hosts[host]
            nested = g_body and all(isinstance(v, dict) for v in g_body.values())
            if nested:
                for ekey, g_entry in g_body.items():
                    if not isinstance(e_body, dict) or ekey not in e_body:
                        continue
                    assert _render(e_body[ekey]) == _render(g_entry), (
                        f"{section}/{host}/{ekey}: byte mismatch"
                    )
                    checked += 1
            else:
                assert _render(e_body) == _render(g_body), f"{section}/{host}: byte mismatch"
                checked += 1
    assert checked > 50  # the parity actually covered the golden sections


def test_golden_blackbox_unordered_parity(engine_doc, golden_doc):
    g = golden_doc.get("exporter_blackbox", {})
    e = engine_doc.get("exporter_blackbox", {})
    checked = 0
    for host, g_body in g.items():
        if host not in e:
            continue
        for ekey, g_entry in g_body.items():
            if ekey in e[host]:
                assert dict(e[host][ekey]) == dict(g_entry), f"blackbox/{host}/{ekey}"
                checked += 1
    assert checked > 50


def test_snmp_args_header_and_merge(spark, tmp_path):
    """O22: the trap_extra_args line lands verbatim at the top; merging a
    second write updates hostname-level entries and keeps the rest."""
    from workbook_exporter_fe_spark.operators.workbook import EXPORTER_SPECS, run_exporter
    from workbook_exporter_fe_spark.sinks.yaml_sink import (
        SNMP_ARGS_LINE,
        write_yaml_document,
    )

    wb = spark.createDataFrame(
        [
            ("h1", "h1.test.org", "10.0.0.1", "Loc", "GB", "exporter_cms", 3001),
            ("h2", "h2.test.org", "10.0.0.2", "Loc", "GB", "exporter_cms", 3002),
        ],
        '`Hostnames` string, `FQDN` string, `IP Address` string, `Location` string,'
        ' `Country` string, `Exporter_name_app` string, `App-Listen-Port` int',
    )
    path = str(tmp_path / "out.yaml")
    long1 = run_exporter(wb, EXPORTER_SPECS["exporter_cms"])
    text = write_yaml_document(long1, path, snmp_args=True)
    assert text.startswith(SNMP_ARGS_LINE + "\n")
    doc = yaml.safe_load(text)
    assert doc["trap_extra_args"].startswith(" --snmp.version 3 --snmp.username")
    assert doc["exporter_cms"]["h1"]["listen_port"] == 3001
    # field order = reference insert order
    assert list(doc["exporter_cms"]["h1"]) == [
        "ip_address", "listen_port", "location", "country", "username", "password",
    ]

    # merge: h2's port changes, h1 must survive untouched
    wb2 = wb.filter(F.col("Hostnames") == "h2").withColumn(
        "App-Listen-Port", F.lit(4002)
    )
    long2 = run_exporter(wb2, EXPORTER_SPECS["exporter_cms"])
    text2 = write_yaml_document(long2, path, merge_existing=True, snmp_args=True)
    doc2 = yaml.safe_load(text2)
    assert doc2["exporter_cms"]["h1"]["listen_port"] == 3001
    assert doc2["exporter_cms"]["h2"]["listen_port"] == 4002


@pytest.fixture(scope="module")
def fidelity_wb(spark):
    return spark.createDataFrame(
        [
            ("a1", "a1.test.org", "10.0.0.1", "Loc", "GB",
             "exporter_genesyscloud", 3001, "comm-a", None, None),
            ("b1", "b1.test.org", "10.0.0.2", "Loc", "GB",
             "exporter_baas", 3002, None, None, "sekrit"),
            ("w1", "w1.test.org", "10.0.0.3", "Loc", "GB",
             "exporter_weblm", 3003, None, "admin", "pw1"),
            ("w2", "w2.test.org", "10.0.0.4", "Loc2", "FR",
             "exporter_weblm", 3004, None, None, None),
        ],
        '`Hostnames` string, `FQDN` string, `IP Address` string, `Location` string,'
        ' `Country` string, `Exporter_name_app` string, `App-Listen-Port` int,'
        ' `comm_string` string, `ssh_username` string, `ssh_password` string',
    )


def _entry(spark_rows, exporter, host):
    out = {}
    for r in spark_rows:
        if r["exporter"] == exporter and r["hostname"] == host:
            out[r["field"]] = r["value"]
    return out


def test_genesyscloud_field_fidelity(spark, fidelity_wb):
    from workbook_exporter_fe_spark.operators.workbook import (
        EXPORTER_SPECS,
        run_exporter,
        spec_field_order,
    )

    rows = run_exporter(fidelity_wb, EXPORTER_SPECS["exporter_genesyscloud"]).collect()
    e = _entry(rows, "exporter_genesyscloud", "a1.test.org")
    # the reference's exact literal (:937) with BOTH missing-space quirks
    assert e["extra_args"] == (
        " --client.managed --billing.enabled --billing.frequency30m"
        " --usage.enabled --usage.frequency12h --client.first-day-of-month22"
        " --mos.enabled --mos.bandceilingcritical2.59999"
        " --mos.bandceilingbad3.59999--mos.bandceilingwarning3.09999"
        " --mos.bandceilinggood3.99999"
    )
    assert "--billing.frequency30m" in e["extra_args"]  # no space before 30m
    assert "3.59999--mos.bandceilingwarning" in e["extra_args"]  # glued flags
    assert e["client_id"] == "ENC[PKCS7...]"
    assert e["client_secret"] == "ENC[PKCS7...]"
    assert e["client_basepath"] == "https://api.mypurecloud.ie"
    assert e["community"] == "comm-a"
    assert e["listen_port"] == "3001"
    assert spec_field_order(EXPORTER_SPECS["exporter_genesyscloud"]) == [
        "listen_port", "extra_args", "client_id", "client_secret",
        "client_basepath", "ip_address", "location", "country", "community",
    ]


def test_baas_field_fidelity(spark, fidelity_wb):
    from workbook_exporter_fe_spark.operators.workbook import (
        EXPORTER_SPECS,
        run_exporter,
        spec_field_order,
    )

    rows = run_exporter(fidelity_wb, EXPORTER_SPECS["exporter_baas"]).collect()
    e = _entry(rows, "exporter_baas", "b1.test.org")
    assert e["username"] == "maas"
    assert e["extra_args"] == " --backup.timeout=30s --backup.frequency=1m "
    assert e["password"] == "sekrit"  # ssh_password wins over the ENC default
    assert e["bucket"] == "s3://<s2bucket>"
    assert spec_field_order(EXPORTER_SPECS["exporter_baas"]) == [
        "ip_address", "listen_port", "location", "country",
        "username", "extra_args", "password", "bucket",
    ]


def test_weblm_first_row_semantics(spark, fidelity_wb):
    """ONE hostname (first row's FQDN), values from the LAST row, the
    tomcat data_path literal, and the put-your-credentials defaults."""
    from workbook_exporter_fe_spark.operators.workbook import (
        EXPORTER_SPECS,
        run_exporter,
    )

    rows = run_exporter(fidelity_wb, EXPORTER_SPECS["exporter_weblm"]).collect()
    hosts = {r["hostname"] for r in rows}
    assert hosts == {"w1.test.org"}  # first row's FQDN only
    e = _entry(rows, "exporter_weblm", "w1.test.org")
    assert e["ip_address"] == "10.0.0.4"  # last row's values win
    assert e["location"] == "Loc2"
    assert e["data_path"] == "/opt/Avaya/tomcat/webapps/WebLM/data/"
    assert e["username"] == "put your username here"  # last row has no creds
    assert e["password"] == "put your password here"


def test_run_workbook_cli_merge_roundtrip(tmp_path):
    """The reference's end-user workflow via the CLI: csv → selected
    exporters → YAML; a second run MERGES new sections into the document
    and keeps the existing ones (write_yaml semantics)."""
    import json
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = str(tmp_path / "out.yaml")

    def run(*args):
        p = subprocess.run(
            [sys.executable, os.path.join(repo, "run_workbook.py"),
             "--input", CSV, "--out", out, *args],
            capture_output=True, text=True, timeout=300,
            env={**os.environ, "SPARK_GRAFT_CPUS": "4"},
        )
        for line in p.stdout.splitlines():
            if line.startswith("{"):
                return json.loads(line)
        raise AssertionError(p.stderr[-2000:])

    s1 = run("--exporters", "exporter_cms,exporter_gateway", "--add-snmp-args")
    assert s1["hosts_processed"]["exporter_cms"] == 2
    s2 = run("--exporters", "exporter_linux")
    assert s2["hosts_processed"]["exporter_linux"] == 84
    doc = yaml.safe_load(open(out))
    assert doc["trap_extra_args"].startswith(" --snmp.version 3")
    assert {"exporter_cms", "exporter_gateway", "exporter_linux"} <= set(doc)
