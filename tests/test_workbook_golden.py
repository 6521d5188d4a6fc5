"""Golden-fixture parity: engine output vs the reference's own test artifact.

The reference ships exactly one test pair:
dummy_data/dummy_data.csv → dummy_data/example_output.yaml. The golden was
generated from an earlier CSV revision, so a handful of golden entries no
longer correspond to shipped input rows (e.g. `Avaya-PC5-1.test.org` under
exporter_windows while the shipped CSV routes that host to exporter_linux/
exporter_pc5) — SURVEY §5 / Appendix A. The parity contract therefore is:

  For every (exporter, hostname) present in BOTH the golden document and
  the engine output, every field must match exactly; and ≥90% of golden
  hostnames per section must be produced at all.

This pins our semantics to the fixture (fixtures win over the reference's
buggy code paths) while tolerating the known-stale golden rows.
"""

from __future__ import annotations

import yaml
import pytest

GOLDEN = "/root/reference/dummy_data/example_output.yaml"
CSV = "/root/reference/dummy_data/dummy_data.csv"

GOLDEN_SECTIONS = [
    "exporter_blackbox",
    "exporter_linux",
    "exporter_cms",
    "exporter_windows",
    "exporter_gateway",
    "exporter_tcti",
]


def _golden_long() -> set[tuple]:
    doc = yaml.safe_load(open(GOLDEN))
    rows = set()
    for exporter, hosts in doc.items():
        for hostname, body in hosts.items():
            # 3-level sections nest entry_key → fields; flat sections don't
            nested = all(isinstance(v, dict) for v in body.values()) and body
            if nested:
                for entry_key, fields in body.items():
                    for f, v in fields.items():
                        rows.add((exporter, str(hostname), str(entry_key), f, str(v)))
            else:
                for f, v in body.items():
                    rows.add((exporter, str(hostname), None, f, str(v)))
    return rows


@pytest.fixture(scope="module")
def engine_rows(spark):
    from workbook_exporter_fe_spark.operators.workbook import run_exporters
    from workbook_exporter_fe_spark.sources.workbook_io import read_workbook_csv

    df = read_workbook_csv(spark, CSV, preamble_rows=7)  # shipped dummy quirk
    out = run_exporters(df, GOLDEN_SECTIONS)
    return {
        (r["exporter"], r["hostname"], r["entry_key"], r["field"], r["value"])
        for r in out.collect()
    }


def test_golden_field_parity(engine_rows):
    golden = _golden_long()
    golden_hosts = {(e, h) for (e, h, _, _, _) in golden}
    engine_hosts = {(e, h) for (e, h, _, _, _) in engine_rows}
    common_hosts = golden_hosts & engine_hosts

    # coverage: ≥90% of each golden section's hosts are produced
    for section in GOLDEN_SECTIONS:
        g = {h for (e, h) in golden_hosts if e == section}
        c = {h for (e, h) in common_hosts if e == section}
        assert len(c) >= 0.9 * len(g), f"{section}: only {len(c)}/{len(g)} hosts produced"

    # exact field parity per (exporter, hostname, entry_key): stale golden
    # *entries* exist too (e.g. ssh_banner probes for rows whose shipped
    # ssh-banner flag is now empty), so intersect at entry granularity —
    # but the intersection must stay ≥90% of golden entries.
    golden_entries = {(e, h, k) for (e, h, k, _, _) in golden}
    engine_entries = {(e, h, k) for (e, h, k, _, _) in engine_rows}
    common = golden_entries & engine_entries
    assert len(common) >= 0.9 * len(golden_entries), (
        f"only {len(common)}/{len(golden_entries)} golden entries produced"
    )
    g_common = {r for r in golden if (r[0], r[1], r[2]) in common}
    e_common = {r for r in engine_rows if (r[0], r[1], r[2]) in common}
    missing = g_common - e_common
    assert not missing, f"golden fields not reproduced (first 10): {sorted(missing, key=repr)[:10]}"


def test_engine_covers_all_current_rows(spark, engine_rows):
    """Engine output is a superset: hosts newly present in the shipped CSV
    (post-golden additions) are processed too — 'all' really means all."""
    from workbook_exporter_fe_spark.sources.workbook_io import read_workbook_csv

    df = read_workbook_csv(spark, CSV, preamble_rows=7)
    n_linux_rows = df.filter(df["Exporter_name_os"] == "exporter_linux").count()
    linux_hosts = {h for (e, h, _, _, _) in engine_rows if e == "exporter_linux"}
    assert len(linux_hosts) == n_linux_rows  # all 84, not the golden's 43


def test_all_exporters_run(spark):
    """Every spec in the catalog executes over the reference CSV; exporters
    with matching rows produce output ('all' really means all)."""
    from workbook_exporter_fe_spark.operators.workbook import EXPORTER_SPECS, run_exporters
    from workbook_exporter_fe_spark.sources.workbook_io import read_workbook_csv

    df = read_workbook_csv(spark, CSV, preamble_rows=7)
    out = run_exporters(df)  # all specs
    per = {r["exporter"] for r in out.select("exporter").distinct().collect()}
    assert len(per) >= 30  # CSV has rows for 32 of the 37 specs
    assert "exporter_kafka" in per  # NameError-dead in the reference (:830)
    assert "exporter_weblm" in per  # NameError-dead in the reference (:1052)
