"""Per-file NDV theta sketches in the manifest (puffin-style stats).

Pins: sketches build per commit under the ``stats.ndv.columns``
property, merge to a table-level NDV that deduplicates ACROSS commits
(union semantics, not sum), survive compaction via re-sketch, and stay
metadata-only (no data scan at query time — the estimate comes from
sidecars)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from workbook_exporter_fe_spark.sources.snapshots import SnapshotTable


def _mk(spark, a, b):
    return spark.range(a, b).select(
        F.concat(F.lit("d"), F.col("id").cast("string")).alias("doc_id"),
        (F.col("id") % 7).alias("g"),
    )


@pytest.fixture()
def table(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    t.set_properties(**{"stats.ndv.columns": ["doc_id", "g"]})
    return t


def test_ndv_estimates_and_union_semantics(spark, table):
    table.commit(_mk(spark, 0, 1000).repartition(4))
    assert all("ndv_ref" in f for f in table.snapshot()["files"])
    est = table.column_ndv("doc_id")
    assert est == pytest.approx(1000, rel=0.05)
    assert table.column_ndv("g") == pytest.approx(7, abs=0.01)
    # overlapping append: 500 repeat ids + 500 new -> union, not sum
    table.commit(_mk(spark, 500, 1500).repartition(4))
    est2 = table.column_ndv("doc_id")
    assert est2 == pytest.approx(1500, rel=0.05)
    # time travel: the first snapshot still answers with its own files
    assert table.column_ndv("doc_id", sequence=1) == pytest.approx(
        1000, rel=0.05
    )
    # unknown / unsketched column
    assert table.column_ndv("nope") is None


def test_maintenance_cli_ndv(spark, tmp_path, capsys, monkeypatch):
    import importlib.util
    import json
    import os
    import sys

    spec = importlib.util.spec_from_file_location(
        "run_maintenance", os.path.join(os.path.dirname(__file__), "..",
                                        "run_maintenance.py")
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    root = str(tmp_path / "tbl")
    t = SnapshotTable(spark, root)
    t.set_properties(**{"stats.ndv.columns": ["doc_id"]})
    t.commit(_mk(spark, 0, 500))
    monkeypatch.setattr(sys, "argv", [
        "run_maintenance.py", "--snapshot-table", root,
        "--analyze", "doc_id,g",
    ])
    m.main()
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    ndv = report["snapshot_tables"][root]["ndv"]
    assert ndv["doc_id"] == pytest.approx(500, rel=0.05)
    assert ndv["g"] is None  # never sketched


def test_ndv_compaction_and_pre_property_files(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    t.commit(_mk(spark, 0, 800).repartition(2))  # pre-property: no sketch
    assert t.column_ndv("doc_id") is None
    t.set_properties(**{"stats.ndv.columns": ["doc_id"]})
    t.commit(_mk(spark, 800, 1000).repartition(2))
    # only the covered 200 contribute (partial coverage is honest-None
    # per file, not a wrong table-level number pretending completeness)
    assert t.column_ndv("doc_id") == pytest.approx(200, rel=0.05)
    # compaction rewrites everything through _file_stats -> full coverage
    t.compact(target_file_bytes=1 << 30)
    assert t.column_ndv("doc_id") == pytest.approx(1000, rel=0.05)
    assert all("ndv_ref" in f for f in t.snapshot()["files"])
