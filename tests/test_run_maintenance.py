"""run_maintenance.py: policy parsing + the wired maintenance pass."""

from __future__ import annotations

import json
import sys

import pytest


def _mod():
    sys.path.insert(0, "/root/repo")
    import run_maintenance

    return run_maintenance


def test_parse_policies():
    m = _mod()
    assert m._parse_policies("tier1='30 days',tier2=interval 60 days") == {
        "tier1": "interval 30 days",
        "tier2": "interval 60 days",
    }
    with pytest.raises(ValueError):
        m._parse_policies("tier1")


def test_maintenance_pass_over_store(spark, sequences, tmp_path, capsys,
                                     monkeypatch):
    """Build a small tier store + snapshot table, run the CLI main()
    in-process (shared session), check the report and the side effects."""
    from workbook_exporter_fe_spark.plans.pipeline import TierPipeline
    from workbook_exporter_fe_spark.sources.snapshots import SnapshotTable

    out = str(tmp_path / "store")
    TierPipeline(spark, out).run(sequences.limit(2000), "maint-test")
    snap_root = str(tmp_path / "snap")
    st = SnapshotTable(spark, snap_root)
    for i in range(3):
        st.commit(spark.range(i * 10, (i + 1) * 10).selectExpr("id"))

    m = _mod()
    monkeypatch.setattr(sys, "argv", [
        "run_maintenance.py",
        "--tiers", out,
        "--retention", "tier1='3650 days',tier2='3651 days',tier3='3652 days'",
        "--verify",
        "--snapshot-table", snap_root,
        "--compact-snapshots", "--expire", "--keep-last", "1",
    ])
    m.main()
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["tiers"]["verify"]["ok"] is True
    assert report["tiers"]["retention"]["tier1"]["dropped"] == 0
    snap = report["snapshot_tables"][snap_root]
    assert snap["sequence"] == 3
    # compaction committed a replace snapshot; expiry kept only its head
    assert snap["compacted_to"] == 4
    assert snap["expire"]["expired_snapshots"] == 3
    st2 = SnapshotTable(spark, snap_root)
    assert st2.read().count() == 30

    # a non-decreasing-TTL violation surfaces as the operator's error
    monkeypatch.setattr(sys, "argv", [
        "run_maintenance.py", "--tiers", out,
        "--retention", "tier1='10 days',tier2='5 days',tier3='20 days'",
    ])
    with pytest.raises(ValueError, match="non-decreasing"):
        m.main()


def test_parse_bounds():
    m = _mod()
    assert m._parse_bounds(None) is None
    assert m._parse_bounds("a<=5,a>=1,b<=x") == {
        "a": (1, 5), "b": (None, "x")
    }
    with pytest.raises(ValueError):
        m._parse_bounds("a=5")


def test_delete_where_pass(spark, tmp_path, capsys, monkeypatch):
    """--delete-where runs a CoW delete before compaction/expiry and the
    report carries the rewrite accounting."""
    from workbook_exporter_fe_spark.sources.snapshots import SnapshotTable

    root = str(tmp_path / "snap")
    st = SnapshotTable(spark, root)
    for i in range(3):
        st.commit(
            spark.range(i * 10, (i + 1) * 10).selectExpr("id").coalesce(1)
        )

    m = _mod()
    monkeypatch.setattr(sys, "argv", [
        "run_maintenance.py",
        "--snapshot-table", root,
        "--delete-where", "id < 10",
        "--delete-bounds", "id<=9",
    ])
    m.main()
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    snap = report["snapshot_tables"][root]
    assert snap["delete"]["rows_deleted"] == 10
    assert snap["delete"]["files_rewritten"] == 1
    assert SnapshotTable(spark, root).read().count() == 20


def test_bloom_and_zorder_pass(spark, tmp_path, capsys, monkeypatch):
    """--bloom-columns sets the table property BEFORE compaction so the
    rewrite blooms its output; --zorder clusters the rewrite on the
    Morton code and min/max pruning works on both listed columns."""
    from pyspark.sql import functions as F

    from workbook_exporter_fe_spark.sources.snapshots import (
        SnapshotTable,
        bloom_entry,
    )

    root = str(tmp_path / "snap")
    st = SnapshotTable(spark, root)
    grid = spark.range(4096).select(
        (F.col("id") % 64).alias("x"),
        F.floor(F.col("id") / 64).cast("long").alias("y"),
        F.concat(F.lit("d"), F.col("id").cast("string")).alias("doc_id"),
    ).orderBy(F.xxhash64("id"))
    st.commit(grid.repartition(8))
    target_mb = 1  # small table -> the ceil-div still yields 1 file goal,
    # so force multiple output files via a tiny target through the CLI is
    # not possible (min 1 MB); assert the property+bloom wiring instead
    m = _mod()
    monkeypatch.setattr(sys, "argv", [
        "run_maintenance.py",
        "--snapshot-table", root,
        "--bloom-columns", "doc_id",
        "--compact-snapshots",
        "--zorder", "x,y",
        "--target-file-mb", str(target_mb),
    ])
    m.main()
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    snap = report["snapshot_tables"][root]
    assert snap["properties"]["bloom.columns"] == ["doc_id"]
    st2 = SnapshotTable(spark, root)
    msum = st2.snapshot()["summary"]
    assert msum["zorder_by"] == ["x", "y"]
    # the zorder rewrite went through _file_stats -> blooms attached
    assert all(
        bloom_entry(f, "doc_id") is not None
        for f in st2.snapshot()["files"]
    )
    _, pruned = st2.scan_files(col_eq={"doc_id": "nope"})
    assert pruned == len(st2.snapshot()["files"])
    assert st2.read().count() == 4096
