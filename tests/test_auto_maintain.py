"""Metadata-only table health + threshold auto-maintenance
(sources/maintenance.py): the policy seam that decides WHEN the
merge-on-read debt (micro-batch small files, position masks, equality
delete entries) gets paid by a compaction — without opening data files.
"""

from __future__ import annotations

import json
import sys

from pyspark.sql import functions as F

from workbook_exporter_fe_spark.sources.maintenance import (
    auto_maintain,
    table_health,
)
from workbook_exporter_fe_spark.sources.snapshots import SnapshotTable


def _build(spark, root, batches=6, rows=50):
    st = SnapshotTable(spark, root)
    for b in range(batches):
        df = spark.range(b * rows, (b + 1) * rows).select(
            F.col("id"),
            (F.col("id") % 7).alias("k"),
            F.concat(F.lit("v"), F.col("id").cast("string")).alias("s"),
        )
        st.commit(df.coalesce(1))
    return st


def test_table_health_counts_debt(spark, tmp_path):
    root = str(tmp_path / "t")
    st = _build(spark, root)
    h0 = table_health(st)
    assert h0["files"] == 6 and h0["rows_footer"] == 300
    assert h0["masked_rows"] == 0 and h0["eq_delete_entries"] == 0
    assert h0["snapshots_on_main"] == 6

    # merge-on-read debt: a position delete vector + an equality delete
    st.delete_where("id < 30", mode="mor")
    st.delete_eq([31, 32, 33], ["id"])
    h1 = table_health(st)
    assert h1["masked_rows"] == 30
    assert abs(h1["masked_fraction"] - 30 / 300) < 1e-9
    assert h1["position_delete_entries"] == 1
    assert h1["eq_delete_entries"] == 1 and h1["eq_delete_keys"] == 3
    # metadata-only: footer counts unchanged, live upper bound masked
    assert h1["rows_footer"] == 300
    assert h1["live_rows_upper_bound"] == 270


def test_empty_table_health(spark, tmp_path):
    st = SnapshotTable(spark, str(tmp_path / "e"))
    assert table_health(st) == {"sequence": 0, "files": 0, "empty": True}
    assert auto_maintain(st)["actions"] == []


def test_auto_maintain_below_thresholds_is_noop(spark, tmp_path):
    root = str(tmp_path / "t")
    st = _build(spark, root, batches=2)
    # 2 files, no masks, no entries; small-file ratio check disabled by
    # a generous target: with target 1 byte no file counts as small
    rep = auto_maintain(st, target_file_bytes=2)
    assert rep["actions"] == []
    assert rep["health_after"]["sequence"] == rep["health"]["sequence"]


def test_auto_maintain_compacts_on_small_files(spark, tmp_path):
    root = str(tmp_path / "t")
    st = _build(spark, root)
    rep = auto_maintain(st)  # 128 MB target: all 6 files are "small"
    acts = {a["action"]: a for a in rep["actions"]}
    assert acts["compact"]["ran"]
    assert any(r.startswith("small_files") for r in acts["compact"]["reasons"])
    after = rep["health_after"]
    assert after["files"] < rep["health"]["files"]
    assert st.read().count() == 300


def test_auto_maintain_pays_delete_debt(spark, tmp_path):
    root = str(tmp_path / "t")
    st = _build(spark, root, batches=3, rows=100)
    st.delete_where("id < 50", mode="mor")  # 50/300 masked > 5%
    st.delete_eq([51], ["id"])
    # entries threshold tripped too (2 > 1): the scope widens to every
    # eq-applicable file so the equality entry can actually retire
    rep = auto_maintain(
        st, target_file_bytes=2, masked_fraction=0.05, max_delete_entries=1
    )
    compact = [a for a in rep["actions"] if a["action"] == "compact"][0]
    assert any(r.startswith("masked_fraction") for r in compact["reasons"])
    assert any(r.startswith("delete_entries") for r in compact["reasons"])
    after = rep["health_after"]
    # the rewrite materialized the masks and retired every entry
    assert after["masked_rows"] == 0
    assert after["position_delete_entries"] == 0
    assert after["eq_delete_entries"] == 0
    assert after["rows_footer"] == 249
    assert st.read().count() == 249


def test_auto_maintain_scope_carries_clean_files(spark, tmp_path):
    """The rewrite tracks the DEBT, not the table: an already-compacted
    clean file is carried by reference, only the masked file and the
    micro-batch small files are rewritten."""
    root = str(tmp_path / "t")
    st = _build(spark, root, batches=4, rows=1000)
    st.compact(target_file_bytes=1 << 30)  # one big clean generation
    big = {f["path"] for f in st.snapshot()["files"]}
    assert len(big) == 1
    big_bytes = st.snapshot()["files"][0]["bytes"]
    for b in range(3):  # fresh micro-batches on top
        st.commit(
            spark.range(10000 + b * 5, 10000 + (b + 1) * 5)
            .selectExpr("id", "id % 7 as k", "cast(id as string) as s")
            .coalesce(1)
        )
    # target chosen so the clean generation is NOT "small" but the
    # micro-batches are (parquet overhead dominates at test scale)
    target = min(2 * big_bytes, 1 << 20)
    rep = auto_maintain(st, target_file_bytes=target)
    compact = [a for a in rep["actions"] if a["action"] == "compact"][0]
    assert compact["ran"] and compact["files_carried_clean"] >= 1
    child_paths = {f["path"] for f in st.snapshot()["files"]}
    assert big <= child_paths  # clean generation untouched
    assert st.read().count() == 4015


def test_auto_maintain_retention_window(spark, tmp_path):
    root = str(tmp_path / "t")
    st = _build(spark, root)
    rep = auto_maintain(st, keep_last=2, orphan_grace_sec=0.0)
    acts = [a["action"] for a in rep["actions"]]
    assert "expire+orphans" in acts
    assert rep["health_after"]["snapshots_on_main"] <= 2
    assert st.read().count() == 300


def test_cli_auto_flag(spark, tmp_path, capsys, monkeypatch):
    sys.path.insert(0, "/root/repo")
    import run_maintenance

    root = str(tmp_path / "t")
    st = _build(spark, root, batches=4)
    st.delete_eq([1, 2], ["id"])
    monkeypatch.setattr(sys, "argv", [
        "run_maintenance.py",
        "--snapshot-table", root,
        "--auto",
        "--expire", "--keep-last", "2",
        "--orphan-grace-min", "0",
    ])
    run_maintenance.main()
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    auto = report["snapshot_tables"][root]["auto"]
    assert {a["action"] for a in auto["actions"]} == {
        "compact", "expire+orphans"
    }
    assert auto["health_after"]["eq_delete_entries"] == 0
    st2 = SnapshotTable(spark, root)
    assert st2.read().count() == 198
