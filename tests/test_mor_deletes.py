"""Merge-on-read position deletes (delete vectors) on SnapshotTable.

Pins: a mor delete touches ZERO data files, reads mask exactly the
matching rows, vectors stack (a row can't be deleted twice), every CoW
rewrite/compaction MATERIALIZES the deletes it covers and retires
attribution, row accounting stays live-exact through update/merge/
drop_partitions, appends carry vectors forward, GC keeps referenced
vectors, and the snapshot_log data source masks per-file.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from workbook_exporter_fe_spark.sources.snapshots import (
    SnapshotTable,
    carry_deletes,
    dv_rows_by_file,
    live_rows_map,
)


def _mk(spark, a, b):
    return spark.range(a, b).select(
        F.col("id"),
        (F.col("id") % 5).alias("g"),
        (F.col("id") * 1.5).alias("v"),
    )


@pytest.fixture()
def table(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    t.commit(_mk(spark, 0, 50).repartition(4))
    return t


def _data_paths(t):
    return sorted(f["path"] for f in t.snapshot()["files"])


def test_mor_delete_touches_no_data_files(spark, table):
    before = _data_paths(table)
    seq = table.delete_where("id >= 40", mode="mor")
    m = table.snapshot(seq)
    assert _data_paths(table) == before  # identical file set, same paths
    assert m["summary"]["mode"] == "mor"
    assert m["summary"]["rows_deleted"] == 10
    assert m["total_rows"] == 40
    # reads mask exactly the deleted rows
    got = table.read()
    assert got.count() == 40
    assert got.agg(F.max("id")).first()[0] == 39
    # time travel still sees everything
    assert table.read(seq - 1).count() == 50
    # the vector is file-attributed and live accounting matches
    dv = dv_rows_by_file(m)
    assert sum(dv.values()) == 10
    assert sum(live_rows_map(m).values()) == 40
    # files() metadata surfaces both counts
    meta = table.files().collect()
    assert sum(r["rows"] for r in meta) == 50
    assert sum(r["live_rows"] for r in meta) == 40


def test_mor_vectors_stack_and_never_double_delete(spark, table):
    table.delete_where("id % 10 = 0", mode="mor")  # 5 rows
    # overlapping predicate: rows already masked are invisible, so the
    # second vector holds only the NEW 5 (id%5=0 includes id%10=0)
    seq = table.delete_where("id % 5 = 0", mode="mor")
    m = table.snapshot(seq)
    assert m["summary"]["rows_deleted"] == 5
    assert len(m["deletes"]) == 2
    assert table.read().count() == 40
    assert table.read().where(F.col("id") % 5 == 0).count() == 0
    # nothing matched -> no commit, no orphan vector
    assert table.delete_where("id < 0", mode="mor") == seq


def test_cow_rewrite_materializes_deletes(spark, table):
    table.delete_where("id >= 45", mode="mor")
    # CoW update on other rows: touched files rewrite through the DV
    # mask; their attribution retires from the child manifest
    table.update_where("id = 1", {"v": F.lit(-1.0)})
    m = table.snapshot()
    assert table.read().count() == 45
    assert table.read().where("v = -1.0").count() == 1
    # every touched file's attribution is gone; untouched files keep
    # theirs (vectors survive only where still needed)
    live = live_rows_map(m)
    assert sum(live.values()) == 45
    # a full compaction retires ALL vectors
    table.compact(target_file_bytes=1 << 30)
    m2 = table.snapshot()
    assert not m2.get("deletes")
    assert m2["total_rows"] == 45
    assert table.read().count() == 45
    assert table.read().where("id >= 45").count() == 0


def test_mor_then_merge_and_append_accounting(spark, table):
    table.delete_where("id < 10", mode="mor")
    src = _mk(spark, 5, 15)  # 5-9 are deleted (insert), 10-14 match
    table.merge_into(src, on=["id"])
    got = table.read()
    # 40 survivors (10..49, with 10..14 updated IN PLACE) + 5 inserts
    # (5..9 — masked rows don't match, so merge re-inserts them)
    assert got.count() == 45
    assert got.where("id < 5").count() == 0
    assert got.where("id BETWEEN 5 AND 14").count() == 10
    # appends carry outstanding vectors forward (45 - 5 masked + 10 new)
    table.delete_where("id >= 45", mode="mor")
    table.commit(_mk(spark, 100, 110))
    m = table.snapshot()
    assert m["operation"] == "append"
    assert m.get("deletes")
    assert table.read().count() == 50
    assert m["total_rows"] == 50


def test_drop_partitions_live_accounting(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    t.set_properties(**{"partition.spec": ["g"]})
    t.commit(_mk(spark, 0, 50))
    t.delete_where("id = 0", mode="mor")  # one row in partition g=0
    res = t.drop_partitions("g", equals="0")
    assert res["rows_dropped"] == 9  # 10 footer rows minus 1 masked
    m = t.snapshot()
    assert not m.get("deletes")  # attribution retired with the partition
    assert t.read().count() == 40


def test_gc_keeps_referenced_vectors(spark, table):
    masked_seq = table.delete_where("id >= 40", mode="mor")
    table.commit(_mk(spark, 50, 60))
    # rollback to the masked snapshot restores its deletes
    table.rollback(masked_seq)
    assert table.read().count() == 40
    table.rollback(masked_seq + 1)  # back to the append (50 rows live)
    table.expire_snapshots(keep_last=1)
    # the vector's dir is still referenced by the kept manifest
    assert table.read().count() == 50
    res = table.remove_orphan_files(grace_sec=0.0)
    assert res["orphans_removed"] == 0
    assert table.read().count() == 50


def test_datasource_masks_positions(spark, table):
    from workbook_exporter_fe_spark.sources import snapshot_source as ss

    table.delete_where("id % 7 = 0", mode="mor")  # 8 rows of 50
    expect = 50 - 8
    assert table.read().count() == expect
    ss.register(spark)
    got = spark.read.format("snapshot_log").load(table.root)
    assert got.count() == expect
    assert got.where(F.col("id") % 7 == 0).count() == 0
    assert got.agg(F.sum("id")).first()[0] == sum(
        i for i in range(50) if i % 7
    )


def test_maintenance_cli_mor(spark, tmp_path, capsys, monkeypatch):
    import importlib.util
    import json
    import sys

    spec = importlib.util.spec_from_file_location(
        "run_maintenance", os.path.join(os.path.dirname(__file__), "..",
                                        "run_maintenance.py")
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    root = str(tmp_path / "tbl")
    t = SnapshotTable(spark, root)
    t.commit(_mk(spark, 0, 30).repartition(3))
    files_before = _data_paths(t)
    monkeypatch.setattr(sys, "argv", [
        "run_maintenance.py", "--snapshot-table", root,
        "--delete-where", "id < 10", "--delete-mode", "mor",
    ])
    m.main()
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    snap = report["snapshot_tables"][root]
    assert snap["delete"]["mode"] == "mor"
    assert snap["delete"]["rows_deleted"] == 10
    t2 = SnapshotTable(spark, root)
    assert _data_paths(t2) == files_before
    assert t2.read().count() == 20


def test_carry_deletes_unit():
    man = {"deletes": [
        {"paths": ["dv1"], "rows": 3, "data_files": {"a": 2, "b": 1}},
        {"paths": ["dv2"], "rows": 1, "data_files": {"b": 1}},
    ]}
    out = carry_deletes(man, {"b"})
    assert out == [{"paths": ["dv1"], "rows": 3, "data_files": {"a": 2}}]
    assert carry_deletes(man, {"a", "b"}) == []
    assert carry_deletes({"files": []}, {"a"}) == []
