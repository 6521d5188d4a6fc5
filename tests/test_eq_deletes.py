"""Equality deletes (Iceberg v2) on SnapshotTable.

Pins: delete_eq commits ONLY the key values (zero table scan, zero data
files touched), reads anti-join null-safely, the delete applies ONLY to
files whose data sequence <= the anchor (later appends of the same key
survive — the CDC re-insert case), CoW rewrites/compactions MATERIALIZE
applicable entries and retire them by applicability, row-exact guards
fall back to counted reads, GC keeps referenced key files, the
snapshot_log data source masks identically, and MoR position deletes
stack with equality deletes.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from workbook_exporter_fe_spark.sources.snapshots import (
    SnapshotTable,
    carry_deletes,
    path_dseq,
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


def test_delete_eq_never_scans_or_touches_data(spark, table):
    before = _data_paths(table)
    seq = table.delete_eq([3, 7, 11, 999], ["id"])  # 999 absent: harmless
    m = table.snapshot(seq)
    assert _data_paths(table) == before
    assert m["summary"] == {"mode": "eq", "eq_cols": ["id"], "keys": 4}
    d = m["deletes"][-1]
    assert d["eq_cols"] == ["id"] and d["rows"] == 4 and d["seq"] == seq - 1
    got = table.read()
    assert got.count() == 47
    assert got.where("id in (3, 7, 11)").count() == 0
    # time travel sees pre-delete rows
    assert table.read(seq - 1).count() == 50


def test_delete_eq_applies_only_below_anchor(spark, table):
    table.delete_eq([10], ["id"])
    # re-append the SAME key after the delete: the new row's file has a
    # higher data sequence, so the delete does NOT mask it (CDC re-insert)
    table.commit(
        spark.createDataFrame([(10, 0, -99.0)], "id long, g long, v double")
    )
    got = table.read()
    assert got.count() == 50
    rows = got.where("id = 10").collect()
    # exactly the NEW row survives (the pre-anchor one stays masked)
    assert len(rows) == 1 and rows[0].v == -99.0


def test_delete_eq_multi_column_and_nulls(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    df = spark.createDataFrame(
        [(1, "a"), (1, None), (2, "a"), (2, "b"), (3, None)],
        "k int, s string",
    )
    t.commit(df)
    t.delete_eq([{"k": 1, "s": None}, {"k": 2, "s": "b"}], ["k", "s"])
    got = sorted((r.k, r.s) for r in t.read().collect())
    # NULL keys match NULL values (Iceberg equality-delete semantics)
    assert got == [(1, "a"), (2, "a"), (3, None)]


def test_compaction_materializes_and_retires(spark, table):
    table.delete_eq([0, 1, 2], ["id"])
    table.compact(target_file_bytes=1 << 30)
    m = table.snapshot()
    assert not m.get("deletes")  # no file with dseq <= anchor remains
    assert m["total_rows"] == 47
    assert table.read().count() == 47
    assert table.read().where("id < 3").count() == 0


def test_scoped_rewrite_keeps_applicable_entry(spark, table):
    table.delete_eq([5], ["id"])
    # CoW update touching ONE file: the entry must survive (other files
    # still carry pre-anchor rows) and the rewritten file materialized it
    table.update_where("id = 20", {"v": F.lit(-1.0)})
    m = table.snapshot()
    assert any("eq_cols" in d for d in m.get("deletes") or [])
    got = table.read()
    assert got.count() == 49  # 50 - id 5
    assert got.where("id = 5").count() == 0
    assert got.where("v = -1.0").count() == 1
    # a second update: guard must use the counted live rows, not the
    # (upper-bound) footer map
    table.update_where("id = 6", {"v": F.lit(-2.0)})
    assert table.read().count() == 49


def test_merge_into_with_outstanding_eq_delete(spark, table):
    table.delete_eq([10, 11], ["id"])
    src = _mk(spark, 10, 13)  # 10, 11 are eq-deleted -> re-insert; 12 matches
    table.merge_into(src, on=["id"])
    got = table.read()
    assert got.count() == 50
    assert got.where("id BETWEEN 10 AND 12").count() == 3


def test_mor_and_eq_stack(spark, table):
    table.delete_where("id >= 45", mode="mor")  # positions: 5 rows
    table.delete_eq([0, 1, 46], ["id"])  # 46 already masked -> no double
    got = table.read()
    assert got.count() == 43  # 50 - 5 - 2
    assert got.where("id in (0, 1, 45, 46)").count() == 0
    table.compact(target_file_bytes=1 << 30)
    m = table.snapshot()
    assert not m.get("deletes")
    assert table.read().count() == 43


def test_stacked_eq_entries_mixed_anchors(spark, table):
    # two pre-append entries (merge into one union anti-join for old
    # files), an append between, and a post-append entry (unconditional
    # for every file) — the dseq scoping must keep the re-insert alive
    table.delete_eq([1], ["id"])
    table.delete_eq([2], ["id"])
    table.commit(_mk(spark, 1, 2))  # re-insert id=1 above both anchors
    table.delete_eq([3], ["id"])    # anchored after the re-insert
    got = table.read()
    assert got.count() == 48  # 50 - {1,2,3} + re-inserted 1
    assert got.where("id = 1").count() == 1
    assert got.where("id in (2, 3)").count() == 0
    # the data source agrees bit-for-bit
    from workbook_exporter_fe_spark.sources import snapshot_source as ss

    ss.register(spark)
    src = spark.read.format("snapshot_log").load(table.root)
    assert sorted(r.id for r in src.select("id").collect()) == sorted(
        r.id for r in got.select("id").collect()
    )


def test_gc_keeps_eq_key_files(spark, table):
    table.delete_eq([0], ["id"])
    table.commit(_mk(spark, 50, 60))
    table.expire_snapshots(keep_last=1)
    assert table.read().count() == 59
    res = table.remove_orphan_files(grace_sec=0.0)
    assert res["orphans_removed"] == 0
    assert table.read().count() == 59
    assert table.read().where("id = 0").count() == 0


def test_datasource_masks_eq(spark, table):
    from workbook_exporter_fe_spark.sources import snapshot_source as ss

    table.delete_eq([2, 4, 6], ["id"])
    table.commit(_mk(spark, 4, 5))  # re-insert id=4 above the anchor
    expect_ids = sorted(set(range(50)) - {2, 4, 6} | {4})
    ss.register(spark)
    got = spark.read.format("snapshot_log").load(table.root)
    assert sorted(r.id for r in got.select("id").collect()) == expect_ids
    assert got.count() == table.read().count()


def test_datasource_masks_eq_multicol_nulls(spark, tmp_path):
    from workbook_exporter_fe_spark.sources import snapshot_source as ss

    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    df = spark.createDataFrame(
        [(1, "a"), (1, None), (2, "a"), (3, None)], "k int, s string"
    )
    t.commit(df)
    t.delete_eq([{"k": 1, "s": None}, {"k": 3, "s": None}], ["k", "s"])
    ss.register(spark)
    got = spark.read.format("snapshot_log").load(t.root)
    assert sorted((r.k, r.s) for r in got.collect()) == [(1, "a"), (2, "a")]
    assert got.count() == t.read().count()


def test_empty_and_unknown_keys(spark, table):
    seq = table.current_sequence()
    assert table.delete_eq([], ["id"]) == seq  # no keys -> no commit
    from workbook_exporter_fe_spark.sources.snapshots import SchemaMismatch

    with pytest.raises(SchemaMismatch):
        table.delete_eq([1], ["nope"])


def test_maintenance_cli_delete_eq(spark, tmp_path, capsys, monkeypatch):
    import importlib.util
    import json
    import sys

    spec = importlib.util.spec_from_file_location(
        "run_maintenance", os.path.join(os.path.dirname(__file__), "..",
                                        "run_maintenance.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    root = str(tmp_path / "tbl")
    t = SnapshotTable(spark, root)
    t.commit(_mk(spark, 0, 30).repartition(3))
    files_before = _data_paths(t)
    monkeypatch.setattr(sys, "argv", [
        "run_maintenance.py", "--snapshot-table", root,
        "--delete-eq", "id:1,2,3",
    ])
    mod.main()
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    snap = report["snapshot_tables"][root]
    assert snap["delete_eq"]["keys"] == 3
    t2 = SnapshotTable(spark, root)
    assert _data_paths(t2) == files_before
    assert t2.read().count() == 27


def test_upsert_eq_single_atomic_commit(spark, table):
    batch = spark.createDataFrame(
        [(10, 0, -1.0), (11, 1, -2.0), (100, 0, -3.0)],
        "id long, g long, v double",
    )
    seq = table.upsert_eq(batch, ["id"])
    m = table.snapshot(seq)
    assert m["operation"] == "upsert"
    assert m["summary"]["mode"] == "upsert"
    assert m["summary"]["rows_upserted"] == 3
    got = table.read()
    assert got.count() == 51  # 50 - 2 replaced + 3 new
    vals = {r.id: r.v for r in got.where("id in (10, 11, 100)").collect()}
    assert vals == {10: -1.0, 11: -2.0, 100: -3.0}
    # ONE snapshot: time travel to seq-1 shows the pre-upsert table
    assert table.read(seq - 1).count() == 50
    # a second upsert of the same key replaces the first upsert's row
    table.upsert_eq(
        spark.createDataFrame([(10, 0, -9.0)], "id long, g long, v double"),
        ["id"],
    )
    rows = table.read().where("id = 10").collect()
    assert len(rows) == 1 and rows[0].v == -9.0


def test_upsert_eq_rejects_duplicate_keys(spark, table):
    dup = spark.createDataFrame(
        [(1, 0, 1.0), (1, 0, 2.0)], "id long, g long, v double"
    )
    with pytest.raises(ValueError, match="duplicate"):
        table.upsert_eq(dup, ["id"])
    assert table.read().count() == 50  # nothing committed


def test_upsert_eq_empty_table_is_append(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    seq = t.upsert_eq(_mk(spark, 0, 5), ["id"])
    m = t.snapshot(seq)
    assert m["operation"] == "upsert"
    assert not m.get("deletes")  # nothing to mask on an empty table
    assert t.read().count() == 5


def test_upsert_then_compact_retires(spark, table):
    table.upsert_eq(
        spark.createDataFrame([(0, 0, -1.0)], "id long, g long, v double"),
        ["id"],
    )
    table.compact(target_file_bytes=1 << 30)
    m = table.snapshot()
    assert not m.get("deletes")
    assert table.read().count() == 50
    assert table.read().where("id = 0").first().v == -1.0


def test_stream_upsert_sink_exactly_once(spark, tmp_path):
    from workbook_exporter_fe_spark.sources import snapshot_source as ss
    from workbook_exporter_fe_spark.sources.snapshots import path_dseq

    ss.register(spark)
    root = str(tmp_path / "tbl")
    t = SnapshotTable(spark, root)
    t.commit(_mk(spark, 0, 20))
    src = str(tmp_path / "src")
    SnapshotTable(spark, src).commit(
        spark.createDataFrame(
            [(5, 0, -5.0), (6, 1, -6.0), (99, 4, -99.0)],
            "id long, g long, v double",
        )
    )
    q = (
        spark.readStream.format("snapshot_log").load(src)
        .writeStream.format("snapshot_log")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .option("upsertKeys", "id")
        .trigger(availableNow=True)
        .start(root)
    )
    q.awaitTermination(120)
    t2 = SnapshotTable(spark, root)
    m = t2.snapshot()
    assert m["operation"] == "upsert"
    got = t2.read()
    assert got.count() == 21  # 20 - 2 replaced + 3
    vals = {r.id: r.v for r in got.where("id in (5, 6, 99)").collect()}
    assert vals == {5: -5.0, 6: -6.0, 99: -99.0}
    # stream-written files were staged into a c-dir (path-derivable dseq)
    new = [f["path"] for f in m["files"] if f["path"] not in
           {x["path"] for x in t2.snapshot(m["parent"])["files"]}]
    assert new and all(path_dseq(p) > 0 for p in new)
    # replaying the same availableNow batch (fresh query, same
    # checkpoint) commits nothing new
    head = t2.current_sequence()
    q2 = (
        spark.readStream.format("snapshot_log").load(src)
        .writeStream.format("snapshot_log")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .option("upsertKeys", "id")
        .trigger(availableNow=True)
        .start(root)
    )
    q2.awaitTermination(120)
    assert SnapshotTable(spark, root).current_sequence() == head
    assert SnapshotTable(spark, root).read().count() == 21


def test_batch_writer_files_get_commit_dirs(spark, tmp_path):
    from workbook_exporter_fe_spark.sources import snapshot_source as ss
    from workbook_exporter_fe_spark.sources.snapshots import path_dseq

    ss.register(spark)
    root = str(tmp_path / "tbl")
    _mk(spark, 0, 10).write.format("snapshot_log").mode("append").save(root)
    t = SnapshotTable(spark, root)
    assert all(path_dseq(f["path"]) > 0 for f in t.snapshot()["files"])
    # so equality deletes are safe on batch-writer tables
    t.delete_eq([1], ["id"])
    assert t.read().count() == 9
    _mk(spark, 10, 12).write.format("snapshot_log").mode("append").save(root)
    assert SnapshotTable(spark, root).read().count() == 11


def test_carry_eq_unit():
    man = {
        "files": [{"path": "/d/c00000001-aaaaaaaa/p.parquet"},
                  {"path": "/d/c00000003-bbbbbbbb/p.parquet"}],
        "deletes": [
            {"paths": ["k"], "rows": 1, "eq_cols": ["id"], "seq": 1},
        ],
    }
    # the seq-1 file remains -> entry carries
    out = carry_deletes(man, {"/d/c00000003-bbbbbbbb/p.parquet"})
    assert out == man["deletes"]
    # only the seq-3 file remains (dseq 3 > anchor 1) -> entry retires
    assert carry_deletes(man, {"/d/c00000001-aaaaaaaa/p.parquet"}) == []
    assert path_dseq("/d/c00000003-bbbbbbbb/x/p.parquet") == 3
    assert path_dseq("/weird/p.parquet") == 0
