"""SnapshotTable branches + write-audit-publish (WAP).

Iceberg-style branching over the from-scratch snapshot log
(sources/snapshots.py): a branch is a named MUTABLE ref; commits
targeting it allocate global sequence numbers but advance only the
branch head, so main readers never see staged data until
``fast_forward`` publishes it atomically. The reference's analogue is
the upload-then-merge flow (workbook_exporter-fe.py:1758-1767 writes
into the existing YAML only after the whole exporter pass succeeded) —
here the audit step is explicit and the publish is a pointer swap.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from workbook_exporter_fe_spark.sources.snapshots import (
    IncrementalScanBreak,
    SnapshotConflict,
    SnapshotTable,
)


def _df(spark, lo, hi, tag):
    return spark.range(lo, hi).select(F.col("id"), F.lit(tag).alias("tag"))


def _rows(df):
    return sorted((r["id"], r["tag"]) for r in df.collect())


@pytest.fixture()
def table(spark, tmp_path):
    return SnapshotTable(spark, str(tmp_path / "tbl"))


def test_wap_stage_audit_publish(spark, table):
    table.commit(_df(spark, 0, 10, "a"))
    main_before = table.current_sequence()

    table.branch("audit")
    s_b1 = table.commit(_df(spark, 10, 20, "b"), branch="audit")
    s_b2 = table.commit(_df(spark, 20, 25, "c"), branch="audit")
    assert s_b2 > s_b1 > main_before

    # staged commits are invisible to main readers...
    assert table.current_sequence() == main_before
    assert table.read().count() == 10
    # ...but fully visible through the branch ref (the audit read)
    assert table.read("audit").count() == 25
    assert table.branches() == {"audit": s_b2}

    # publish: main jumps to the branch head atomically
    assert table.fast_forward("audit") == s_b2
    assert table.current_sequence() == s_b2
    assert table.read().count() == 25
    table.delete_branch("audit")
    assert table.branches() == {}


def test_fast_forward_conflict_when_main_advanced(spark, table):
    table.commit(_df(spark, 0, 10, "a"))
    table.branch("audit")
    table.commit(_df(spark, 10, 20, "b"), branch="audit")
    table.commit(_df(spark, 90, 95, "m"))  # main moves past the fork
    with pytest.raises(SnapshotConflict):
        table.fast_forward("audit")
    # main unharmed, branch still readable for re-staging decisions
    assert _rows(table.read())[-1][1] == "m"
    assert table.read("audit").count() == 20


def test_changes_follow_parent_chain_across_publish(spark, table):
    table.commit(_df(spark, 0, 10, "a"))
    wm = table.current_sequence()  # a consumer's watermark on main
    table.branch("audit")
    table.commit(_df(spark, 10, 20, "b"), branch="audit")
    head = table.fast_forward("audit")
    # the published commits ARE the change set after fast-forward
    assert table.changes(wm).count() == 10
    assert table.changes(wm, head).count() == 10


def test_changes_reject_foreign_branch_watermark(spark, table):
    table.commit(_df(spark, 0, 10, "a"))
    table.branch("audit")
    b = table.commit(_df(spark, 10, 20, "b"), branch="audit")
    table.commit(_df(spark, 90, 95, "m"))  # main: not an ancestor of b
    with pytest.raises(IncrementalScanBreak):
        table.changes(b)


def test_branch_isolation_and_global_sequences(spark, table):
    table.commit(_df(spark, 0, 10, "a"))
    table.branch("x")
    table.branch("y")
    sx = table.commit(_df(spark, 10, 20, "bx"), branch="x")
    sy = table.commit(_df(spark, 20, 30, "by"), branch="y")
    assert sx != sy
    assert table.read("x").count() == 20
    assert table.read("y").count() == 20
    assert {r["tag"] for r in table.read("x").collect()} == {"a", "bx"}
    assert {r["tag"] for r in table.read("y").collect()} == {"a", "by"}
    # main commit after branch commits must not collide with their seqs
    sm = table.commit(_df(spark, 50, 55, "m"))
    assert sm not in (sx, sy)
    assert table.read().count() == 15


def test_history_and_as_of_stay_on_main_chain(spark, table):
    import time as _t

    table.commit(_df(spark, 0, 10, "a"))
    table.branch("audit")
    table.commit(_df(spark, 10, 20, "b"), branch="audit")
    sm = table.commit(_df(spark, 50, 55, "m"))
    hist = [r["sequence"] for r in table.history().collect()]
    assert hist == [1, sm]  # the branch's staged commit is not main history
    assert table.as_of(_t.time() + 60) == sm


def test_expire_protects_branch_then_collects_after_delete(spark, table):
    for i in range(4):
        table.commit(_df(spark, 10 * i, 10 * i + 10, f"m{i}"))
    table.branch("audit")
    sb = table.commit(_df(spark, 100, 110, "b"), branch="audit")
    table.commit(_df(spark, 200, 205, "m4"))

    table.expire_snapshots(keep_last=1)
    # branch head and its ancestry survive expiry; audit read still whole
    assert table.read("audit").count() == 50
    assert os.path.exists(table._manifest_path(sb))

    table.delete_branch("audit")
    table.expire_snapshots(keep_last=1)
    assert not os.path.exists(table._manifest_path(sb))
    assert table.read().count() == 45  # main unaffected


def test_branch_schema_checked_against_branch_head(spark, table):
    from workbook_exporter_fe_spark.sources.snapshots import SchemaMismatch

    table.commit(_df(spark, 0, 10, "a"))
    table.branch("audit")
    bad = spark.range(3).select(F.col("id"), F.lit(1).alias("other"))
    with pytest.raises(SchemaMismatch):
        table.commit(bad, branch="audit")


def test_ref_namespace_is_shared(spark, table):
    table.commit(_df(spark, 0, 10, "a"))
    table.tag("v1")
    with pytest.raises(ValueError):
        table.branch("v1")
    table.branch("audit")
    with pytest.raises(ValueError):
        table.tag("audit")
    with pytest.raises(ValueError):
        table.branch("audit")  # no silent reset of staged work


def test_wap_from_empty_table(spark, table):
    table.branch("audit")  # fork at sequence 0: first load is auditable
    table.commit(_df(spark, 0, 10, "a"), branch="audit")
    assert table.current_sequence() == 0
    head = table.fast_forward("audit")
    assert table.current_sequence() == head
    assert table.read().count() == 10


def test_stream_tail_skips_foreign_branch_commits(spark, table, tmp_path):
    """The snapshot_log micro-batch reader plans batches along main's
    parent chain — a staged branch commit between two main commits must
    not leak into the stream."""
    table.commit(_df(spark, 0, 10, "a"))
    table.branch("audit")
    table.commit(_df(spark, 100, 200, "staged"), branch="audit")
    table.commit(_df(spark, 10, 20, "m"))

    from workbook_exporter_fe_spark.sources import snapshot_source as ss

    ss.register(spark)
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    q = (
        spark.readStream.format("snapshot_log")
        .option("starting", "earliest")
        .load(table.root)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() == 20
    assert {r["tag"] for r in got.collect()} == {"a", "m"}


def test_remove_orphan_files(spark, table):
    """Unreferenced parquet inside the data dir (failed task attempts,
    crashed commits) is GC'd once past the grace window; referenced files
    and young orphans survive."""
    table.commit(_df(spark, 0, 10, "a"))
    live_dir = os.path.dirname(table.snapshot()["files"][0]["path"])

    # a crashed commit: data written, no manifest
    orphan = os.path.join(table.data, "c_crashed", "part-0.parquet")
    os.makedirs(os.path.dirname(orphan))
    _df(spark, 50, 60, "x").coalesce(1).write.mode("overwrite").parquet(
        os.path.dirname(orphan) + "_tmp"
    )
    import shutil
    src = next(
        os.path.join(os.path.dirname(orphan) + "_tmp", n)
        for n in os.listdir(os.path.dirname(orphan) + "_tmp")
        if n.endswith(".parquet")
    )
    shutil.copy(src, orphan)
    shutil.rmtree(os.path.dirname(orphan) + "_tmp")

    # young orphan: inside the grace window → kept
    rep = table.remove_orphan_files(grace_sec=3600)
    assert rep["orphans_removed"] == 0
    assert os.path.exists(orphan)

    # age it past the window → removed; live files untouched
    old = os.path.getmtime(orphan) - 7200
    os.utime(orphan, (old, old))
    rep = table.remove_orphan_files(grace_sec=3600)
    assert rep["orphans_removed"] == 1
    assert not os.path.exists(orphan)
    assert table.read().count() == 10
    assert os.path.isdir(live_dir)


def test_maintenance_cli_remove_orphans(spark, tmp_path, monkeypatch, capsys):
    """run_maintenance --expire --remove-orphans: expiry first (dropping
    the manifests that pinned old files), then orphan GC under the CLI's
    grace knob."""
    import importlib.util
    import json as _json
    import sys as _sys

    from workbook_exporter_fe_spark.sources.snapshots import SnapshotTable

    root = str(tmp_path / "tbl")
    st = SnapshotTable(spark, root)
    st.commit(_df(spark, 0, 10, "a"))
    orphan = os.path.join(st.data, "stray.parquet")
    with open(orphan, "wb") as f:
        f.write(b"PAR1 not really parquet PAR1")
    os.utime(orphan, (1, 1))  # ancient

    spec = importlib.util.spec_from_file_location(
        "run_maintenance", os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "run_maintenance.py",
        )
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setattr(_sys, "argv", [
        "run_maintenance.py", "--snapshot-table", root,
        "--expire", "--keep-last", "1",
        "--remove-orphans", "--orphan-grace-min", "1",
    ])
    mod.main()
    report = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    entry = report["snapshot_tables"][root]
    assert entry["orphans"]["orphans_removed"] == 1
    assert not os.path.exists(orphan)
    assert SnapshotTable(spark, root).read().count() == 10
