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
