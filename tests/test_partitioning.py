"""Hidden partitioning (sources/partitioning.py + SnapshotTable wiring).

Pins: spec parsing, the Spark-expr/Python-twin equivalence (partition
pruning is only sound if the driver probe recomputes the writer's value
bit-exactly), manifest tuples, transform-aware file skipping, hidden-ness
of the derived columns, metadata-only drop_partitions, compaction
re-tupling, and the expire_snapshots nested-dir regression.
"""

from __future__ import annotations

import json
import os
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from workbook_exporter_fe_spark.sources.partitioning import (
    PartitionField,
    file_survives_partition,
    parse_spec,
    partition_columns,
    partition_value,
)
from workbook_exporter_fe_spark.sources.snapshots import SnapshotTable

SPEC = ["day(ts)", "bucket(4, doc_id)", "source"]


def _mk(spark, n=64):
    return spark.range(n).select(
        F.concat(F.lit("d"), F.col("id").cast("string")).alias("doc_id"),
        (
            F.lit(datetime(2024, 1, 1))
            + F.make_interval(hours=(F.col("id") % 96).cast("int"))
        ).alias("ts"),
        F.when(F.col("id") % 3 == 0, "web").otherwise("code").alias("source"),
        (F.col("id") * 10).alias("v"),
    )


@pytest.fixture()
def table(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    t.set_properties(**{"partition.spec": SPEC})
    t.commit(_mk(spark))
    return t


# ------------------------------------------------------------ spec parsing
def test_parse_spec_shapes():
    fields = parse_spec(["day(ts)", "bucket(16, doc_id)", "truncate(8,s)", "src"])
    assert [(f.name, f.transform, f.param, f.source) for f in fields] == [
        ("ts_day", "day", None, "ts"),
        ("doc_id_bucket16", "bucket", 16, "doc_id"),
        ("s_truncate8", "truncate", 8, "s"),
        ("src", "identity", None, "src"),
    ]
    for bad in ("day(a,b)", "bucket(doc_id)", "bucket(0, x)", "q-r", ""):
        with pytest.raises(ValueError):
            parse_spec([bad])
    with pytest.raises(ValueError, match="duplicate"):
        parse_spec(["day(ts)", "day(ts)"])


# --------------------------------------------- Spark expr == Python twin
def test_twin_equivalence(spark):
    """The dir-name string Spark writes must equal partition_value's
    output for every transform — otherwise pruning silently loses rows."""
    df = spark.createDataFrame(
        [
            ("doc-1", datetime(2024, 3, 9, 23, 59, 59), "web services", -17),
            ("x", datetime(2023, 12, 31, 0, 0), "c", 0),
            ("Ω≤uni", datetime(2024, 2, 29, 12, 30), "web", 123456),
        ],
        "doc_id string, ts timestamp, source string, v long",
    )
    fields = parse_spec(
        ["day(ts)", "hour(ts)", "month(ts)", "bucket(7, doc_id)",
         "bucket(5, v)", "truncate(3, source)", "truncate(100, v)",
         "source", "v"]
    )
    got = df.select(
        "doc_id", "ts", "source", "v", *partition_columns(df, fields)
    ).collect()
    for r in got:
        raw = {"ts": r.ts, "doc_id": r.doc_id, "source": r.source, "v": r.v}
        for f in fields:
            spark_side = r["__p_" + f.name]
            assert str(spark_side) == partition_value(f, raw[f.source]), (
                f.name,
                raw[f.source],
            )


# ------------------------------------------------- manifest + hidden-ness
def test_commit_records_tuples_and_stays_hidden(spark, table):
    files = table.snapshot()["files"]
    assert files and all(
        set(f["partition"]) == {"ts_day", "doc_id_bucket4", "source"}
        for f in files
    )
    # one file per partition tuple (write.distribution-mode=hash)
    tuples = [json.dumps(f["partition"], sort_keys=True) for f in files]
    assert len(tuples) == len(set(tuples))
    # hidden: readers see the ORIGINAL schema and values, no __p_ columns
    got = table.read()
    assert got.columns == ["doc_id", "ts", "source", "v"]
    assert got.count() == 64
    assert got.agg(F.sum("v")).first()[0] == sum(i * 10 for i in range(64))
    # partitions() metadata view accounts for every file and row
    parts = table.partitions().collect()
    assert sum(p.n_files for p in parts) == len(files)
    assert sum(p.rows for p in parts) == 64


def test_partition_pruning(spark, table):
    n_files = len(table.snapshot()["files"])
    # equality on the bucketed id: only that bucket's files survive,
    # and the row IS found (no false negative)
    keep, pruned = table.scan_files(col_eq={"doc_id": "d7"})
    assert pruned > 0 and len(keep) + pruned == n_files
    assert (
        table.read(col_eq={"doc_id": "d7"})
        .where(F.col("doc_id") == "d7")
        .count()
        == 1
    )
    # absent id: its bucket's files still survive (bucket can't prove
    # absence — that's the blooms' job), but other buckets prune
    keep2, pruned2 = table.scan_files(col_eq={"doc_id": "nope"})
    assert pruned2 > 0
    # identity equality on source
    keep3, _ = table.scan_files(col_eq={"source": "web"})
    rows = table.read(col_eq={"source": "web"}).where(
        F.col("source") == "web"
    )
    assert rows.count() == len([i for i in range(64) if i % 3 == 0])
    assert all("source=web" not in p or True for p in keep3)
    # day range on ts: datetime bounds, partition-domain compare
    lo, hi = datetime(2024, 1, 2), datetime(2024, 1, 2, 23, 59)
    keep4, pruned4 = table.scan_files(col_between={"ts": (lo, hi)})
    assert pruned4 > 0
    day2 = table.read(col_between={"ts": (lo, hi)}).where(
        (F.col("ts") >= lo) & (F.col("ts") <= hi)
    )
    assert day2.count() == len(
        [i for i in range(64) if 24 <= (i % 96) < 48]
    )


def test_null_partition_prunes(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    t.set_properties(**{"partition.spec": ["source"]})
    t.commit(
        spark.range(8).coalesce(1).select(
            F.col("id"), F.lit(None).cast("string").alias("source")
        )
    )
    f = t.snapshot()["files"][0]
    assert f["partition"] == {"source": None}
    keep, pruned = t.scan_files(col_eq={"source": "web"})
    assert keep == [] and pruned == 1
    keep, pruned = t.scan_files(col_between={"source": ("a", "z")})
    assert keep == [] and pruned == 1


def test_pre_spec_files_never_prune(spark, tmp_path):
    """Partition evolution: files committed before the spec carry no
    tuple and must always survive (superset guard)."""
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    t.commit(_mk(spark, 16))
    old_files = {f["path"] for f in t.snapshot()["files"]}
    t.set_properties(**{"partition.spec": SPEC})
    t.commit(_mk(spark, 16))
    keep, pruned = t.scan_files(col_eq={"doc_id": "zz-absent"})
    assert old_files <= set(keep)
    assert pruned > 0  # but the NEW files' wrong buckets did prune
    assert t.read().count() == 32


# ------------------------------------------------------- drop_partitions
def test_drop_partitions_metadata_only(spark, table):
    before = table.current_sequence()
    data_files_before = {
        f["path"] for f in table.snapshot()["files"]
    }
    res = table.drop_partitions("ts_day", upto="2024-01-02")
    assert res["files_dropped"] > 0
    # expired days are gone; day 3+ intact; NOTHING was read or written
    left = table.read()
    assert left.where(F.col("ts") < datetime(2024, 1, 3)).count() == 0
    kept_expected = len([i for i in range(64) if (i % 96) >= 48])
    assert left.count() == kept_expected
    assert res["rows_dropped"] == 64 - kept_expected
    assert {f["path"] for f in table.snapshot()["files"]} <= data_files_before
    # time travel still sees the dropped days
    assert table.read(before).count() == 64
    # equals= drops exactly one partition value
    r2 = table.drop_partitions("source", equals="web")
    assert table.read().where(F.col("source") == "web").count() == 0
    assert r2["files_dropped"] > 0
    with pytest.raises(ValueError):
        table.drop_partitions("doc_id_bucket4", upto="2")  # unordered
    with pytest.raises(ValueError):
        table.drop_partitions("nope", equals="x")
    with pytest.raises(ValueError):
        table.drop_partitions("source")


def test_drop_partitions_accepts_source_domain_datetime(spark, table):
    res = table.drop_partitions("ts_day", upto=datetime(2024, 1, 1, 5, 0))
    # a mid-day timestamp canonicalizes to its day — day 1 drops whole
    assert table.read().where(F.col("ts") < datetime(2024, 1, 2)).count() == 0
    assert res["rows_dropped"] == len([i for i in range(64) if (i % 96) < 24])


# ------------------------------------------- rewrites + maintenance + GC
def test_compact_preserves_partitioning(spark, table):
    table.compact(target_file_bytes=1 << 30, sort_by=["v"])
    files = table.snapshot()["files"]
    assert all(f.get("partition") for f in files)
    keep, pruned = table.scan_files(col_eq={"doc_id": "d7"})
    assert pruned > 0
    assert (
        table.read(col_eq={"doc_id": "d7"})
        .where(F.col("doc_id") == "d7")
        .count()
        == 1
    )
    assert table.read().count() == 64


def test_delete_where_preserves_partitioning(spark, table):
    table.delete_where("v = 70", stats_bounds={"v": (70, 70)})
    assert table.read().count() == 63
    rewritten = [
        f for f in table.snapshot()["files"] if "partition" in f
    ]
    assert len(rewritten) == len(table.snapshot()["files"])
    keep, pruned = table.scan_files(col_eq={"doc_id": "d8"})
    assert pruned > 0 and table.read().where(F.col("doc_id") == "d8").count() == 1


def test_expire_keeps_live_nested_dirs(spark, table):
    """Regression: live_dirs must be COMMIT dirs — dirname() of a
    partitioned file is its leaf partition dir, and comparing that
    against top-level commit dirs deleted live data."""
    table.commit(_mk(spark, 8))
    table.expire_snapshots(keep_last=1)
    assert table.read().count() == 72  # nothing live was GC'd
    # orphan GC walks nested dirs and respects references
    res = table.remove_orphan_files(grace_sec=0.0)
    assert res["orphans_removed"] == 0
    assert table.read().count() == 72


def test_file_survives_partition_unit():
    day = PartitionField("ts_day", "day", None, "ts")
    bkt = PartitionField("id_bucket4", "bucket", 4, "id")
    fp = {"ts_day": "2024-01-05", "id_bucket4": partition_value(bkt, "a")}
    fields = [day, bkt]
    assert file_survives_partition(fp, fields, {"id": "a"}, None)
    assert not file_survives_partition(
        fp, fields, None, {"ts": ("2024-01-06", None)}
    )
    assert not file_survives_partition(
        fp, fields, None, {"ts": (None, "2024-01-04 23:59:59")}
    )
    assert file_survives_partition(
        fp, fields, None, {"ts": ("2024-01-05 12:00", "2024-01-07")}
    )
    # missing field / no tuple / unprobeable value -> survive
    assert file_survives_partition(None, fields, {"id": "zz"}, None)
    assert file_survives_partition({}, fields, {"id": "zz"}, None)
    assert file_survives_partition(fp, fields, {"id": 1.5}, None)


def test_datasource_pushdown_prunes_partitions(spark, table):
    """The snapshot_log reader's pushed EqualTo/range filters also probe
    the partition tuples — a wrong-bucket file never opens."""
    from pyspark.sql.datasource import EqualTo

    from workbook_exporter_fe_spark.sources import snapshot_source as ss

    schema = table.read().schema
    full = ss.SnapshotLogBatchReader(
        table.root, schema, None, 65536
    ).partitions()
    r = ss.SnapshotLogPushdownReader(table.root, schema, None, 65536)
    list(r.pushFilters([EqualTo(("doc_id",), "d7")]))
    pruned = r.partitions()
    assert 0 < len(pruned) < len(full)
    # and the row is still served end-to-end
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    try:
        ss.register(spark)
        got = (
            spark.read.format("snapshot_log")
            .option("pushdown", "true")
            .load(table.root)
            .where(F.col("doc_id") == "d7")
        )
        assert got.count() == 1
    finally:
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "false")


def test_maintenance_cli_partition_flags(spark, tmp_path, capsys, monkeypatch):
    import importlib.util
    import sys

    spec = importlib.util.spec_from_file_location(
        "run_maintenance", os.path.join(os.path.dirname(__file__), "..",
                                        "run_maintenance.py")
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    root = str(tmp_path / "tbl")
    t = SnapshotTable(spark, root)
    t.set_properties(**{"partition.spec": ["day(ts)"]})
    t.commit(_mk(spark, 48))
    monkeypatch.setattr(sys, "argv", [
        "run_maintenance.py", "--snapshot-table", root,
        "--partition-spec", "day(ts),bucket(4;doc_id)",
        "--drop-partitions", "ts_day<=2024-01-01",
    ])
    m.main()
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    snap = report["snapshot_tables"][root]
    assert snap["properties"]["partition.spec"] == [
        "day(ts)", "bucket(4,doc_id)"
    ]
    assert snap["drop_partitions"]["files_dropped"] == 1
    t2 = SnapshotTable(spark, root)
    assert t2.read().count() == len([i for i in range(48) if (i % 96) >= 24])
