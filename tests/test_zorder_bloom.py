"""Manifest bloom filters (equality file skipping) + Z-order compaction.

Blooms answer the predicate min/max stats cannot: `doc_id = X` over a
hash-distributed id column, where every file spans the whole value range.
A bloom miss is a PROOF of absence (file skipped); a hit is maybe
(superset guard — Spark still applies the row filter). Z-order compaction
answers multi-column range predicates: each rewritten file covers a small
hypercube, so manifest min/max prunes on every z-ordered column at once.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from workbook_exporter_fe_spark.sources.snapshots import (
    SnapshotTable,
    bloom_entry,
    bloom_might_contain,
)


def _docs(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.concat(F.lit("doc-"), F.lpad(F.col("id").cast("string"), 6, "0")
                 ).alias("doc_id"),
        F.col("id").alias("n"),
        (F.col("id") % 7).cast("double").alias("v"),
    )


@pytest.fixture()
def bloomed(spark, tmp_path):
    """Four appends of disjoint id ranges, blooms on both id columns."""
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    t.set_properties(**{"bloom.columns": ["doc_id", "n"],
                        "bloom.bits": 1 << 16})
    ranges = [(0, 500), (500, 1000), (1000, 1500), (1500, 2000)]
    commit_files = {}
    seen: set = set()
    for i, (lo, hi) in enumerate(ranges):
        t.commit(_docs(spark, lo, hi).coalesce(1))
        paths = {f["path"] for f in t.snapshot()["files"]}
        commit_files[i] = sorted(paths - seen)
        seen = paths
    return t, ranges, commit_files


def test_bloom_prunes_point_lookups(spark, bloomed):
    t, ranges, commit_files = bloomed
    total = len(t.snapshot()["files"])
    assert total == 4
    # manifests carry only sidecar refs (append manifests copy all prior
    # entries forward — inline filter bytes would grow metadata O(files²))
    for f in t.snapshot()["files"]:
        assert "bloom" not in f
        assert f["bloom_ref"] == f["path"] + ".bloom.json"

    # present value: its commit's file survives; the other three are
    # bloom-missed (64 Kbit filter over 500 values — FPR ~1e-5 per file,
    # deterministic data, so the count is stable)
    keep, pruned = t.scan_files(col_eq={"doc_id": "doc-000750"})
    assert keep == commit_files[1]
    assert pruned == 3

    # absent value: every file prunes — the scan opens NOTHING
    keep, pruned = t.scan_files(col_eq={"doc_id": "doc-999999"})
    assert keep == [] and pruned == 4

    # integer column probes with a Python int (canonical str form
    # matches Spark's CAST AS STRING)
    keep, pruned = t.scan_files(col_eq={"n": 1501})
    assert keep == commit_files[3] and pruned == 3

    # read() applies the same pruning and the row filter still governs
    got = t.read(col_eq={"doc_id": "doc-000750"}).where(
        F.col("doc_id") == "doc-000750"
    )
    assert [r.n for r in got.collect()] == [750]


def test_bloom_never_false_negative(spark, bloomed):
    """The hard guarantee: for EVERY committed value the containing file
    survives the probe (a false negative would silently drop rows)."""
    t, ranges, commit_files = bloomed
    for i, (lo, hi) in enumerate(ranges):
        for n in range(lo, hi, 83):  # stride through each commit
            keep, _ = t.scan_files(col_eq={"doc_id": f"doc-{n:06d}"})
            assert set(commit_files[i]) <= set(keep), (i, n)
            keep, _ = t.scan_files(col_eq={"n": n})
            assert set(commit_files[i]) <= set(keep), (i, n)


def test_bloom_unprobeable_values_keep_files(spark, bloomed):
    """Floats/bools/None never probe (their Python str form can diverge
    from Spark's CAST AS STRING) — superset guard keeps every file."""
    t, _, _ = bloomed
    for v in (1.5, True, None):
        keep, pruned = t.scan_files(col_eq={"n": v})
        assert pruned == 0, v
    # unknown / un-bloomed column: no pruning either
    keep, pruned = t.scan_files(col_eq={"v": "x"})
    assert pruned == 0


def test_all_null_column_prunes_everything(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    t.set_properties(**{"bloom.columns": ["tag"], "bloom.bits": 4096})
    t.commit(
        spark.range(10).coalesce(1).select(
            F.col("id"), F.lit(None).cast("string").alias("tag")
        )
    )
    # equality never matches NULL, so an all-null file prunes on ANY probe
    keep, pruned = t.scan_files(col_eq={"tag": "anything"})
    assert keep == [] and pruned == 1
    # the sidecar entry exists explicitly (absent entry = "no bloom
    # built", which must never be conflated with "no values"), and the
    # manifest itself carries only the ref string — metadata stays small
    f = t.snapshot()["files"][0]
    assert f["bloom_ref"] == f["path"] + ".bloom.json"
    assert "bloom" not in f
    assert not bloom_might_contain(bloom_entry(f, "tag"), "anything")


def test_bloom_survives_compaction_and_mutation(spark, bloomed):
    """Compaction and CoW rewrites go through _file_stats, so rewritten
    files are re-bloomed and point lookups keep pruning."""
    t, _, _ = bloomed
    t.compact(target_file_bytes=1 << 40)  # bin-pack to one file
    files = t.snapshot()["files"]
    assert len(files) == 1 and bloom_entry(files[0], "doc_id") is not None
    keep, pruned = t.scan_files(col_eq={"doc_id": "doc-999999"})
    assert pruned == 1  # absent value still proves absence post-rewrite
    t.delete_where("n = 750")
    keep, pruned = t.scan_files(col_eq={"doc_id": "doc-000750"})
    # the only file was rewritten without doc-000750 → bloom prunes it
    assert pruned == len(t.snapshot()["files"])


def test_bloom_pushdown_through_data_source(spark, bloomed):
    from pyspark.sql.datasource import EqualTo

    from workbook_exporter_fe_spark.sources import snapshot_source as ss

    t, _, commit_files = bloomed
    ss.register(spark)
    schema = t.read().schema
    r = ss.SnapshotLogPushdownReader(t.root, schema, None, 65536)
    list(r.pushFilters([EqualTo(("doc_id",), "doc-000042")]))
    parts = r.partitions()
    assert [p.path for p in parts] == commit_files[0]
    # end-to-end read returns exactly the one row
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    got = (
        spark.read.format("snapshot_log")
        .option("pushdown", "true")
        .option("path", t.root)
        .load()
        .where(F.col("doc_id") == "doc-000042")
        .collect()
    )
    assert len(got) == 1 and got[0].n == 42


def test_properties_roundtrip(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    assert t.properties() == {}
    t.set_properties(**{"bloom.columns": ["a"]})
    t.set_properties(**{"bloom.bits": 4096})
    assert t.properties() == {"bloom.columns": ["a"], "bloom.bits": 4096}
    t.set_properties(**{"bloom.bits": None})  # None deletes
    assert t.properties() == {"bloom.columns": ["a"]}
    # no properties → commits carry no blooms (and nothing prunes)
    t2 = SnapshotTable(spark, str(tmp_path / "t2"))
    t2.commit(spark.range(5).select(F.col("id").cast("string").alias("s")))
    assert "bloom" not in t2.snapshot()["files"][0]
    _, pruned = t2.scan_files(col_eq={"s": "zzz"})
    assert pruned == 0


# ------------------------------------------------------------------ Z-order


def _grid(spark):
    """64x64 grid of (x, y) points in a deliberately bad layout: ordered
    so consecutive rows scatter across the whole plane."""
    df = spark.range(4096).select(
        (F.col("id") % 64).alias("x"),
        F.floor(F.col("id") / 64).cast("long").alias("y"),
        F.col("id").alias("payload"),
    )
    # shuffle deterministically: order by a hash so every commit file
    # spans ~the full range of BOTH dims
    return df.orderBy(F.xxhash64("id"))


@pytest.fixture()
def grid_table(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "grid"))
    t.commit(_grid(spark).repartition(8))
    return t


def _target_bytes_for(t: SnapshotTable, n_files: int) -> int:
    total = sum(f["bytes"] for f in t.snapshot()["files"])
    return max(1, total // n_files)


def test_zorder_compaction_prunes_both_dims(spark, grid_table):
    t = grid_table
    before = t.read().collect()

    t.compact(target_file_bytes=_target_bytes_for(t, 16),
              zorder_by=["x", "y"], zorder_bits=6)
    m = t.snapshot()
    assert m["summary"]["zorder_by"] == ["x", "y"]
    n_files = len(m["files"])
    assert n_files >= 8  # enough granularity for pruning to mean anything

    # a quarter-plane rectangle on EACH dimension prunes most files
    keep_x, pruned_x = t.scan_files(col_between={"x": (0, 15)})
    keep_y, pruned_y = t.scan_files(col_between={"y": (0, 15)})
    assert pruned_x >= n_files // 2, (pruned_x, n_files)
    assert pruned_y >= n_files // 2, (pruned_y, n_files)
    # the small rectangle on BOTH prunes even harder
    keep_xy, pruned_xy = t.scan_files(
        col_between={"x": (0, 15), "y": (0, 15)}
    )
    assert pruned_xy >= max(pruned_x, pruned_y)

    # row set bit-identical through the rewrite
    after = t.read().collect()
    assert sorted(map(tuple, after)) == sorted(map(tuple, before))
    # and the pruned read still returns every matching row
    got = t.read(col_between={"x": (0, 15), "y": (0, 15)}).where(
        (F.col("x") <= 15) & (F.col("y") <= 15)
    )
    assert got.count() == 16 * 16


def test_zorder_beats_single_column_sort_on_the_other_dim(spark, tmp_path):
    """sort_by x gives perfect x pruning and ~none on y; zorder prunes
    on both — the reason it exists."""
    a = SnapshotTable(spark, str(tmp_path / "sorted"))
    a.commit(_grid(spark).repartition(8))
    a.compact(target_file_bytes=_target_bytes_for(a, 16), sort_by=["x"])

    z = SnapshotTable(spark, str(tmp_path / "zed"))
    z.commit(_grid(spark).repartition(8))
    z.compact(target_file_bytes=_target_bytes_for(z, 16),
              zorder_by=["x", "y"], zorder_bits=6)

    _, sorted_y_pruned = a.scan_files(col_between={"y": (0, 15)})
    _, z_y_pruned = z.scan_files(col_between={"y": (0, 15)})
    assert sorted_y_pruned == 0  # every x-sorted file spans all of y
    assert z_y_pruned > len(z.snapshot()["files"]) // 2


def test_zvalue_validation(spark, grid_table):
    from workbook_exporter_fe_spark.sources.layout import with_zvalue

    df = spark.range(4).select(
        F.col("id").alias("a"), F.col("id").cast("string").alias("s")
    )
    with pytest.raises(ValueError, match="numeric/timestamp"):
        with_zvalue(df, ["s"])
    with pytest.raises(ValueError, match="unknown z-order column"):
        with_zvalue(df, ["missing"])
    with pytest.raises(ValueError, match="fit a long"):
        with_zvalue(df, ["a"], bits=64)
    with pytest.raises(ValueError, match="mutually exclusive"):
        grid_table.compact(sort_by=["x"], zorder_by=["y"])
    # both-null rows land in bucket 0 on every dim → z = 0
    nulls = spark.createDataFrame(
        [(None, None), (5, 9)], "a int, b int"
    )
    rows = with_zvalue(nulls, ["a", "b"], bits=2).collect()
    assert [r["__z"] for r in rows if r["a"] is None] == [0]


# -------------------------------------------------------- scoped compaction


def test_scoped_compaction_rewrites_only_bounded_files(spark, tmp_path):
    """compact(where_bounds=...) is Iceberg's rewrite_data_files(where):
    only files whose stats intersect the bounds are rewritten; everything
    else carries into the child manifest VERBATIM (at 100 TB you compact
    yesterday's window, never the table)."""
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    for lo in (0, 100, 200):
        t.commit(
            spark.range(lo, lo + 100).selectExpr("id", "id * 2 AS v")
            .repartition(2)
        )
    m0 = t.snapshot()
    assert len(m0["files"]) == 6
    hot = {f["path"] for f in m0["files"] if f["min"]["id"] >= 200}
    cold_entries = [f for f in m0["files"] if f["path"] not in hot]

    seq = t.compact(where_bounds={"id": (200, 299)})
    m1 = t.snapshot(seq)
    assert m1["operation"] == "replace"
    assert m1["summary"]["files_rewritten"] == 2
    assert m1["summary"]["files_carried"] == 4
    assert m1["summary"]["where_bounds"] == {"id": [200, 299]}
    # out-of-scope entries carried VERBATIM (same path, rows, stats)
    carried_now = {f["path"]: f for f in m1["files"]}
    for c in cold_entries:
        assert carried_now[c["path"]] == c
    # the hot window is now one file; row multiset unchanged
    new_paths = {f["path"] for f in m1["files"]} - {
        c["path"] for c in cold_entries
    }
    assert len(new_paths) == 1
    assert t.read().count() == 300
    assert t.read().agg(F.sum("id")).first()[0] == sum(range(300))
    # a bounded no-op: scope already compact -> same sequence back
    assert t.compact(where_bounds={"id": (200, 299)}) == seq
    # empty scope -> no-op
    assert t.compact(where_bounds={"id": (10_000, 10_001)}) == seq
