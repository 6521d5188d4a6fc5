"""Metadata-driven join planning (operators/joinplan.py, r5).

Pins the r4-verdict item: broadcast vs shuffle vs salt chosen from
SnapshotTable manifest stats (live rows/bytes + theta NDV) with ZERO
data scans — proven by deleting every data file and planning anyway —
and that every strategy returns row-identical results.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from workbook_exporter_fe_spark.operators.joinplan import (
    TableStats,
    auto_join,
    plan_join_strategy,
    stats_for,
)
from workbook_exporter_fe_spark.sources.snapshots import SnapshotTable


def _fact(spark, n=20_000, nsrc=5):
    """Fact side: few distinct join keys (the salt trigger)."""
    return spark.range(n).select(
        F.concat(F.lit("s"), (F.col("id") % nsrc).cast("string"))
        .alias("source"),
        F.col("id").alias("v"),
    )


def _dim(spark, nsrc=5):
    return spark.range(nsrc).select(
        F.concat(F.lit("s"), F.col("id").cast("string")).alias("source"),
        F.concat(F.lit("region-"), (F.col("id") % 2).cast("string"))
        .alias("region"),
    )


@pytest.fixture()
def tables(spark, tmp_path):
    fact = SnapshotTable(spark, str(tmp_path / "fact"))
    fact.set_properties(**{"stats.ndv.columns": ["source"]})
    fact.commit(_fact(spark).repartition(4))
    dim = SnapshotTable(spark, str(tmp_path / "dim"))
    dim.set_properties(**{"stats.ndv.columns": ["source"]})
    dim.commit(_dim(spark))
    return fact, dim


def test_stats_for_is_manifest_accurate(spark, tables):
    fact, dim = tables
    fs = stats_for(fact, "source")
    ds = stats_for(dim, "source")
    assert fs.rows == 20_000 and ds.rows == 5
    assert fs.bytes > ds.bytes > 0
    assert fs.ndv == pytest.approx(5, abs=0.01)
    assert ds.ndv == pytest.approx(5, abs=0.01)


def test_stats_need_no_data_files(spark, tables, tmp_path):
    """THE metadata-only pin: every data parquet deleted from disk, the
    planner still produces the identical stats and decision."""
    fact, dim = tables
    before = (stats_for(fact, "source"), stats_for(dim, "source"))
    removed = 0
    for m in (fact.snapshot(), dim.snapshot()):
        for f in m["files"]:
            os.remove(f["path"])
            removed += 1
    assert removed >= 2
    after = (stats_for(fact, "source"), stats_for(dim, "source"))
    assert after == before
    plan = plan_join_strategy(after[0], after[1])
    assert plan["strategy"] == "broadcast" and plan["build_side"] == "right"


def test_small_side_broadcasts(spark, tables):
    fact, dim = tables
    fs, ds = stats_for(fact, "source"), stats_for(dim, "source")
    plan = plan_join_strategy(fs, ds)
    assert plan["strategy"] == "broadcast"
    assert plan["build_side"] == "right"
    got, plan2 = auto_join(
        fact.read(), dim.read(), ["source"], fs, ds
    )
    assert plan2 == plan
    got.collect()
    phys = got._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in phys
    want = fact.read().join(dim.read(), ["source"]).collect()
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want))


def test_low_ndv_salts_with_sized_buckets(spark, tables):
    fact, dim = tables
    fs, ds = stats_for(fact, "source"), stats_for(dim, "source")
    # force the non-broadcast branch: pretend the threshold is 1 byte
    plan = plan_join_strategy(
        fs, ds, broadcast_bytes=1, parallelism=200, min_keys_per_slot=4.0
    )
    assert plan["strategy"] == "salt"
    # ndv≈5, need 800 keys → ceil(800/5)=160 → clamped to 64
    assert plan["salt_buckets"] == 64
    got, _ = auto_join(
        fact.read(), dim.read(), ["source"], fs, ds, broadcast_bytes=1
    )
    want = fact.read().join(dim.read(), ["source"]).collect()
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want))


def test_high_ndv_shuffles(spark):
    left = TableStats(rows=10**9, bytes=500 << 30, ndv=2e8)
    right = TableStats(rows=10**8, bytes=50 << 30, ndv=1e8)
    plan = plan_join_strategy(left, right)
    assert plan["strategy"] == "shuffle"
    # unknown NDV also falls through to shuffle (never salt blind)
    plan = plan_join_strategy(
        TableStats(10**9, 500 << 30, None), right
    )
    # right has ndv but the BIG side (left) drives the salt check; with
    # left bigger, ndv comes from... left is bigger so small side=right?
    # No: right.bytes < left.bytes → small=right → big=left, ndv=None
    assert plan["strategy"] == "shuffle"


def test_salt_bucket_clamps():
    small = TableStats(rows=10**6, bytes=10 << 30, ndv=None)
    big = TableStats(rows=10**9, bytes=100 << 30, ndv=3.0)
    plan = plan_join_strategy(big, small, max_salt_buckets=64)
    assert plan["strategy"] == "salt" and plan["salt_buckets"] == 64
    big2 = TableStats(rows=10**9, bytes=100 << 30, ndv=500.0)
    plan2 = plan_join_strategy(big2, small, parallelism=200)
    assert plan2["strategy"] == "salt" and plan2["salt_buckets"] == 2


def test_salt_swaps_when_big_side_is_right(spark, tables):
    """r5 review fix: salted_join replicates its RIGHT side ×buckets, so
    when the planner's big low-NDV side is the caller's right, inner
    joins swap sides (column order restored) instead of replicating the
    big table."""
    fact, dim = tables
    fs, ds = stats_for(fact, "source"), stats_for(dim, "source")
    got, plan = auto_join(
        dim.read(), fact.read(), ["source"], ds, fs, broadcast_bytes=1
    )
    assert plan["strategy"] == "salt"
    want = dim.read().join(fact.read(), ["source"])
    assert got.columns == want.columns  # order restored after the swap
    assert sorted(map(tuple, got.collect())) \
        == sorted(map(tuple, want.collect()))


def test_salt_degrades_to_shuffle_not_semantics_change(spark, tables):
    """r5 review fix: shapes salting can't express (outer joins; left
    join with the big side on the right) fall back to the PLAIN join —
    never a silent inner-join downgrade."""
    fact, dim = tables
    fs, ds = stats_for(fact, "source"), stats_for(dim, "source")
    extra = dim.read().unionByName(
        spark.createDataFrame(
            [("s9", "region-x")], "source string, region string"
        )
    )
    # full outer with salt-triggering stats → degraded shuffle plan
    got, plan = auto_join(
        fact.read(), extra, ["source"], fs, ds, how="full",
        broadcast_bytes=1,
    )
    assert plan["strategy"] == "shuffle" and "degraded" in plan["why"]
    want = fact.read().join(extra, ["source"], "full")
    assert sorted(map(tuple, got.collect())) \
        == sorted(map(tuple, want.collect()))
    # the unmatched dim row survived (an inner downgrade would drop it)
    assert any(r.source == "s9" for r in got.collect())
    # left join with big side on the right also degrades, keeps nulls
    got2, plan2 = auto_join(
        dim.read(), fact.read(), ["source"], ds, fs, how="left",
        broadcast_bytes=1,
    )
    assert plan2["strategy"] == "shuffle"
    want2 = dim.read().join(fact.read(), ["source"], "left")
    assert sorted(map(tuple, got2.collect())) \
        == sorted(map(tuple, want2.collect()))


def test_stats_for_parquet_footers_only(spark, tmp_path):
    """Plain parquet dirs get footer-based rows/bytes (no Spark job, no
    data pages); NDV stays None so the planner never salts blind."""
    from workbook_exporter_fe_spark.operators.joinplan import (
        stats_for_parquet,
    )

    p = str(tmp_path / "plain")
    _fact(spark, n=5000).write.partitionBy("source").parquet(p)
    st = stats_for_parquet(p)
    assert st.rows == 5000 and st.bytes > 0 and st.ndv is None
    plan = plan_join_strategy(
        st, TableStats(rows=10, bytes=1000, ndv=None)
    )
    assert plan["strategy"] == "broadcast" and plan["build_side"] == "right"
    # big + unknown ndv on the big side → shuffle, never blind salt
    plan2 = plan_join_strategy(
        TableStats(rows=10**9, bytes=500 << 30, ndv=None),
        TableStats(rows=10**8, bytes=50 << 30, ndv=None),
    )
    assert plan2["strategy"] == "shuffle"


def test_merge_paths_take_stats(spark, tables):
    """anti_join_state/merge_upsert consume the same TableStats: small
    state → broadcast hint in the plan; big state → no forced hint."""
    from workbook_exporter_fe_spark.operators.merge import (
        anti_join_state,
        merge_upsert,
    )

    fact, dim = tables
    new = _fact(spark, n=100, nsrc=8)  # s5..s7 are new keys
    small_stats = stats_for(dim, "source")
    out = anti_join_state(new, dim.read(), ["source"], small_stats)
    out.collect()
    phys = out._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in phys
    assert set(r.source for r in out.collect()) == {"s5", "s6", "s7"}
    # big new side: the default broadcast hint must drop
    big_stats = TableStats(rows=10**9, bytes=100 << 30, ndv=None)
    merged = merge_upsert(
        _fact(spark, 1000), _fact(spark, 500), ["source", "v"],
        new_stats=big_stats,
    )
    analyzed = merged._jdf.queryExecution().analyzed().toString()
    assert "broadcast" not in analyzed.lower()
    # and result semantics are unchanged
    assert merged.count() == 1000
