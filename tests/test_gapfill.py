"""Gap-fill tests: spine density, LOCF semantics, interpolation exactness."""

from __future__ import annotations

from pyspark.sql import functions as F

from workbook_exporter_fe_spark.operators.eventize import inject_gaps
from workbook_exporter_fe_spark.operators.gapfill import (
    bucket_spine,
    densify,
    interpolate,
    locf,
)
from workbook_exporter_fe_spark.operators.tiers import rollup_tier1


def _mk_tier(spark, rows):
    return spark.createDataFrame(
        [(s, f"2026-01-01 00:{m:02d}:00", v) for s, m, v in rows],
        "source string, bucket_str string, avg_v double",
    ).select("source", F.to_timestamp("bucket_str").alias("bucket_ts"), "avg_v")


def test_spine_is_dense(spark, events):
    t1 = rollup_tier1(events)
    spine = bucket_spine(t1, "1m")
    # per source: spine covers exactly (max-min)/60s + 1 buckets
    ranges = t1.groupBy("source").agg(
        ((F.max("bucket_ts").cast("long") - F.min("bucket_ts").cast("long")) / 60 + 1).alias("want")
    )
    got = spine.groupBy("source").count()
    bad = ranges.join(got, "source").filter(F.col("want") != F.col("count")).count()
    assert bad == 0


def test_locf_fills_with_previous(spark):
    tier = _mk_tier(spark, [("a", 0, 10.0), ("a", 3, 40.0), ("a", 5, 60.0)])
    dense = densify(tier, "1m", value_cols=["avg_v"])
    filled = locf(dense, "avg_v").orderBy("bucket_ts").collect()
    assert [r["avg_v"] for r in filled] == [10.0, 10.0, 10.0, 40.0, 40.0, 60.0]
    assert [r["filled"] for r in filled] == [False, True, True, False, True, False]


def test_interpolate_linear_exact(spark):
    tier = _mk_tier(spark, [("a", 0, 10.0), ("a", 4, 50.0), ("a", 6, 30.0)])
    dense = densify(tier, "1m", value_cols=["avg_v"])
    out = interpolate(dense, "avg_v").orderBy("bucket_ts").collect()
    assert [r["avg_v"] for r in out] == [10.0, 20.0, 30.0, 40.0, 50.0, 40.0, 30.0]


def test_interpolate_recovers_injected_gaps(spark, events):
    """Drop ~10% of events; interpolation over 1s buckets must recover the
    dropped v exactly when neighbours are linear... here v is arbitrary, so
    instead check: non-gap points unchanged, all gaps filled, no nulls."""
    gapped, dropped = inject_gaps(events, seed=42)
    assert dropped.count() > 0
    # 1-second tier so each event is its own bucket
    t = gapped.select(
        "source", F.date_trunc("second", "event_ts").alias("bucket_ts"), F.col("v").alias("avg_v")
    )
    dense = densify(t, value_cols=["avg_v"])
    # spine stepping is 1m in densify's default; build 1s spine via explicit step
    from workbook_exporter_fe_spark.operators import gapfill

    spine = (
        t.groupBy("source")
        .agg(F.min("bucket_ts").alias("lo"), F.max("bucket_ts").alias("hi"))
        .select("source", F.explode(F.sequence("lo", "hi", F.expr("interval 1 second"))).alias("bucket_ts"))
    )
    dense = spine.join(t, ["source", "bucket_ts"], "left").withColumn(
        "filled", F.col("avg_v").isNull()
    )
    out = interpolate(dense, "avg_v")
    assert out.filter(F.col("avg_v").isNull()).count() == 0
    unchanged = out.filter(~F.col("filled")).select("source", "bucket_ts", "avg_v")
    orig = t.select("source", "bucket_ts", "avg_v")
    assert unchanged.exceptAll(orig).count() == 0
