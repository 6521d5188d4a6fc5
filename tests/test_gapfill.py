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


# -- segmented (scale-path) variants: bit-equal to the plain operators ----


def _multi_day_gaps(spark):
    """Two sources, observations on days 1 and 5 only — days 2-4 are
    entirely empty segments, so carries must cross multiple segments."""
    import datetime as dt

    rows = []
    base = dt.datetime(2024, 1, 1)
    for src, off in (("a", 0), ("b", 17)):
        for day, hour, val in [(0, 1, 10.0), (0, 5, 20.0), (4, 3, 50.0), (4, 9, 30.0)]:
            rows.append((src, base + dt.timedelta(days=day, hours=hour, minutes=off), val))
    df = spark.createDataFrame(rows, "source string, bucket_ts timestamp, avg_v double")
    from workbook_exporter_fe_spark.operators.gapfill import densify

    return densify(df, "1h", value_cols=["avg_v"])


def test_locf_segmented_equals_plain(spark):
    from workbook_exporter_fe_spark.operators.gapfill import locf, locf_segmented

    dense = _multi_day_gaps(spark)
    a = locf(dense, "avg_v").orderBy("source", "bucket_ts").collect()
    b = locf_segmented(dense, "avg_v", segment="1d").orderBy("source", "bucket_ts").collect()
    assert a == b


def test_interpolate_segmented_equals_plain(spark):
    from workbook_exporter_fe_spark.operators.gapfill import (
        interpolate,
        interpolate_segmented,
    )

    dense = _multi_day_gaps(spark)
    a = interpolate(dense, "avg_v").orderBy("source", "bucket_ts").collect()
    b = (
        interpolate_segmented(dense, "avg_v", segment="1d")
        .orderBy("source", "bucket_ts")
        .collect()
    )
    assert a == b


def test_segmented_equals_plain_on_tier_data(spark, events):
    """Same equality over the real tier-1 shape (dense minute spine)."""
    from workbook_exporter_fe_spark.operators.gapfill import (
        densify,
        interpolate,
        interpolate_segmented,
        locf,
        locf_segmented,
    )
    from workbook_exporter_fe_spark.operators.tiers import rollup_tier1

    t1 = rollup_tier1(events).select("source", "bucket_ts", "avg_v")
    dense = densify(t1, "1m", value_cols=["avg_v"])
    for plain, seg in (
        (locf, locf_segmented),
        (interpolate, interpolate_segmented),
    ):
        a = plain(dense, "avg_v").orderBy("source", "bucket_ts").collect()
        b = seg(dense, "avg_v", segment="1h").orderBy("source", "bucket_ts").collect()
        assert a == b, plain.__name__


def test_fill_segmented_shared_pass_equals_separate(spark):
    """One shared carry pass must be bit-identical to running the two
    segmented fills independently (the q64 single-pass restructure)."""
    from workbook_exporter_fe_spark.operators.gapfill import (
        fill_segmented,
        interpolate_segmented,
        locf_segmented,
    )

    dense = _multi_day_gaps(spark)
    both = (
        fill_segmented(
            dense, {"locf_v": "locf", "interp_v": "interp"},
            value_col="avg_v", segment="1d",
        )
        .orderBy("source", "bucket_ts")
        .collect()
    )
    lo = (
        locf_segmented(dense, "avg_v", segment="1d")
        .orderBy("source", "bucket_ts")
        .collect()
    )
    it = (
        interpolate_segmented(dense, "avg_v", segment="1d")
        .orderBy("source", "bucket_ts")
        .collect()
    )
    assert [r["locf_v"] for r in both] == [r["avg_v"] for r in lo]
    assert [r["interp_v"] for r in both] == [r["avg_v"] for r in it]
    # the original value column rides through unchanged
    assert [r["avg_v"] for r in both] == [
        r["avg_v"]
        for r in dense.orderBy("source", "bucket_ts").collect()
    ]


def test_align_series_for_binary_ops(spark):
    from datetime import datetime

    from workbook_exporter_fe_spark.operators.gapfill import align_series

    def series(rows):
        return spark.createDataFrame(
            [("s", datetime(2026, 1, 1, 0, m), v) for m, v in rows],
            "source string, bucket_ts timestamp, avg_v double",
        )

    # a: minutes 0,2,5 ; b: minutes 1,2,6 — spine must span 0..6
    a = series([(0, 10.0), (2, 20.0), (5, 50.0)])
    b = series([(1, 1.0), (2, 2.0), (6, 6.0)])
    out = {
        r["bucket_ts"].minute: (r["v_a"], r["v_b"])
        for r in align_series(a, b, "1m").collect()
    }
    assert sorted(out) == [0, 1, 2, 3, 4, 5, 6]
    assert out[0] == (10.0, None)          # b doesn't exist yet -> NULL
    assert out[1] == (10.0, 1.0)           # a carried forward
    assert out[2] == (20.0, 2.0)
    assert out[3] == (20.0, 2.0) and out[4] == (20.0, 2.0)
    assert out[5] == (50.0, 2.0)
    assert out[6] == (50.0, 6.0)           # a carried to the union's end
    # ratio (the point of aligning) is now well-defined wherever both exist
    from pyspark.sql import functions as F

    ratio = (
        align_series(a, b, "1m")
        .withColumn("r", F.col("v_a") / F.col("v_b"))
        .filter(F.col("r").isNotNull())
    )
    assert ratio.count() == 6
