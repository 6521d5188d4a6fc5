"""HLL distinct-count tier cascade: accuracy + merge semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from workbook_exporter_fe_spark.operators.tiers import (
    distinct_sketch_finalize,
    distinct_sketch_reaggregate,
    distinct_sketch_tier1,
)


def test_merged_estimates_track_exact(spark, events):
    t1 = distinct_sketch_tier1(events)
    t2 = distinct_sketch_reaggregate(t1, "1h")
    est = distinct_sketch_finalize(t2)
    exact = events.groupBy(
        "source", F.date_trunc("hour", "event_ts").alias("bucket_ts")
    ).agg(F.countDistinct("doc_id").alias("exact"))
    rows = est.join(exact, ["source", "bucket_ts"]).collect()
    assert rows
    for r in rows:
        assert abs(r.approx_distinct - r.exact) <= max(0.02 * r.exact, 2), (
            r.source, r.bucket_ts, r.approx_distinct, r.exact)


def test_day_tier_merges_from_hour_not_tier0(spark, events):
    """1d built from 1h sketches stays inside the envelope too (two unions
    deep), and cnt decomposes exactly."""
    t1 = distinct_sketch_tier1(events)
    t2 = distinct_sketch_reaggregate(t1, "1h")
    t3 = distinct_sketch_reaggregate(t2, "1d")
    est = distinct_sketch_finalize(t3)
    exact = events.groupBy(
        "source", F.date_trunc("day", "event_ts").alias("bucket_ts")
    ).agg(
        F.countDistinct("doc_id").alias("exact"), F.count("*").alias("cnt_exact")
    )
    rows = est.join(exact, ["source", "bucket_ts"]).collect()
    assert rows
    for r in rows:
        assert abs(r.approx_distinct - r.exact) <= max(0.02 * r.exact, 2)
        assert r.cnt == r.cnt_exact


def test_kll_quantiles_merge_within_rank_tolerance(spark, events):
    """p50/p95 from 1m→1h-merged KLL sketches sit inside a ±5% rank window
    of the exact distribution."""
    from workbook_exporter_fe_spark.operators.tiers import (
        quantile_sketch_finalize,
        quantile_sketch_reaggregate,
        quantile_sketch_tier1,
    )

    t1 = quantile_sketch_tier1(events)
    t2 = quantile_sketch_reaggregate(t1, "1h")
    est = quantile_sketch_finalize(t2, quantiles=(0.5, 0.95))
    bounds = events.groupBy(
        "source", F.date_trunc("hour", "event_ts").alias("bucket_ts")
    ).agg(
        F.expr("percentile(v, 0.45)").alias("lo50"),
        F.expr("percentile(v, 0.55)").alias("hi50"),
        F.expr("percentile(v, 0.90)").alias("lo95"),
        F.expr("percentile(v, 1.00)").alias("hi95"),
        F.count("*").alias("n"),
    )
    rows = est.join(bounds, ["source", "bucket_ts"]).collect()
    assert rows
    for r in rows:
        if r.n < 20:  # tiny buckets: rank windows collapse
            continue
        assert r.lo50 <= r.p50 <= r.hi50, (r.source, r.bucket_ts, r.p50, r.lo50, r.hi50)
        assert r.lo95 <= r.p95 <= r.hi95, (r.source, r.bucket_ts, r.p95, r.lo95, r.hi95)
