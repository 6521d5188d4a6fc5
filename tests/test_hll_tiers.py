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
