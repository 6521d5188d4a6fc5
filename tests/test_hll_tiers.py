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


def test_theta_churn_tracks_exact_set_algebra(spark, sf_dir):
    """Returning/new user estimates between consecutive hour buckets match
    the exact set intersection/difference within sketch error."""
    from workbook_exporter_fe_spark.operators.tiers import (
        bucket_churn,
        theta_bucket_sketches,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.col("event_type").alias("source"),
        F.col("ts").alias("event_ts"),
        F.col("user_id").cast("string").alias("doc_id"),
    )
    churn = bucket_churn(theta_bucket_sketches(ev, tier="1h"))
    rows = churn.collect()
    assert rows
    # exact per-bucket user sets (small at sf0.01) for comparison
    import collections

    buckets = collections.defaultdict(set)
    for r in ev.select(
        "source", F.date_trunc("hour", "event_ts").alias("b"), "doc_id"
    ).collect():
        buckets[(r.source, r.b)].add(r.doc_id)
    from datetime import timedelta

    checked = 0
    for r in rows:
        cur = buckets[(r.source, r.bucket_ts)]
        prev = buckets.get((r.source, r.bucket_ts - timedelta(hours=1)))
        if prev is None:  # lag pairs non-adjacent buckets across gaps; skip
            continue
        checked += 1
        tol = lambda x: max(0.05 * x, 3)
        assert abs(r.est_total - len(cur)) <= tol(len(cur))
        assert abs(r.est_returning - len(cur & prev)) <= tol(len(cur & prev))
        assert abs(r.est_new - len(cur - prev)) <= tol(len(cur - prev))
    assert checked > 10
