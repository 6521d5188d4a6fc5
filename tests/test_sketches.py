"""Count-min sketch: error bound, merge associativity, Spark tier path."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from workbook_exporter_fe_spark.functions.sketches import (
    cms_build,
    cms_merge,
    cms_query,
    merge_sketches,
    sketch_token_histogram,
)
from workbook_exporter_fe_spark.operators.tiers import token_histogram


def test_cms_overestimates_within_bound():
    rng = np.random.default_rng(3)
    tokens = rng.integers(0, 5000, 20000)
    sk = cms_build(tokens, depth=4, width=2048)
    from collections import Counter

    truth = Counter(tokens.tolist())
    # CMS never underestimates; overestimate ≤ 2N/width w.h.p.
    for tok, n in list(truth.items())[:200]:
        est = cms_query(sk, tok)
        assert est >= n
        assert est - n <= 2 * len(tokens) / 2048 * 4


def test_cms_merge_equals_combined_build():
    rng = np.random.default_rng(4)
    a, b = rng.integers(0, 999, 5000), rng.integers(0, 999, 7000)
    merged = cms_merge(cms_build(a), cms_build(b))
    combined = cms_build(np.concatenate([a, b]))
    assert np.array_equal(merged, combined)  # exact decomposability


def test_spark_sketch_tiers(spark, events):
    sk1 = sketch_token_histogram(events, "1m", depth=2, width=512).cache()
    assert sk1.count() == events.select(
        "source", F.date_trunc("minute", "event_ts")
    ).distinct().count()
    # tier-2 sketch via merge == tier-2 sketch built direct from tier-0
    sk2_merged = merge_sketches(sk1, "1h")
    sk2_direct = sketch_token_histogram(events, "1h", depth=2, width=512)
    m = {(r["source"], r["bucket_ts"]): bytes(r["sketch"]) for r in sk2_merged.collect()}
    d = {(r["source"], r["bucket_ts"]): bytes(r["sketch"]) for r in sk2_direct.collect()}
    assert m == d
    # never underestimates the exact histogram
    exact = token_histogram(events, "1m")
    joined = sk1.join(exact, ["source", "bucket_ts"]).limit(20).collect()
    for r in joined:
        sk = np.frombuffer(bytes(r["sketch"]), dtype=np.int64).reshape(2, 512)
        for tok, n in list(r["tok_hist"].items())[:20]:
            assert cms_query(sk, tok) >= n


def test_heavy_hitters_merge_matches_exact_topk(spark):
    """Tier-1 heavy-hitter rows merged to 1h must recover the EXACT hourly
    top-k token set (small scale: the exact histogram is the oracle), with
    CMS estimates >= true counts (over-estimate-only). Input tokens are
    log-uniform (Zipf-like hot head) — heavy hitters only exist, and the
    pattern only claims recall, on skewed data; a uniform vocabulary has
    no hitters to find (everything ties at count 1-2)."""
    from pyspark.sql import functions as F

    from workbook_exporter_fe_spark.functions.sketches import (
        heavy_hitters_tier,
        heavy_hitters_topk,
        merge_heavy_hitters,
    )

    df = spark.range(0, 20_000, 1, 8)
    u = lambda j: (F.pmod(F.xxhash64(F.lit(7), F.col("id"), j), F.lit(1_000_003)) / 1_000_003.0)  # noqa: E731
    tokens = F.transform(
        F.sequence(F.lit(0), F.lit(19)),
        lambda j: F.floor(F.pow(F.lit(1000.0), u(j))).cast("int"),
    )
    events = df.select(
        F.concat(F.lit("src-"), (F.col("id") % 4).cast("string")).alias("source"),
        (
            F.to_timestamp(F.lit("2026-01-01 00:00:00"))
            + F.make_interval(secs=(F.col("id") % 7200).cast("double"))
        ).alias("event_ts"),
        tokens.alias("tokens"),
    )

    k = 10
    hh1 = heavy_hitters_tier(events, tier="1m", k=k, slack=4, width=4096)
    hh2 = merge_heavy_hitters(hh1, "1h", k=k, slack=4)
    got = heavy_hitters_topk(hh2, k=k)

    exact = (
        events.select(
            "source",
            F.date_trunc("hour", "event_ts").alias("bucket_ts"),
            F.explode("tokens").alias("token"),
        )
        .groupBy("source", "bucket_ts", "token")
        .agg(F.count("*").alias("n"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("source", "bucket_ts").orderBy(
        F.desc("n"), F.asc("token")
    )
    exact_k = exact.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)

    j = got.join(exact, ["source", "bucket_ts", "token"], "left")
    # every reported heavy hitter is a real token and never under-counted
    assert j.filter(F.col("n").isNull()).count() == 0
    assert j.filter(F.col("est_n") < F.col("n")).count() == 0

    # recall vs the exact top-k: ties at the boundary can swap, so compare
    # against the exact top-k count with a >=90% set-recall bar
    hit = exact_k.join(got, ["source", "bucket_ts", "token"], "left_semi").count()
    total = exact_k.count()
    assert hit >= 0.9 * total, f"recall {hit}/{total}"
