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
