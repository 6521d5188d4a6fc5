"""Hashed n-gram logistic regression: trains in-engine, separates, scores.

Synthetic separable corpus: "good" docs draw tokens from one id range,
"bad" docs from another, so a linear model over hashed unigrams must
reach ~perfect accuracy; a pure-numpy twin of the update rule pins the
distributed gradient math on a tiny corpus.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from workbook_exporter_fe_spark.operators.classifier import (
    featurize,
    lr_score,
    lr_train,
)


def _corpus(spark, n=400, toks=24):
    """Even ids → label 1, tokens in [0, 100); odd → label 0, [100, 200).
    Deterministic token streams from xxhash64."""
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 2 == 0).cast("double").alias("label"),
        F.transform(
            F.sequence(F.lit(1), F.lit(toks)),
            lambda i: (
                F.pmod(F.xxhash64(F.col("id") * 1000 + i), F.lit(100))
                + F.when(F.col("id") % 2 == 0, 0).otherwise(100)
            ).cast("int"),
        ).alias("tokens"),
    )


def test_featurize_shape_and_determinism(spark):
    df = _corpus(spark, n=8, toks=5)
    a = featurize(df, dim=1 << 10).select("doc_id", "features")
    b = featurize(df, dim=1 << 10).select("doc_id", "features")
    ra = {r.doc_id: r.features for r in a.collect()}
    rb = {r.doc_id: r.features for r in b.collect()}
    assert ra == rb  # pure function of (tokens, dim, seed)
    for fx in ra.values():
        assert len(fx) == 5 + 4  # unigrams + adjacent bigrams
        assert all(0 <= i < (1 << 10) for i in fx)
    # empty token list -> no features, not an error
    empty = spark.createDataFrame([([],)], "tokens array<int>")
    assert featurize(empty, dim=64).first().features == []


def test_train_separates_and_scores(spark):
    df = _corpus(spark).persist()
    model = lr_train(
        df, "label", dim=1 << 14, epochs=25, lr=1.0, track_loss=True
    )
    # loss decreased monotonically-ish (full-batch GD on separable data)
    assert model["loss"][-1] < 0.1 < model["loss"][0]
    scored = lr_score(df, model)
    acc = scored.select(
        ((F.col("quality_p") > 0.5).cast("double") == F.col("label"))
        .cast("int").alias("ok")
    ).agg(F.avg("ok")).first()[0]
    assert acc == 1.0
    # held-out docs from the same generative process also separate
    held = _corpus(spark, n=100).withColumn(
        "doc_id", F.col("doc_id") + 10_000
    )
    hacc = lr_score(held, model).select(
        ((F.col("quality_p") > 0.5).cast("double") == F.col("label"))
        .cast("int").alias("ok")
    ).agg(F.avg("ok")).first()[0]
    assert hacc >= 0.99
    df.unpersist()


def test_gradient_matches_numpy_twin(spark):
    """One epoch of the distributed update == the same update in numpy
    on the same featurized rows (sums are tiny here, so float order
    noise is below the tolerance)."""
    df = _corpus(spark, n=20, toks=6)
    dim = 1 << 8
    fx = {
        r.doc_id: (list(r.features), r.label)
        for r in featurize(df, dim=dim).select(
            "doc_id", "features", "label"
        ).collect()
    }
    lr, l2 = 0.5, 1e-6
    model = lr_train(df, "label", dim=dim, epochs=1, lr=lr, l2=l2)

    w = np.zeros(dim)
    g = np.zeros(dim + 1)
    n = len(fx)
    for feats, y in fx.values():
        r = 1.0 / (1.0 + np.exp(-0.0)) - y  # margin 0 at init
        for i in feats:
            g[i] += r
        g[dim] += r
    w_ref = w - lr * (g[:dim] / n + l2 * w)
    b_ref = -lr * g[dim] / n
    assert np.allclose(model["weights"], w_ref, atol=1e-12)
    assert model["bias"] == pytest.approx(b_ref, abs=1e-12)


def test_empty_training_set_raises(spark):
    empty = spark.createDataFrame([], "tokens array<int>, label double")
    with pytest.raises(ValueError, match="empty training set"):
        lr_train(empty, "label", dim=64, epochs=1)
