"""Trained quality classifier: hashed n-gram logistic regression in-engine.

The third tier of the quality-filtering story (after the heuristic
scores in functions/textops.py and the unigram-LM cross-entropy in
operators/lm.py): a fastText-style linear classifier over hashed
token n-grams, TRAINED WHERE THE DATA IS — the labeled corpus never
leaves the cluster, the model is the only thing on the driver.

Split of labor (same pattern as operators/bpe.py bpe_train): the MODEL
is feature-hash-sized (2^18 float64 = 2 MiB — driver-held numpy,
broadcast per epoch), the DATA-sized work is Spark-side:

- featurize: unigram + adjacent-bigram hashes mod ``dim`` as pure Column
  expressions (xxhash64 inside HOF transforms — no Python in the row
  path, no vocabulary collection, bounded width by construction: the
  hashing trick, what fastText does);
- per epoch ONE job: an Arrow-batched pandas_udf computes each doc's
  margin against the broadcast weights (numpy fancy-index per row), and
  the gradient aggregates map-side — ``explode(features) → groupBy(idx)
  → sum(residual)`` returns ≤ dim rows to the driver (model-sized,
  never corpus-sized). The bias rides the same pass as reserved feature
  index ``dim``.

Full-batch gradient descent, not SGD: every epoch's gradient is an
order-insensitive SUM, so training has no sample-order dependence to
tune around, and each epoch is exactly one shuffle whose width is the
feature dimension, combined map-side — the same partial-agg shape as
the bigram counts that measured 0.948 scaling. At 100 TB: epochs scan
the persisted featurized relation (columnar, one int-array column + a
label double); nothing corpus-sized ever reaches the driver.

Labels are {0.0, 1.0}; scores are P(label=1). Binary logistic loss;
L2 on the weights (not the bias).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def featurize(
    df: DataFrame,
    tokens_col: str = "tokens",
    dim: int = 1 << 18,
    out: str = "features",
    seed: int = 9,
) -> DataFrame:
    """Hashed unigram + adjacent-bigram feature indices in [0, dim).

    Pure Column expressions: per token ``xxhash64(token, seed) mod
    dim``; per adjacent pair the two int32 ids packed into one int64
    ((a<<32)|b — the operators/vocab.py packing) hashed under a distinct
    seed. Collisions are the hashing trick's accepted noise; ``dim``
    controls them, nothing is learned per-string. ``zip_with`` pairs the
    two shifted slices elementwise (same length by construction), so no
    explode happens here — the fan-out stays inside the row.
    """
    toks = F.col(tokens_col)
    pair_len = F.greatest(F.size(toks) - 1, F.lit(0))
    uni = F.transform(
        toks, lambda t: F.pmod(F.xxhash64(t, F.lit(seed)), F.lit(dim))
    )
    bi = F.zip_with(
        F.slice(toks, 1, pair_len),
        F.slice(toks, 2, pair_len),
        lambda a, b: F.pmod(
            F.xxhash64(
                F.shiftleft(a.cast("long"), 32) + b.cast("long"),
                F.lit(seed + 1),
            ),
            F.lit(dim),
        ),
    )
    return df.withColumn(out, F.concat(uni, bi).cast("array<int>"))


def _margin_udf(bw, bias: float):
    """Arrow-batched margin: w[ix].sum() + b per row; ``bw`` is a Spark
    broadcast of the weight vector (model-sized, shipped once per epoch,
    not per task)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def margin(features):
        import pandas as pd

        w = bw.value
        return pd.Series(
            [
                float(w[np.asarray(ix, dtype=np.int64)].sum()) + bias
                if len(ix) else bias
                for ix in features
            ],
            dtype="float64",
        )

    return margin


def lr_train(
    df: DataFrame,
    label_col: str,
    tokens_col: str = "tokens",
    dim: int = 1 << 18,
    epochs: int = 30,
    lr: float = 0.5,
    l2: float = 1e-6,
    seed: int = 9,
    track_loss: bool = False,
) -> dict:
    """Train the classifier; returns ``{"weights", "bias", "dim",
    "seed", "loss"}`` (loss per epoch only when ``track_loss`` — it is
    a second action per epoch re-running the margin kernel; gradients
    alone need exactly one).
    """
    spark = df.sparkSession
    feats = (
        featurize(df, tokens_col, dim=dim, seed=seed)
        .select(
            F.col("features"),
            F.col(label_col).cast("double").alias("_y"),
        )
        .persist()
    )
    n = feats.count()  # materializes the persist; featurize runs ONCE
    if n == 0:
        raise ValueError("empty training set")
    w = np.zeros(dim, dtype=np.float64)
    bias = 0.0
    losses: list[float] = []
    try:
        for _ in range(epochs):
            bw = spark.sparkContext.broadcast(w)
            margin = _margin_udf(bw, bias)
            resid = feats.select(
                # bias rides as reserved index `dim`, so ONE groupBy
                # carries every gradient component
                F.concat(F.col("features"), F.array(F.lit(dim))
                         ).alias("_fx"),
                margin("features").alias("_m"),
                F.col("_y"),
            ).withColumn(
                "_r",
                F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("_m")))
                - F.col("_y"),
            )
            rows = (
                resid.select(F.explode("_fx").alias("_i"), "_r")
                .groupBy("_i")
                .agg(F.sum("_r").alias("g"))
                .collect()
            )
            if track_loss:
                s = resid.agg(
                    F.sum(
                        F.greatest(F.col("_m"), F.lit(0.0))
                        - F.col("_m") * F.col("_y")
                        + F.log1p(F.exp(-F.abs(F.col("_m"))))
                    )
                ).collect()[0][0]
                losses.append(float(s) / n)
            bw.destroy()
            g = np.zeros(dim + 1, dtype=np.float64)
            for r in rows:
                g[r._i] = r.g
            w = w - lr * (g[:dim] / n + l2 * w)
            bias -= lr * g[dim] / n
    finally:
        feats.unpersist()
    return {"weights": w, "bias": bias, "dim": dim, "seed": seed,
            "loss": losses}


def text_tokens(text_col) -> "F.Column":
    """Deterministic int tokens for RAW-TEXT corpora: whitespace split →
    ``xxhash64 mod 2^31`` per word, as a pure Column expression. The
    engine's native input is pre-tokenized (``tokens: array<int>``,
    BASELINE input_hint); this adapter lets the same classifier train and
    score on text tables — train and score MUST both go through it (the
    ids are hash-arbitrary; only consistency matters, exactly like the
    feature hashing itself)."""
    words = F.filter(F.split(text_col, r"\s+"), lambda w: w != "")
    return F.transform(
        words, lambda w: F.pmod(F.xxhash64(w), F.lit(1 << 31)).cast("int")
    )


def save_model(model: dict, path: str) -> None:
    """Persist a trained model as npz (weights + scalars)."""
    np.savez_compressed(
        path,
        weights=model["weights"],
        bias=np.float64(model["bias"]),
        dim=np.int64(model["dim"]),
        seed=np.int64(model["seed"]),
    )


def load_model(path: str) -> dict:
    z = np.load(path)
    return {
        "weights": z["weights"],
        "bias": float(z["bias"]),
        "dim": int(z["dim"]),
        "seed": int(z["seed"]),
        "loss": [],
    }


def lr_score(
    df: DataFrame,
    model: dict,
    tokens_col: str = "tokens",
    out: str = "quality_p",
) -> DataFrame:
    """P(label=1) per row under a trained model — one Arrow kernel pass,
    usable as a corpus-pipeline filter stage (``quality_p >= τ``). The
    weights broadcast stays alive for the returned plan's lifetime."""
    spark = df.sparkSession
    bw = spark.sparkContext.broadcast(model["weights"])
    margin = _margin_udf(bw, model["bias"])
    featured = featurize(
        df, tokens_col, dim=model["dim"], seed=model["seed"], out="__fx"
    )
    return featured.withColumn(
        out, F.lit(1.0) / (F.lit(1.0) + F.exp(-margin("__fx")))
    ).drop("__fx")
