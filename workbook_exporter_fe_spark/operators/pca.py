"""Distributed PCA over embedding columns (dimensionality reduction for
the similarity/ANN family).

The reference engine has nothing comparable — brief-surface for the
training-data pipeline's embedding operations (reduce before index: an
IVF/LSH index over 16 PCA dims scans ~4× less than over 64 raw dims at
the same recall on anisotropic embeddings).

Scale design — the standard two-moment sufficient-statistics shape:

- ONE corpus pass: ``mapInPandas`` accumulates per-partition
  (n, Σx, ΣxᵀX) with a numpy GEMM (d² doubles per PARTITION, not per
  row — no d²-wide shuffle rows, no explode); the reduce collects one
  tiny row per partition (d=64 → 4 KB each), so driver traffic is
  O(partitions · d²) regardless of corpus size;
- the eigendecomposition runs on the d×d covariance on the DRIVER
  (d ≤ a few thousand for any embedding model — microseconds, not a
  distributed problem);
- projection is the corpus-scale hot path: one Arrow-batched pandas UDF
  doing a batch GEMM against the broadcast (k, d) component matrix —
  narrow projection, no shuffle (the bpe_encode / unigram_encode
  contract).

Determinism: component signs are normalized (largest-|loading|
coordinate positive) so repeated fits agree; eigh on the same covariance
is deterministic. Tests pin the fit against numpy.cov+eigh on collected
data, orthonormality, variance ordering, and the rotation invariance
(full-rank projection preserves pairwise distances) that the q28 gate's
``pca_ok`` envelope re-checks per pair.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, DoubleType


@dataclass
class PCAModel:
    mean: np.ndarray          # (d,)
    components: np.ndarray    # (k, d) — rows are principal axes
    eigenvalues: np.ndarray   # (k,) descending
    explained: np.ndarray     # (k,) fraction of total variance
    n: int


def _moments(emb: DataFrame, vec_col: str) -> tuple[int, np.ndarray, np.ndarray]:
    """(N, Σx, ΣXᵀX) in one pass: per-partition numpy accumulation,
    one summary row per partition."""

    def part(it):
        n, s, ss = 0, None, None
        for pdf in it:
            if not len(pdf):
                continue
            m = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            n += m.shape[0]
            if s is None:
                s = m.sum(axis=0)
                ss = m.T @ m
            else:
                s += m.sum(axis=0)
                ss += m.T @ m
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "ss": [ss.ravel().tolist()]}
            )

    rows = (
        emb.select(vec_col)
        .mapInPandas(part, "n long, s array<double>, ss array<double>")
        .collect()
    )
    if not rows:
        raise ValueError("pca_fit: empty input")
    n = sum(r["n"] for r in rows)
    s = np.sum([np.asarray(r["s"]) for r in rows], axis=0)
    ss_flat = np.sum([np.asarray(r["ss"]) for r in rows], axis=0)
    d = s.shape[0]
    return n, s, ss_flat.reshape(d, d)


def pca_fit(
    emb: DataFrame, k: int | None = None, vec_col: str = "embedding"
) -> PCAModel:
    """Fit PCA from the two-moment statistics; ``k`` defaults to full
    rank. Population covariance (÷N), eigenvalues descending, signs
    normalized for reproducibility."""
    n, s, ss = _moments(emb, vec_col)
    mean = s / n
    cov = ss / n - np.outer(mean, mean)
    cov = (cov + cov.T) / 2.0  # exact symmetry for eigh
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1]
    k = len(w) if k is None else min(k, len(w))
    w, v = w[order[:k]], v[:, order[:k]]
    comps = v.T.copy()
    for row in comps:
        j = int(np.argmax(np.abs(row)))
        if row[j] < 0:
            row *= -1.0
    total = float(np.clip(ss.trace() / n - mean @ mean, 1e-300, None))
    return PCAModel(
        mean=mean,
        components=comps,
        eigenvalues=np.clip(w, 0.0, None),
        explained=np.clip(w, 0.0, None) / total,
        n=n,
    )


def pca_project(
    df: DataFrame,
    model: PCAModel,
    vec_col: str = "embedding",
    out_col: str = "pca",
) -> DataFrame:
    """Append ``out_col``: the centered embedding projected onto the
    model's components — one Arrow-batched GEMM per batch."""
    mean, comps_t = model.mean, model.components.T.copy()

    @pandas_udf(ArrayType(DoubleType()))
    def _proj(col: pd.Series) -> pd.Series:
        m = np.asarray([np.asarray(v, dtype=np.float64) for v in col])
        if m.size == 0:
            return pd.Series([], dtype=object)
        y = (m - mean) @ comps_t
        return pd.Series(list(y))

    return df.withColumn(out_col, _proj(F.col(vec_col)))
