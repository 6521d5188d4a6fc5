"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force exact cosine vs a query vector — the
  baseline. Dot products run integer-exact: coordinates are scaled by 1e7
  and rounded to int64, so the sum is associative (order-independent) and
  bit-identical in any engine — same trick as the decimal sums in the
  query registry. Error vs float cosine < 1e-6, which is inside the
  rounding we report anyway.
- ``lsh_buckets``: scale path — random-hyperplane LSH where the hyperplanes
  are *data rows* (fixed vec_ids), so both Spark and the SQL oracle derive
  identical planes without sharing an RNG. Bucket = sign-bit vector of the
  hyperplane dots. ANN search then brute-forces only the query's bucket.

Scale notes: brute force is a broadcast of the query vector + a narrow
map — perfectly parallel but O(corpus) per query; LSH buckets shrink the
candidate set ~2^planes×. For batch kNN at 100 TB, bucket both sides and
join on bucket (the classic bucketed-ANN join); IVF (k-means coarse
quantizer) drops in the same seam.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 10_000_000  # 1e7: int64-exact dot products for 64-dim unit-ish vectors


def _ivec(col):
    """array<float> → array<long> scaled by 1e7 (engine-portable exact)."""
    return F.transform(col, lambda x: F.round(x.cast("double") * SCALE).cast("long"))


def _idot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("long"), lambda acc, v: acc + v
    )


def cosine_topk(
    embeddings: DataFrame, query_vec_id: int = 0, k: int = 20,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Top-k (vec_id, cos) vs the query vector, ties broken by vec_id."""
    q = embeddings.filter(F.col(id_col) == query_vec_id).select(
        _ivec(F.col(vec_col)).alias("qv")
    )
    cand = embeddings.filter(F.col(id_col) != query_vec_id).crossJoin(F.broadcast(q))
    av = _ivec(F.col(vec_col))
    dot = _idot(av, F.col("qv"))
    na = _idot(av, av)
    nq = _idot(F.col("qv"), F.col("qv"))
    cos = F.round(
        dot.cast("double") / (F.sqrt(na.cast("double")) * F.sqrt(nq.cast("double"))), 6
    )
    return (
        cand.select(F.col(id_col), cos.alias("cos"))
        .orderBy(F.col("cos").desc(), F.col(id_col))
        .limit(k)
    )


def lsh_buckets(
    embeddings: DataFrame, plane_ids: tuple[int, ...] = (1, 2, 3, 4),
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, bucket): sign-bit bucket vs data-derived hyperplanes."""
    planes = embeddings.filter(F.col(id_col).isin(list(plane_ids))).select(
        F.col(id_col).alias("plane_id"), _ivec(F.col(vec_col)).alias("pv")
    )
    joined = embeddings.crossJoin(F.broadcast(planes))
    bit_val = F.when(
        _idot(_ivec(F.col(vec_col)), F.col("pv")) >= 0,
        F.pow(F.lit(2.0), F.array_position(F.array(*[F.lit(p) for p in plane_ids]), F.col("plane_id")) - 1).cast("long"),
    ).otherwise(F.lit(0))
    return joined.groupBy(id_col).agg(F.sum(bit_val).alias("bucket"))
