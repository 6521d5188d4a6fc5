"""int8 embedding quantization + quantized-scan/exact-rerank ANN."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from workbook_exporter_fe_spark.operators.similarity import (
    cosine_topk,
    cosine_topk_quantized,
    quantize_embeddings,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


def test_quantization_shape_and_reconstruction(spark, emb):
    qt = quantize_embeddings(emb)
    row = qt.first()
    assert dict(qt.dtypes)["qv"] == "array<tinyint>"
    assert all(-127 <= q <= 127 for q in row.qv)
    # reconstruction error bounded by scale/2 per coordinate
    orig = {r.vec_id: r.embedding for r in emb.limit(5).collect()}
    for r in qt.filter(F.col("vec_id").isin(list(orig))).collect():
        for x, q in zip(orig[r.vec_id], r.qv):
            assert abs(x - q * r.scale) <= r.scale / 2 + 1e-12


def test_quantized_topk_recall_is_exact_after_rerank(spark, emb):
    want = [r.vec_id for r in cosine_topk(emb, query_vec_id=0, k=10).collect()]
    got = [
        r.vec_id
        for r in cosine_topk_quantized(emb, query_vec_id=0, k=10).collect()
    ]
    assert got == want  # exact re-rank restores the exact ordering
    # approximate-only (factor 1 margin) still lands most of the top-k
    near = {
        r.vec_id
        for r in cosine_topk_quantized(
            emb, query_vec_id=0, k=10, rerank_factor=1
        ).collect()
    }
    assert len(near & set(want)) >= 8


def test_gemv_and_hof_kernels_agree(spark):
    """The Arrow/numpy GEMV scan and the JVM HOF fold compute the same
    integer dots, so both kernels must pick the same rerank candidates
    and return the identical exact top-k."""
    from workbook_exporter_fe_spark.operators.similarity import (
        cosine_topk_quantized,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    a = cosine_topk_quantized(emb, query_vec_id=0, k=10, kernel="gemv")
    b = cosine_topk_quantized(emb, query_vec_id=0, k=10, kernel="hof")
    assert [tuple(r) for r in a.collect()] == [tuple(r) for r in b.collect()]
