"""Lloyd k-means (DataFrame-native) + kmeans-centroid IVF search."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from workbook_exporter_fe_spark.operators.similarity import (
    cosine_topk,
    ivf_topk_kmeans,
    kmeans_fit,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def test_kmeans_inertia_monotone_and_k_cells(spark, emb):
    cents, hist = kmeans_fit(emb, k=8, iters=4)
    assert cents.count() == 8
    assert len(hist) == 4
    for a, b in zip(hist, hist[1:]):
        assert b <= a + 1e-6  # Lloyd never increases inertia
    assert hist[-1] < hist[0]  # and actually improves on this data


def test_kmeans_deterministic(spark, emb):
    c1, h1 = kmeans_fit(emb, k=5, iters=3)
    c2, h2 = kmeans_fit(emb.repartition(13), k=5, iters=3)
    assert h1 == h2
    a = {r["cid"]: tuple(r["cv"]) for r in c1.collect()}
    b = {r["cid"]: tuple(r["cv"]) for r in c2.collect()}
    assert set(a) == set(b)
    for cid in a:
        assert all(abs(x - y) < 1e-9 for x, y in zip(a[cid], b[cid]))


def test_kmeans_beats_single_centroid_baseline(spark, emb):
    """Quantizer quality: trained k=8 inertia must be well below the k=1
    baseline (total variance around the global mean) — i.e. the coarse
    quantizer genuinely partitions the space, which is what IVF needs.
    (The table's `label` column is metadata, not geometry — this corpus's
    vectors are not label-clustered, so quality is measured vs variance.)"""
    dim = len(emb.select("embedding").first()[0])
    v = emb.select(F.col("embedding").cast("array<double>").alias("x"))
    gmean = v.agg(
        F.array(*[F.avg(F.col("x")[i]) for i in range(dim)]).alias("g")
    ).first()["g"]
    base = v.select(
        F.aggregate(
            F.zip_with(F.col("x"), F.array(*[F.lit(g) for g in gmean]),
                       lambda p, q: (p - q) * (p - q)),
            F.lit(0.0),
            lambda acc, e: acc + e,
        ).alias("d")
    ).agg(F.sum("d")).first()[0]
    _, hist = kmeans_fit(emb, k=8, iters=5)
    assert hist[-1] < base * 0.95  # strictly better quantization than k=1


def test_kmeans_rejects_empty_and_tiny_input(spark, emb):
    empty = emb.filter(F.lit(False))
    with pytest.raises(ValueError, match="empty"):
        kmeans_fit(empty, k=3)
    tiny = emb.limit(2)
    with pytest.raises(ValueError, match="at least k=5"):
        kmeans_fit(tiny, k=5)


def test_ivf_kmeans_recall_vs_brute(spark, emb):
    cents, _ = kmeans_fit(emb, k=8, iters=4)
    brute = {r["vec_id"] for r in cosine_topk(emb, query_vec_id=0, k=10).collect()}
    got_rows = ivf_topk_kmeans(emb, cents, query_vec_id=0, nprobe=4, k=10).collect()
    got = {r["vec_id"] for r in got_rows}
    assert len(got_rows) == 10
    recall = len(got & brute) / 10
    assert recall >= 0.5, recall
