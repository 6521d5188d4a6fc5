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


def test_kmeans_assign_matches_python_argmin(spark):
    from workbook_exporter_fe_spark.operators.similarity import (
        kmeans_assign,
        kmeans_fit,
    )

    rows = [
        (i, [float((i * 13 + j * 7) % 11) - 5.0 for j in range(6)])
        for i in range(40)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents, _ = kmeans_fit(emb, k=4, iters=3)
    got = {r["vec_id"]: r["cid"] for r in kmeans_assign(emb, cents).collect()}
    cv = {r["cid"]: r["cv"] for r in cents.collect()}
    for i, x in rows:
        want = min(
            sorted(cv),
            key=lambda c: (sum((p - q) ** 2 for p, q in zip(x, cv[c])), c),
        )
        assert got[i] == want, i


def test_semantic_dedup_planted_clusters(spark):
    """Planted tight duplicate groups on orthogonal axes: survivors are
    exactly the min id per group (+ singletons); pairs only within
    groups; cells never produce cross-group false positives."""
    import pyspark.sql.functions as F

    from workbook_exporter_fe_spark.operators.similarity import (
        semantic_dedup,
        semantic_dedup_pairs,
    )

    dim, sizes = 8, [4, 3, 1, 5, 1, 2]
    rows = []
    for g, n in enumerate(sizes):
        for j in range(n):
            v = [0.0] * dim
            v[g] = 10.0
            v[(g + 1) % dim] = 0.01 * ((g * 7 + j) % 5)  # tiny intra-group jitter
            rows.append((g * 10 + j, v))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    docs = emb.select(F.col("vec_id").alias("doc_id"), "embedding")

    pairs = semantic_dedup_pairs(emb, k=3, iters=3, threshold=0.9).collect()
    for r in pairs:
        assert r["id_a"] // 10 == r["id_b"] // 10  # never cross-group
        assert r["cos"] >= 0.9
    # every within-group pair that shares a cell must be found; with tight
    # groups every member maps to one cell, so ALL within-group pairs exist
    want_pairs = {
        (g * 10 + a, g * 10 + b)
        for g, n in enumerate(sizes)
        for a in range(n)
        for b in range(a + 1, n)
    }
    assert {(r["id_a"], r["id_b"]) for r in pairs} == want_pairs

    kept = sorted(
        r["doc_id"]
        for r in semantic_dedup(docs, emb, k=3, iters=3, threshold=0.9,
                                doc_id_col="doc_id").collect()
    )
    assert kept == [g * 10 for g in range(len(sizes))]
