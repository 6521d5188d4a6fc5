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

import numpy as np
import pandas as pd
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
    q = (
        embeddings.filter(F.col(id_col) == query_vec_id)
        .select(_ivec(F.col(vec_col)).alias("qv"))
        .select("qv", _idot(F.col("qv"), F.col("qv")).alias("nq"))
    )
    cand = (
        embeddings.filter(F.col(id_col) != query_vec_id)
        .select(F.col(id_col), _ivec(F.col(vec_col)).alias("av"))
        .crossJoin(F.broadcast(q))
    )
    cos = _cos(_idot(F.col("av"), F.col("qv")), _idot(F.col("av"), F.col("av")), F.col("nq"))
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


def _cos(dot, na, nb):
    return F.round(
        dot.cast("double") / (F.sqrt(na.cast("double")) * F.sqrt(nb.cast("double"))), 6
    )


def embedding_neardup_pairs(
    embeddings: DataFrame, plane_ids: tuple[int, ...] = (1, 2, 3, 4),
    threshold: float = 0.4, id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-dup pairs: LSH-bucketed candidates, exact verify.

    Completes the dedup family set (exact / MinHash-LSH / Jaccard / SimHash /
    embedding-cosine): candidate pairs are vectors sharing an LSH sign
    bucket (2^planes-way partition of the corpus), then each candidate pair
    is verified with the exact integer-scaled cosine and kept at
    ``cos >= threshold``. The bucket join is the scale path — at 100 TB the
    all-pairs O(n²) join never materializes; the self-join keys on
    ``bucket``, which spreads the corpus 2^planes ways (add planes to
    shrink buckets; recall is tunable via multiple plane sets OR-ed, same
    seam as MinHash bands).
    """
    b = lsh_buckets(embeddings, plane_ids, id_col, vec_col)
    # norms precomputed per VECTOR, not per pair: the pair verify below is
    # the hot loop (|bucket|² pairs) and higher-order array lambdas are
    # interpreted, so each removed per-pair array pass matters (measured
    # ~2.5× on the verify stage).
    v = (
        embeddings.select(F.col(id_col), _ivec(F.col(vec_col)).alias("iv"))
        .select(id_col, "iv", _idot(F.col("iv"), F.col("iv")).alias("n"))
        .join(b, id_col)
    )
    a = v.select(
        F.col(id_col).alias("id_a"), F.col("iv").alias("va"),
        F.col("n").alias("na"), "bucket",
    )
    c = v.select(
        F.col(id_col).alias("id_b"), F.col("iv").alias("vb"),
        F.col("n").alias("nb"), "bucket",
    )
    pairs = a.join(c, "bucket").filter(F.col("id_a") < F.col("id_b"))
    cos = _cos(_idot(F.col("va"), F.col("vb")), F.col("na"), F.col("nb"))
    return pairs.select("id_a", "id_b", cos.alias("cos")).filter(
        F.col("cos") >= threshold
    )


def lsh_topk(
    embeddings: DataFrame, plane_ids: tuple[int, ...] = (1, 2, 3, 4),
    query_vec_id: int = 0, k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """LSH-bucketed ANN: exact cosine top-k restricted to the query's bucket.

    The scale companion to ``cosine_topk``: candidates are only the vectors
    sharing the query's sign bucket (~corpus/2^planes of the data), then
    ranked by the exact integer-scaled cosine. Recall is tunable by OR-ing
    multiple plane sets (same seam as MinHash bands); partitioning the
    vector table by bucket turns the candidate filter into partition
    pruning at the source.
    """
    b = lsh_buckets(embeddings, plane_ids, id_col, vec_col)
    qb = b.filter(F.col(id_col) == query_vec_id).select("bucket")
    q = (
        embeddings.filter(F.col(id_col) == query_vec_id)
        .select(_ivec(F.col(vec_col)).alias("qv"))
        .select("qv", _idot(F.col("qv"), F.col("qv")).alias("nq"))
    )
    cand = (
        embeddings.filter(F.col(id_col) != query_vec_id)
        .select(F.col(id_col), _ivec(F.col(vec_col)).alias("av"))
        .join(b, id_col)
        .join(F.broadcast(qb), "bucket")
        .crossJoin(F.broadcast(q))
    )
    cos = _cos(_idot(F.col("av"), F.col("qv")), _idot(F.col("av"), F.col("av")), F.col("nq"))
    return (
        cand.select(F.col(id_col), cos.alias("cos"))
        .orderBy(F.col("cos").desc(), F.col(id_col))
        .limit(k)
    )


def ivf_topk(
    embeddings: DataFrame, centroid_ids: tuple[int, ...] = (1, 2, 3, 4, 5, 6, 7, 8),
    query_vec_id: int = 0, nprobe: int = 2, k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style ANN: coarse quantize into cells, probe nearest cells only.

    The coarse quantizer's centroids are *data rows* (fixed vec_ids) rather
    than k-means output so both Spark and the SQL oracle derive identical
    cells without sharing an RNG or an iterative trainer; a k-means
    refinement drops into the same seam (centroids df in, nothing else
    changes). Assignment = argmax cosine over the broadcast centroid set
    (ties to the lower centroid id); search probes the query's ``nprobe``
    nearest cells and brute-forces only those candidates.

    Scale: assignment is a broadcast nested loop over #centroids (a few
    thousand at 100 TB — still broadcastable) + a map-side argmax, no
    shuffle; the probe filter prunes the candidate scan to
    nprobe/#cells of the corpus, and partitioning the vector table by
    cell turns that into partition pruning at the source.
    """
    from pyspark.sql import Window

    cents = (
        embeddings.filter(F.col(id_col).isin(list(centroid_ids)))
        .select(F.col(id_col).alias("cid"), _ivec(F.col(vec_col)).alias("cv"))
        .select("cid", "cv", _idot(F.col("cv"), F.col("cv")).alias("cn"))
    )
    v = embeddings.select(F.col(id_col), _ivec(F.col(vec_col)).alias("iv")).select(
        id_col, "iv", _idot(F.col("iv"), F.col("iv")).alias("n")
    )
    scored = v.crossJoin(F.broadcast(cents)).select(
        id_col,
        "cid",
        _cos(_idot(F.col("iv"), F.col("cv")), F.col("n"), F.col("cn")).alias("ccos"),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("ccos"), F.asc("cid"))
    cells = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(F.col(id_col), F.col("cid").alias("cell"))
    )
    probed = (
        scored.filter(F.col(id_col) == query_vec_id)
        .orderBy(F.desc("ccos"), F.asc("cid"))
        .limit(nprobe)
        .select(F.col("cid").alias("cell"))
    )
    q = v.filter(F.col(id_col) == query_vec_id).select(
        F.col("iv").alias("qv"), F.col("n").alias("nq")
    )
    cand = (
        v.filter(F.col(id_col) != query_vec_id)
        .join(cells, id_col)
        .join(F.broadcast(probed), "cell")
        .crossJoin(F.broadcast(q))
    )
    cos = _cos(_idot(F.col("iv"), F.col("qv")), F.col("n"), F.col("nq"))
    return (
        cand.select("cell", F.col(id_col), cos.alias("cos"))
        .orderBy(F.col("cos").desc(), F.col(id_col))
        .limit(k)
    )


def pca_topk(
    embeddings: DataFrame,
    model,
    query_vec_id: int = 0,
    k: int = 10,
    shortlist: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN via a PCA-reduced shortlist scan + exact raw-space rerank.

    The reduced scan ranks candidates by squared Euclidean distance in
    the model's top-k subspace (operators/pca.py — projection preserves
    the dominant-variance geometry, so true neighbors land in a small
    shortlist), then the shortlist is re-scored with the SAME
    integer-exact cosine as brute force (``cosine_topk``) — the result
    contract matches the quantized path (``cosine_topk_quantized``):
    approximate candidate generation, exact final scores.

    Scale: the scan touches k_dims doubles per row instead of d (the
    storage/bandwidth win quantization couldn't show at int8 — 64→16
    dims is 4×), the shortlist is top-N via TakeOrdered (no full sort),
    and the rerank reads only ``shortlist`` raw vectors.

    For COSINE retrieval, fit the model on (and pass) L2-NORMALIZED
    embeddings: on the unit sphere cosine is monotone in Euclidean
    distance (cos = 1 − d²/2), so the subspace-L2 shortlist targets the
    right neighbors; on raw vectors with a large common mean the two
    rankings diverge and recall suffers (pinned in tests/test_pca.py).
    The rerank's cosine is scale-invariant, so scores are unchanged."""
    from workbook_exporter_fe_spark.operators.pca import pca_project

    sl = shortlist if shortlist is not None else 4 * k
    proj = pca_project(embeddings, model, vec_col=vec_col, out_col="_p")
    qp = proj.filter(F.col(id_col) == query_vec_id).select(
        F.col("_p").alias("_qp")
    )
    d2 = F.aggregate(
        F.zip_with(F.col("_p"), F.col("_qp"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cand = (
        proj.filter(F.col(id_col) != query_vec_id)
        .crossJoin(F.broadcast(qp))
        .select(F.col(id_col), d2.alias("_d2"))
        .orderBy(F.asc("_d2"), F.asc(id_col))
        .limit(sl)
        .select(id_col)
    )
    v = embeddings.select(
        F.col(id_col), _ivec(F.col(vec_col)).alias("iv")
    ).select(id_col, "iv", _idot(F.col("iv"), F.col("iv")).alias("n"))
    q = v.filter(F.col(id_col) == query_vec_id).select(
        F.col("iv").alias("qv"), F.col("n").alias("nq")
    )
    cos = _cos(_idot(F.col("iv"), F.col("qv")), F.col("n"), F.col("nq"))
    return (
        v.join(cand, id_col)
        .crossJoin(F.broadcast(q))
        .select(F.col(id_col), cos.alias("cos"))
        .orderBy(F.col("cos").desc(), F.asc(id_col))
        .limit(k)
    )


def kmeans_fit(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, list[float]]:
    """DataFrame-native Lloyd k-means; returns ((cid, cv), inertia history).

    The IVF docstring's promised refinement: a trained coarse quantizer
    that drops into the same centroid seam. Deterministic throughout —
    init picks the k rows with smallest md5(id) (hash-spread, no RNG),
    assignment ties break to the lower cid — so refits are reproducible
    on any cluster size.

    Scale per iteration: assignment is a broadcast nested loop over k
    centroids with a map-side argmin (no shuffle; same shape as ivf_topk
    assignment); the update is ONE groupBy(cid) computing per-dimension
    means (partial-aggregated map-side, k×dim output). The per-row
    distance uses zip_with/aggregate HOFs — interpreted, but per ROW×k
    with small k, not per candidate pair (CLAUDE.md HOF rule). Lineage is
    localCheckpoint-truncated per iteration. Empty cells keep their
    previous centroid.

    Init is a global TakeOrdered (``orderBy(_h).limit(k)``): every
    partition contributes only its local top-k, so no single task ever
    holds the corpus — unlike an unpartitioned row_number window, which
    funnels the whole table through one partition.
    """
    from pyspark.sql import Window

    first = embeddings.select(vec_col).first()
    if first is None:
        raise ValueError("kmeans_fit: empty embeddings input")
    dim = len(first[0])
    v = embeddings.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("x")
    ).localCheckpoint()

    # k smallest-md5 rows via TakeOrdered (parallel partial top-k per
    # partition + driver merge of k-row heads) — same deterministic k rows
    # as the former global-window formulation, minus its one-task funnel.
    seed_rows = (
        v.withColumn("_h", F.md5(F.col("id").cast("string")))
        .orderBy("_h")
        .limit(k)
        .collect()
    )
    if len(seed_rows) < k:
        raise ValueError(
            f"kmeans_fit: need at least k={k} rows, got {len(seed_rows)}"
        )
    spark = embeddings.sparkSession
    cents = spark.createDataFrame(
        [(cid, list(r["x"])) for cid, r in enumerate(seed_rows)],
        "cid INT, cv ARRAY<DOUBLE>",
    ).localCheckpoint()

    def dist2(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda p, q: (p - q) * (p - q)),
            F.lit(0.0),
            lambda acc, e: acc + e,
        )

    wa = Window.partitionBy("id").orderBy(F.asc("_d"), F.asc("cid"))
    history: list[float] = []
    for _ in range(iters):
        scored = v.crossJoin(F.broadcast(cents)).select(
            "id", "x", "cid", dist2(F.col("x"), F.col("cv")).alias("_d")
        )
        assigned = (
            scored.withColumn("_rn", F.row_number().over(wa))
            .filter(F.col("_rn") == 1)
            .select("id", "x", "cid", "_d")
        )
        inertia, = assigned.agg(F.sum("_d")).first()
        history.append(float(inertia))
        new_cents = assigned.groupBy("cid").agg(
            F.array(*[F.avg(F.col("x")[i]) for i in range(dim)]).alias("cv")
        )
        # empty cells keep their previous centroid
        cents = (
            cents.select("cid", F.col("cv").alias("_old"))
            .join(new_cents, "cid", "left")
            .select("cid", F.coalesce("cv", "_old").alias("cv"))
            .localCheckpoint()
        )
    return cents, history


def ivf_topk_kmeans(
    embeddings: DataFrame,
    centroids: DataFrame,
    query_vec_id: int = 0,
    nprobe: int = 2,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """``ivf_topk`` with trained (kmeans_fit) centroids instead of data
    rows: assign every vector to its nearest centroid (L2, broadcast
    argmin), probe the query's nprobe nearest cells, exact-cosine rank
    the candidates. Not oracle-checked (the trainer is iterative);
    recall vs brute force is pinned in tests."""
    from pyspark.sql import Window

    def dist2(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda p, q: (p - q) * (p - q)),
            F.lit(0.0),
            lambda acc, e: acc + e,
        )

    v = embeddings.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("x")
    )
    scored = v.crossJoin(F.broadcast(centroids)).select(
        id_col, "x", "cid", dist2(F.col("x"), F.col("cv")).alias("_d")
    )
    wa = Window.partitionBy(id_col).orderBy(F.asc("_d"), F.asc("cid"))
    cells = (
        scored.withColumn("_rn", F.row_number().over(wa))
        .filter(F.col("_rn") == 1)
        .select(F.col(id_col), F.col("cid").alias("cell"))
    )
    probed = (
        scored.filter(F.col(id_col) == query_vec_id)
        .orderBy(F.asc("_d"), F.asc("cid"))
        .limit(nprobe)
        .select(F.col("cid").alias("cell"))
    )
    q = v.filter(F.col(id_col) == query_vec_id).select(F.col("x").alias("qx"))
    dot = F.aggregate(
        F.zip_with(F.col("x"), F.col("qx"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, e: acc + e,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(c, F.lit(0.0), lambda acc, e: acc + e * e)
    )
    cand = (
        v.filter(F.col(id_col) != query_vec_id)
        .join(cells, id_col)
        .join(F.broadcast(probed), "cell")
        .crossJoin(F.broadcast(q))
    )
    cos = F.round(dot / (norm(F.col("x")) * norm(F.col("qx"))), 6)
    return (
        cand.select("cell", F.col(id_col), cos.alias("cos"))
        .orderBy(F.col("cos").desc(), F.col(id_col))
        .limit(k)
    )


def kmeans_assign(
    embeddings: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id_col, cid): nearest trained centroid — ZERO-shuffle assignment.

    The centroid table is k×dim (driver-small by definition of a coarse
    quantizer), so it collects into a literal array of (d², cid) structs
    and the argmin is one `array_min` per row — a map-side projection,
    unlike the window-argmin inside `kmeans_fit`'s training loop (which
    needs per-id frames anyway). Ties break to the lower cid via struct
    ordering, matching the trainer. For k beyond ~1k switch to the
    broadcast-join + min_by formulation; the literal plan node grows with
    k×dim."""
    rows = centroids.orderBy("cid").collect()
    x = F.col(vec_col).cast("array<double>")
    cands = []
    for r in rows:
        cv = F.array(*[F.lit(float(c)) for c in r["cv"]])
        d2 = F.aggregate(
            F.zip_with(x, cv, lambda p, q: (p - q) * (p - q)),
            F.lit(0.0),
            lambda acc, e: acc + e,
        )
        cands.append(F.struct(d2.alias("d"), F.lit(int(r["cid"])).alias("cid")))
    best = F.array_min(F.array(*cands))["cid"]
    return embeddings.select(F.col(id_col), best.alias("cid"))


def semantic_dedup_pairs(
    embeddings: DataFrame,
    centroids: DataFrame | None = None,
    k: int = 16,
    iters: int = 3,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style near-dup pairs: k-means cells as the candidate
    blocks, exact integer-scaled cosine verify within each cell.

    Same shape as ``embedding_neardup_pairs`` with the sign-bucket LSH
    swapped for a TRAINED coarse quantizer: semantically close vectors
    land in the same cell even when their sign pattern differs, so recall
    at high thresholds is centroid-quality- rather than plane-luck-bound
    (the SemDeDup observation: duplicates concentrate inside k-means
    clusters of the embedding space). The all-pairs join never
    materializes — the self-join keys on ``cid``; size k ≈ corpus/target
    cell size so |cell|² stays bounded, exactly like the LSH planes knob.
    Misses cross-cell pairs by construction (boundary duplicates) — the
    recall/cost trade every blocked dedup makes; raise k for cost, or OR
    with `embedding_neardup_pairs` buckets for recall.
    """
    if centroids is None:
        centroids, _ = kmeans_fit(embeddings, k, iters, id_col, vec_col)
    cells = kmeans_assign(embeddings, centroids, id_col, vec_col)
    v = (
        embeddings.select(F.col(id_col), _ivec(F.col(vec_col)).alias("iv"))
        .select(id_col, "iv", _idot(F.col("iv"), F.col("iv")).alias("n"))
        .join(cells, id_col)
    )
    a = v.select(
        F.col(id_col).alias("id_a"), F.col("iv").alias("va"),
        F.col("n").alias("na"), "cid",
    )
    b = v.select(
        F.col(id_col).alias("id_b"), F.col("iv").alias("vb"),
        F.col("n").alias("nb"), "cid",
    )
    pairs = a.join(b, "cid").filter(F.col("id_a") < F.col("id_b"))
    cos = _cos(_idot(F.col("va"), F.col("vb")), F.col("na"), F.col("nb"))
    return pairs.select("id_a", "id_b", cos.alias("cos")).filter(
        F.col("cos") >= threshold
    )


def semantic_dedup(
    docs: DataFrame,
    embeddings: DataFrame,
    centroids: DataFrame | None = None,
    k: int = 16,
    iters: int = 3,
    threshold: float = 0.95,
    doc_id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Rows of ``docs`` surviving semantic near-dup clustering: candidate
    pairs from `semantic_dedup_pairs`, transitive closure + one canonical
    doc per cluster via components.dedup_canonical (min id survives,
    singletons kept)."""
    from .components import dedup_canonical

    pairs = semantic_dedup_pairs(
        embeddings, centroids, k, iters, threshold, vec_id_col, vec_col
    )
    return dedup_canonical(docs, pairs, id_col=doc_id_col)


# ----------------------------------------------------------- quantization


def quantize_embeddings(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Symmetric per-vector int8 scalar quantization: ``(id, qv:
    array<tinyint>, scale: double)`` with ``x ≈ qv * scale``.

    In-memory ANN systems get 4× less vector traffic from int8 vs
    float32; MEASURED in this parquet-backed engine the effect is more
    modest and honest numbers are in BENCH/BASELINE.md ("int8
    quantization: measured effect"): zstd-parquet already bit-packs the
    integer-scaled vectors (stored ratio 1.41×), and at bench scale the
    interpreted higher-order-function dot product — not memory
    bandwidth — bounds the scan, so wall is unchanged. The durable wins
    are the smaller representation for in-memory/broadcast use and the
    exact-re-rank contract below. Cosine needs no dequantization — the
    per-vector scales cancel in dot/(|a||b|) — so search touches ONLY
    the int8 arrays; ``scale`` is kept for dot/reconstruction uses.

    Arrow-batched numpy kernel, NOT a JVM transform lambda: the obvious
    ``transform(x, v -> round(v/scale))`` re-evaluates the scale
    expression (an array_max over the row) per ELEMENT once
    CollapseProject inlines it — O(dim²) per row, measured 15× slower
    than the float scan at dim=128 in scripts/bench_q8_gemv.py — the
    same trap operators/drift.py documents at vocabulary scale. The
    kernel does one rowwise abs-max + divide per Arrow batch instead.
    Rounding is HALF_UP away from zero (Spark's ROUND), so the arrays
    match what the old JVM expression produced. Requires fixed-dim
    embeddings (any real embedding column is).
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("struct<qv:array<tinyint>,scale:double>")
    def _quant(col: pd.Series) -> pd.DataFrame:
        if len(col) == 0:
            return pd.DataFrame({"qv": [], "scale": []})
        m = np.stack(col.to_numpy()).astype(np.float64)
        amax = np.abs(m).max(axis=1)
        scale = np.where(amax > 0, amax / 127.0, 1.0)
        r = m / scale[:, None]
        q = (np.sign(r) * np.floor(np.abs(r) + 0.5)).astype(np.int8)
        return pd.DataFrame({"qv": list(q), "scale": scale})

    return df.select(
        F.col(id_col), _quant(F.col(vec_col)).alias("s")
    ).select(
        id_col, F.col("s.qv").alias("qv"), F.col("s.scale").alias("scale")
    )


def _qdot(a, b):
    """Exact int64 dot of two int8 arrays (promote before multiply)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("int") * y.cast("int")),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def _q8_gemv_scan(qt: DataFrame, query_vec_id: int, id_col: str) -> DataFrame:
    """Vectorized int8 scan: one Arrow-batched numpy GEMV per batch
    against the closure-captured query vector, instead of the
    interpreted per-element HOF fold. This is the kernel that actually
    realizes the int8 width win (BENCH/BASELINE.md "int8 quantization"
    identified the HOF dot as the seam hiding it): each Arrow batch is
    stacked into a (B, d) int8 matrix and hits BLAS-ish numpy matmul in
    int32 (exact while 127²·d < 2³¹, i.e. dim < ~133k).

    Returns ((id_col, dot:long, qn:long) for every row but the query's,
    and the query's own squared norm).
    """
    from pyspark.sql.functions import pandas_udf

    qrow = qt.filter(F.col(id_col) == query_vec_id).select("qv").first()
    if qrow is None:
        raise ValueError(f"query vec_id {query_vec_id} not found")
    q = np.asarray(qrow["qv"], dtype=np.int32)
    qn_q = int(q.astype(np.int64) @ q.astype(np.int64))

    @pandas_udf("struct<dot:long,qn:long>")
    def scan(col: pd.Series) -> pd.DataFrame:
        if len(col) == 0:
            return pd.DataFrame({"dot": [], "qn": []}, dtype="int64")
        m = np.stack(col.to_numpy()).astype(np.int32)  # (B, d) int8→int32
        return pd.DataFrame(
            {"dot": m @ q, "qn": np.einsum("ij,ij->i", m, m)}
        )

    scored = qt.filter(F.col(id_col) != query_vec_id).select(
        id_col, scan(F.col("qv")).alias("s")
    ).select(id_col, F.col("s.dot").alias("dot"), F.col("s.qn").alias("qn"))
    return scored, qn_q


def cosine_topk_quantized(
    embeddings: DataFrame,
    query_vec_id: int = 0,
    k: int = 10,
    rerank_factor: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    kernel: str = "gemv",
) -> DataFrame:
    """Brute-force cosine top-k over INT8-quantized vectors with exact
    re-rank: score every candidate on the quantized arrays (4× less
    memory traffic than the float scan), keep the top
    ``rerank_factor * k`` by approximate cosine, re-score only those on
    the exact integer-scaled vectors, return the exact top-k.

    With symmetric int8 the approximate cosine errs by O(1/127) per
    term, so the true top-k sits inside a modest re-rank margin;
    tests/test_quantized.py pins recall == 1.0 at rerank_factor=4 on the
    driver embeddings. Composes with the IVF probe filter (the candidate
    relation here is the full corpus; swap in the probed cells for
    IVF-quantized search — same seam as ivf_topk).

    ``kernel``: 'gemv' (default) scans with the Arrow-batched numpy
    matrix-vector kernel; 'hof' keeps the JVM higher-order-function fold
    (the round-3 path, kept for the A/B in scripts/bench_r2_fixes and as
    the no-Python fallback). Both produce identical integer dots, so the
    rerank candidates — and therefore the exact output — are the same.
    """
    qt = quantize_embeddings(embeddings, vec_col=vec_col, id_col=id_col)
    if kernel == "gemv":
        scored, qn_q = _q8_gemv_scan(qt, query_vec_id, id_col)
        approx = (
            scored.select(
                id_col,
                _cos(F.col("dot"), F.col("qn"), F.lit(qn_q)).alias("acos_"),
            )
            .orderBy(F.desc("acos_"), F.asc(id_col))
            .limit(rerank_factor * k)
        )
    else:
        qn = qt.select(
            id_col, "qv", _qdot(F.col("qv"), F.col("qv")).alias("qn")
        )
        qq = qn.filter(F.col(id_col) == query_vec_id).select(
            F.col("qv").alias("qqv"), F.col("qn").alias("qqn")
        )
        approx = (
            qn.filter(F.col(id_col) != query_vec_id)
            .crossJoin(F.broadcast(qq))
            .select(
                id_col,
                _cos(
                    _qdot(F.col("qv"), F.col("qqv")), F.col("qn"), F.col("qqn")
                ).alias("acos_"),
            )
            .orderBy(F.desc("acos_"), F.asc(id_col))
            .limit(rerank_factor * k)
        )
    v = embeddings.select(F.col(id_col), _ivec(F.col(vec_col)).alias("iv")).select(
        id_col, "iv", _idot(F.col("iv"), F.col("iv")).alias("n")
    )
    q = v.filter(F.col(id_col) == query_vec_id).select(
        F.col("iv").alias("qv_"), F.col("n").alias("nq")
    )
    exact = (
        v.join(F.broadcast(approx.select(id_col)), id_col)
        .crossJoin(F.broadcast(q))
        .select(
            id_col,
            _cos(_idot(F.col("iv"), F.col("qv_")), F.col("n"), F.col("nq")).alias("cos"),
        )
    )
    return exact.orderBy(F.desc("cos"), F.asc(id_col)).limit(k)
