"""Benchmark decontamination: remove corpus docs that leak eval data.

The standard pre-training hygiene pass (GPT-3 appendix C / PaLM / Llama
data cards): a training document is CONTAMINATED if it shares any word
n-gram (typically 8-13 words) with a benchmark/eval document; contaminated
docs are dropped (or flagged) before training so benchmark scores measure
generalization, not memorization.

Spark-first shape (reference has nothing comparable; this is brief-surface
for the training-data pipeline):

1. both sides explode to word k-gram HASHES — int64 primitives, never
   strings, on the shuffle (CLAUDE.md perf rule; same two hash modes as
   dedup: ``md5`` = engine-portable oracle mode, ``native`` = xxhash64
   production mode);
2. the benchmark side is reduced to DISTINCT hashes — benchmark suites are
   tiny next to a corpus (thousands of docs vs billions), so this relation
   broadcasts and the probe is a map-side semi-join: the corpus is scanned
   ONCE, shuffles nothing, and emits only hit doc_ids;
3. ``decontaminate`` finishes with a broadcast anti-join of the (small)
   contaminated-id set against the corpus.

At 100 TB the only wide operation is the corpus scan; if the benchmark
ever outgrows broadcast size, drop the ``broadcast`` hint and the same
plan degrades gracefully to a shuffled semi-join on the int64 hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from workbook_exporter_fe_spark.functions.textops import word_shingles


def _gram_hashes(df: DataFrame, k: int, id_col: str, text_col: str, hash_fn: str):
    """(id, gh): one row per word-k-gram occurrence, hashed to int64."""
    sh = F.explode(word_shingles(F.col(text_col), k)).alias("_g")
    out = df.select(F.col(id_col), sh)
    if hash_fn == "md5":
        gh = F.conv(F.substring(F.md5(F.col("_g")), 1, 15), 16, 10).cast("long")
    elif hash_fn == "native":
        gh = F.xxhash64(F.col("_g"))
    else:
        raise ValueError(hash_fn)
    return out.select(id_col, gh.alias("gh"))


def contaminated_docs(
    docs: DataFrame,
    bench: DataFrame,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str | None = None,
    hash_fn: str = "md5",
) -> DataFrame:
    """(doc_id, n_hits): corpus docs sharing ≥1 word k-gram with ``bench``
    and how many of their k-gram occurrences hit benchmark grams.

    Docs shorter than k words emit no grams and can never be flagged —
    callers screening short eval items should lower ``k``.
    """
    bench_grams = (
        _gram_hashes(bench, k, id_col, bench_text_col or text_col, hash_fn)
        .select("gh")
        .distinct()
    )
    corpus_grams = _gram_hashes(docs, k, id_col, text_col, hash_fn)
    hits = corpus_grams.join(F.broadcast(bench_grams), "gh", "leftsemi")
    return hits.groupBy(id_col).agg(F.count("*").alias("n_hits"))


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str | None = None,
    hash_fn: str = "md5",
) -> DataFrame:
    """Rows of ``docs`` with no word-k-gram overlap with ``bench``.

    The contaminated-id relation is hit-sized (typically a tiny corpus
    fraction) — broadcast into the anti-join so the corpus never shuffles."""
    bad = contaminated_docs(
        docs, bench, k, id_col, text_col, bench_text_col, hash_fn
    ).select(id_col)
    return docs.join(F.broadcast(bad), id_col, "left_anti")


def fuzzy_decontaminate(
    docs: DataFrame,
    benchmark_index,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """NEAR-duplicate benchmark decontamination: drop training docs that
    LSH-match any document in a prebuilt benchmark MinHashIndex
    (operators/dedup.MinHashIndex — built once from the eval sets, then
    queried read-only by every training batch).

    The exact n-gram pass (:func:`decontaminate`) catches verbatim
    leakage; this catches paraphrased/reformatted leakage the way the
    near-dup dedup family catches it — token-shingle MinHash bands — at
    the cost of the benchmark signature relation only (~n_bands rows per
    benchmark doc; the benchmark corpus itself is never reread). Pure
    composition: index.match() + one anti-join.
    """
    from pyspark.sql import functions as F

    # index ids are STRING (MinHashIndex.sign normalizes) — compare on
    # the caller's id cast to string, not via Spark's numeric coercion
    # (lossy above 2^53 for 64-bit ids)
    hits = benchmark_index.match(
        docs, tokens_col=tokens_col, id_col=id_col
    ).select(F.col("id_b").cast("string").alias("__hit_id")).distinct()
    return docs.join(
        hits, F.col(id_col).cast("string") == F.col("__hit_id"), "anti"
    )
