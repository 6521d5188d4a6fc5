"""Corpus relevance scoring: TF-IDF weights and BM25 ranked retrieval.

Training-data curation uses these for query-targeted corpus slicing
("pull the docs most relevant to these seed terms") and per-term
informativeness weights; they are also the textbook sanity check on the
doc-term relation the rest of the text stack (vocab analytics, decontam)
is built on.

Scale design:
- the doc-term frequency relation is ONE corpus-scale explode + groupBy
  (map-side combined, same shape as the measured token-bigram job);
- document frequencies reduce that relation to vocabulary size (Heaps'
  law: orders of magnitude below corpus size), joined back BY KEY — a
  shuffle join keyed on the term, never a broadcast of the full vocab;
- BM25 filters to the QUERY terms before any shuffle, so its tf relation
  is (matching docs × query terms)-sized and the per-term df/idf relation
  is query-sized — broadcast both; corpus scanned once;
- scalar corpus stats (N, avgdl) ride as broadcast one-row relations, not
  driver-side collects, so the whole plan stays lazy/composable.

Scoring math is float (ln); the driver-gate evidence therefore exposes the
EXACT integer df relation (hash-checked in q25) while the float scores are
pinned against a pure-python reference in pytest — the same split as the
sketch tiers (exact companions hashed, estimates enveloped).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def doc_terms(docs: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """(doc_id, word, tf): whitespace term frequencies per document."""
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.split(F.col(text_col), " ")).alias("word"),
        )
        .groupBy("doc_id", "word")
        .agg(F.count("*").alias("tf"))
    )


def doc_freqs(docs: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """(word, df): number of documents containing each word.

    distinct-then-count keeps the shuffle rows (doc, word)-distinct —
    no count-distinct aggregate state per term."""
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(
                F.array_distinct(F.split(F.col(text_col), " "))
            ).alias("word"),
        )
        .groupBy("word")
        .agg(F.count("*").alias("df"))
    )


def tfidf(docs: DataFrame, text_col: str = "text",
          id_col: str = "doc_id") -> DataFrame:
    """(doc_id, word, tf, df, tfidf): tf · ln(N/df) per doc-term.

    The df join is keyed on the term (vocabulary-sized relation joined to
    the doc-term relation — a co-partitioned shuffle join at scale); N is
    a broadcast one-row aggregate."""
    terms = doc_terms(docs, text_col, id_col)
    df_rel = doc_freqs(docs, text_col, id_col)
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    return (
        terms.join(df_rel, "word")
        .join(F.broadcast(n_docs))
        .select(
            "doc_id",
            "word",
            "tf",
            "df",
            F.round(
                F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )


def bm25(
    docs: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """(doc_id, score): Okapi BM25 of each matching document against the
    query-term bag (Robertson idf with the +1 floor, so scores stay ≥ 0).

    Only docs containing ≥ 1 query term appear. The query-term filter runs
    map-side BEFORE the tf groupBy, so every shuffled relation is
    query-sized, not corpus-sized."""
    q = F.array(*[F.lit(t) for t in query_terms])
    hits = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.size(F.split(F.col(text_col), " ")).alias("dl"),
            F.explode(
                F.filter(
                    F.split(F.col(text_col), " "),
                    lambda w: F.array_contains(q, w),
                )
            ).alias("word"),
        )
        .groupBy("doc_id", "dl", "word")
        .agg(F.count("*").alias("tf"))
    )
    # df per query term over the corpus (distinct doc gate map-side)
    df_rel = (
        docs.select(
            F.explode(
                F.array_intersect(
                    F.array_distinct(F.split(F.col(text_col), " ")), q
                )
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").alias("df"))
    )
    stats = docs.agg(
        F.count("*").alias("n_docs"),
        F.avg(F.size(F.split(F.col(text_col), " "))).alias("avgdl"),
    )
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    denom = F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
    contrib = idf * (F.col("tf") * (k1 + 1.0)) / denom
    return (
        hits.join(F.broadcast(df_rel), "word")
        .join(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.round(F.sum(contrib), 6).alias("score"))
    )
