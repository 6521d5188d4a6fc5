"""Count-based n-gram language-model scoring for corpus quality filtering.

The CCNet/ROOTS-style curation signal: train a count LM on the corpus (or
a trusted slice of it), score every document's per-token cross-entropy,
and gate on the score — documents whose token distribution diverges from
the reference (boilerplate, lists, non-language noise) score high.

Scale design:
- the LM is ONE corpus-scale explode + groupBy (map-side combined) whose
  OUTPUT is vocabulary-sized (Heaps' law — orders of magnitude below
  corpus size at 100 TB);
- scoring joins the exploded doc-term relation to the vocab relation BY
  KEY (term) — a co-partitioned shuffle join, never a broadcast of a
  possibly-large vocab — then one per-doc aggregate;
- the two scalar stats (total token count T, vocab size V) ride as a
  broadcast one-row relation, keeping the plan lazy and collect-free.

Cross-engine exactness (driver-gate discipline): each token's log
probability is rounded to 6 dp and summed as DECIMAL(28,6) — exact,
order-independent addition (the repo's _dsum rule) — so the per-doc sum
is bit-identical across engines; the final division by the doc's token
count is one correctly-rounded IEEE op. ln() itself agrees between the
JVM and DuckDB on identical doubles (established by the q50 math oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def unigram_lm(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, c): whitespace unigram counts — the LM's count table."""
    return (
        docs.select(
            F.explode(F.split(F.col(text_col), " ")).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").alias("c"))
    )


def doc_cross_entropy(
    docs: DataFrame,
    lm: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: float = 1.0,
) -> DataFrame:
    """(doc_id, n_tok, xent): add-k-smoothed unigram cross-entropy
    -(1/n) * sum ln((c_w + k) / (T + k*V)) per document.

    ``lm`` defaults to a model trained on ``docs`` itself (self-scoring,
    the in-corpus outlier signal); pass the count table of a trusted
    reference corpus for CCNet-style filtering. Tokens absent from the LM
    get the smoothed floor k / (T + k*V).
    """
    lm = unigram_lm(docs, text_col) if lm is None else lm
    stats = lm.agg(
        F.sum("c").alias("T"), F.count("*").alias("V")
    )
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("word"),
    )
    # per-token logprob, rounded then summed as DECIMAL: exact,
    # order-independent — the float sum would be partition-order-dependent
    logp = F.round(
        F.log(
            (F.coalesce(F.col("c"), F.lit(0)) + F.lit(float(k)))
            / (F.col("T") + F.lit(float(k)) * F.col("V"))
        ),
        6,
    ).cast("decimal(28,6)")
    return (
        toks.join(lm, "word", "left")
        .join(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tok"),
            F.sum(logp).alias("_slp"),
        )
        .select(
            "doc_id",
            "n_tok",
            F.round(
                -F.col("_slp").cast("double") / F.col("n_tok"), 6
            ).alias("xent"),
        )
    )
