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


def _bigrams(
    docs: DataFrame, text_col: str, id_col: str, pre_tokenized: bool = False
) -> DataFrame:
    """(doc_id, v, w) bigram stream — extracted per ROW by an array HOF
    (sequence + element_at, 1-indexed to mirror DuckDB lists), so the
    corpus is never shuffled to form pairs; the only exchanges in any
    bigram computation are the vocabulary-sized count groupBys.

    ``pre_tokenized=True`` reads ``text_col`` as an existing token ARRAY
    (any primitive element type — int tokens keep the downstream count
    joins on primitive shuffle keys, the CLAUDE.md hot-path rule)."""
    arr = (
        F.col(text_col) if pre_tokenized else F.split(F.col(text_col), " ")
    )
    pairs = F.transform(
        F.sequence(F.lit(1), F.size(arr) - 1),
        lambda i: F.struct(
            F.element_at(arr, i).alias("v"),
            F.element_at(arr, i + 1).alias("w"),
        ),
    )
    return (
        docs.filter(F.size(arr) >= 2)
        .select(
            F.col(id_col).alias("doc_id"),
            F.explode(pairs).alias("p"),
        )
        .select("doc_id", "p.v", "p.w")
    )


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


def bigram_kn(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    pre_tokenized: bool = False,
) -> dict[str, DataFrame]:
    """Count tables of an interpolated Kneser-Ney bigram LM.

    Four relations, all derived from ONE corpus pass (the bigram-type
    groupBy) and all vocabulary-sized — never corpus-sized:

    - ``big``:  (v, w, c_vw) bigram counts
    - ``ctx``:  (v, c_v, n1p_v) context totals + distinct-continuation
      counts N1+(v, *) — the interpolation weight numerator
    - ``cont``: (w, r_w) distinct LEFT contexts N1+(*, w) — the
      Kneser-Ney continuation counts ("how many contexts does w
      complete" rather than "how often does w occur")
    - ``tot``:  one row (nbt = distinct bigram types N1+(*,*),
      vc = continuation vocabulary size)
    """
    big = _bigrams(docs, text_col, id_col, pre_tokenized).groupBy(
        "v", "w"
    ).agg(F.count("*").alias("c_vw"))
    # FOUR consumers derive from `big` (ctx/cont/tot + the scoring join);
    # without reuse each one re-explodes and re-aggregates the whole
    # corpus — the executed plan showed 5 Generate branches. Persist the
    # bigram-type relation once; DISK_ONLY measured FASTEST at every
    # parallelism on the 250k-doc scaling corpus (local[16] 104 s → 43 s;
    # MEMORY_AND_DISK's deserialized 64M-row cache was 25% slower from
    # GC churn even at a 24 g heap, and the un-persisted plan is 2.4-3.4×
    # slower) — on executors the persist lands on per-node local disk,
    # and the ContextCleaner reclaims it when the plan is dropped.
    from pyspark import StorageLevel

    big = big.persist(StorageLevel.DISK_ONLY)
    ctx = big.groupBy("v").agg(
        F.sum("c_vw").alias("c_v"), F.count("*").alias("n1p_v")
    )
    cont = big.groupBy("w").agg(F.count("*").alias("r_w"))
    tot = big.agg(
        F.count("*").alias("nbt"), F.count_distinct("w").alias("vc")
    )
    return {"big": big, "ctx": ctx, "cont": cont, "tot": tot}


def doc_cross_entropy_bigram(
    docs: DataFrame,
    model: dict[str, DataFrame] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    discount: float = 0.75,
    k: float = 1.0,
    pre_tokenized: bool = False,
) -> DataFrame:
    """(doc_id, n_big, xent2): per-document cross-entropy under an
    interpolated Kneser-Ney bigram LM (Kneser & Ney 1995; Chen & Goodman
    1999 eq. 4.24, bigram case):

        P(w|v) = (max(c(v,w) - D, 0) + D * N1+(v,*) * Pcont(w)) / c(v)

    with the continuation distribution add-k smoothed so unseen words
    keep finite mass (the OOV floor the pure KN formulation lacks):

        Pcont(w) = (N1+(*,w) + k) / (N1+(*,*) + k * Vcont)

    and P(w|v) = Pcont(w) when the context v is unseen. ``model``
    defaults to counts trained on ``docs`` itself; pass
    :func:`bigram_kn` of a reference corpus for held-out scoring.

    Cross-engine exactness: every count is an integer; D = 0.75 and
    k = 1.0 are exact binaries, so ``c_vw - D``, ``D * n1p_v`` and the
    add-k sums are EXACT doubles — the probability is then three
    correctly-rounded IEEE ops (Pcont division, interpolation multiply +
    add, context division) in a fixed parenthesization mirrored verbatim
    in the oracle SQL, and the per-token ln is rounded to 6 dp and
    summed as DECIMAL (the repo's _dsum rule). Scale shape: scoring is a
    co-partitioned key join of the doc bigram stream against the
    vocab-sized count tables plus one broadcast one-row totals relation
    — no corpus-sized shuffle beyond the stream's own groupBy(doc_id).
    """
    model = (
        bigram_kn(docs, text_col, id_col, pre_tokenized)
        if model is None
        else model
    )
    big, ctx, cont, tot = (
        model["big"], model["ctx"], model["cont"], model["tot"]
    )
    stream = _bigrams(docs, text_col, id_col, pre_tokenized)
    d, kk = float(discount), float(k)
    p_cont = (F.coalesce(F.col("r_w"), F.lit(0)) + F.lit(kk)) / (
        F.col("nbt") + F.lit(kk) * F.col("vc")
    )
    p = F.when(
        F.col("c_v").isNotNull(),
        (
            F.greatest(
                F.coalesce(F.col("c_vw"), F.lit(0)) - F.lit(d), F.lit(0.0)
            )
            + (F.lit(d) * F.col("n1p_v")) * p_cont
        )
        / F.col("c_v"),
    ).otherwise(p_cont)
    logp = F.round(F.log(p), 6).cast("decimal(28,6)")
    return (
        stream.join(big, ["v", "w"], "left")
        .join(ctx, "v", "left")
        .join(cont, "w", "left")
        .join(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_big"), F.sum(logp).alias("_slp"))
        .select(
            "doc_id",
            "n_big",
            F.round(
                -F.col("_slp").cast("double") / F.col("n_big"), 6
            ).alias("xent2"),
        )
    )
