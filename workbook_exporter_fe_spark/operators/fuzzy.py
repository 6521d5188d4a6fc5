"""Blocked fuzzy matching: edit-distance pairs without the all-pairs join.

Dedup family #6 (after exact hash, MinHash/LSH, n-gram Jaccard, SimHash,
embedding-cosine): cluster near-identical STRINGS — typo'd vocabulary
entries, entity names, URLs — by Levenshtein distance. The naive plan is
the quadratic self-join; this operator uses the standard blocking
decomposition (the same candidate-generation-then-verify shape as LSH):

- **block** every string by (first char, length bucket). Two strings
  within edit distance k differ in length by ≤ k, so the probe side
  replicates each string into its own bucket plus the k buckets below —
  a bounded fan-out of (k+1), exactly like LSH's band replication — and
  the join is a plain equi-join on the block key. Blocking on the first
  char is a recall heuristic (an edit at position 0 crosses blocks); like
  LSH's bucketing it trades bounded recall loss for a linear plan, and
  the oracle mirrors the same blocking so the semantics are pinned.
- **verify** candidates with the exact JVM Levenshtein (insert/delete/
  substitute, unit cost — identical to DuckDB's ``levenshtein``), keep
  pairs with distance ≤ k, dedupe.

Scale: meant for vocabulary-sized relations (distinct words, entity
names, URL hosts — ≤ 1e8 rows by Heaps' law even at 100 TB corpus scale),
not raw corpora. Block sizes are bounded by the (first-char × length)
fan-out; the verify cost is per-candidate-pair, and the length filter
inside the block prunes the cross-bucket false candidates for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def fuzzy_pairs(
    strings: DataFrame,
    text_col: str = "word",
    max_dist: int = 2,
    bucket_width: int | None = None,
) -> DataFrame:
    """(word_a, word_b, dist): distinct pairs with Levenshtein ≤ max_dist
    sharing a (first-char, length-bucket) block; word_a < word_b.

    ``bucket_width`` defaults to ``max_dist + 1`` so a pair within
    ``max_dist`` always lands in the same or adjacent bucket — covered by
    the probe side's (k+1)-bucket replication.
    """
    w = bucket_width or (max_dist + 1)
    base = (
        strings.select(F.col(text_col).alias("word"))
        .filter(F.length("word") > 0)
        .distinct()
    )
    blocked = base.select(
        "word",
        F.substring("word", 1, 1).alias("c0"),
        F.floor(F.length("word") / w).alias("lb"),
    )
    # probe side replicates into its own bucket plus the adjacent buckets
    # in BOTH directions: a partner within k of its length sits at most
    # floor(k/w)+1 buckets away, and the lexicographic word_a < word_b
    # orientation filter below is independent of length, so the shorter
    # partner is not always on a fixed side. Fan-out is 2·(k//w+1)+1 = 3
    # at the default width — bounded, like LSH band replication.
    r = max_dist // w + 1
    reps = F.array(*[F.lit(i) for i in range(-r, r + 1)])
    probe = blocked.select(
        F.col("word").alias("word_b"),
        "c0",
        F.explode(F.transform(reps, lambda i: F.col("lb") + i)).alias("lb"),
    )
    cand = blocked.withColumnRenamed("word", "word_a").join(
        probe, ["c0", "lb"]
    )
    return (
        cand.filter(F.col("word_a") < F.col("word_b"))
        .filter(
            F.abs(F.length("word_a") - F.length("word_b")) <= max_dist
        )
        .withColumn("dist", F.levenshtein("word_a", "word_b"))
        .filter(F.col("dist") <= max_dist)
        .select("word_a", "word_b", "dist")
        .distinct()
    )


def fuzzy_vocab_pairs(
    docs: DataFrame, text_col: str = "text", max_dist: int = 2
) -> DataFrame:
    """Fuzzy pairs over a corpus's whitespace vocabulary — the typical
    call: one vocabulary-sized groupBy (map-side combined) then blocked
    matching on the distinct-word relation."""
    vocab = docs.select(
        F.explode(F.split(F.col(text_col), " ")).alias("word")
    )
    return fuzzy_pairs(vocab, "word", max_dist=max_dist)
