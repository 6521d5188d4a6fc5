"""Distributed BPE tokenizer training + encoding (Sennrich et al. 2016).

The reference engine has nothing comparable — this is brief-surface for
the training-data pipeline (tokens axis): learn a byte-pair-encoding merge
table FROM the corpus, then encode the corpus with it.

Scale design (the part that matters at 100 TB):

- ``word_freqs`` is the ONLY corpus-scale operation: one partially-
  aggregating groupBy word → count. Its output is vocabulary-sized —
  orders of magnitude below corpus size (natural-language vocabularies
  are ~1e6-1e8 distinct words for any corpus size, Heaps' law) — and
  every training iteration below runs on THAT relation, never rescanning
  the corpus.
- each merge round is: explode adjacent symbol pairs weighted by word
  freq → one partial-agg groupBy(pair) → take the argmax row (a 1-row
  collect) → apply the merge to every word's symbol array with ONE
  JVM-side ``F.aggregate`` fold (left-to-right, the canonical BPE
  greedy order) — no Python in the loop.
- the symbol relation is ``localCheckpoint``-ed each round so the plan
  stays O(1) deep instead of stacking one fold per merge (the same
  lineage-truncation discipline as connected_components).
- ``bpe_encode`` is the per-row hot path over the full corpus: it applies
  the learned ranks with the classic lowest-rank-first loop inside an
  Arrow-batched pandas UDF (same kernel class as the codec UDFs — the
  merge table broadcasts as a plain dict; no per-row Python round-trips).

Determinism: pair argmax ties break on (count DESC, pair_a ASC, pair_b
ASC) so the merge sequence is reproducible across partitionings — pinned
by the pure-python reference in tests/test_bpe.py.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType


def word_freqs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq): corpus word frequencies — the one corpus-scale pass.

    Map-side combine does the heavy lifting: the shuffle carries
    (word, partial_count) per task, not one row per occurrence."""
    w = F.explode(F.filter(F.split(F.col(text_col), " "), lambda t: t != ""))
    return (
        docs.select(w.alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _chars(col):
    """Split a word into single-character symbols (the BPE base alphabet).

    Spark's split keeps trailing empties (limit=-1 semantics) and the
    ``(?!^)`` lookahead matches at the end position too — the ``(?s:(?=.))``
    guard requires a following character so no empty tail symbol appears."""
    return F.split(col, "(?!^)(?s:(?=.))")


def _merge_fold(symbols, a: str, b: str):
    """One left-to-right merge pass of pair (a, b) over a symbol array.

    F.aggregate fold: append each symbol unless the running array ends in
    ``a`` and the incoming symbol is ``b`` — then replace the tail with the
    merged symbol. Greedy left-to-right, so 'aaa' under merge (a,a) becomes
    ['aa','a'] exactly like the python reference."""
    return F.aggregate(
        symbols,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (s == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(a + b))
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def bpe_train(
    words: DataFrame, n_merges: int, min_pair_count: int = 1
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from a (word, freq) relation.

    Returns the ordered merge list [(a, b), ...]. Stops early when no
    pair reaches ``min_pair_count``. Each round costs one vocabulary-sized
    groupBy + a 1-row collect; the corpus is never touched."""
    sym = words.select(
        _chars(F.col("word")).alias("syms"), F.col("freq")
    ).localCheckpoint(eager=True)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs = (
            sym.filter(F.size("syms") >= 2)
            .select(
                F.explode(
                    F.transform(
                        F.sequence(F.lit(1), F.size("syms") - 1),
                        lambda i: F.struct(
                            F.element_at("syms", i).alias("a"),
                            F.element_at("syms", i + 1).alias("b"),
                        ),
                    )
                ).alias("p"),
                "freq",
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("n"))
        )
        top = pairs.orderBy(F.desc("n"), F.asc("a"), F.asc("b")).limit(1).collect()
        if not top or top[0]["n"] < min_pair_count:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        sym = sym.select(
            _merge_fold(F.col("syms"), a, b).alias("syms"), "freq"
        ).localCheckpoint(eager=True)
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Pure-python BPE encode of one word under a merge-rank table —
    the canonical lowest-rank-first loop (shared by the pandas kernel and
    the tests' reference)."""
    syms = list(word)
    while len(syms) >= 2:
        best_i, best_r = -1, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_r is None or r < best_r):
                best_i, best_r = i, r
        if best_r is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_encode(
    docs: DataFrame,
    merges: Iterable[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Append ``out_col``: the document's BPE token array under ``merges``.

    Arrow-batched pandas UDF; the rank dict is closure-captured (broadcast
    once per executor). This is the corpus-scale hot path — one narrow
    projection, no shuffle."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    @pandas_udf(ArrayType(StringType()))
    def _encode(texts: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}

        def enc(t):
            out: list[str] = []
            for w in (t or "").split(" "):
                if not w:
                    continue
                got = cache.get(w)
                if got is None:
                    got = cache[w] = encode_word(w, ranks)
                out.extend(got)
            return out

        return texts.map(enc)

    return docs.withColumn(out_col, _encode(F.col(text_col)))
