"""Distributed BPE tokenizer training + encoding (Sennrich et al. 2016).

The reference engine has nothing comparable — this is brief-surface for
the training-data pipeline (tokens axis): learn a byte-pair-encoding merge
table FROM the corpus, then encode the corpus with it.

Scale design (the part that matters at 100 TB):

- ``word_freqs`` is the ONLY corpus-scale operation: one partially-
  aggregating groupBy word → count. Its output is vocabulary-sized —
  orders of magnitude below corpus size (natural-language vocabularies
  are ~1e6-1e8 distinct words for any corpus size, Heaps' law) — and
  everything below runs on THAT relation, never rescanning the corpus.
- ``bpe_train`` maintains the (pair → count) table INCREMENTALLY on the
  driver (it is alphabet²-then-some sized, not corpus sized) with a
  lazy max-heap for the argmax, so a merge round never recounts the
  vocabulary. The per-round Spark work is one job over only the words
  that can contain the merged pair (a pushed-down ``contains(word,
  a+b)`` prefilter — a superset, and the ± pair deltas of unaffected
  words cancel exactly): re-derive those words' current segmentation
  from the merge ranks (Arrow-batched kernel), apply the new merge,
  and aggregate the signed pair-count deltas. Early rounds touch many
  words cheaply (few ranks), late rounds touch few words — the classic
  incremental-BPE cost shape, not n_merges × vocabulary.
- ``bpe_train_local`` is the same algorithm run entirely driver-side
  (pair → word-index plus per-word symbol state) for when the VOCAB
  fits the driver — the practical production path at real merge counts
  (30-50k), since per-round Spark scheduling (~0.1 s) dominates long
  before data size does. Corpus-scale counting stays distributed
  (word_freqs); only the vocabulary-sized relation is collected.
- ``bpe_encode`` is the per-row hot path over the full corpus: it applies
  the learned ranks with the classic lowest-rank-first loop inside an
  Arrow-batched pandas UDF (same kernel class as the codec UDFs — the
  merge table broadcasts as a plain dict; no per-row Python round-trips).

Determinism: pair argmax ties break on (count DESC, pair_a ASC, pair_b
ASC) so the merge sequence is reproducible across partitionings — pinned
by the pure-python reference in tests/test_bpe.py, and bpe_train ≡
bpe_train_local by construction (same counts, same tie-break).
"""

from __future__ import annotations

import heapq
from collections import Counter
from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType


def word_freqs(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = 1,
    top_k: int | None = None,
) -> DataFrame:
    """(word, freq): corpus word frequencies — the one corpus-scale pass.

    Map-side combine does the heavy lifting: the shuffle carries
    (word, partial_count) per task, not one row per occurrence.

    ``min_count`` / ``top_k`` bound the relation DISTRIBUTED-side, before
    any trainer collects it: a raw 100 TB web corpus has >1e9 word types
    (mostly hapax noise), and SentencePiece's standard recipe is exactly
    this frequency floor. ``top_k`` compiles to TakeOrderedAndProject
    (per-partition partial top-k, driver merge of k·partitions rows —
    never a full sort); ties break (freq DESC, word ASC), deterministic
    under any partitioning."""
    w = F.explode(F.filter(F.split(F.col(text_col), " "), lambda t: t != ""))
    out = (
        docs.select(w.alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )
    if min_count > 1:
        out = out.filter(F.col("freq") >= min_count)
    if top_k is not None:
        out = out.orderBy(F.col("freq").desc(), F.col("word")).limit(top_k)
    return out


def _chars(col):
    """Split a word into single-character symbols (the BPE base alphabet).

    Spark's split keeps trailing empties (limit=-1 semantics) and the
    ``(?!^)`` lookahead matches at the end position too — the ``(?s:(?=.))``
    guard requires a following character so no empty tail symbol appears."""
    return F.split(col, "(?!^)(?s:(?=.))")


def _merge_once(syms: list[str], a: str, b: str) -> list[str]:
    """One left-to-right merge pass of pair (a, b) over a symbol list —
    greedy, so 'aaa' under merge (a,a) becomes ['aa','a']."""
    out: list[str] = []
    i, n = 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _pair_counts(c: dict, syms: Iterable[str], f: int) -> None:
    prev = None
    for s in syms:
        if prev is not None:
            p = (prev, s)
            c[p] = c.get(p, 0) + f
        prev = s


class _ArgmaxHeap:
    """Lazy max-heap over the mutable (pair → count) dict: entries go
    stale when a count changes; ``top`` discards entries that no longer
    match the dict. Tie-break (count DESC, a ASC, b ASC) is the heap
    order itself."""

    def __init__(self, counts: dict[tuple[str, str], int]):
        self.counts = counts
        self.heap = [(-n, a, b) for (a, b), n in counts.items()]
        heapq.heapify(self.heap)

    def push(self, pair: tuple[str, str], n: int) -> None:
        heapq.heappush(self.heap, (-n, pair[0], pair[1]))

    def top(self) -> tuple[str, str, int] | None:
        while self.heap:
            nn, a, b = self.heap[0]
            cur = self.counts.get((a, b))
            if cur is None or cur != -nn:
                heapq.heappop(self.heap)  # stale
                continue
            return a, b, cur
        return None

    def apply_deltas(self, deltas: Iterable[tuple[str, str, int]]) -> None:
        for x, y, d in deltas:
            if not d:
                continue
            nc = self.counts.get((x, y), 0) + d
            if nc <= 0:
                self.counts.pop((x, y), None)
            else:
                self.counts[(x, y)] = nc
                self.push((x, y), nc)


def bpe_train(
    words: DataFrame, n_merges: int, min_pair_count: int = 1
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from a (word, freq) relation.

    Returns the ordered merge list [(a, b), ...]; stops early when no
    pair reaches ``min_pair_count``. Incremental: the pair-count table
    lives on the driver (vocab-pair sized) and each round runs ONE Spark
    job over just the candidate words (``contains(word, a+b)`` — a
    superset whose false positives cancel in the ± deltas), instead of
    re-exploding and recounting the whole vocabulary per merge. The
    candidate kernel re-derives each word's current segmentation from
    the merge RANKS (encoding with ranks ≡ replaying the merges in
    order — the textbook BPE equivalence the encoder relies on), so no
    distributed symbol state needs maintaining or checkpointing.

    The per-round closure ships the rank dict (O(merges) bytes); at real
    production merge counts (≳30k) prefer :func:`bpe_train_local`, which
    runs the identical algorithm driver-side without per-round jobs."""
    base = (
        words.select("word", "freq")
        .filter(F.length("word") >= 2)
        .localCheckpoint(eager=True)  # scanned once per round, plan O(1)
    )
    init: dict[tuple[str, str], int] = {}
    for r in (
        base.select(_chars(F.col("word")).alias("syms"), "freq")
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
        .collect()
    ):
        init[(r["a"], r["b"])] = r["n"]
    heap = _ArgmaxHeap(init)

    delta_type = "array<struct<x:string,y:string,d:long>>"
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        top = heap.top()
        if top is None or top[2] < min_pair_count:
            break
        a, b = top[0], top[1]
        merges.append((a, b))
        ranks_pre = {p: i for i, p in enumerate(merges[:-1])}

        @pandas_udf(delta_type)
        def _deltas(col: pd.Series) -> pd.Series:
            # fresh udf per round: a/b/ranks_pre close over THIS round
            def one(w):
                pre = encode_word(w, ranks_pre)
                post = _merge_once(pre, a, b)
                if post == pre:  # contains() false positive
                    return []
                c = Counter(zip(post, post[1:]))
                c.subtract(Counter(zip(pre, pre[1:])))
                return [(x, y, d) for (x, y), d in c.items() if d]

            return col.map(one)

        rows = (
            base.filter(F.col("word").contains(a + b))
            .select(F.explode(_deltas(F.col("word"))).alias("p"), "freq")
            .groupBy("p.x", "p.y")
            .agg(F.sum(F.col("p.d") * F.col("freq")).alias("d"))
            .filter(F.col("d") != 0)
            .collect()
        )
        heap.apply_deltas((r["x"], r["y"], r["d"]) for r in rows)
    return merges


def bpe_train_local(
    freqs: DataFrame | dict[str, int],
    n_merges: int,
    min_pair_count: int = 1,
) -> list[tuple[str, str]]:
    """Driver-side incremental BPE trainer — identical merge sequence to
    :func:`bpe_train` (same counts, same tie-break), for when the VOCAB
    fits the driver (it almost always does: ~1e6-1e8 words regardless of
    corpus size, while the corpus-scale counting stays distributed in
    ``word_freqs``). Maintains per-word symbol state plus a pair →
    word-index so each merge touches ONLY the words containing the
    merged pair: the classic fast algorithm, n_merges=30k in seconds
    instead of 30k driver-scheduled Spark jobs."""
    if not isinstance(freqs, dict):
        freqs = {r["word"]: r["freq"] for r in freqs.collect()}
    items = [(w, f) for w, f in freqs.items() if len(w) >= 2]
    syms = [list(w) for w, _ in items]
    counts: dict[tuple[str, str], int] = {}
    where: dict[tuple[str, str], set[int]] = {}
    for wi, (w, f) in enumerate(items):
        _pair_counts(counts, syms[wi], f)
        for p in zip(syms[wi], syms[wi][1:]):
            where.setdefault(p, set()).add(wi)
    heap = _ArgmaxHeap(counts)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        top = heap.top()
        if top is None or top[2] < min_pair_count:
            break
        a, b = top[0], top[1]
        merges.append((a, b))
        deltas: dict[tuple[str, str], int] = {}
        # `where` entries can be stale (pair since merged away in that
        # word) — the no-op check below skips them; it can never MISS a
        # word, because every pair occurrence registers on creation
        for wi in where.pop((a, b), ()):
            pre, f = syms[wi], items[wi][1]
            post = _merge_once(pre, a, b)
            if post == pre:
                continue
            syms[wi] = post
            c = Counter(zip(post, post[1:]))
            c.subtract(Counter(zip(pre, pre[1:])))
            for p, d in c.items():
                if d > 0:
                    where.setdefault(p, set()).add(wi)
                if d:
                    deltas[p] = deltas.get(p, 0) + d * f
        heap.apply_deltas((x, y, d) for (x, y), d in deltas.items())
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
