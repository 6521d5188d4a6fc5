"""BPE trainer/encoder pinned against a pure-python reference.

The reference replicates the exact training semantics: pair counts over
(word, freq), argmax with (count DESC, a ASC, b ASC) tie-break, merge all
occurrences left-to-right per round.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from workbook_exporter_fe_spark.operators.bpe import (
    bpe_encode,
    bpe_train,
    encode_word,
    word_freqs,
)

DOCS = [
    ("d1", "low low low low low lower lower newest newest"),
    ("d2", "newest newest newest newest widest widest widest"),
    ("d3", "low lower newest widest wildest"),
]


def _ref_train(freqs: dict[str, int], n_merges: int):
    """Pure-python BPE (Sennrich Alg. 1) with the operator's tie-break."""
    vocab = {w: list(w) for w in freqs}
    merges = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + freqs[w]
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[0]
        merges.append(best)
        a, b = best
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges, vocab


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(DOCS, "doc_id string, text string")


@pytest.fixture(scope="module")
def freqs():
    counts: dict[str, int] = {}
    for _, t in DOCS:
        for w in t.split():
            counts[w] = counts.get(w, 0) + 1
    return counts


def test_word_freqs(spark, corpus, freqs):
    got = {r.word: r.freq for r in word_freqs(corpus).collect()}
    assert got == freqs


def test_word_freqs_min_count_floor(spark, corpus, freqs):
    """r5: the SentencePiece-style frequency floor is pushed into the
    DISTRIBUTED relation — a below-floor word never reaches the driver
    dict (the bound for >1e9-type raw web vocabularies)."""
    floor = 2
    got = {
        r.word: r.freq
        for r in word_freqs(corpus, min_count=floor).collect()
    }
    assert got == {w: f for w, f in freqs.items() if f >= floor}
    assert any(f < floor for f in freqs.values())  # the floor pruned some
    # trainers stay green over the floored vocab
    from workbook_exporter_fe_spark.operators.bpe import bpe_train_local

    assert bpe_train_local(got, n_merges=5)


def test_word_freqs_top_k_cap(spark, corpus, freqs):
    got = word_freqs(corpus, top_k=5).collect()
    assert len(got) == 5
    want = sorted(freqs.items(), key=lambda t: (-t[1], t[0]))[:5]
    assert sorted((r.word, r.freq) for r in got) == sorted(want)


def test_merge_sequence_matches_reference(spark, corpus, freqs):
    merges = bpe_train(word_freqs(corpus), n_merges=12)
    ref_merges, _ = _ref_train(freqs, 12)
    assert merges == ref_merges


def test_encode_matches_training_segmentation(spark, corpus, freqs):
    """Encoding a training word under the learned ranks reproduces the
    segmentation training left it with (the textbook BPE property)."""
    merges = bpe_train(word_freqs(corpus), n_merges=10)
    _, vocab = _ref_train(freqs, 10)
    ranks = {p: i for i, p in enumerate(merges)}
    for w, syms in vocab.items():
        assert encode_word(w, ranks) == syms, w


def test_encode_dataframe_roundtrip(spark, corpus):
    merges = bpe_train(word_freqs(corpus), n_merges=8)
    out = bpe_encode(corpus, merges).collect()
    for r in out:
        # concatenating a word's tokens reconstructs the word, in order
        rebuilt = "".join(r.bpe_tokens)
        assert rebuilt == r.text.replace(" ", "")
        # every token is either a learned merge product or a base char
        vocab = {a + b for a, b in merges}
        assert all(len(t) == 1 or t in vocab for t in r.bpe_tokens)


def test_early_stop_on_exhausted_pairs(spark):
    df = spark.createDataFrame([("x", "ab ab")], "doc_id string, text string")
    merges = bpe_train(word_freqs(df), n_merges=50)
    assert merges == [("a", "b")]  # after one merge every word is 1 symbol


def test_unseen_word_encodes_with_partial_merges(spark, corpus):
    merges = bpe_train(word_freqs(corpus), n_merges=10)
    ranks = {p: i for i, p in enumerate(merges)}
    toks = encode_word("slowest", ranks)
    assert "".join(toks) == "slowest"
    assert len(toks) < len("slowest")  # at least one merge applied


def test_local_trainer_matches_distributed_and_reference(spark, corpus, freqs):
    """bpe_train_local (driver-side incremental) ≡ bpe_train (distributed
    incremental) ≡ the per-round-recount Sennrich reference, to merge
    exhaustion — the incremental pair-count maintenance must be invisible
    in the merge sequence."""
    from workbook_exporter_fe_spark.operators.bpe import bpe_train_local

    n = 40  # beyond exhaustion for this corpus → exercises early stop too
    ref_merges, _ = _ref_train(freqs, n)
    assert bpe_train_local(freqs, n) == ref_merges
    assert bpe_train(word_freqs(corpus), n) == ref_merges


def test_incremental_counts_on_synthetic_vocab():
    """Wider alphabet + skewed Zipf-ish freqs: the local incremental
    trainer tracks the recount reference through 120 merges, including
    pair counts that rise, fall to zero, and resurrect via multi-char
    symbol adjacency."""
    import random

    from workbook_exporter_fe_spark.operators.bpe import bpe_train_local

    rng = random.Random(7)
    alphabet = "abcdefgh"
    freqs = {}
    for i in range(400):
        w = "".join(rng.choice(alphabet) for _ in range(rng.randint(2, 12)))
        freqs[w] = freqs.get(w, 0) + rng.randint(1, 50)
    ref_merges, _ = _ref_train(freqs, 120)
    assert bpe_train_local(freqs, 120) == ref_merges


def test_min_pair_count_threshold(spark, corpus, freqs):
    from workbook_exporter_fe_spark.operators.bpe import bpe_train_local

    got = bpe_train_local(freqs, 50, min_pair_count=6)
    ref = []
    f = dict(freqs)
    # reference: run the recount trainer, cutting where count < 6
    vocab = {w: list(w) for w in f}
    while True:
        counts = {}
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + f[w]
        if not counts:
            break
        best, n = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if n < 6:
            break
        ref.append(best)
        a, b = best
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    assert got == ref and len(got) >= 3
    assert bpe_train(word_freqs(corpus), 50, min_pair_count=6) == ref
