"""Blocked fuzzy pairs pinned against a brute-force python oracle.

The operator's contract: exactly the pairs (a < b) sharing a first char,
with |len(a)-len(b)| <= k and levenshtein(a,b) <= k — the blocking is a
complete cover for that spec, so brute force over the vocabulary is the
oracle.
"""

from __future__ import annotations

from workbook_exporter_fe_spark.operators.fuzzy import (
    fuzzy_pairs,
    fuzzy_vocab_pairs,
)


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _oracle(words: set[str], k: int) -> set[tuple[str, str, int]]:
    out = set()
    ws = sorted(words)
    for i, a in enumerate(ws):
        for b in ws[i + 1 :]:
            if not a or not b or a[0] != b[0]:
                continue
            if abs(len(a) - len(b)) > k:
                continue
            d = _lev(a, b)
            if d <= k:
                out.add((a, b, d))
    return out


WORDS = [
    "spark", "spork", "spark", "sprak", "spank",
    "stream", "streams", "streaming",
    "table", "tables", "tabel",
    "a", "ab", "abc", "abcd", "abcde",
    "zone", "zones", "tone",
    "x" * 30, "x" * 29 + "y", "x" * 28,
]


def test_fuzzy_pairs_match_bruteforce(spark):
    df = spark.createDataFrame([(w,) for w in WORDS], "word string")
    got = {
        (r.word_a, r.word_b, r.dist)
        for r in fuzzy_pairs(df, "word", max_dist=2).collect()
    }
    assert got == _oracle(set(WORDS), 2)
    assert ("spark", "spork", 1) in got
    assert ("stream", "streams", 1) in got
    # 'tone'/'zone' differ in first char: outside the blocked spec
    assert not any(a == "tone" or b == "tone" for a, b, _ in got if "zone" in (a, b))


def test_fuzzy_pairs_k1(spark):
    df = spark.createDataFrame([(w,) for w in WORDS], "word string")
    got = {
        (r.word_a, r.word_b, r.dist)
        for r in fuzzy_pairs(df, "word", max_dist=1).collect()
    }
    assert got == _oracle(set(WORDS), 1)


def test_fuzzy_vocab_pairs_on_documents(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    vocab = {
        w
        for r in docs.select("text").collect()
        for w in r.text.split(" ")
        if w
    }
    got = {
        (r.word_a, r.word_b, r.dist)
        for r in fuzzy_vocab_pairs(docs, max_dist=2).collect()
    }
    assert got == _oracle(vocab, 2)
