"""TF-IDF / BM25 pinned against pure-python references.

Exact integer relations (tf, df) must match exactly; float scores match
the reference to 1e-6 (both sides round to 6)."""

from __future__ import annotations

import math

import pytest

from workbook_exporter_fe_spark.operators.relevance import (
    bm25,
    doc_freqs,
    doc_terms,
    tfidf,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown cat sleeps on the warm mat"),
    (3, "spark shuffles data between executors over the network"),
    (4, "the dog chases the cat around the spark cluster"),
    (5, "quick quick quick brown brown fox"),
]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _tf(doc: str) -> dict[str, int]:
    out: dict[str, int] = {}
    for w in doc.split(" "):
        out[w] = out.get(w, 0) + 1
    return out


def test_doc_terms_and_freqs(spark, corpus):
    got_tf = {
        (r.doc_id, r.word): r.tf for r in doc_terms(corpus).collect()
    }
    want_tf = {
        (i, w): n for i, t in DOCS for w, n in _tf(t).items()
    }
    assert got_tf == want_tf

    got_df = {r.word: r.df for r in doc_freqs(corpus).collect()}
    want_df: dict[str, int] = {}
    for _, t in DOCS:
        for w in set(t.split(" ")):
            want_df[w] = want_df.get(w, 0) + 1
    assert got_df == want_df


def test_tfidf_matches_reference(spark, corpus):
    n = len(DOCS)
    want_df: dict[str, int] = {}
    for _, t in DOCS:
        for w in set(t.split(" ")):
            want_df[w] = want_df.get(w, 0) + 1
    for r in tfidf(corpus).collect():
        want = round(r.tf * math.log(n / want_df[r.word]), 6)
        assert r.tfidf == pytest.approx(want, abs=1e-6), (r.doc_id, r.word)
        assert r.df == want_df[r.word]


def test_bm25_matches_reference(spark, corpus):
    query = ["quick", "spark", "dog"]
    k1, b = 1.2, 0.75
    n = len(DOCS)
    dls = {i: len(t.split(" ")) for i, t in DOCS}
    avgdl = sum(dls.values()) / n
    dfs = {
        q: sum(1 for _, t in DOCS if q in t.split(" ")) for q in query
    }

    def score(i: int, t: str) -> float:
        tf = _tf(t)
        s = 0.0
        for q in query:
            if q not in tf:
                continue
            idf = math.log((n - dfs[q] + 0.5) / (dfs[q] + 0.5) + 1.0)
            s += idf * tf[q] * (k1 + 1) / (
                tf[q] + k1 * (1 - b + b * dls[i] / avgdl)
            )
        return s

    got = {r.doc_id: r.score for r in bm25(corpus, query).collect()}
    want = {i: score(i, t) for i, t in DOCS if score(i, t) > 0}
    assert set(got) == set(want)
    for i in want:
        assert got[i] == pytest.approx(round(want[i], 6), abs=1e-6), i
    # ranking sanity: doc 5 (3x quick) beats doc 2 (1x quick) on this query
    assert got[5] > got[2]


def test_bm25_only_matching_docs(spark, corpus):
    got = bm25(corpus, ["nonexistent_term"]).collect()
    assert got == []
