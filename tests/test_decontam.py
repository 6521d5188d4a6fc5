"""Benchmark decontamination: n-gram overlap flagging + anti-join drop.

Exact reference replicated in-test for the md5 hash mode; the native
(xxhash64) mode is pinned to select the same doc ids — hash function only
changes the gram fingerprint, never the hit set (collisions aside).
"""

from __future__ import annotations

import pytest

from workbook_exporter_fe_spark.operators.decontam import (
    contaminated_docs,
    decontaminate,
)

DOCS = [
    # shares the 4-gram "the quick brown fox" with bench b1
    ("d1", "in the beginning the quick brown fox jumped over everything"),
    # shares "pack my box with" with bench b2
    ("d2", "please pack my box with five dozen liquor jugs today"),
    # clean: no 4-gram overlap with any bench doc
    ("d3", "completely unrelated text about spark catalyst optimizer plans"),
    # shorter than k words: can never be flagged
    ("d4", "too short doc"),
    # shares TWO distinct bench grams (one from each bench doc)
    ("d5", "the quick brown fox likes to pack my box with care"),
]
BENCH = [
    ("b1", "the quick brown fox jumps over the lazy dog"),
    ("b2", "pack my box with five dozen liquor jugs"),
]


@pytest.fixture(scope="module")
def corpora(spark):
    docs = spark.createDataFrame(DOCS, "doc_id string, text string")
    bench = spark.createDataFrame(BENCH, "doc_id string, text string")
    return docs, bench


def test_contaminated_docs_matches_reference(spark, corpora):
    docs, bench = corpora
    got = {
        (r.doc_id, r.n_hits)
        for r in contaminated_docs(docs, bench, k=4).collect()
    }

    # pure-python reference on the tiny input: same k-gram definition as
    # word_shingles (overlapping word windows joined by ' ')
    def grams(t, k=4):
        w = t.split()
        return [" ".join(w[i : i + k]) for i in range(len(w) - k + 1)]

    bench_set = {g for _, t in BENCH for g in grams(t)}
    expect = {}
    for did, t in DOCS:
        hits = sum(1 for g in grams(t) if g in bench_set)
        if hits:
            expect[did] = hits
    assert got == set(expect.items())
    assert "d3" not in dict(got) and "d4" not in dict(got)


def test_decontaminate_drops_exactly_the_flagged_docs(spark, corpora):
    docs, bench = corpora
    kept = {r.doc_id for r in decontaminate(docs, bench, k=4).collect()}
    flagged = {r.doc_id for r in contaminated_docs(docs, bench, k=4).collect()}
    assert kept == {d for d, _ in DOCS} - flagged
    assert kept == {"d3", "d4"}


def test_native_mode_selects_same_docs(spark, corpora):
    docs, bench = corpora
    md5_ids = {r.doc_id for r in contaminated_docs(docs, bench, k=4).collect()}
    nat_ids = {
        r.doc_id
        for r in contaminated_docs(docs, bench, k=4, hash_fn="native").collect()
    }
    assert md5_ids == nat_ids


def test_k_larger_than_every_doc_flags_nothing(spark, corpora):
    docs, bench = corpora
    assert contaminated_docs(docs, bench, k=50).count() == 0
    assert decontaminate(docs, bench, k=50).count() == len(DOCS)
