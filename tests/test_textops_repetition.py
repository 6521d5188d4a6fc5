"""Gopher-style repetition features: pinned against a python reference."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from workbook_exporter_fe_spark.functions.textops import repetition_features

ROWS = [
    ("r1", "a a a a"),                      # pure repetition
    ("r2", "one two three four five"),      # all distinct
    ("r3", "spam spam ham spam eggs ham"),  # mixed
    ("r4", "x"),                            # 1 word: no 2/3-grams
    ("r5", ""),                             # empty: all ratios 0
]


def _ref(text):
    w = [t for t in text.split() if t]

    def dup(k):
        grams = [" ".join(w[i : i + k]) for i in range(len(w) - k + 1)]
        return round(1 - len(set(grams)) / len(grams), 6) if grams else 0.0

    top = round(max((w.count(t) for t in set(w)), default=0) / len(w), 6) if w else 0.0
    return dup(1), dup(2), dup(3), top


@pytest.fixture(scope="module")
def feats(spark):
    df = spark.createDataFrame(ROWS, "doc_id string, text string")
    cols = repetition_features(F.col("text"))
    out = df.select("doc_id", *[c.alias(n) for n, c in cols.items()])
    return {r.doc_id: r for r in out.collect()}


def test_repetition_matches_python_reference(feats):
    for did, text in ROWS:
        d1, d2, d3, top = _ref(text)
        r = feats[did]
        assert (r.dup_word_ratio, r.dup_2gram_ratio, r.dup_3gram_ratio) == (
            d1,
            d2,
            d3,
        ), did
        assert r.top_word_ratio == top, did


def test_boundary_values(feats):
    assert feats["r1"].dup_word_ratio == 0.75  # 4 words, 1 distinct
    assert feats["r1"].top_word_ratio == 1.0
    assert feats["r2"].dup_word_ratio == 0.0
    assert feats["r4"].dup_2gram_ratio == 0.0  # too short for a gram
    assert feats["r5"].top_word_ratio == 0.0
