"""Inverted posting index (operators/invindex.py).

Pins: index BM25 == full-scan relevance.bm25 (same formula, same
rounding) across incremental batches; bucket partitioning + manifest
blooms actually prune (a query opens a small fraction of the files);
corpus constants come from the running summary, not a scan; python
reference oracle for the per-term contribution.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from workbook_exporter_fe_spark.operators.invindex import (
    InvertedIndex,
    bm25_reference_score,
)
from workbook_exporter_fe_spark.operators.relevance import bm25

DOCS = [
    ("d01", "the quick brown fox jumps over the lazy dog"),
    ("d02", "the quick blue hare sleeps"),
    ("d03", "brown bears eat quick salmon"),
    ("d04", "lazy dog naps all day"),
    ("d05", "fox and hare race across the field"),
    ("d06", "the field of brown grass"),
    ("d07", "salmon swim upstream past the fox"),
    ("d08", "a dog a fox and a bear walk in"),
    ("d09", "grass grows where bears sleep"),
    ("d10", "quick quick quick repetition test"),
]


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


@pytest.fixture()
def index(spark, tmp_path):
    ix = InvertedIndex(spark, str(tmp_path / "ix"), n_buckets=8)
    ix.add_batch(_docs(spark, DOCS[:6]))
    ix.add_batch(_docs(spark, DOCS[6:]))
    return ix


def test_query_matches_full_scan_bm25(spark, index):
    corpus = _docs(spark, DOCS)
    for terms in (["fox"], ["quick", "brown"], ["dog", "salmon", "grass"]):
        want = {
            r.doc_id: r.score
            for r in bm25(corpus, terms).collect()
        }
        got = {r.doc_id: r.score for r in index.query(terms, k=100).collect()}
        assert got.keys() == want.keys()
        for d in want:
            assert got[d] == pytest.approx(want[d], abs=2e-6)


def test_topk_order_and_limit(spark, index):
    top = index.query(["quick"], k=2).collect()
    assert len(top) == 2
    # d10 says quick 3x in a 5-token doc: highest tf/dl -> must rank first
    assert top[0].doc_id == "d10"
    assert top[0].score >= top[1].score


def test_pruning_opens_few_files(spark, index):
    stats = index.pruning_stats(["fox"])
    # 2 batches x 8 buckets worth of files; one term lives in one bucket
    # per batch, blooms prune within it
    assert stats["files_total"] >= 8
    assert stats["files_opened"] <= max(2, stats["files_total"] // 4)
    # absent term: blooms + buckets should open (almost) nothing
    none = index.pruning_stats(["zzzzmissing"])
    assert none["files_opened"] <= 2


def test_totals_are_metadata_only(spark, index):
    n, sum_dl = index._totals()
    assert n == 10
    assert sum_dl == sum(len(t.split(" ")) for _, t in DOCS)


def test_empty_index_and_param_guard(spark, tmp_path):
    ix = InvertedIndex(spark, str(tmp_path / "ix"), n_buckets=4)
    assert ix.query(["anything"]).count() == 0
    ix.add_batch(_docs(spark, DOCS[:2]))
    with pytest.raises(ValueError, match="partition spec"):
        InvertedIndex(spark, str(tmp_path / "ix"), n_buckets=16)


def test_reference_oracle_single_term(spark, index):
    # one-term query against the python oracle, end to end
    got = {r.doc_id: r.score for r in index.query(["salmon"], k=10).collect()}
    n, sum_dl = index._totals()
    avgdl = sum_dl / n
    # salmon appears in d03 (5 tokens) and d07 (6 tokens), tf=1 each
    want = {
        "d03": round(bm25_reference_score(1, 2, 5, n, avgdl), 6),
        "d07": round(bm25_reference_score(1, 2, 6, n, avgdl), 6),
    }
    assert got.keys() == want.keys()
    for d in want:
        assert got[d] == pytest.approx(want[d], abs=1e-6)
