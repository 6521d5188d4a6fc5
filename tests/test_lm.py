"""Unigram-LM cross-entropy scoring: DuckDB oracle + behavioral checks."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from workbook_exporter_fe_spark.operators.lm import (
    doc_cross_entropy,
    unigram_lm,
)

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the dog sat on the rug"),
    (2, "the cat and the dog sat"),
    (3, "qq zz xx vv kk jj"),  # out-of-distribution noise
    (4, "the the the the the the"),  # degenerate repetition
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_xent_vs_duckdb(docs):
    got = {r.doc_id: (r.n_tok, r.xent) for r in doc_cross_entropy(docs).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", DOCS)
    want = con.execute(
        """
        WITH lm AS (
          SELECT word, COUNT(*) AS c
          FROM (SELECT UNNEST(string_split(text, ' ')) AS word FROM d)
          GROUP BY word
        ),
        st AS (SELECT SUM(c) AS T, COUNT(*) AS V FROM lm)
        SELECT doc_id, COUNT(*) AS n_tok,
               ROUND(-CAST(SUM(CAST(ROUND(ln((c + 1.0) / (T + 1.0 * V)), 6)
                                    AS DECIMAL(28,6))) AS DOUBLE)
                     / COUNT(*), 6) AS xent
        FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS word FROM d)
        JOIN lm USING (word) CROSS JOIN st
        GROUP BY doc_id
        """
    ).fetchall()
    assert len(got) == len(want)
    for doc_id, n_tok, xent in want:
        assert got[doc_id] == (n_tok, xent)


def test_xent_orders_quality(docs):
    """OOD noise scores worst; degenerate repetition scores best (its one
    token is the corpus's most frequent) — the filter's intended ordering."""
    x = {r.doc_id: r.xent for r in doc_cross_entropy(docs).collect()}
    assert x[3] == max(x.values())
    assert x[4] == min(x.values())
    assert x[0] < x[3] and x[1] < x[3] and x[2] < x[3]


def test_external_lm_handles_oov(spark, docs):
    """Scoring against a reference LM: unseen tokens hit the smoothed
    floor k/(T+kV) instead of erroring."""
    ref = unigram_lm(docs.filter(F.col("doc_id") <= 2))
    scored = doc_cross_entropy(
        spark.createDataFrame(
            [(9, "the unseen walrus")], "doc_id long, text string"
        ),
        lm=ref,
    ).collect()
    assert len(scored) == 1 and scored[0].xent is not None
    # 'the' is known, 'unseen'/'walrus' are OOV -> higher than an all-known doc
    known = doc_cross_entropy(
        spark.createDataFrame([(8, "the cat sat")], "doc_id long, text string"),
        lm=ref,
    ).collect()[0].xent
    assert scored[0].xent > known
