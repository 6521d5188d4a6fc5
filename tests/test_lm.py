"""Count-LM cross-entropy scoring (unigram add-k + interpolated
Kneser-Ney bigram): DuckDB oracles + behavioral checks."""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from workbook_exporter_fe_spark.operators.lm import (
    bigram_kn,
    doc_cross_entropy,
    doc_cross_entropy_bigram,
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


def _ref_kn_xent(rows, d=0.75, k=1.0):
    """Pure-python interpolated-KN reference (Chen & Goodman eq. 4.24,
    bigram case, add-k continuation floor) — unrounded doubles."""
    from collections import Counter

    big, c_v, n1p, r_w = Counter(), Counter(), Counter(), Counter()
    for _, text in rows:
        ws = text.split(" ")
        for a, b in zip(ws, ws[1:]):
            big[(a, b)] += 1
    for (v, w), c in big.items():
        c_v[v] += c
        n1p[v] += 1
        r_w[w] += 1
    nbt, vc = len(big), len({w for _, w in big})
    out = {}
    for doc_id, text in rows:
        ws = text.split(" ")
        if len(ws) < 2:
            continue
        s, n = 0.0, 0
        for a, b in zip(ws, ws[1:]):
            pc = (r_w[b] + k) / (nbt + k * vc)
            if c_v[a] > 0:
                p = (max(big[(a, b)] - d, 0.0) + (d * n1p[a]) * pc) / c_v[a]
            else:
                p = pc
            s += math.log(p)
            n += 1
        out[doc_id] = (n, -s / n)
    return out


def test_kn_xent_vs_duckdb(docs):
    """Cross-engine replica of the q37 xent2 oracle columns."""
    got = {
        r.doc_id: (r.n_big, r.xent2)
        for r in doc_cross_entropy_bigram(docs).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", DOCS)
    want = con.execute(
        """
        WITH f AS (SELECT doc_id, string_split(text, ' ') AS ws FROM d),
        bgt AS (
          SELECT doc_id, ws[i] AS v, ws[i + 1] AS w
          FROM f, UNNEST(range(1, len(ws))) AS t(i)
          WHERE len(ws) >= 2
        ),
        bigc AS (SELECT v, w, COUNT(*) AS c_vw FROM bgt GROUP BY 1, 2),
        ctx AS (SELECT v, SUM(c_vw) AS c_v, COUNT(*) AS n1p_v
                FROM bigc GROUP BY 1),
        cont AS (SELECT w, COUNT(*) AS r_w FROM bigc GROUP BY 1),
        btot AS (SELECT COUNT(*) AS nbt, COUNT(DISTINCT w) AS vc FROM bigc)
        SELECT doc_id, COUNT(*) AS n_big,
               ROUND(-CAST(SUM(CAST(ROUND(ln(
                   CASE WHEN c_v IS NOT NULL THEN
                     (greatest(COALESCE(c_vw, 0) - 0.75, 0.0)
                      + (0.75 * n1p_v)
                        * ((COALESCE(r_w, 0) + 1.0) / (nbt + 1.0 * vc)))
                     / c_v
                   ELSE (COALESCE(r_w, 0) + 1.0) / (nbt + 1.0 * vc) END
                 ), 6) AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*), 6) AS xent2
        FROM bgt
        LEFT JOIN bigc USING (v, w)
        LEFT JOIN ctx USING (v)
        LEFT JOIN cont USING (w)
        CROSS JOIN btot
        GROUP BY doc_id
        """
    ).fetchall()
    assert len(got) == len(want)
    for doc_id, n_big, xent2 in want:
        assert got[doc_id] == (n_big, xent2)


def test_kn_semantics_vs_python_reference(docs):
    """The distributed computation implements the KN equations: per-doc
    cross-entropy agrees with an independent pure-python fold (up to the
    6-dp per-token rounding the cross-engine discipline requires)."""
    want = _ref_kn_xent(DOCS)
    got = {
        r.doc_id: (r.n_big, r.xent2)
        for r in doc_cross_entropy_bigram(docs).collect()
    }
    assert set(got) == set(want)
    for doc_id, (n, x) in want.items():
        assert got[doc_id][0] == n
        assert got[doc_id][1] == pytest.approx(x, abs=2e-6)


def test_kn_continuation_beats_frequency(spark):
    """The KN signature: a word frequent in ONE context only ('francisco'
    after 'san') gets LOW continuation probability, so it scores worse
    than an equally-frequent word seen in many contexts."""
    rows = [
        (i, f"san francisco c{i}") for i in range(8)
    ] + [(8 + i, f"w{i} common z{i}") for i in range(8)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    m = bigram_kn(d)
    cont = {r.w: r.r_w for r in m["cont"].collect()}
    # both occur 8 times, but 'francisco' completes 1 context, 'common' 8
    assert cont["francisco"] == 1 and cont["common"] == 8
    probe = spark.createDataFrame(
        [(100, "qq francisco"), (101, "qq common")], "doc_id long, text string"
    )
    x = {
        r.doc_id: r.xent2
        for r in doc_cross_entropy_bigram(probe, model=m).collect()
    }
    assert x[100] > x[101]


def test_kn_oov_and_short_docs(spark, docs):
    """Unseen context and unseen word stay finite via the add-k
    continuation floor; single-token docs produce no bigram row."""
    m = bigram_kn(docs)
    probe = spark.createDataFrame(
        [(90, "totally unseen words"), (91, "one")],
        "doc_id long, text string",
    )
    rows = doc_cross_entropy_bigram(probe, model=m).collect()
    assert [r.doc_id for r in rows] == [90]
    assert rows[0].xent2 is not None and math.isfinite(rows[0].xent2)


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
