"""Repeated-span (exact substring) dedup: DuckDB + pure-python oracles.

`repeated_spans` in md5 mode is replicated bit-for-bit in DuckDB list
SQL; `remove_repeated_spans` is pinned to a brute-force python reference
on the generated token sequences; native (xxhash64) mode is pinned to
md5 mode on a corpus small enough that collisions are impossible.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from workbook_exporter_fe_spark.operators.spans import (
    position_fingerprints,
    remove_repeated_spans,
    repeated_spans,
)

N = 6


@pytest.fixture(scope="module")
def docs(spark):
    """Small corpus with planted verbatim repeats.

    Base: deterministic pseudo-random token arrays; a shared 15-token
    boilerplate block is planted at different offsets of docs 0..3, and
    doc 7 is an exact copy of doc 6.
    """
    import random

    rng = random.Random(7)
    boiler = [rng.randrange(1000) for _ in range(15)]
    rows = []
    for d in range(10):
        toks = [rng.randrange(1000) + 2000 + 100 * d for _ in range(40)]
        if d < 4:
            off = 5 + 3 * d
            toks[off : off + 15] = boiler
        rows.append((d, toks))
    rows[7] = (7, list(rows[6][1]))
    return spark.createDataFrame(rows, "doc_id long, tokens array<int>")


@pytest.fixture(scope="module")
def duck(docs, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("duck") / "docs")
    docs.write.mode("overwrite").parquet(p)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW docs AS SELECT * FROM read_parquet('{p}/*.parquet')"
    )
    return con


def test_repeated_spans_md5_vs_duckdb(docs, duck):
    got = sorted(
        (r["doc_id"], r["span_start"], r["span_end"], r["n_windows"])
        for r in repeated_spans(docs, n=N, hash_fn="md5").collect()
    )
    want = sorted(
        tuple(r)
        for r in duck.execute(
            f"""
        WITH grams AS (
          SELECT doc_id, i - 1 AS pos,
                 md5(array_to_string(tokens[i:i+{N}-1], '_')) AS fp
          FROM (SELECT doc_id, tokens,
                       unnest(range(1, len(tokens) - {N} + 2)) AS i
                FROM docs
                WHERE len(tokens) >= {N})
        ),
        hot AS (SELECT fp FROM grams GROUP BY fp HAVING COUNT(*) >= 2),
        hits AS (
          SELECT doc_id, pos AS s, pos + {N} - 1 AS e
          FROM grams JOIN hot USING (fp)
        ),
        flagged AS (
          SELECT doc_id, s, e,
                 CASE WHEN s > COALESCE(MAX(e) OVER (
                     PARTITION BY doc_id ORDER BY s
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), -2) + 1 THEN 1 ELSE 0 END AS new_island
          FROM hits
        ),
        islands AS (
          SELECT doc_id, s, e,
                 SUM(new_island) OVER (
                   PARTITION BY doc_id ORDER BY s
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS island
          FROM flagged
        )
        SELECT doc_id, MIN(s), MAX(e), COUNT(*)
        FROM islands GROUP BY doc_id, island
        """
        ).fetchall()
    )
    assert got == want
    # the planted boilerplate produced a span in each of docs 0..3 and the
    # full-copy pair flagged both docs end to end
    by_doc = {d: (s, e) for d, s, e, _ in got}
    for d in range(4):
        off = 5 + 3 * d
        assert by_doc[d] == (off, off + 14)
    assert by_doc[6] == (0, 39) and by_doc[7] == (0, 39)


def test_native_mode_matches_md5_mode(docs):
    a = sorted(
        tuple(r)
        for r in repeated_spans(docs, n=N, hash_fn="native").collect()
    )
    b = sorted(
        tuple(r) for r in repeated_spans(docs, n=N, hash_fn="md5").collect()
    )
    assert a == b


def _python_reference_removal(rows, n, keep_first):
    from collections import defaultdict

    pos = defaultdict(list)
    for d, toks in rows:
        for i in range(len(toks) - n + 1):
            pos[tuple(toks[i : i + n])].append((d, i))
    remove = defaultdict(set)
    for fp, occ in pos.items():
        if len(occ) < 2:
            continue
        occ = sorted(occ)
        keep = occ[0] if keep_first else None
        for d, i in occ:
            if keep_first and (d, i) == keep:
                continue
            remove[d].update(range(i, i + n))
    out = {}
    for d, toks in rows:
        out[d] = [t for i, t in enumerate(toks) if i not in remove[d]]
    return out


@pytest.mark.parametrize("keep_first", [True, False])
def test_remove_spans_vs_python(spark, docs, keep_first):
    rows = [(r["doc_id"], list(r["tokens"])) for r in docs.collect()]
    want = _python_reference_removal(rows, N, keep_first)
    got = {
        r["doc_id"]: list(r["tokens_clean"])
        for r in remove_repeated_spans(
            docs, n=N, keep_first=keep_first
        ).collect()
    }
    assert got == want
    # n_removed bookkeeping
    for r in remove_repeated_spans(docs, n=N, keep_first=keep_first).collect():
        assert r["n_removed"] == 40 - len(want[r["doc_id"]])


def test_short_docs_emit_nothing(spark):
    df = spark.createDataFrame(
        [(1, [1, 2, 3]), (2, [1, 2, 3])], "doc_id long, tokens array<int>"
    )
    assert position_fingerprints(df, n=6).count() == 0
    assert repeated_spans(df, n=6).count() == 0
    out = remove_repeated_spans(df, n=6).collect()
    assert all(list(r["tokens_clean"]) == list(r["tokens"]) for r in out)


def test_spans_on_generated_sequences(sequences):
    """End-to-end over the standard generated corpus: every reported span
    really is covered by windows with corpus df >= 2 (spot audit)."""
    docs = sequences.select("doc_id", "tokens").limit(300)
    spans = repeated_spans(docs, n=4).limit(5).collect()
    fp = position_fingerprints(docs, n=4)
    counts = {
        r["fp"]: r["c"]
        for r in fp.groupBy("fp").agg(F.count("*").alias("c")).collect()
    }
    by_pos = {
        (r["id"], r["pos"]): r["fp"] for r in fp.collect()
    }
    for s in spans:
        for p in range(s["span_start"], s["span_end"] - 4 + 2):
            assert counts[by_pos[(s["doc_id"], p)]] >= 2
