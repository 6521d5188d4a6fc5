"""interval_join: binned overlap join equals the naive cross-product
formulation exactly, dedup included, and the plan is a real hash join.
interval_union: running-max sweep islands equal a pure-python merge."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from workbook_exporter_fe_spark.operators.interval import (
    interval_join,
    interval_union,
)


@pytest.fixture(scope="module")
def intervals(spark):
    rng = np.random.default_rng(5)
    base = pd.Timestamp("2026-01-01")

    def mk(n, tag):
        start = rng.integers(0, 86_400, n)
        length = rng.integers(60, 14_400, n)  # 1 min .. 4 h — spans bins
        return pd.DataFrame(
            {
                "key": rng.choice(["a", "b"], n),
                f"{tag}_id": np.arange(n),
                f"{tag}_start": base + pd.to_timedelta(start, unit="s"),
                f"{tag}_end": base + pd.to_timedelta(start + length, unit="s"),
            }
        )

    return spark.createDataFrame(mk(300, "l")), spark.createDataFrame(mk(200, "r"))


def _pairs(df):
    return sorted((r["l_id"], r["r_id"]) for r in df.select("l_id", "r_id").collect())


@pytest.mark.parametrize("by", [None, "key"])
def test_interval_join_matches_naive(spark, intervals, by):
    ldf, rdf = intervals
    got = interval_join(
        ldf, rdf, "l_start", "l_end", "r_start", "r_end", by=by, bin_width_sec=1800
    )
    cond = (F.col("l_start") < F.col("r_end")) & (F.col("r_start") < F.col("l_end"))
    if by:
        naive = ldf.join(rdf.withColumnRenamed("key", "rkey"),
                         cond & (F.col("key") == F.col("rkey")))
    else:
        naive = ldf.join(rdf.withColumnRenamed("key", "rkey"), cond)
    assert _pairs(got) == _pairs(naive)
    # no duplicate pairs from multi-bin overlaps
    assert got.count() == got.select("l_id", "r_id").distinct().count()


def _merge_reference(ivs):
    """Pure-python island merge of [s, e) pairs (touching intervals join)."""
    islands = []
    for s, e in sorted(ivs):
        if islands and s <= islands[-1][1]:
            islands[-1][1] = max(islands[-1][1], e)
            islands[-1][2] += 1
        else:
            islands.append([s, e, 1])
    return [(s, e, n) for s, e, n in islands]


def test_interval_union_matches_reference(spark):
    rng = np.random.default_rng(11)
    rows = [
        (k, int(s), int(s + d))
        for k in ("x", "y")
        for s, d in zip(
            rng.integers(0, 2000, 400), rng.integers(1, 60, 400)
        )
    ]
    df = spark.createDataFrame(rows, "k string, s long, e long")
    got: dict[str, list] = {"x": [], "y": []}
    for r in interval_union(df, "s", "e", key="k", as_long=True).collect():
        got[r.k].append((r.island_start, r.island_end, r.n_intervals))
    for k in ("x", "y"):
        want = _merge_reference([(s, e) for kk, s, e in rows if kk == k])
        assert sorted(got[k]) == sorted(want)


def test_interval_union_touching_and_coverage(spark):
    # [0,3) + [3,5) touch -> one island; [10,12) separate
    df = spark.createDataFrame(
        [("a", 0, 3), ("a", 3, 5), ("a", 10, 12)], "k string, s long, e long"
    )
    out = sorted(
        interval_union(df, "s", "e", key="k", as_long=True).collect(),
        key=lambda r: r.island_start,
    )
    assert [(r.island_start, r.island_end, r.n_intervals) for r in out] == [
        (0, 5, 2),
        (10, 12, 1),
    ]
    coverage = sum(r.island_end - r.island_start for r in out)
    assert coverage == 7  # naive duration sum would say 3+2+2 = 7 too,
    # but with overlap: add [1,4) and the union stays 7 while naive says 10
    df2 = df.union(
        spark.createDataFrame([("a", 1, 4)], "k string, s long, e long")
    )
    out2 = interval_union(df2, "s", "e", key="k", as_long=True).collect()
    assert sum(r.island_end - r.island_start for r in out2) == 7


def test_interval_join_plan_is_hash_join(spark, intervals):
    ldf, rdf = intervals
    plan = interval_join(
        ldf, rdf, "l_start", "l_end", "r_start", "r_end", by="key"
    )._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan  # the whole point: no O(n^2) join
