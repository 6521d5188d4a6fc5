"""Histogram tiers: DuckDB-oracled bin counts, cascade = direct, and
quantile estimates bracketed by true bin bounds."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from workbook_exporter_fe_spark.operators.histogram import (
    histogram_quantile,
    histogram_reaggregate,
    histogram_tier1,
)

LO, HI, NB = 0.0, 512.0, 32


@pytest.fixture(scope="module")
def duck_ev(events, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("duck") / "ev")
    events.select("source", "event_ts", "v").write.mode("overwrite").parquet(p)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW ev AS SELECT * FROM read_parquet('{p}/*.parquet')")
    return con


def test_histogram_tier1_vs_duckdb(events, duck_ev):
    got = {
        (r["source"], r["bucket_ts"], r["bin"]): r["n"]
        for r in histogram_tier1(events, LO, HI, NB).collect()
    }
    width = (HI - LO) / NB
    want = duck_ev.execute(
        f"""
        SELECT source, CAST(date_trunc('minute', event_ts) AS TIMESTAMP) AS b,
               CASE WHEN v < {LO} THEN -1
                    WHEN v >= {HI} THEN {NB}
                    ELSE CAST(FLOOR((v - {LO}) / {width}) AS INT) END AS bin,
               COUNT(*) AS n
        FROM ev GROUP BY 1, 2, 3
        """
    ).fetchall()
    assert len(got) == len(want)
    for s, b, bin_, n in want:
        assert got[(s, b, bin_)] == n


def test_cascade_equals_direct(events):
    t1 = histogram_tier1(events, LO, HI, NB)
    via_cascade = histogram_reaggregate(t1, "1h")
    direct = histogram_tier1(events, LO, HI, NB, tier="1h")
    assert via_cascade.exceptAll(direct).count() == 0
    assert direct.exceptAll(via_cascade).count() == 0


def test_quantile_bracketed_by_exact(events):
    """The histogram picks the bin CONTAINING the ceil(q·n)-th smallest
    value (its rank convention), and interpolates inside it — so the
    estimate must sit within one bin width of that exact order statistic,
    for every bucket size including tiny ones."""
    t1h = histogram_tier1(events, LO, HI, NB, tier="1h")
    est = histogram_quantile(t1h, 0.5, LO, HI, NB)
    exact = events.groupBy(
        "source", F.date_trunc("hour", "event_ts").alias("bucket_ts")
    ).agg(
        F.element_at(
            F.sort_array(F.collect_list("v")),
            F.ceil(F.count("*") * 0.5).cast("int"),
        ).alias("rank_item"),
        F.count("*").alias("cnt"),
    )
    j = est.join(exact, ["source", "bucket_ts"])
    assert j.count() == exact.count()
    width = (HI - LO) / NB
    bad = j.filter(
        (F.abs(F.col("q50") - F.col("rank_item")) > width)
        | (F.col("q50") < LO)
        | (F.col("q50") > HI)
        | (F.col("total") != F.col("cnt"))
    )
    assert bad.count() == 0


def test_quantile_edges(spark):
    """Underflow/overflow bins clamp; interpolation is exact on a known
    distribution (uniform counts → quantile = linear position)."""
    from datetime import datetime

    # one bucket, 4 bins of 10 each over [0, 40)
    rows = [("s", datetime(2026, 1, 1), b, 10) for b in range(4)]
    hist = spark.createDataFrame(
        rows, "source string, bucket_ts timestamp, bin int, n long"
    )
    got = histogram_quantile(hist, 0.5, 0.0, 40.0, 4).collect()[0]
    assert got["q50"] == 20.0  # exact middle
    got25 = histogram_quantile(hist, 0.25, 0.0, 40.0, 4).collect()[0]
    assert got25["q25"] == 10.0
