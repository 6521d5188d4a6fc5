"""run_query.py: metric spec parsing + instant/range CLI evaluation."""

from __future__ import annotations

import json
import sys

import pytest
from pyspark.sql import functions as F


def _mod():
    sys.path.insert(0, "/root/repo")
    import run_query

    return run_query


def test_parse_metric():
    m = _mod()
    assert m._parse_metric("tok=/p/tier1:sum_v") == {
        "name": "tok", "table": "/p/tier1", "value": "sum_v",
        "labels": ["source"],
    }
    assert m._parse_metric("x=/p") == {
        "name": "x", "table": "/p", "value": "value", "labels": ["source"],
    }
    assert m._parse_metric("x=/p:v:a+b")["labels"] == ["a", "b"]
    with pytest.raises(ValueError):
        m._parse_metric("nope")


@pytest.fixture()
def tier1(spark, tmp_path):
    """A tiny tier-1-shaped table: 2 sources x 30 1m buckets."""
    path = str(tmp_path / "tier1")
    (
        spark.range(60)
        .select(
            F.concat(F.lit("s"), (F.col("id") % 2).cast("string"))
            .alias("source"),
            F.timestamp_seconds(
                1700000000 + (F.col("id") / 2).cast("long") * 60
            ).alias("bucket_ts"),
            (F.col("id") * 1.0).alias("sum_v"),
        )
        .write.parquet(path)
    )
    return path


def test_instant_query_stdout(tier1, spark, capsys, monkeypatch):
    m = _mod()
    monkeypatch.setattr(sys, "argv", [
        "run_query.py",
        "--metric", f"tok={tier1}:sum_v",
        "--promql", "sum by (source) (sum_over_time(tok[5m]))",
        "--limit", "5",
    ])
    m.main()
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()]
    assert len(lines) == 5
    assert set(lines[0]) == {"source", "ts", "value"}
    # value-descending deterministic order
    vals = [l["value"] for l in lines]
    assert vals == sorted(vals, reverse=True)


def test_range_query_parquet_out(tier1, spark, tmp_path, capsys, monkeypatch):
    m = _mod()
    out = str(tmp_path / "ans")
    monkeypatch.setattr(sys, "argv", [
        "run_query.py",
        "--metric", f"tok={tier1}:sum_v",
        "--promql", "avg_over_time(tok[5m])",
        "--range", "2023-11-14T22:13:20..2023-11-14T22:43:20",
        "--step", "5m", "--out", out,
    ])
    m.main()
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["out"] == out and rep["rows"] > 0
    df = spark.read.parquet(out)
    assert set(df.columns) == {"source", "ts", "value"}
    # grid spacing is exactly the step for every series
    secs = sorted(
        r.ts.timestamp() for r in df.filter("source = 's0'").collect()
    )
    assert all(b - a == 300 for a, b in zip(secs, secs[1:]))
