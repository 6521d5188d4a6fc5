"""Physical-plan regression tests: the optimizations we rely on at 100 TB.

These assert plan *shape*, not timing: filter/column pushdown into the
parquet scan, broadcast joins for dimension tables, two-phase (partial +
final) hash aggregation for tier rollups, and no Python row-at-a-time UDFs
anywhere in the hot paths.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from workbook_exporter_fe_spark.operators.tiers import rollup_tier1
from workbook_exporter_fe_spark.plans.registry import QUERIES


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_scan_pushdown_and_pruning(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    q = (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag")
        .agg(F.sum("l_quantity").alias("s"))
    )
    plan = _plan(q)
    scan = next(l for l in plan.splitlines() if "FileScan parquet" in l)
    # column pruning: only the 3 referenced columns reach the scan
    assert "l_quantity" in scan and "l_returnflag" in scan and "l_shipdate" in scan
    assert "l_extendedprice" not in scan and "l_partkey" not in scan
    # filter pushed into the scan node
    assert "l_shipdate" in scan.split("DataFilters:")[1] if "DataFilters:" in scan else True


def test_dim_joins_broadcast(spark, sf_dir):
    plan = _plan(QUERIES["q03_join_dims"](spark, sf_dir))
    assert plan.count("BroadcastHashJoin") == 3
    assert "SortMergeJoin" not in plan


def test_tier1_partial_aggregation(spark, events):
    plan = _plan(rollup_tier1(events))
    # partial (map-side) + final HashAggregate pair
    assert plan.count("HashAggregate") >= 2
    assert "partial_sum" in plan or "partial" in plan.lower()


def test_no_python_row_udfs_in_registry(spark, sf_dir):
    """Hot-path queries contain no BatchEvalPython (row-at-a-time Python).
    ArrowEvalPython / MapInPandas (vectorized) are allowed where declared."""
    for name in ["q01_scan_agg", "q03_join_dims", "q09_dedup_lastwin", "q11_topk_per_group"]:
        plan = _plan(QUERIES[name](spark, sf_dir))
        assert "BatchEvalPython" not in plan, name


def test_anti_join_not_nested_loop(spark, sf_dir):
    plan = _plan(QUERIES["q04_anti_join"](spark, sf_dir))
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_salted_rollup_two_phase_plan(events):
    """salt_buckets>0 compiles to two aggregation pairs (salted partial →
    final), the explicit skew-spread for a hot (source, bucket) key."""
    from workbook_exporter_fe_spark.operators.tiers import rollup_tier1

    df = rollup_tier1(events, salt_buckets=8)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "_salt" in analyzed  # salted partial-agg key present
    salted = _plan(df)
    assert salted.count("HashAggregate") >= 3  # salted partial/final + final pair
    assert salted.count("Exchange") >= 2  # two shuffles: salted then final


def test_aqe_enabled_in_session(spark):
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
