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


def test_ivf_assignment_broadcasts_centroids(spark, sf_dir):
    """IVF cell assignment must broadcast the centroid set — the corpus
    side never shuffles for assignment."""
    from workbook_exporter_fe_spark.operators.similarity import ivf_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    plan = _plan(ivf_topk(emb))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_minhash_single_preagg_exchange(spark, sf_dir):
    """All band mins reduce in ONE groupBy(doc_id): exactly one Exchange
    below the stack(), and it carries int64 hashes, not shingle strings."""
    from workbook_exporter_fe_spark.operators.dedup import minhash_signatures

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(minhash_signatures(docs, n_bands=4))
    assert plan.count("Exchange") == 1
    # partial+final agg around that exchange (map-side combine of mins)
    assert plan.count("HashAggregate") >= 2


def test_neardup_joins_on_bucket_not_cartesian(spark, sf_dir):
    from workbook_exporter_fe_spark.operators.similarity import embedding_neardup_pairs

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    plan = _plan(embedding_neardup_pairs(emb))
    assert "CartesianProduct" not in plan


def test_hash_sample_is_scan_side_filter(spark, sf_dir):
    """hash_sample adds zero exchanges — a pure map-side gate."""
    from workbook_exporter_fe_spark.operators.sampling import hash_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(hash_sample(docs, 0.25))
    assert "Exchange" not in plan
    assert "Filter" in plan


def test_aqe_skew_join_split_triggers(spark):
    """A Zipf-hot join key actually trips AQE's skew-join split (SURVEY §7
    risk 5: don't just enable the conf — observe the runtime re-plan)."""
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "128k"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64k")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        # 400k rows, ~50% on key 0 (hot); pad must be INCOMPRESSIBLE —
        # shuffle blocks are lz4'd and a constant pad compresses below the
        # skew byte threshold (measured: no split with "x"*64)
        left = spark.range(400_000).select(
            F.when(F.col("id") % 2 == 0, 0).otherwise(F.col("id") % 97).alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("pad"),
        )
        right = spark.range(97).select(
            F.col("id").alias("k"), F.col("id").alias("rv")
        )
        # The aggregate must CONSUME pad (max), or Catalyst prunes it and
        # the shuffled partitions shrink below the skew threshold
        # (measured: groupBy().count() never triggers the split). count()
        # executes through j's own QueryExecution, so the adaptive FINAL
        # plan is inspectable on the same Dataset (a write wraps the plan
        # in a fresh execution whose final plan we can't reach).
        j = left.join(right, "k").groupBy().agg(
            F.max("pad").alias("mp"), F.count("*").alias("n")
        )
        assert j.collect()[0]["n"] > 0
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan, plan[:500]
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_dynamic_partition_pruning_on_tier_tables(spark, tmp_path):
    """A selective dim-filtered join against a source-partitioned tier
    table must prune partitions at RUNTIME (dynamicpruning subquery in the
    scan) — at 100 TB this is the difference between scanning one source
    directory and scanning the table."""
    from workbook_exporter_fe_spark.operators.eventize import eventize
    from workbook_exporter_fe_spark.operators.tiers import rollup_tier1
    from workbook_exporter_fe_spark.sources.datagen import gen_sequences

    path = str(tmp_path / "t1_parted")
    t1 = rollup_tier1(eventize(gen_sequences(spark, 3000, seed=42)))
    t1.write.partitionBy("source").mode("overwrite").parquet(path)
    fact = spark.read.parquet(path)
    dim = spark.createDataFrame(
        [("src-00", "keep")], "source string, tag string"
    )
    joined = fact.join(dim.filter("tag = 'keep'"), "source")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower() or "PartitionFilters: [isnotnull(source" in plan
    # and the result only touches the pruned source
    assert joined.select("source").distinct().collect()[0]["source"] == "src-00"
