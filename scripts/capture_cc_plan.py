"""Capture the executed per-round plan of connected_components for
BENCH/PLANS.md — mirrors the round body of operators/components.py
exactly (posts-agg + labels-join shape, AQE off as the operator runs it)
on a small synthetic pair graph so the executed plan can be read without
running the 24M-edge benchmark.

Run alone (pytest/bench timings get contaminated by concurrent jobs).
"""
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from workbook_exporter_fe_spark.session import get_spark

spark = get_spark(app_name="capture_cc_plan", cores=8, shuffle_partitions=8,
                  extra_conf={"spark.sql.adaptive.enabled": "false"})
n_part = 8

# 10k-pair synthetic graph (same shape as the recorded capture)
pairs = spark.range(10_000).select(
    (F.col("id") * 2).alias("id_a"), (F.col("id") * 2 + 1).alias("id_b")
)

# --- mirrors connected_components() init ---
edges = (
    pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    .unionByName(
        pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
    )
    .repartition(n_part, "dst")
    .dropDuplicates()
    .persist()
)
edges.count()
labels = (
    edges.select(F.col("src").alias("id"))
    .distinct()
    .withColumn("component", F.col("id"))
    .localCheckpoint()
)
frontier = labels

# --- mirrors one round ---
posts = (
    edges.join(
        frontier.withColumnRenamed("id", "dst").hint("shuffle_hash"), "dst"
    )
    .select(F.col("src").alias("id"), F.col("component").alias("post"))
    .groupBy("id")
    .agg(F.min("post").alias("post"))
)
new_labels = labels.join(posts.hint("shuffle_hash"), "id", "left").select(
    "id",
    F.least(F.col("component"), F.col("post")).alias("component"),
    F.col("component").alias("old"),
)
new_labels = new_labels.localCheckpoint(eager=False)
new_labels.filter(F.col("component") != F.col("old")).count()

print(new_labels._jdf.queryExecution().executedPlan().toString())
spark.stop()
