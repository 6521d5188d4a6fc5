"""Salted skew join: result-identical to the plain join, hot key split."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from workbook_exporter_fe_spark.operators.skewjoin import (
    salted_join,
    top_keys_by_count,
)


@pytest.fixture(scope="module")
def skewed(spark):
    # left: 10k rows, 40% on key 'hot'; right: 30 rows per key (too many
    # dup-key rows to broadcast comfortably at scale, small enough to test)
    left = spark.range(10_000).select(
        F.when(F.col("id") % 10 < 4, "hot")
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 97).cast("string")))
        .alias("k"),
        F.col("id").alias("lid"),
    )
    right = (
        left.select("k")
        .distinct()
        .select("k", F.explode(F.sequence(F.lit(0), F.lit(29))).alias("rv"))
    )
    return left, right


def test_top_keys_by_count(spark, skewed):
    left, _ = skewed
    hot = top_keys_by_count(left, ["k"], min_share=0.2)
    assert hot == [("hot",)]


@pytest.mark.parametrize("skewed_only", [False, True])
def test_salted_join_equals_plain_join(spark, skewed, skewed_only):
    left, right = skewed
    plain = left.join(right, ["k"])
    salted = salted_join(
        left,
        right,
        ["k"],
        salt_buckets=8,
        skewed_keys=[("hot",)] if skewed_only else None,
    )
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_salt_actually_splits_the_hot_key(spark, skewed):
    left, _ = skewed
    lsalt = F.pmod(F.xxhash64(F.col("lid")), F.lit(8))
    per_salt = (
        left.filter("k = 'hot'")
        .withColumn("_salt", lsalt)
        .groupBy("_salt")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert len(per_salt) == 8  # all buckets used
    n_hot = sum(r["n"] for r in per_salt)
    assert max(r["n"] for r in per_salt) < n_hot / 8 * 1.3  # balanced ±30%


def test_left_join_and_validation(spark, skewed):
    left, right = skewed
    missing = right.filter("k != 'hot'")  # drop hot from right side
    plain = left.join(missing, ["k"], "left")
    salted = salted_join(left, missing, ["k"], skewed_keys=[("hot",)], how="left")
    assert salted.count() == plain.count()
    assert salted.filter("rv IS NULL").count() == plain.filter("rv IS NULL").count()
    with pytest.raises(ValueError):
        salted_join(left, right, ["k"], how="full")
    with pytest.raises(ValueError):
        salted_join(left.select("k"), right, ["k"])


def test_null_keys_survive_in_left_join(spark, skewed):
    _, right = skewed
    left = spark.createDataFrame(
        [("hot", 1), (None, 2), ("k5", 3)], "k string, lid long"
    )
    plain = left.join(right, ["k"], "left")
    salted = salted_join(left, right, ["k"], skewed_keys=[("hot",)], how="left")
    assert salted.count() == plain.count()
    assert salted.filter("lid = 2").count() == 1  # the NULL-key row survives
