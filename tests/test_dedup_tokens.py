"""Token-shingle MinHash: duplicate detection + partition invariance."""

from __future__ import annotations

from pyspark.sql import functions as F

from workbook_exporter_fe_spark.operators.dedup import (
    lsh_candidate_pairs,
    minhash_signatures_tokens,
)


def test_exact_duplicates_collide_on_every_band(spark, sequences):
    base = sequences.limit(40).cache()
    dup = base.select(
        F.concat(F.col("doc_id"), F.lit("#dup")).alias("doc_id"),
        "tokens",
        "n_tok",
        "source",
    )
    sig = minhash_signatures_tokens(base.unionByName(dup))
    pairs = {
        (r.id_a, r.id_b) for r in lsh_candidate_pairs(sig).collect()
    }
    for r in base.filter(F.size("tokens") >= 3).select("doc_id").collect():
        assert (r.doc_id, r.doc_id + "#dup") in pairs


def test_signatures_stable_under_repartition(spark, sequences):
    s = sequences.limit(100)
    a = minhash_signatures_tokens(s).orderBy("doc_id", "band").collect()
    b = minhash_signatures_tokens(s.repartition(23)).orderBy("doc_id", "band").collect()
    assert a == b


def test_short_sequences_dropped_not_errored(spark):
    df = spark.createDataFrame(
        [("d1", [1, 2]), ("d2", [1, 2, 3, 4])],
        "doc_id string, tokens array<int>",
    )
    got = minhash_signatures_tokens(df)
    ids = {r.doc_id for r in got.collect()}
    assert ids == {"d2"}


def test_native_mode_duplicates_collide_on_every_band(spark, sequences):
    base = sequences.limit(40).cache()
    dup = base.select(
        F.concat(F.col("doc_id"), F.lit("#dup")).alias("doc_id"),
        "tokens",
        "n_tok",
        "source",
    )
    sig = minhash_signatures_tokens(base.unionByName(dup), hash_fn="native")
    pairs = {(r.id_a, r.id_b) for r in lsh_candidate_pairs(sig).collect()}
    for r in base.filter(F.size("tokens") >= 3).select("doc_id").collect():
        assert (r.doc_id, r.doc_id + "#dup") in pairs
