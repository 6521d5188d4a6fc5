"""hash_sample determinism + pack_greedy layout invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from workbook_exporter_fe_spark.operators.sampling import hash_sample, pack_greedy


def test_hash_sample_stable_under_repartition(spark, sequences):
    a = hash_sample(sequences, rate=0.25, key_col="doc_id")
    b = hash_sample(sequences.repartition(17), rate=0.25, key_col="doc_id")
    ids_a = {r.doc_id for r in a.select("doc_id").collect()}
    ids_b = {r.doc_id for r in b.select("doc_id").collect()}
    assert ids_a == ids_b
    # rate lands near 25% (hash-uniform over doc_ids)
    frac = len(ids_a) / sequences.count()
    assert 0.2 < frac < 0.3


def test_hash_sample_is_subset(spark, sequences):
    small = {r.doc_id for r in hash_sample(sequences, 0.1).select("doc_id").collect()}
    big = {r.doc_id for r in hash_sample(sequences, 0.5).select("doc_id").collect()}
    assert small <= big


def test_pack_greedy_layout(spark, sequences):
    cap = 512
    packed = pack_greedy(sequences, capacity=cap, weight_col="n_tok").cache()
    rows = packed.collect()
    # offsets always inside the pack
    assert all(0 <= r.pack_offset < cap for r in rows)
    # per (source, pack) the packed weights tile the pack contiguously:
    # min offset of pack p+1 == 0 and start positions are the running sum
    by_key = {}
    for r in sorted(rows, key=lambda r: (r.source, r.doc_id)):
        start = by_key.get(r.source, 0)
        assert r.pack_id == start // cap
        assert r.pack_offset == start % cap
        by_key[r.source] = start + r.n_tok
    # total weight preserved
    got = packed.agg(F.sum("n_tok")).first()[0]
    want = sequences.agg(F.sum("n_tok")).first()[0]
    assert got == want


def test_pack_greedy_stable_under_repartition(spark, sequences):
    a = pack_greedy(sequences, 512).orderBy("source", "doc_id").collect()
    b = pack_greedy(sequences.repartition(13), 512).orderBy("source", "doc_id").collect()
    assert a == b


def test_hash_split_partitions_everything_once(spark, sequences):
    from workbook_exporter_fe_spark.operators.sampling import hash_split

    d = hash_split(sequences, {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r.split: r.n for r in d.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == sequences.count()
    n = sequences.count()
    assert 0.75 * n < counts["train"] < 0.85 * n
    # stable under repartitioning
    d2 = hash_split(sequences.repartition(19), {"train": 0.8, "val": 0.1, "test": 0.1})
    a = {(r.doc_id, r.split) for r in d.select("doc_id", "split").collect()}
    b = {(r.doc_id, r.split) for r in d2.select("doc_id", "split").collect()}
    assert a == b
    import pytest as _p

    with _p.raises(ValueError):
        hash_split(sequences, {"train": 0.5, "val": 0.1})
