"""Streaming MinHash dedup: batch equivalence + replay exactly-once.

The sink's three replay states are driven directly (deterministic); the
end-to-end test runs a real availableNow file-source stream and pins the
result against the batch MinHashIndex/incremental_keep chain.
"""

from __future__ import annotations

import os

from workbook_exporter_fe_spark.operators.dedup import (
    MinHashIndex,
    incremental_keep,
    lsh_candidate_pairs,
    minhash_signatures_tokens,
)
from workbook_exporter_fe_spark.sources.snapshots import SnapshotTable
from workbook_exporter_fe_spark.streaming.stream_minhash import (
    minhash_dedup_sink,
    stream_minhash_dedup,
)

DOC_SCHEMA = "doc_id string, tokens array<int>"


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, list(t)) for i, t in rows], DOC_SCHEMA
    )


def _batches(spark):
    base = list(range(100, 150))
    uniq = lambda s: [s * 7 + j * 13 + (s * j) % 11 for j in range(40)]
    b1 = _docs(spark, [("d01", base), ("d02", base), ("d03", uniq(3))])
    b2 = _docs(spark, [("d11", base), ("d12", uniq(12))])
    b3 = _docs(
        spark, [("d21", uniq(21)), ("d22", uniq(21)), ("d23", uniq(12))]
    )
    return b1, b2, b3


def test_sink_batches_match_batch_operators(spark, tmp_path):
    batches = _batches(spark)
    sink = minhash_dedup_sink(str(tmp_path / "idx"), str(tmp_path / "out"))
    for epoch, b in enumerate(batches):
        sink(b, epoch)
    out = SnapshotTable(spark, str(tmp_path / "out"))
    assert out.current_sequence() == 3
    got = {r.doc_id for r in out.read().collect()}
    # batch-side truth: the same batches through the index operators
    idx2 = MinHashIndex(spark, str(tmp_path / "idx2"))
    want = set()
    for b in batches:
        kept = incremental_keep(b, idx2.add_batch(b))
        want |= {r.doc_id for r in kept.collect()}
    assert got == want == {"d01", "d03", "d12", "d21"}


def test_sink_replay_is_idempotent(spark, tmp_path):
    b1, b2, _ = _batches(spark)
    sink = minhash_dedup_sink(str(tmp_path / "idx"), str(tmp_path / "out"))
    sink(b1, 0)
    sink(b2, 1)
    idx = MinHashIndex(spark, str(tmp_path / "idx"))
    out = SnapshotTable(spark, str(tmp_path / "out"))
    seqs = (idx.table.current_sequence(), out.current_sequence())
    rows = sorted(r.doc_id for r in out.read().collect())
    sink(b2, 1)  # full replay: both tables already have epoch 1
    sink(b1, 0)  # stale replay
    assert (idx.table.current_sequence(), out.current_sequence()) == seqs
    assert sorted(r.doc_id for r in out.read().collect()) == rows


def test_sink_recovers_from_crash_between_commits(spark, tmp_path):
    """Index committed, survivors not (the partial-failure state): the
    replayed epoch rebuilds pairs via time travel and produces exactly
    what the uninterrupted run would have."""
    b1, b2, _ = _batches(spark)
    idx_root, out_root = str(tmp_path / "idx"), str(tmp_path / "out")
    sink = minhash_dedup_sink(idx_root, out_root)
    sink(b1, 0)
    # simulate the crash: epoch 1 signatures land, survivors commit lost
    idx = MinHashIndex(spark, idx_root)
    idx.add_batch(b2, extra_summary={"epoch": 1})
    assert idx.table.current_sequence() == 2
    sink(b2, 1)  # replay of epoch 1
    idx_after = MinHashIndex(spark, idx_root)
    assert idx_after.table.current_sequence() == 2  # no double signature commit
    out = SnapshotTable(spark, out_root)
    got = {r.doc_id for r in out.read().collect()}
    # d11 duplicates the already-indexed d01 → only d12 survives b2
    assert got == {"d01", "d03", "d12"}


def test_stream_matches_batch_chain(spark, tmp_path):
    """Real availableNow stream, one file per micro-batch (mtime-ordered):
    survivors equal the batch chain run in the same order, and the pair
    union equals full-corpus LSH pairs."""
    batches = _batches(spark)
    src = str(tmp_path / "src")
    os.makedirs(src)
    for i, b in enumerate(batches):
        # distinct mtimes make file-source ordering deterministic
        b.coalesce(1).write.parquet(f"{src}/b{i}__tmp")
        part = next(
            n for n in os.listdir(f"{src}/b{i}__tmp") if n.endswith(".parquet")
        )
        os.rename(f"{src}/b{i}__tmp/{part}", f"{src}/b{i}.parquet")
        t = 1_700_000_000 + i * 10
        os.utime(f"{src}/b{i}.parquet", (t, t))
    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*.parquet")
    )
    q = stream_minhash_dedup(
        stream, str(tmp_path / "idx"), str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    out = SnapshotTable(spark, str(tmp_path / "out"))
    got = {r.doc_id for r in out.read().collect()}
    assert got == {"d01", "d03", "d12", "d21"}
    # pair-union == full-corpus property, via the index's stored sigs
    idx = MinHashIndex(spark, str(tmp_path / "idx"))
    all_docs = batches[0].unionByName(batches[1]).unionByName(batches[2])
    want_pairs = {
        tuple(sorted((r.id_a, r.id_b)))
        for r in lsh_candidate_pairs(
            minhash_signatures_tokens(all_docs)
        ).collect()
    }
    rebuilt = {
        tuple(sorted((r.id_a, r.id_b)))
        for r in lsh_candidate_pairs(idx.signatures()).collect()
    }
    assert rebuilt == want_pairs
    assert idx.table.current_sequence() == 3


def test_fresh_stream_against_existing_tables_processes_batches(
    spark, tmp_path
):
    """A NEW stream (fresh checkpoint → epochs restart at 0, new run id)
    pointed at tables an earlier stream populated must PROCESS its
    batches — the bare-epoch guard used to skip every batch whose epoch
    was <= the old stream's head (silent data loss)."""
    b1, b2, b3 = _batches(spark)
    roots = str(tmp_path / "idx"), str(tmp_path / "out")
    old = minhash_dedup_sink(*roots, run_id="run_old")
    old(b1, 0)
    old(b2, 1)
    out = SnapshotTable(spark, roots[1])
    before = {r.doc_id for r in out.read().collect()}
    assert before == {"d01", "d03", "d12"}
    new = minhash_dedup_sink(*roots, run_id="run_new")
    new(b3, 0)  # epoch 0 again — a replay for run_old, NEW work here
    got = {r.doc_id for r in out.read().collect()}
    assert got == {"d01", "d03", "d12", "d21"}  # d23 dups d12, d22 dups d21


def test_same_run_epoch_regression_raises(spark, tmp_path):
    """Checkpoint deleted but the same checkpoint dir (same run id)
    reused against grown tables: fail loudly instead of dropping data."""
    import pytest

    b1, b2, _ = _batches(spark)
    roots = str(tmp_path / "idx"), str(tmp_path / "out")
    sink = minhash_dedup_sink(*roots, run_id="runA")
    sink(b1, 0)
    sink(b2, 1)
    with pytest.raises(RuntimeError, match="epoch regression"):
        sink(b1, 0)


def test_replay_detected_through_interleaved_commits(spark, tmp_path):
    """A compaction/manual commit landing between an epoch's commit and
    its replay must not defeat the head-snapshot check."""
    b1, b2, _ = _batches(spark)
    roots = str(tmp_path / "idx"), str(tmp_path / "out")
    sink = minhash_dedup_sink(*roots, run_id="runA")
    sink(b1, 0)
    sink(b2, 1)
    out = SnapshotTable(spark, roots[1])
    # interleaved non-stream commit (no epoch in summary) on BOTH tables
    out.commit(out.read().limit(0))
    idx = MinHashIndex(spark, roots[0])
    idx.table.commit(idx.signatures().limit(0))
    seqs = (idx.table.current_sequence(), out.current_sequence())
    rows = sorted(r.doc_id for r in out.read().collect())
    sink(b2, 1)  # replay: must still be recognized behind the interleave
    assert (MinHashIndex(spark, roots[0]).table.current_sequence(),
            out.current_sequence()) == seqs
    assert sorted(r.doc_id for r in out.read().collect()) == rows


def test_find_epoch_skips_expired_manifests(spark, tmp_path):
    """Maintenance expiry deletes old manifests; the replay scan must
    skip the holes instead of dying with FileNotFoundError on the first
    commit after an expire_snapshots run."""
    from pyspark.sql import functions as F

    from workbook_exporter_fe_spark.sources.snapshots import SnapshotTable
    from workbook_exporter_fe_spark.streaming.stream_minhash import (
        _find_epoch,
    )

    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    for i in range(5):
        t.commit(
            spark.range(i, i + 1).select(F.col("id")),
            summary={"writer": "x", "run": "r1", "epoch": i},
        )
    t.expire_snapshots(keep_last=1)
    assert _find_epoch(t, "r1", 4) == 5  # head still answers
    # a DIFFERENT run skips the head and must walk the expired holes
    assert _find_epoch(t, "r2", 0) is None
