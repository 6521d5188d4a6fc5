"""Streaming near-duplicate dedup: MinHashIndex over a document stream.

The continuous-ingestion form of the batch MinHash/LSH dedup family
(operators/dedup.py): a Structured Streaming query whose every
micro-batch is signed, paired against the PERSISTED signature index, and
reduced to its surviving documents — the 100 TB corpus is never re-read,
each batch touches only the (band, sig) signature relation (~n_bands
rows/doc) plus its own rows.

Exactly-once across replays (Spark re-runs a micro-batch after any
failure between sink start and checkpoint commit) is done with the same
epoch-in-summary protocol as the snapshot_log stream writer
(sources/snapshot_source.py): both the signature index and the survivors
table record the micro-batch's epoch id in their snapshot summary, and
the sink distinguishes the three replay states:

- survivors table already has the epoch → the batch fully applied; skip.
- index has the epoch but survivors doesn't (crash between the two
  commits) → recompute the batch's pairs against the index AS OF the
  sequence BEFORE the batch's own signature commit (time travel), then
  commit survivors only. Signing is deterministic, so the rebuilt pairs
  equal the lost ones.
- neither has it → the normal path: pair, commit signatures, commit
  survivors.

Batch equivalence contract: the union of every micro-batch's pairs
equals the full-corpus LSH pairs, and the surviving set is what
incremental_keep produces batch-by-batch (first-seen canonical wins
across batches; min-id canonical within a batch) — pinned in
tests/test_stream_minhash.py against the batch operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_REPLAY_SCAN = 64  # Spark replays the LAST epoch; 64 snapshots is generous


def _find_epoch(table, run_id: str | None, epoch_id: int,
                scan: int = _REPLAY_SCAN) -> int | None:
    """Sequence of the recent snapshot recording this (run, epoch), else
    None. Scans back ``scan`` manifests instead of only the head so
    interleaved non-stream commits (compaction, manual appends) can't
    hide an epoch. Manifests from OTHER runs are skipped, so a fresh
    stream (new checkpoint → epochs restart at 0, new run id) against an
    existing table processes every batch instead of silently dropping
    them; an epoch REGRESSION within the same run (checkpoint deleted
    but the same checkpoint dir reused against grown tables) raises
    instead of losing data. Pre-protocol manifests (no 'run' key) fall
    back to single-writer semantics: epoch >= means committed.
    """
    head = table.current_sequence()
    for seq in range(head, max(0, head - scan), -1):
        try:
            s = table.snapshot(seq)["summary"]
        except FileNotFoundError:
            continue  # expired by maintenance: carries no information
        if "epoch" not in s:
            continue  # interleaved non-stream commit
        run, e = s.get("run"), int(s["epoch"])
        if run is not None and run != run_id:
            continue  # another stream's commit
        if e == epoch_id:
            return seq
        if e > epoch_id:
            if run is None:
                return seq  # legacy manifest: old single-writer contract
            raise RuntimeError(
                f"epoch regression: table {table.root!r} already has "
                f"epoch {e} from this run but Spark delivered epoch "
                f"{epoch_id} — the checkpoint was reset against existing "
                "state; use a fresh checkpoint dir (new run) or fresh "
                "tables"
            )
        return None  # most recent same-run epoch is OLDER: not committed
    return None


def minhash_dedup_sink(
    index_root: str,
    survivors_root: str,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    n_bands: int = 4,
    k: int = 3,
    hash_fn: str = "md5",
    run_id: str | None = None,
):
    """foreachBatch function applying one micro-batch of documents to the
    signature index + survivors SnapshotTable (replay-safe, see module
    docstring). Exposed separately so the replay states are directly
    testable; `stream_minhash_dedup` wires it to a streaming query.

    ``run_id`` identifies the logical stream across query restarts
    (stream_minhash_dedup derives it from the checkpoint location);
    replay detection matches the (run, epoch) pair, not the bare epoch,
    so a NEW stream whose epochs restart at 0 never skips batches
    against tables an old stream populated."""
    from workbook_exporter_fe_spark.operators.dedup import (
        MinHashIndex,
        incremental_keep,
    )
    from workbook_exporter_fe_spark.sources.snapshots import SnapshotTable

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        idx = MinHashIndex(
            spark, index_root, n_bands=n_bands, k=k, hash_fn=hash_fn
        )
        out = SnapshotTable(spark, survivors_root)
        if _find_epoch(out, run_id, epoch_id) is not None:
            return  # replayed epoch, fully applied
        sig_seq = _find_epoch(idx.table, run_id, epoch_id)
        if sig_seq is not None:
            # crashed between the two commits: the batch's signatures are
            # at sig_seq — pair against the state just before them
            sigs = idx.sign(batch_df, tokens_col=tokens_col, id_col=id_col)
            old = idx.signatures(sig_seq - 1)
            pairs = idx.pairs_against(sigs, old)
        else:
            pairs = idx.add_batch(
                batch_df, tokens_col=tokens_col, id_col=id_col,
                extra_summary={"epoch": int(epoch_id), "run": run_id},
            )
        kept = incremental_keep(batch_df, pairs, id_col=id_col)
        out.commit(kept, summary={"epoch": int(epoch_id), "run": run_id})

    return sink


def stream_minhash_dedup(
    docs: DataFrame,
    index_root: str,
    survivors_root: str,
    checkpoint_dir: str,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    n_bands: int = 4,
    k: int = 3,
    hash_fn: str = "md5",
    available_now: bool = True,
):
    """Start the streaming dedup query over a document stream.

    ``docs`` is any streaming DataFrame carrying (id_col, tokens_col);
    survivors accumulate in a SnapshotTable at ``survivors_root`` (one
    snapshot per micro-batch, epoch-tagged), signatures in a
    MinHashIndex at ``index_root``. ``available_now=True`` drains what
    exists and stops (backfill); False runs continuously.

    The run identity is the checkpoint location — constant across
    restarts of the same query (so replays are recognized), distinct for
    a fresh checkpoint (so a new stream never skips epochs a previous
    stream already used)."""
    import hashlib
    import os

    run_id = hashlib.md5(
        os.path.abspath(checkpoint_dir).encode()
    ).hexdigest()[:16]
    sink = minhash_dedup_sink(
        index_root, survivors_root, tokens_col=tokens_col, id_col=id_col,
        n_bands=n_bands, k=k, hash_fn=hash_fn, run_id=run_id,
    )
    writer = docs.writeStream.outputMode("update").option(
        "checkpointLocation", checkpoint_dir
    ).foreachBatch(sink)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
