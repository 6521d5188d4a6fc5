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


def _last_epoch(table) -> int:
    """Epoch recorded in the table's latest snapshot summary (-1 if the
    table is empty or its head predates the epoch protocol)."""
    if table.current_sequence() == 0:
        return -1
    return int(table.snapshot()["summary"].get("epoch", -1))


def minhash_dedup_sink(
    index_root: str,
    survivors_root: str,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    n_bands: int = 4,
    k: int = 3,
    hash_fn: str = "md5",
):
    """foreachBatch function applying one micro-batch of documents to the
    signature index + survivors SnapshotTable (replay-safe, see module
    docstring). Exposed separately so the replay states are directly
    testable; `stream_minhash_dedup` wires it to a streaming query."""
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
        if _last_epoch(out) >= epoch_id:
            return  # replayed epoch, fully applied
        if _last_epoch(idx.table) >= epoch_id:
            # crashed between the two commits: the index head IS this
            # batch's signatures — pair against the state before it
            sigs = idx.sign(batch_df, tokens_col=tokens_col, id_col=id_col)
            old = idx.signatures(idx.table.current_sequence() - 1)
            pairs = idx.pairs_against(sigs, old)
        else:
            pairs = idx.add_batch(
                batch_df, tokens_col=tokens_col, id_col=id_col,
                extra_summary={"epoch": int(epoch_id)},
            )
        kept = incremental_keep(batch_df, pairs, id_col=id_col)
        out.commit(kept, summary={"epoch": int(epoch_id)})

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
    exists and stops (backfill); False runs continuously."""
    sink = minhash_dedup_sink(
        index_root, survivors_root, tokens_col=tokens_col, id_col=id_col,
        n_bands=n_bands, k=k, hash_fn=hash_fn,
    )
    writer = docs.writeStream.outputMode("update").option(
        "checkpointLocation", checkpoint_dir
    ).foreachBatch(sink)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
