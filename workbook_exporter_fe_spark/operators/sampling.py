"""Deterministic corpus sampling + sequence packing for training pipelines.

Two operators a 100 TB training-data pipeline needs between dedup and
writing shards:

- ``hash_sample``: deterministic hash-gated downsampling. The reference's
  only "sampling" is manual row selection in the uploaded workbook; at
  cluster scale RNG-based ``df.sample()`` is neither reproducible across
  reruns nor stable under repartitioning, so the gate is a pure function
  of the row key: keep iff the first 16 bits of ``md5(key)`` fall below
  ``rate * 2^16``. Same rows survive on any cluster size, any partition
  layout, any engine with md5 — which also makes it DuckDB-oracle-checkable.
- ``pack_greedy``: GPT-style sequence packing — concatenate documents in a
  stable per-source order and chunk the concatenation into fixed-capacity
  training examples; each doc gets (pack_id, pack_offset) from a running
  sum. One window scan per source, no shuffle beyond the per-source
  partition, and the assignment is again an exact integer function of the
  data (oracle-checkable).

Scale notes: ``hash_sample`` is a map-side filter — it pushes to the scan
and costs zero shuffles. ``pack_greedy``'s window partitions by ``source``;
for a Zipf-hot source at 10^12 rows, split the window key into
(source, shard = hash(doc_id) % N) and pack within shards — packing only
needs *some* stable grouping, not a single global order per source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def hash_sample(
    df: DataFrame, rate: float, key_col: str = "doc_id"
) -> DataFrame:
    """Deterministic sample: keep iff first-16-bits(md5(key)) < rate * 2^16."""
    gate = F.conv(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 4), 16, 10
    ).cast("long")
    return df.filter(gate < int(rate * 65536))


def pack_greedy(
    df: DataFrame,
    capacity: int,
    weight_col: str = "n_tok",
    key_col: str = "doc_id",
    part_col: str = "source",
) -> DataFrame:
    """Assign (pack_id, pack_offset) by chunking the per-source running sum.

    Documents are laid head-to-tail in ``key_col`` order; a document's pack
    is the capacity-chunk its *first* token lands in (docs longer than
    ``capacity`` span packs, exactly like pretraining-corpus chunking).
    """
    w = (
        Window.partitionBy(part_col)
        .orderBy(key_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = (F.sum(F.col(weight_col)).over(w) - F.col(weight_col)).cast("long")
    # exact int64 division (`div`), NOT float `/` + floor: past 2^53 total
    # tokens per source a double division rounds and pack boundaries drift
    # off-by-one — at 10^12-row scale that is a real running-sum magnitude.
    return df.select(
        F.col(part_col),
        F.col(key_col),
        F.col(weight_col),
        start.alias("_start"),
    ).select(
        part_col,
        key_col,
        weight_col,
        F.expr(f"_start div {int(capacity)}").alias("pack_id"),
        (F.col("_start") % capacity).alias("pack_offset"),
    )


def hash_split(
    df: DataFrame,
    weights: dict[str, float],
    key_col: str = "doc_id",
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment from the same md5 gate as
    ``hash_sample``: each row's 16-bit key hash falls into one of the
    cumulative weight ranges. Assignment is a pure function of the key —
    stable across cluster sizes, reruns, and engines — and filtering one
    split later is the same map-side gate (no materialized split tables
    needed, though writing partitioned-by-split is one `partitionBy` away).
    """
    if abs(sum(weights.values()) - 1.0) > 1e-9:
        raise ValueError("split weights must sum to 1")
    gate = F.conv(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 4), 16, 10
    ).cast("long")
    acc = 0.0
    expr = None
    items = list(weights.items())
    for name, w in items[:-1]:
        acc += w
        cond = gate < int(acc * 65536)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, expr)
