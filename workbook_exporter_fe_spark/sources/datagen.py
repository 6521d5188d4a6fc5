"""Deterministic synthetic `sequences` generator (FIXTURES.md F1).

Schema (BASELINE.json ``input_hint``): ``doc_id:string, tokens:array<int>,
n_tok:int, source:string``. Everything derives from ``(seed, i)`` via
``xxhash64`` so the table is bit-reproducible at any scale and independent
of partitioning — this is the engine's stand-in for the reference's uploaded
workbook CSV (reference scan: /root/reference/workbook_exporter-fe.py:1703-1714),
re-shaped to the tokens payload.

Scale notes: generation is a single ``spark.range(n)`` (already partitioned,
no shuffle) followed by narrow projections — at 10^12 rows this parallelizes
perfectly. ``source`` is Zipf(s=1.2)-skewed over 64 values with src-00
carrying ~29% of rows, deliberately, to exercise salting/AQE skew handling
downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_SOURCES = 64
ZIPF_S = 1.2
VOCAB = 50257
MAX_LEN = 512


def _hash64(*cols) -> F.Column:
    """Non-negative 64-bit hash of the given columns (xxhash64, pmod 2^62)."""
    return F.pmod(F.xxhash64(*cols), F.lit(1 << 62))


def _zipf_cdf() -> list[float]:
    w = [1.0 / (z + 1) ** ZIPF_S for z in range(N_SOURCES)]
    tot = sum(w)
    acc, cdf = 0.0, []
    for x in w:
        acc += x / tot
        cdf.append(acc)
    return cdf


def gen_sequences(
    spark: SparkSession, n: int, seed: int = 42, num_partitions: int | None = None
) -> DataFrame:
    """Deterministic sequences table: (doc_id, tokens, n_tok, source)."""
    df = spark.range(0, n, 1, num_partitions or spark.sparkContext.defaultParallelism)
    seed_c = F.lit(seed)

    length = (F.lit(1) + _hash64(seed_c, F.col("id"), F.lit("len")) % MAX_LEN).cast("int")
    # tokens[j] = hash64(seed, i, j) mod VOCAB — pure expression, no Python.
    tokens = F.transform(
        F.sequence(F.lit(0), length - 1),
        lambda j: (_hash64(seed_c, F.col("id"), j) % VOCAB).cast("int"),
    )

    # Zipf source pick: u in [0,1) from the hash, z = #cdf-entries ≤ u.
    # A chained CASE/WHEN over the 64 cdf boundaries, NOT a filter() HOF
    # over a literal array: higher-order functions are CodegenFallback,
    # and ONE of them in this projection forced the whole generator row
    # into interpreted evaluation — measured ~65 µs/row on the 750M-event
    # corpus build (tens of minutes per pass) vs codegen'd compares. Same
    # z for every u including exact boundary hits (u == cdf[j] ⇒ j+1 both
    # ways: count(c ≤ u) = first index with cdf[i] > u).
    cdf = _zipf_cdf()
    u = (_hash64(seed_c, F.col("id"), F.lit("src")) % 1_000_000_007) / 1_000_000_007.0
    z = F.lit(len(cdf))
    for j in range(len(cdf) - 1, -1, -1):
        z = F.when(u < cdf[j], F.lit(j)).otherwise(z)
    source = F.format_string("src-%02d", z)

    # n_tok == size(tokens) by construction (invariant, BASELINE.json:15);
    # reuse `length` instead of size(tokens) to avoid materializing the
    # 512-hash array expression twice.
    return df.select(
        F.format_string("doc-%012d", F.col("id")).alias("doc_id"),
        tokens.alias("tokens"),
        length.alias("n_tok"),
        source.alias("source"),
    )


def write_sequences(df: DataFrame, path: str, range_partitions: int | None = None) -> None:
    """Land the sequences table: range-partitioned by (source, doc_id).

    Measured on the 250M-event bench corpus (BENCH/BASELINE.md): plain
    ``partitionBy(source)`` writes ONE file per source, so scan parallelism
    is bounded by 128MB row groups inside the Zipf-hot source;
    round-robin ``repartition(n)`` balances files but destroys (source,
    time) locality and degenerates downstream partial aggregation (5-10×
    slower). ``repartitionByRange(source, doc_id)`` gives both: files sized
    ∝ data with contiguous per-source slices. At 10^12 scale add hidden
    bucketing on hash(doc_id) via Iceberg instead.
    """
    n = range_partitions or max(df.sparkSession.sparkContext.defaultParallelism * 4, 8)
    (
        df.repartitionByRange(n, "source", "doc_id")
        .write.mode("overwrite")
        .option("parquet.block.size", 16 * 1024 * 1024)
        .parquet(path)
    )
