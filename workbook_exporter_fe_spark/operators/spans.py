"""Cross-document repeated-span detection + removal (exact substring dedup).

MinHash/Jaccard/SimHash (operators/dedup.py) treat the DOCUMENT as the
dedup unit; training corpora also need SPAN-level exact dedup — boiler-
plate, licenses, templated headers repeated verbatim across otherwise
distinct documents (the ExactSubstr pass of Lee et al., "Deduplicating
Training Data Makes Language Models Better", ACL 2022 — implemented
there with a suffix array on one machine). The Spark-native
re-expression works at n-gram granularity:

1. every document emits one fingerprint per position — the hash of the
   n-token window starting there (positions via ``sequence``, window
   hashes via a ``transform`` lambda over the slice: per-ROW higher-order
   functions, no n× row blow-up before the explode);
2. fingerprints occurring in ≥ ``min_count`` positions corpus-wide are
   "hot" (one partial-agg groupBy over (hash) — map-side combine does
   the heavy lifting since repeated spans are, by definition, repeated);
3. hot positions join back (broadcast when the hot set is small, the
   common case) and overlapping/adjacent windows merge into MAXIMAL
   spans per document with the classic island window: a running max of
   span ends over a bounded ASC frame — O(n log n) per doc, never an
   unbounded-FOLLOWING frame;
4. ``remove_repeated_spans`` rebuilds the token array dropping covered
   positions (zip_with index + filter HOF — per row, no shuffle), with
   ``keep_first`` retaining one canonical occurrence per fingerprint
   (the corpus keeps ONE copy of the boilerplate, not zero).

Scale shape: the only all-data shuffle is the fingerprint groupBy
(int64 keys, partial-agg); the join back is hot-set-sized and the span
algebra is per-document windows — the same recipe that held 0.94+
scaling for the n-gram/bigram jobs in BENCH/BASELINE.md.

Hashing: ``hash_fn='native'`` (default) fingerprints with xxhash64 over
the token-window array — zero string churn, the production mode (CLAUDE
perf rule: hash primitives, not strings). 64-bit collisions can only
FLAG an extra span, never corrupt surviving tokens, and at corpus sizes
where ~2^32 distinct windows make collisions likely the span list is
advisory anyway. ``hash_fn='md5'`` builds the join key as
md5(concat_ws) for cross-engine oracle checks (DuckDB replicates it
bit-for-bit in tests)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def _window_hash(tokens: Column, pos: Column, n: int, hash_fn: str) -> Column:
    sl = F.slice(tokens, pos + 1, n)
    if hash_fn == "native":
        return F.xxhash64(sl)
    if hash_fn == "md5":
        return F.md5(
            F.concat_ws("_", F.transform(sl, lambda t: t.cast("string")))
        )
    raise ValueError(hash_fn)


def position_fingerprints(
    docs: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    hash_fn: str = "native",
) -> DataFrame:
    """(id, pos, fp): one fingerprint per n-token window start position.

    Documents shorter than ``n`` emit nothing (no window fits)."""
    positions = F.sequence(
        F.lit(0), F.size(F.col(tokens_col)) - F.lit(n)
    )
    fps = F.transform(
        positions,
        lambda p: _window_hash(F.col(tokens_col), p, n, hash_fn),
    )
    return (
        docs.filter(F.size(F.col(tokens_col)) >= n)
        .select(F.col(id_col).alias("id"), F.posexplode(fps).alias("pos", "fp"))
    )


def repeated_spans(
    docs: DataFrame,
    n: int = 8,
    min_count: int = 2,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    hash_fn: str = "native",
    broadcast_hot: bool = True,
) -> DataFrame:
    """(id, span_start, span_end, n_windows): maximal merged spans whose
    every covering n-gram window occurs ≥ ``min_count`` times corpus-wide.

    ``span_end`` is INCLUSIVE token position; a single hot window yields
    span ``[pos, pos+n-1]``; overlapping/adjacent hot windows merge.
    ``broadcast_hot=False`` for pathological corpora where the hot
    fingerprint set itself is huge (near-total duplication) — falls back
    to a shuffled join."""
    fps = position_fingerprints(docs, n, id_col, tokens_col, hash_fn)
    hot = (
        fps.groupBy("fp")
        .agg(F.count("*").alias("_df"))
        .filter(F.col("_df") >= min_count)
        .select("fp")
    )
    if broadcast_hot:
        hot = F.broadcast(hot)
    hits = fps.join(hot, "fp").select(
        "id",
        F.col("pos").alias("start"),
        (F.col("pos") + F.lit(n - 1)).alias("end"),
    )
    w = Window.partitionBy("id").orderBy("start")
    prev_max_end = F.max("end").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    # new island when this window starts beyond everything seen so far
    # (end+1 = adjacent windows also merge: contiguous coverage)
    flagged = hits.withColumn(
        "_new",
        F.when(
            prev_max_end.isNull() | (F.col("start") > prev_max_end + 1),
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn(
        "island",
        F.sum("_new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        flagged.groupBy("id", "island")
        .agg(
            F.min("start").alias("span_start"),
            F.max("end").alias("span_end"),
            F.count("*").alias("n_windows"),
        )
        .select(
            F.col("id").alias(id_col),
            "span_start",
            "span_end",
            "n_windows",
        )
    )


def remove_repeated_spans(
    docs: DataFrame,
    n: int = 8,
    min_count: int = 2,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    hash_fn: str = "native",
    keep_first: bool = True,
) -> DataFrame:
    """Documents with span-covered token positions removed.

    Adds ``<tokens_col>_clean`` plus ``n_removed``. ``keep_first=True``
    retains the occurrence at the corpus-wide minimum (id, pos) per
    fingerprint — every repeated passage survives EXACTLY once (Lee et
    al.'s keep-one policy); ``False`` strips all occurrences."""
    fps = position_fingerprints(docs, n, id_col, tokens_col, hash_fn)
    counted = fps.groupBy("fp").agg(
        F.count("*").alias("_df"),
        F.min(F.struct("id", "pos")).alias("_first"),
    )
    hot = counted.filter(F.col("_df") >= min_count).select("fp", "_first")
    hits = fps.join(F.broadcast(hot), "fp")
    if keep_first:
        hits = hits.filter(
            ~(
                (F.col("id") == F.col("_first.id"))
                & (F.col("pos") == F.col("_first.pos"))
            )
        )
    spans = (
        hits.select(
            "id",
            F.col("pos").alias("start"),
            (F.col("pos") + F.lit(n - 1)).alias("end"),
        )
        .groupBy("id")
        .agg(
            F.collect_list(F.struct("start", "end")).alias("_spans"),
        )
        .withColumnRenamed("id", "_span_id")
    )
    covered = lambda i: F.exists(  # noqa: E731
        F.col("_spans"),
        lambda sp: (i >= sp["start"]) & (i <= sp["end"]),
    )
    idx = F.sequence(F.lit(0), F.size(F.col(tokens_col)) - 1)
    cleaned = (
        docs.join(spans, F.col(id_col) == F.col("_span_id"), "left")
        .drop("_span_id")
        .withColumn(
            f"{tokens_col}_clean",
            F.when(F.col("_spans").isNull(), F.col(tokens_col)).otherwise(
                F.filter(
                    F.zip_with(
                        F.col(tokens_col),
                        idx,
                        lambda t, i: F.struct(
                            t.alias("t"), i.alias("i")
                        ),
                    ),
                    lambda x: ~covered(x["i"]),
                ).getField("t")
            ),
        )
        .withColumn(
            "n_removed",
            F.size(F.col(tokens_col)) - F.size(F.col(f"{tokens_col}_clean")),
        )
        .drop("_spans")
    )
    return cleaned
