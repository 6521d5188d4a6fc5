#!/usr/bin/env python
"""Measured claim: an inverted-index BM25 point query costs the query
terms' postings, not the corpus.

Protocol: 200k docs of the dedup bench corpus (tokens rendered as
whitespace text), one-time index build (bucket(64; word) + word blooms
over a postings SnapshotTable), then the SAME 3-term query measured
full-scan (operators/relevance.bm25 over the doc relation) vs indexed
(operators/invindex.InvertedIndex.query), with the manifest-pruning
ratio recorded. Results are asserted equal in-run.

Prints one JSON line and (with --splice) rewrites the owned section of
BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MARKER = "## Inverted-index BM25: point-query cost vs full scan (measured)"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", default="/tmp/spark_graft_bench/seq_dedup_1m")
    ap.add_argument("--docs", type=int, default=200_000)
    ap.add_argument("--root", default="/tmp/spark_graft_bench/invindex")
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--splice", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from workbook_exporter_fe_spark.operators.invindex import InvertedIndex
    from workbook_exporter_fe_spark.operators.relevance import bm25
    from workbook_exporter_fe_spark.session import get_spark

    spark = get_spark(app_name="bench_invindex", cores=16,
                      shuffle_partitions=32)
    docs = (
        spark.read.parquet(args.corpus)
        .limit(args.docs)
        .select(
            "doc_id",
            F.array_join(
                F.transform("tokens", lambda x: x.cast("string")), " "
            ).alias("text"),
        )
        .localCheckpoint()  # freeze the doc set: both paths see one input
    )
    terms = ["42299", "1234", "50000"]

    shutil.rmtree(args.root, ignore_errors=True)
    ix = InvertedIndex(spark, args.root, n_buckets=args.buckets)
    t0 = time.perf_counter()
    ix.add_batch(docs)
    w_build = time.perf_counter() - t0

    def wall(fn) -> float:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return best

    full = bm25(docs, terms).orderBy(F.col("score").desc(), "doc_id")
    w_full = wall(lambda: full.limit(10).collect())
    w_index = wall(lambda: ix.query(terms, k=10).collect())
    stats = ix.pruning_stats(terms)

    # correctness: identical top-10 (score-rounded, same tie order)
    want = [(r.doc_id, r.score) for r in full.limit(10).collect()]
    got = [(r.doc_id, r.score) for r in ix.query(terms, k=10).collect()]
    assert [d for d, _ in want] == [d for d, _ in got], (want, got)
    assert all(abs(a[1] - b[1]) < 2e-6 for a, b in zip(want, got))

    postings = ix.table.snapshot()["total_rows"]
    out = {
        "job": "invindex", "docs": args.docs, "postings": postings,
        "build_s": round(w_build, 2),
        "query_full_scan_s": round(w_full, 2),
        "query_indexed_s": round(w_index, 2),
        **stats,
    }
    print(json.dumps(out))

    if args.splice:
        from scripts.bench_scaling import _splice_section

        section = f"""{MARKER}

Setup: {args.docs:,} docs ({postings:,} posting rows) indexed once into
a bucket({args.buckets}; word)-partitioned postings SnapshotTable with
manifest word blooms (operators/invindex.py — build {round(w_build, 1)}s,
a one-time corpus-scale explode+groupBy). The same 3-term BM25 query,
best of 3:

| path | wall (s) | files opened |
|---|---|---|
| full-scan relevance.bm25 over the doc relation | {round(w_full, 2)} | all |
| InvertedIndex.query (manifest-pruned postings) | {round(w_index, 2)} | {stats['files_opened']} of {stats['files_total']} |

Top-10 results are asserted identical in-run. The indexed query opened
{stats['files_opened']}/{stats['files_total']} posting files — bucket
pruning puts each term in one bucket, blooms drop the bucket's files
that don't contain it — and its wall is dominated by fixed scheduling,
not data. The full scan re-reads and re-tokenizes every document per
query. At 100 TB the gap IS the design: query cost tracks the query
terms' postings (kilobytes-to-megabytes) while the full scan tracks the
corpus; repeated curation probes (decontam phrase checks, seed-term
slicing) become point lookups. Ingestion stays one measured
bigram-shaped batch job; doc ids must be unique across batches (same
contract as the dedup indexes).
"""
        _splice_section(MARKER, section)

    spark.stop()


if __name__ == "__main__":
    main()
