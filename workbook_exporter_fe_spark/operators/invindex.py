"""Persisted inverted (posting-list) index: query-time BM25 retrieval
that opens only the query terms' files, never the corpus.

`operators/relevance.bm25` is the full-scan form: every query reads the
whole doc relation (fine inside a curation pass that is scanning anyway).
This module is the SERVING form a training-data pipeline needs for
repeated point queries — "which docs mention these benchmark phrases",
"pull the top-k docs for this seed term" — where re-scanning 100 TB per
query is absurd. It is deliberately a COMPOSITION of the engine's own
table-format features rather than a new storage format:

- postings ``(word, doc_id, tf, dl)`` live in a SnapshotTable whose
  hidden partitioning is ``bucket(N; word)`` (sources/partitioning.py):
  a term's postings land in exactly one bucket, so a query prunes to
  1/N of the files from the MANIFEST alone;
- manifest blooms on ``word`` (``bloom.columns``) prune within the
  bucket: only files that can contain the term are opened — across
  many incremental batches most bucket files don't have it;
- corpus constants (doc count, total token count) ride the commit
  summary as RUNNING totals, so BM25's n/avgdl are a metadata read;
- document frequency needs no separate store: each posting row is one
  (word, doc) pair, so df(term) = COUNT(*) of the term's own pruned
  postings — the only data touched is what scoring needs anyway.

Query cost is therefore O(postings of the query terms) at any corpus
size — the inverted-index contract — while ingestion stays one
corpus-scale explode+groupBy per batch (the measured bigram shape).
Results are pinned equal to the full-scan ``relevance.bm25`` in
tests/test_invindex.py.

Same incremental contract as the dedup indexes (operators/dedup.py
MinHashIndex): doc ids must be unique across batches — re-ingesting a
doc would double its postings (use dedup/incremental_keep upstream).

Reference parity: the reference has no retrieval at all (it renders
YAML); this serves the engine's corpus-curation side (SURVEY §2's
LLM-data operators), e.g. decontam probe queries without full scans.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

_POSTING_SCHEMA = "word string, doc_id string, tf long, dl long"


class InvertedIndex:
    """Bucket-partitioned, bloom-pruned posting index over a SnapshotTable."""

    def __init__(self, spark, root: str, n_buckets: int = 64):
        from workbook_exporter_fe_spark.sources.snapshots import SnapshotTable

        self.spark = spark
        self.table = SnapshotTable(spark, root)
        if self.table.current_sequence() == 0:
            self.table.set_properties(**{
                "partition.spec": [f"bucket({n_buckets},word)"],
                "bloom.columns": ["word"],
            })
        else:
            spec = self.table.properties().get("partition.spec") or []
            if spec != [f"bucket({n_buckets},word)"]:
                raise ValueError(
                    f"index at {root!r} was built with partition spec "
                    f"{spec}, not bucket({n_buckets},word)"
                )

    # ----------------------------------------------------------- ingestion
    def add_batch(
        self, docs: DataFrame, text_col: str = "text",
        id_col: str = "doc_id",
    ) -> int:
        """Index one batch: one explode+groupBy builds the batch's
        postings (map-side combined), the bucket writer distributes them
        by word hash, and the commit summary carries RUNNING corpus
        totals so query-time constants never need a scan."""
        postings = (
            docs.select(
                F.col(id_col).cast("string").alias("doc_id"),
                F.split(F.col(text_col), " ").alias("toks"),
            )
            .select(
                "doc_id",
                F.size("toks").alias("dl"),
                F.explode("toks").alias("word"),
            )
            .groupBy("word", "doc_id", "dl")
            .agg(F.count(F.lit(1)).alias("tf"))
            .select("word", "doc_id", "tf", "dl")
        )
        n, sum_dl = docs.select(
            F.count(F.lit(1)),
            F.sum(F.size(F.split(F.col(text_col), " "))),
        ).first()
        prev_n, prev_dl = self._totals()
        return self.table.commit(postings, summary={
            "n_docs_total": int(prev_n + n),
            "sum_dl_total": int(prev_dl + (sum_dl or 0)),
        })

    def _totals(self) -> tuple:
        if self.table.current_sequence() == 0:
            return 0, 0
        s = self.table.snapshot()["summary"]
        return int(s.get("n_docs_total") or 0), int(s.get("sum_dl_total") or 0)

    # -------------------------------------------------------------- queries
    def _pruned_postings(self, terms: list[str]) -> tuple:
        """(postings DataFrame limited to files that can contain a query
        term, files opened, files total) — bucket partition pruning plus
        manifest blooms, straight from the table's own scan_files."""
        m = self.table.snapshot()
        total = len(m["files"])
        paths: set[str] = set()
        for t in terms:
            surv, _ = self.table.scan_files(col_eq={"word": t})
            paths.update(surv)
        pruned = self.table._read_paths(m, sorted(paths))
        return (
            pruned.filter(F.col("word").isin(list(terms))),
            len(paths),
            total,
        )

    def query(
        self, terms: list[str], k: int = 10,
        k1: float = 1.2, b: float = 0.75,
    ) -> DataFrame:
        """Top-k (doc_id, score) by Okapi BM25 (same formula/rounding as
        relevance.bm25 — pinned equal in tests). Touches ONLY the pruned
        postings of the query terms; n/avgdl come from the summary."""
        n_docs, sum_dl = self._totals()
        if n_docs == 0:
            return self.spark.createDataFrame([], "doc_id string, score double")
        avgdl = sum_dl / n_docs
        hits, _, _ = self._pruned_postings(terms)
        df_rel = hits.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
        idf = F.log(
            (F.lit(float(n_docs)) - F.col("df") + 0.5)
            / (F.col("df") + 0.5) + 1.0
        )
        denom = F.col("tf") + k1 * (
            1.0 - b + b * F.col("dl") / F.lit(float(avgdl))
        )
        contrib = idf * (F.col("tf") * (k1 + 1.0)) / denom
        return (
            hits.join(F.broadcast(df_rel), "word")
            .groupBy("doc_id")
            .agg(F.round(F.sum(contrib), 6).alias("score"))
            .orderBy(F.col("score").desc(), "doc_id")
            .limit(k)
        )

    def pruning_stats(self, terms: list[str]) -> dict:
        """{files_opened, files_total} for a query — the evidence hook
        (tests assert opened ≪ total; bench records the ratio)."""
        _, opened, total = self._pruned_postings(terms)
        return {"files_opened": opened, "files_total": total}


def bm25_reference_score(
    tf: int, df: int, dl: int, n_docs: int, avgdl: float,
    k1: float = 1.2, b: float = 0.75,
) -> float:
    """Pure-python single-term BM25 contribution (test oracle)."""
    idf = math.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)
    return idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))
