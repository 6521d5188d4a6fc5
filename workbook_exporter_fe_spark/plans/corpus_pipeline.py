"""End-to-end corpus curation: the LLM-training-data user story.

Chains the engine's training-data operators into the standard curation
pipeline a user of the reference's domain (bulk config/text mapping,
reference workbook_exporter-fe.py:1622-1687's scan→filter→derive→merge
chain) runs at corpus scale:

    annotate (lang-ID + quality, one map-side pass)
      → exact dedup (content-hash groups, keep min doc_id)
      → quality/lang filter (map-side)
      → deterministic hash sample (map-side gate)
      → train/val/test hash split (map-side)
      → bounded-size shard export (maxRecordsPerFile roll)

Everything before the final write is either a pure projection/filter or
ONE content-hash shuffle (the dedup groupBy) — the pipeline's cost at
100 TB is the scan plus a single exchange over (hash, id) pairs, and the
stage metrics come from one count per stage boundary (each a cheap
aggregate over the already-built lineage, cached once).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from workbook_exporter_fe_spark.functions.textops import lang_id, quality_features
from workbook_exporter_fe_spark.operators.sampling import hash_sample, hash_split
from workbook_exporter_fe_spark.sources.tableio import write_shards


def annotate_documents(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Add lang_pred + quality signal columns (no shuffle, scan-stage)."""
    t = F.col(text_col)
    feats = quality_features(t)
    out = docs.withColumn("lang_pred", lang_id(t))
    for name, col in feats.items():
        out = out.withColumn(name, col)
    return out.withColumn("content_hash", F.md5(t))


def dedup_exact_keep_first(
    docs: DataFrame, id_col: str = "doc_id", hash_col: str = "content_hash"
) -> DataFrame:
    """Keep one row per distinct content (min id wins — deterministic).

    One shuffle keyed by the content hash; the winners relation is
    distinct-content-sized and rejoins on (hash, id) so no row data rides
    the dedup exchange, only (hash, id) pairs."""
    winners = docs.groupBy(hash_col).agg(F.min(id_col).alias(id_col))
    return docs.join(winners, [hash_col, id_col], "leftsemi")


def curate_corpus(
    docs: DataFrame,
    out_dir: str | None = None,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    langs: tuple[str, ...] | None = None,
    quality_min: float = 0.0,
    sample_rate: float = 1.0,
    splits: dict[str, float] | None = None,
    max_records_per_file: int = 100_000,
) -> tuple[DataFrame, dict]:
    """Run the curation chain; returns (final DataFrame, stage metrics).

    With ``out_dir`` set, also exports hive-partitioned (split=...) parquet
    shards with bounded row counts. All gates are pure functions of the
    data (md5-based), so the same corpus curates identically on any
    cluster size, partition layout, or rerun — the property that makes the
    pipeline resumable and its outputs diffable."""
    splits = splits or {"train": 0.9, "val": 0.05, "test": 0.05}
    metrics: dict = {"input_rows": docs.count()}

    ann = annotate_documents(docs, text_col)
    deduped = dedup_exact_keep_first(ann, id_col)
    metrics["after_dedup"] = deduped.count()
    metrics["dup_rows_removed"] = metrics["input_rows"] - metrics["after_dedup"]

    kept = deduped
    if langs is not None:
        kept = kept.filter(F.col("lang_pred").isin(list(langs)))
    if quality_min > 0.0:
        kept = kept.filter(F.col("quality_score") >= quality_min)
    metrics["after_filter"] = kept.count()

    if sample_rate < 1.0:
        kept = hash_sample(kept, sample_rate, key_col=id_col)
        metrics["after_sample"] = kept.count()
    else:
        metrics["after_sample"] = metrics["after_filter"]

    final = hash_split(kept, splits, key_col=id_col)
    metrics["split_rows"] = {
        r["split"]: r["n"]
        for r in final.groupBy("split").agg(F.count("*").alias("n")).collect()
    }

    if out_dir is not None:
        write_shards(
            final,
            out_dir,
            max_records_per_file=max_records_per_file,
            partition_by=["split"],
            sort_within=[id_col],
        )
        metrics["out_dir"] = out_dir
    return final, metrics
