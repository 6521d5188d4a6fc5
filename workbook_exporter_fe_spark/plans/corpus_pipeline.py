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
ONE content-hash shuffle (the dedup window) — the pipeline's cost at
100 TB is the scan plus a single exchange keyed by content hash. Stage
metrics are ``Observation`` rows collected DURING the one shard-write
action (CollectMetrics nodes in the write's own plan), so the whole
chain executes exactly one scan of the corpus — zero extra actions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from workbook_exporter_fe_spark.functions.textops import lang_id, quality_features
from workbook_exporter_fe_spark.operators.sampling import hash_sample, hash_split
from workbook_exporter_fe_spark.sources.tableio import write_shards


def save_tokenizer(art: dict, path: str) -> None:
    """Persist a trained tokenizer artifact as JSON: {"type": "bpe",
    "merges": [[a, b], ...]} or {"type": "unigram", "model":
    {piece: logprob}} — portable, diffable, re-loadable by
    :func:`load_tokenizer` / run_corpus --tokenizer-load."""
    import json

    out = dict(art)
    if art["type"] == "bpe":
        out["merges"] = [list(p) for p in art["merges"]]
    with open(path, "w") as f:
        json.dump(out, f)


def load_tokenizer(path: str) -> dict:
    import json

    with open(path) as f:
        art = json.load(f)
    if art.get("type") == "bpe":
        art["merges"] = [tuple(p) for p in art["merges"]]
    elif art.get("type") != "unigram":
        raise ValueError(f"unknown tokenizer artifact type in {path!r}")
    return art


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

    ONE shuffle keyed by the content hash and a LINEAR lineage: rank rows
    within each hash group and keep rank 1. The former groupBy-winners +
    leftsemi-rejoin formulation scanned the input twice (both sides of
    the self-join) and shuffled twice; the window form shuffles the same
    rows once and lets downstream observation metrics ride a single
    action (curate_corpus's one-scan contract)."""
    from pyspark.sql import Window

    w = Window.partitionBy(hash_col).orderBy(id_col)
    return (
        docs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


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
    mixture: dict[str, int] | None = None,
    mixture_epochs: bool = False,
    mixture_max_epochs: int = 64,
    mixture_token_col: str = "n_chars",
    mixture_source_col: str = "source",
    shuffle_seed: int | None = None,
    target_files: int | None = None,
    quality_model: dict | None = None,
    quality_p_min: float = 0.5,
    model_tokens_col: str | None = None,
    tokenize: str | None = None,
    tokenize_train_rate: float = 0.05,
    tokenize_min_count: int = 1,
    tokenize_top_k: int | None = None,
    tokenizer_save: str | None = None,
    tokenizer_load: str | None = None,
) -> tuple[DataFrame, dict]:
    """Run the curation chain; returns (final DataFrame, stage metrics).

    With ``out_dir`` set, also exports hive-partitioned (split=...) parquet
    shards with bounded row counts. All gates are pure functions of the
    data (md5-based), so the same corpus curates identically on any
    cluster size, partition layout, or rerun — the property that makes the
    pipeline resumable and its outputs diffable.

    Single-pass metrics: every stage boundary count is an ``Observation``
    (a CollectMetrics node in the lineage), all collected by ONE action —
    the shard write itself (or one count when ``out_dir`` is None). No
    per-stage .count() actions, no cache, no re-execution of the dedup
    shuffle (tests pin zero extra actions).

    Two optional stages extend the chain past the map-side gates:
    ``mixture`` (per-``mixture_source_col`` token budgets applied after
    the filters via :func:`mixture_sample` — adds the one per-source
    window exchange that an exact greedy fill requires;
    ``mixture_epochs=True`` switches to :func:`mixture_oversample`, so
    budgets above a source's corpus replay it across epochs and the
    shards gain a ``mix_epoch`` column) and
    ``shuffle_seed`` (+ ``target_files``: the shard export becomes the
    deterministic global shuffle instead of id-sorted shards).

    ``tokenize`` ("bpe:<n_merges>" | "unigram:<vocab_size>") appends a
    ``tokens_enc`` array column to the shards — the curation →
    tokenization → packed-shards hand-off in one pass. The tokenizer
    trains DRIVER-SIDE (operators/bpe.bpe_train_local /
    operators/unigram.unigram_train_local — the documented production
    path: the vocab fits the driver at any corpus size) on a
    ``tokenize_train_rate`` hash-sample of the RAW input (one word_freqs
    collect; training never re-executes the curation chain's dedup
    shuffle), and the encode rides the shard-write scan as one more
    Arrow kernel — still a single action, with the encoded token count
    joining the split observation. ``tokenize_min_count`` /
    ``tokenize_top_k`` bound the collected vocabulary distributed-side
    (word_freqs pushes the floor/cap before the collect — the guard for
    >1e9-type raw web corpora; SentencePiece's standard min-frequency
    recipe)."""
    from pyspark.sql import Observation

    splits = splits or {"train": 0.9, "val": 0.05, "test": 0.05}
    n = F.count(F.lit(1)).alias("rows")

    # unnamed observations get unique auto-names — curate_corpus may run
    # several times per session and named observations would cross-match
    obs_in, obs_dedup, obs_filter, obs_sample, obs_mix, obs_split = (
        Observation() for _ in range(6)
    )

    ann = annotate_documents(docs.observe(obs_in, n), text_col)
    deduped = dedup_exact_keep_first(ann, id_col).observe(obs_dedup, n)

    kept = deduped
    if langs is not None:
        kept = kept.filter(F.col("lang_pred").isin(list(langs)))
    if quality_min > 0.0:
        kept = kept.filter(F.col("quality_score") >= quality_min)
    if quality_model is not None:
        # trained-classifier gate (operators/classifier.py): one Arrow
        # margin kernel over the broadcast weights — rides the same scan
        # as the heuristic filters, counted in after_filter
        from workbook_exporter_fe_spark.operators.classifier import (
            lr_score,
            text_tokens,
        )

        src = model_tokens_col
        if src is None:  # raw-text corpus: derive the int tokens inline
            src = "__qtok"
            kept = kept.withColumn(src, text_tokens(F.col(text_col)))
        kept = lr_score(kept, quality_model, tokens_col=src).filter(
            F.col("quality_p") >= quality_p_min
        )
        if src == "__qtok":
            kept = kept.drop(src)
    kept = kept.observe(obs_filter, n)

    sampled = sample_rate < 1.0
    if sampled:
        kept = hash_sample(kept, sample_rate, key_col=id_col).observe(obs_sample, n)

    if mixture is not None:
        from workbook_exporter_fe_spark.operators.sampling import (
            mixture_oversample,
            mixture_sample,
        )

        extra = (
            {"max_epochs": mixture_max_epochs} if mixture_epochs else {}
        )
        fill = mixture_oversample if mixture_epochs else mixture_sample
        kept = fill(
            kept, mixture, token_col=mixture_token_col,
            source_col=mixture_source_col, key_col=id_col, **extra,
        ).observe(
            obs_mix, n, F.sum(mixture_token_col).alias("tokens")
        )

    tok_meta: dict = {}
    if tokenize is not None or tokenizer_load is not None:
        from workbook_exporter_fe_spark.operators.bpe import bpe_encode
        from workbook_exporter_fe_spark.operators.unigram import (
            unigram_encode,
        )

        if tokenizer_load is not None:
            art = load_tokenizer(tokenizer_load)
        else:
            kind, _, param = tokenize.partition(":")
            from workbook_exporter_fe_spark.operators.bpe import word_freqs

            train_src = (
                hash_sample(docs, tokenize_train_rate, key_col=id_col)
                if tokenize_train_rate < 1.0
                else docs
            )
            freqs = {
                r["word"]: r["freq"]
                for r in word_freqs(
                    train_src, text_col,
                    min_count=tokenize_min_count, top_k=tokenize_top_k,
                ).collect()
            }
            if kind == "bpe":
                from workbook_exporter_fe_spark.operators.bpe import (
                    bpe_train_local,
                )

                art = {
                    "type": "bpe",
                    "merges": bpe_train_local(
                        freqs, n_merges=int(param or 200)
                    ),
                }
            elif kind == "unigram":
                from workbook_exporter_fe_spark.operators.unigram import (
                    unigram_train_local,
                )

                art = {
                    "type": "unigram",
                    "model": unigram_train_local(
                        freqs, vocab_size=int(param or 300)
                    ),
                }
            else:
                raise ValueError(
                    f"unknown tokenizer {tokenize!r} (bpe:<n>|unigram:<n>)"
                )
            if tokenizer_save is not None:
                save_tokenizer(art, tokenizer_save)
                tok_meta["tokenizer_saved"] = tokenizer_save
        if art["type"] == "bpe":
            kept = bpe_encode(
                kept, art["merges"], text_col=text_col, out_col="tokens_enc"
            )
            tok_meta["tokenizer"] = f"bpe:{len(art['merges'])}"
        else:
            kept = unigram_encode(
                kept, art["model"], text_col=text_col, out_col="tokens_enc"
            )
            tok_meta["tokenizer"] = f"unigram:{len(art['model'])}"
        tokenize = tokenize or art["type"]  # drives the observe column

    final = hash_split(kept, splits, key_col=id_col).observe(
        obs_split,
        n,
        *[
            F.sum(F.when(F.col("split") == s, 1).otherwise(0)).alias(f"n_{s}")
            for s in splits
        ],
        *(
            [F.sum(F.size("tokens_enc")).alias("enc_tokens")]
            if tokenize is not None
            else []
        ),
    )

    if out_dir is not None:
        write_shards(
            final,
            out_dir,
            max_records_per_file=max_records_per_file,
            partition_by=["split"],
            sort_within=None if shuffle_seed is not None else [id_col],
            shuffle_seed=shuffle_seed,
            shuffle_key=id_col,
            target_files=target_files,
        )
    else:
        final.write.mode("overwrite").format("noop").save()

    split_obs = obs_split.get
    metrics: dict = {
        "input_rows": obs_in.get["rows"],
        "after_dedup": obs_dedup.get["rows"],
        "after_filter": obs_filter.get["rows"],
        "after_sample": obs_sample.get["rows"] if sampled else obs_filter.get["rows"],
        "split_rows": {
            s: split_obs[f"n_{s}"]
            for s in splits
            if (split_obs[f"n_{s}"] or 0) > 0
        },
    }
    if mixture is not None:
        metrics["after_mixture"] = obs_mix.get["rows"]
        metrics["mixture_tokens"] = obs_mix.get["tokens"]
    metrics["dup_rows_removed"] = metrics["input_rows"] - metrics["after_dedup"]
    if tokenize is not None:
        metrics.update(tok_meta)
        metrics["encoded_tokens"] = split_obs["enc_tokens"]
    if out_dir is not None:
        metrics["out_dir"] = out_dir
    return final, metrics
