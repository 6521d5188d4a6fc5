#!/usr/bin/env python
"""CLI entry point: the corpus curation chain (training-data user story).

Runs plans/corpus_pipeline.curate_corpus over a documents parquet table
(columns: id, text, and — for mixture budgets — a source and a token
count) and prints the stage-metrics JSON. Every gate is a deterministic
function of the data, so reruns and cluster-size changes produce
byte-identical curation decisions.

Usage (local or spark-submit --py-files engine.zip run_corpus.py ...):

    python run_corpus.py --input docs.parquet --out /tmp/shards
    python run_corpus.py --input docs.parquet --out /tmp/shards \
        --langs en,de --quality-min 0.3 --sample-rate 0.5 \
        --splits train=0.9,val=0.05,test=0.05
    python run_corpus.py --input docs.parquet --out /tmp/shards \
        --mixture src-00=2000000,src-01=500000 --mixture-token-col n_chars \
        --shuffle-seed 7 --target-files 64
    python run_corpus.py --input docs.parquet --out /tmp/shards \
        --mixture-temp 5000000@0.3   # budgets from p_i ∝ n_i^0.3 (mT5 rule)
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _kv_floats(text: str) -> dict[str, float]:
    out = {}
    for part in text.split(","):
        k, _, v = part.partition("=")
        out[k.strip()] = float(v)
    return out


def _kv_ints(text: str) -> dict[str, int]:
    return {k: int(v) for k, v in _kv_floats(text).items()}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="documents parquet path")
    ap.add_argument("--out", help="shard output dir (omit for a dry run)")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--langs", help="comma-separated lang_pred allowlist")
    ap.add_argument("--quality-min", type=float, default=0.0)
    ap.add_argument("--sample-rate", type=float, default=1.0)
    ap.add_argument(
        "--splits", default="train=0.9,val=0.05,test=0.05",
        help="name=weight,... (weights sum to 1)",
    )
    ap.add_argument("--max-records-per-file", type=int, default=100_000)
    ap.add_argument(
        "--mixture", help="per-source token budgets, e.g. web=2000000,code=500000",
    )
    ap.add_argument(
        "--mixture-epochs", action="store_true",
        help="epoch-repeat oversampling: budgets above a source's corpus "
        "replay it across epochs (shards gain a mix_epoch column)",
    )
    ap.add_argument(
        "--mixture-max-epochs", type=int, default=64,
        help="fat-finger guard: raise if a budget legitimately needs "
        "more than this many replays of a source",
    )
    ap.add_argument("--mixture-token-col", default="n_chars")
    ap.add_argument("--mixture-source-col", default="source")
    ap.add_argument(
        "--mixture-temp",
        help="derive the per-source budgets from the corpus itself with "
        "temperature sampling: TOTAL_TOKENS@ALPHA (e.g. 5000000@0.3 — "
        "p_i ∝ n_i^alpha, the mT5/XLM-R rule). Mutually exclusive with "
        "--mixture; adds one per-source count aggregate before curation",
    )
    ap.add_argument(
        "--shuffle-seed", type=int,
        help="deterministic global shard shuffle (requires --target-files)",
    )
    ap.add_argument("--target-files", type=int)
    ap.add_argument(
        "--decontam-index",
        help="MinHashIndex root built from benchmark/eval docs: training "
        "docs LSH-matching any indexed doc are dropped BEFORE curation "
        "(near-dup leakage removal; the exact n-gram pass lives in "
        "operators/decontam.py)",
    )
    ap.add_argument(
        "--quality-model",
        help="trained classifier npz (operators/classifier.py lr_train + "
        "save_model, or --train-quality below): docs scoring below "
        "--quality-p-min are dropped in the same scan as the heuristic "
        "filters",
    )
    ap.add_argument("--quality-p-min", type=float, default=0.5)
    ap.add_argument(
        "--model-tokens-col",
        help="pre-tokenized int-array column for the classifier; omit to "
        "derive tokens from --text-col (train and score must match)",
    )
    ap.add_argument(
        "--train-quality",
        help="TRAIN mode: labeled parquet (label column 0/1) — trains the "
        "hashed n-gram classifier and saves it to --quality-model, then "
        "exits (no curation pass)",
    )
    ap.add_argument("--label-col", default="label")
    ap.add_argument("--model-epochs", type=int, default=30)
    ap.add_argument(
        "--tokenize",
        help="append a tokens_enc column to the shards: 'bpe:<n_merges>' "
        "or 'unigram:<vocab_size>' — trained driver-side on a hash-sample "
        "of the raw input, encoded in the same shard-write scan",
    )
    ap.add_argument(
        "--tokenize-train-rate", type=float, default=0.05,
        help="hash-sample rate of the raw input the tokenizer trains on",
    )
    ap.add_argument(
        "--tokenize-min-count", type=int, default=1,
        help="frequency floor pushed into word_freqs BEFORE the driver "
        "collect (SentencePiece-style; bounds >1e9-type web vocabularies)",
    )
    ap.add_argument(
        "--tokenize-top-k", type=int, default=None,
        help="cap the collected vocabulary to the K most frequent words "
        "(distributed TakeOrdered, ties freq DESC then word ASC)",
    )
    ap.add_argument(
        "--tokenizer-save",
        help="write the trained tokenizer artifact (JSON) here",
    )
    ap.add_argument(
        "--tokenizer-load",
        help="skip training: encode with a previously saved artifact",
    )
    ap.add_argument("--cores", default=os.environ.get("SPARK_GRAFT_CPUS", "*"))
    args = ap.parse_args()

    from workbook_exporter_fe_spark.plans.corpus_pipeline import curate_corpus
    from workbook_exporter_fe_spark.session import get_spark

    spark = get_spark(app_name="run_corpus", cores=args.cores)

    if args.train_quality:
        if not args.quality_model:
            ap.error("--train-quality needs --quality-model (save path)")
        from pyspark.sql import functions as F

        from workbook_exporter_fe_spark.operators.classifier import (
            lr_train,
            save_model,
            text_tokens,
        )

        labeled = spark.read.parquet(args.train_quality)
        tok_col = args.model_tokens_col
        if tok_col is None:
            tok_col = "__qtok"
            labeled = labeled.withColumn(
                tok_col, text_tokens(F.col(args.text_col))
            )
        model = lr_train(
            labeled, args.label_col, tokens_col=tok_col,
            epochs=args.model_epochs, track_loss=True,
        )
        save_model(model, args.quality_model)
        print(json.dumps({
            "trained": args.quality_model,
            "rows": labeled.count(),
            "epochs": args.model_epochs,
            "final_loss": model["loss"][-1] if model["loss"] else None,
        }))
        return

    docs = spark.read.parquet(args.input)
    pre_metrics = {}
    if args.decontam_index:
        from pyspark.sql import functions as F

        from workbook_exporter_fe_spark.operators.decontam import (
            fuzzy_decontaminate,
        )
        from workbook_exporter_fe_spark.operators.dedup import MinHashIndex

        idx = MinHashIndex(spark, args.decontam_index)
        toked = docs.withColumn("_toks", F.split(F.col(args.text_col), " "))
        before = docs.count()
        docs = fuzzy_decontaminate(
            toked, idx, tokens_col="_toks", id_col=args.id_col
        ).drop("_toks")
        pre_metrics["decontam_dropped"] = before - docs.count()
    mixture = _kv_ints(args.mixture) if args.mixture else None
    if args.mixture_temp:
        if mixture is not None:
            ap.error("--mixture-temp is mutually exclusive with --mixture")
        from pyspark.sql import functions as F

        from workbook_exporter_fe_spark.operators.sampling import (
            mixture_budgets,
            temperature_weights,
        )

        total_s, alpha_s = args.mixture_temp.split("@")
        counts = {
            r["src"]: r["n"]
            for r in docs.groupBy(
                F.col(args.mixture_source_col).alias("src")
            ).agg(F.sum(args.mixture_token_col).alias("n")).collect()
        }
        mixture = mixture_budgets(
            int(total_s), temperature_weights(counts, float(alpha_s))
        )
        pre_metrics["mixture_temp_budgets"] = mixture
    quality_model = None
    if args.quality_model:
        from workbook_exporter_fe_spark.operators.classifier import load_model

        quality_model = load_model(args.quality_model)
    _, metrics = curate_corpus(
        docs,
        args.out,
        text_col=args.text_col,
        id_col=args.id_col,
        langs=tuple(args.langs.split(",")) if args.langs else None,
        quality_min=args.quality_min,
        sample_rate=args.sample_rate,
        splits=_kv_floats(args.splits),
        max_records_per_file=args.max_records_per_file,
        mixture=mixture,
        mixture_epochs=args.mixture_epochs,
        mixture_max_epochs=args.mixture_max_epochs,
        mixture_token_col=args.mixture_token_col,
        mixture_source_col=args.mixture_source_col,
        shuffle_seed=args.shuffle_seed,
        target_files=args.target_files,
        quality_model=quality_model,
        quality_p_min=args.quality_p_min,
        model_tokens_col=args.model_tokens_col,
        tokenize=args.tokenize,
        tokenize_train_rate=args.tokenize_train_rate,
        tokenize_min_count=args.tokenize_min_count,
        tokenize_top_k=args.tokenize_top_k,
        tokenizer_save=args.tokenizer_save,
        tokenizer_load=args.tokenizer_load,
    )
    print(json.dumps({**pre_metrics, **metrics}, default=str))


if __name__ == "__main__":
    main()
