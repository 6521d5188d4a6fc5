"""End-to-end corpus curation chain: dedup → filter → sample → split →
shards, with stage metrics, determinism, and manual-oracle checks."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from workbook_exporter_fe_spark.plans.corpus_pipeline import (
    annotate_documents,
    curate_corpus,
    dedup_exact_keep_first,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="module")
def docs_with_dups(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    # re-append 100 docs under new ids → exact duplicates with higher ids
    dups = (
        docs.orderBy("doc_id")
        .limit(100)
        .withColumn("doc_id", F.col("doc_id") + 1_000_000)
    )
    return docs.unionByName(dups)


def test_dedup_keeps_min_id_per_content(spark, docs_with_dups):
    ann = annotate_documents(docs_with_dups)
    kept = dedup_exact_keep_first(ann)
    # one row per distinct text, and it is the min-id row
    n_distinct = docs_with_dups.select("text").distinct().count()
    assert kept.count() == n_distinct
    manual = {
        r["m"]
        for r in docs_with_dups.groupBy("text").agg(F.min("doc_id").alias("m")).collect()
    }
    assert {r["doc_id"] for r in kept.select("doc_id").collect()} == manual


def test_curate_corpus_metrics_and_shards(spark, docs_with_dups, tmp_path):
    out = str(tmp_path / "curated")
    final, m = curate_corpus(
        docs_with_dups,
        out,
        quality_min=0.3,
        sample_rate=0.8,
        splits={"train": 0.8, "val": 0.1, "test": 0.1},
        max_records_per_file=50,
    )
    assert m["input_rows"] == docs_with_dups.count()
    assert m["dup_rows_removed"] == 100
    assert m["after_filter"] <= m["after_dedup"]
    assert m["after_sample"] <= m["after_filter"]
    assert sum(m["split_rows"].values()) == m["after_sample"]

    # manual oracle for the filter stage
    ann = annotate_documents(docs_with_dups)
    dd = dedup_exact_keep_first(ann)
    assert m["after_filter"] == dd.filter(F.col("quality_score") >= 0.3).count()

    # shards on disk: split dirs + row-count bound + lossless round-trip
    import glob

    import pyarrow.parquet as pq

    split_dirs = {d for d in os.listdir(out) if d.startswith("split=")}
    assert split_dirs == {f"split={s}" for s in m["split_rows"]}
    for f in glob.glob(f"{out}/*/*.parquet"):
        assert pq.ParquetFile(f).metadata.num_rows <= 50
    back = spark.read.parquet(out)
    assert back.count() == m["after_sample"]


def test_curate_corpus_metrics_ride_the_single_write(
    spark, docs_with_dups, tmp_path, monkeypatch
):
    # metrics must ride the ONE shard-write action: any .count()/.collect()
    # inside curate_corpus is a lineage re-execution (the round-2 defect:
    # ~5 full scans + 3 dedup shuffles where one write should do)
    from pyspark.sql import DataFrame

    def _boom(name):
        def f(self, *a, **k):
            raise AssertionError(f"curate_corpus ran an extra {name}() action")

        return f

    monkeypatch.setattr(DataFrame, "count", _boom("count"))
    monkeypatch.setattr(DataFrame, "collect", _boom("collect"))
    out = str(tmp_path / "one_action")
    final, m = curate_corpus(
        docs_with_dups, out, quality_min=0.3, sample_rate=0.8
    )
    monkeypatch.undo()
    assert m["dup_rows_removed"] == 100
    assert m["input_rows"] - m["after_dedup"] == 100
    assert m["after_sample"] == sum(m["split_rows"].values())
    assert spark.read.parquet(out).count() == m["after_sample"]


def test_curation_is_repartition_stable(spark, docs_with_dups):
    a, _ = curate_corpus(docs_with_dups, None, quality_min=0.3, sample_rate=0.5)
    b, _ = curate_corpus(
        docs_with_dups.repartition(23), None, quality_min=0.3, sample_rate=0.5
    )
    ka = {(r["doc_id"], r["split"]) for r in a.select("doc_id", "split").collect()}
    kb = {(r["doc_id"], r["split"]) for r in b.select("doc_id", "split").collect()}
    assert ka == kb


def test_curate_corpus_mixture_and_shuffled_shards(spark, docs_with_dups,
                                                  tmp_path):
    """Optional stages: per-source token-budget fill + deterministic
    global shard shuffle; metrics carry the mixture boundary."""
    import glob

    out = str(tmp_path / "curated_mix")
    budgets = {"src0": 5_000, "src1": 2_000}
    final, m = curate_corpus(
        docs_with_dups,
        out,
        mixture=budgets,
        shuffle_seed=11,
        target_files=3,
        max_records_per_file=10_000,
    )
    assert m["after_mixture"] <= m["after_filter"]
    assert m["after_mixture"] > 0
    # budgets were reached (first-crossing inclusive; supply sufficient)
    assert m["mixture_tokens"] >= sum(budgets.values())
    assert sum(m["split_rows"].values()) == m["after_mixture"]
    srcs = {r.source for r in final.select("source").distinct().collect()}
    assert srcs <= set(budgets)
    files = glob.glob(f"{out}/split=*/part-*.parquet")
    assert files
    # same seed+input -> identical shard contents on rerun
    out2 = str(tmp_path / "curated_mix2")
    curate_corpus(docs_with_dups, out2, mixture=budgets, shuffle_seed=11,
                  target_files=3, max_records_per_file=10_000)
    import pyarrow.parquet as pq

    def contents(d):
        return [
            tuple(pq.read_table(f, columns=["doc_id"]).column("doc_id").to_pylist())
            for f in sorted(glob.glob(f"{d}/split=*/part-*.parquet"))
        ]

    assert contents(out) == contents(out2)


def test_run_corpus_cli_mixture_temp(spark, tmp_path, monkeypatch, capsys):
    """--mixture-temp TOTAL@ALPHA derives the per-source budgets from the
    corpus itself (p_i ∝ n_i^alpha) and feeds them to the mixture stage."""
    import json
    import sys

    from pyspark.sql import functions as F

    from workbook_exporter_fe_spark.operators.sampling import (
        mixture_budgets,
        temperature_weights,
    )

    sys.path.insert(0, "/root/repo")
    import run_corpus

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    src = str(tmp_path / "docs")
    docs.write.parquet(src)
    monkeypatch.setattr(sys, "argv", [
        "run_corpus.py", "--input", src, "--out", str(tmp_path / "out"),
        "--mixture-temp", "50000@0.3",
    ])
    run_corpus.main()
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    budgets = report["mixture_temp_budgets"]
    assert sum(budgets.values()) == 50_000
    counts = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(
            F.sum("n_chars").alias("n")
        ).collect()
    }
    assert budgets == mixture_budgets(
        50_000, temperature_weights(counts, 0.3)
    )
    # the fill reached every budget (first-crossing inclusive)
    assert report["mixture_tokens"] >= 50_000


def test_run_corpus_cli_decontam_path(spark, tmp_path, monkeypatch, capsys):
    """run_corpus.py main() with --decontam-index: benchmark-matching docs
    drop before curation and the metric surfaces in the report."""
    import json
    import sys

    from pyspark.sql import functions as F

    from workbook_exporter_fe_spark.operators.dedup import MinHashIndex

    sys.path.insert(0, "/root/repo")
    import run_corpus

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    src = str(tmp_path / "docs")
    docs.write.parquet(src)
    bench = docs.orderBy("doc_id").limit(10).select(
        F.concat(F.lit("bench-"), F.col("doc_id")).alias("doc_id"),
        F.split("text", " ").alias("tokens"),
    )
    idx_root = str(tmp_path / "idx")
    MinHashIndex(spark, idx_root).add_batch(bench)

    monkeypatch.setattr(sys, "argv", [
        "run_corpus.py", "--input", src, "--out", str(tmp_path / "out"),
        "--decontam-index", idx_root,
    ])
    run_corpus.main()
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["decontam_dropped"] >= 10
    assert report["input_rows"] == docs.count() - report["decontam_dropped"]


def test_run_corpus_cli_quality_classifier(spark, tmp_path, monkeypatch,
                                           capsys):
    """Train mode (--train-quality) then score mode (--quality-model):
    the trained gate drops the junk class in the same scan as the
    heuristic filters, and the npz roundtrip preserves the decision."""
    import json
    import sys

    from pyspark.sql import functions as F

    from workbook_exporter_fe_spark.operators.classifier import (
        load_model,
        lr_score,
        text_tokens,
    )

    sys.path.insert(0, "/root/repo")
    import run_corpus

    # separable labeled set: clean prose vs keyboard-mash junk
    clean = [(i, f"the quick brown fox number {i} jumps over the lazy dog",
              1.0) for i in range(120)]
    junk = [(1000 + i, f"zzqx{i} vvkk qqzz xkcd{i} zxzx qqq kkvv zz{i}", 0.0)
            for i in range(120)]
    labeled = spark.createDataFrame(
        clean + junk, "doc_id long, text string, label double"
    )
    lab_src = str(tmp_path / "labeled")
    labeled.write.parquet(lab_src)
    model_path = str(tmp_path / "quality.npz")
    monkeypatch.setattr(sys, "argv", [
        "run_corpus.py", "--input", "unused", "--train-quality", lab_src,
        "--quality-model", model_path, "--model-epochs", "40",
    ])
    run_corpus.main()
    train_report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert train_report["trained"] == model_path
    assert train_report["final_loss"] < 0.5  # learned something

    # apply: a mixed corpus — junk rows must drop, clean rows survive
    corpus = spark.createDataFrame(
        [(i, f"the quick brown fox number {i} jumps over the lazy dog",
          "web", 50) for i in range(40)]
        + [(100 + i, f"zzqx{i} vvkk qqzz xkcd{i} zxzx qqq kkvv zz{i}",
            "web", 50) for i in range(40)],
        "doc_id long, text string, source string, n_chars long",
    )
    src = str(tmp_path / "docs")
    corpus.write.parquet(src)
    monkeypatch.setattr(sys, "argv", [
        "run_corpus.py", "--input", src, "--out", str(tmp_path / "out"),
        "--quality-model", model_path, "--quality-p-min", "0.5",
    ])
    run_corpus.main()
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # oracle: score the corpus directly with the loaded model
    m = load_model(model_path)
    scored = lr_score(
        corpus.withColumn("_t", text_tokens(F.col("text"))), m,
        tokens_col="_t",
    )
    expect = scored.where(F.col("quality_p") >= 0.5).count()
    assert report["after_filter"] == expect
    # the classifier actually separates (not a degenerate all-pass)
    assert 0 < expect < 80
    assert expect >= 35  # nearly all clean rows survive


def test_curate_corpus_tokenize_stage(spark, docs_with_dups, tmp_path):
    """--tokenize: the shards carry a tokens_enc column that round-trips
    the text, the metrics carry the encoded token count, and both
    tokenizer families ride the same single-action chain."""
    from workbook_exporter_fe_spark.plans.corpus_pipeline import curate_corpus

    for spec in ("bpe:25", "unigram:80"):
        out = str(tmp_path / spec.replace(":", "_"))
        final, metrics = curate_corpus(
            docs_with_dups, out, tokenize=spec, tokenize_train_rate=0.2,
        )
        assert metrics["tokenizer"].startswith(spec.split(":")[0] + ":")
        assert metrics["encoded_tokens"] > 0
        shards = spark.read.parquet(out)
        row = shards.filter(F.size("tokens_enc") > 0).first()
        assert "".join(row["tokens_enc"]) == row["text"].replace(" ", "")
        total = shards.agg(
            F.sum(F.size("tokens_enc")).alias("s")
        ).first()["s"]
        assert total == metrics["encoded_tokens"]


def test_run_corpus_cli_tokenize(spark, tmp_path, monkeypatch, capsys):
    import json
    import sys

    sys.path.insert(0, "/root/repo")
    import run_corpus

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    src = str(tmp_path / "docs_tok")
    docs.write.parquet(src)
    monkeypatch.setattr(sys, "argv", [
        "run_corpus.py", "--input", src, "--out", str(tmp_path / "out_tok"),
        "--tokenize", "unigram:60", "--tokenize-train-rate", "0.1",
    ])
    run_corpus.main()
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["tokenizer"].startswith("unigram:")
    assert report["encoded_tokens"] > 0
    shards = spark.read.parquet(str(tmp_path / "out_tok"))
    assert "tokens_enc" in shards.columns


def test_tokenizer_save_load_roundtrip(spark, docs_with_dups, tmp_path):
    """Train+save in one run, load in a second: identical tokens_enc
    (the artifact carries the full model, no retraining drift)."""
    from workbook_exporter_fe_spark.plans.corpus_pipeline import curate_corpus

    art = str(tmp_path / "tok.json")
    out1 = str(tmp_path / "o1")
    out2 = str(tmp_path / "o2")
    _, m1 = curate_corpus(
        docs_with_dups, out1, tokenize="bpe:20",
        tokenize_train_rate=0.2, tokenizer_save=art,
    )
    assert m1["tokenizer_saved"] == art
    _, m2 = curate_corpus(docs_with_dups, out2, tokenizer_load=art)
    assert m2["tokenizer"] == m1["tokenizer"]
    assert m2["encoded_tokens"] == m1["encoded_tokens"]
    a = spark.read.parquet(out1).select("doc_id", "tokens_enc")
    b = spark.read.parquet(out2).select("doc_id", "tokens_enc")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_curate_corpus_mixture_epochs(spark, docs_with_dups, tmp_path):
    """mixture_epochs: a budget above a source's corpus replays it across
    epochs; shards carry mix_epoch and the token sum reaches the budget."""
    from workbook_exporter_fe_spark.plans.corpus_pipeline import curate_corpus

    tot = {
        r.source: r.t
        for r in docs_with_dups.groupBy("source").agg(
            F.sum("n_chars").alias("t")
        ).collect()
    }
    src = max(tot, key=tot.get)
    budget = int(tot[src] * 2)
    out = str(tmp_path / "mo")
    _, m = curate_corpus(
        docs_with_dups, out,
        mixture={src: budget}, mixture_epochs=True,
    )
    assert m["mixture_tokens"] >= budget
    shards = spark.read.parquet(out)
    assert shards.agg(F.max("mix_epoch")).first()[0] >= 1
