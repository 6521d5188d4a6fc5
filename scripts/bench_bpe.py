#!/usr/bin/env python
"""Incremental BPE trainer cost shape (round-3 verdict item #2).

The sf0.1 documents table has a ~31-word synthetic vocabulary — far too
small to exercise trainer cost — so this bench builds a realistic
200k-word Zipf vocabulary (hex-alphabet words of length 2-13,
deterministic from ids) and measures:

1. the OLD design's per-round cost: one full vocabulary pair recount
   (explode + groupBy + argmax over all 200k words) — this happened
   EVERY merge round;
2. ``bpe_train`` (distributed incremental) for 200 rounds: per-round
   wall, which is one candidate-filtered job (words containing the
   merged pair) + driver heap ops;
3. ``bpe_train_local`` for 1000 and 30000 merges: the driver-side path
   recommended at production merge counts.

Equality of merge sequences across the three paths is asserted on a
shared prefix. One JSON line out; transcribed into BENCH/BASELINE.md.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from workbook_exporter_fe_spark.session import get_spark
from workbook_exporter_fe_spark.operators.bpe import (
    bpe_train,
    bpe_train_local,
    _chars,
)

N_WORDS = int(os.environ.get("BENCH_BPE_WORDS", "200000"))


def main() -> None:
    spark = get_spark(
        app_name="bench_bpe", cores=os.environ.get("SPARK_GRAFT_CPUS", "16")
    )
    # deterministic Zipf vocab: word = md5-hex prefix (16-char alphabet),
    # length 2-13; freq ~ 1e7/(rank+1)
    wf = (
        spark.range(N_WORDS)
        .select(
            F.substring(
                F.md5(F.col("id").cast("string")), 1,
                (F.col("id") % 12 + 2).cast("int"),
            ).alias("word"),
            (F.lit(10_000_000) / (F.col("id") + 1)).cast("long").alias("freq"),
        )
        .groupBy("word")
        .agg(F.sum("freq").alias("freq"))
        .localCheckpoint(eager=True)
    )
    n_vocab = wf.count()

    # --- old design: one full-vocabulary recount round
    t0 = time.perf_counter()
    (
        wf.select(_chars(F.col("word")).alias("syms"), "freq")
        .filter(F.size("syms") >= 2)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("syms") - 1),
                    lambda i: F.struct(
                        F.element_at("syms", i).alias("a"),
                        F.element_at("syms", i + 1).alias("b"),
                    ),
                )
            ).alias("p"),
            "freq",
        )
        .groupBy("p.a", "p.b")
        .agg(F.sum("freq").alias("n"))
        .orderBy(F.desc("n"), F.asc("a"), F.asc("b"))
        .limit(1)
        .collect()
    )
    full_recount_sec = time.perf_counter() - t0

    t0 = time.perf_counter()
    m200 = bpe_train(wf, 200)
    dist_200_sec = time.perf_counter() - t0
    cand = [
        (i, wf.filter(F.col("word").contains(a + b)).count())
        for i, (a, b) in enumerate(m200)
        if i % 40 == 0
    ]

    freqs = {r["word"]: r["freq"] for r in wf.collect()}
    t0 = time.perf_counter()
    m1k = bpe_train_local(freqs, 1000)
    local_1k_sec = time.perf_counter() - t0
    t0 = time.perf_counter()
    m30k = bpe_train_local(freqs, 30000)
    local_30k_sec = time.perf_counter() - t0
    assert m200 == m1k[:200] == m30k[:200]
    assert m1k == m30k[:1000]

    print(json.dumps({
        "vocab_words": n_vocab,
        "old_full_recount_round_sec": round(full_recount_sec, 3),
        "old_estimated_30k_rounds_hr": round(full_recount_sec * 30000 / 3600, 1),
        "dist_incremental_200_merges_sec": round(dist_200_sec, 2),
        "dist_per_round_sec": round(dist_200_sec / 200, 3),
        "dist_estimated_1000_rounds_min": round(dist_200_sec / 200 * 1000 / 60, 1),
        "candidates_per_round_sampled": cand,
        "local_1000_merges_sec": round(local_1k_sec, 2),
        "local_30000_merges_sec": round(local_30k_sec, 2),
        "learned_30k": len(m30k),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
