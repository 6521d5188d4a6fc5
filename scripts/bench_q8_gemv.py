#!/usr/bin/env python
"""int8 ANN scan kernels: HOF fold vs Arrow/numpy GEMV (verdict item #5).

Round 3 measured an honest negative: int8 quantization bought storage
(1.41x) but ZERO scan-time win, hypothesizing the interpreted
higher-order-function dot product — not memory bandwidth — bounds the
scan. This bench tests that seam directly on a 300k x 128 synthetic
embedding set (deterministic, generated in Spark):

- scan-only: score all rows against one query on a pre-quantized,
  checkpointed (id, qv) relation — HOF fold vs pandas GEMV kernel;
- end-to-end: cosine_topk_quantized(kernel='hof'|'gemv') including
  quantization, rerank and the exact float path, vs the exact
  brute-force cosine_topk baseline.

3 timed repeats after 1 warmup each; one JSON line out.
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from workbook_exporter_fe_spark.session import get_spark
from workbook_exporter_fe_spark.operators.similarity import (
    _cos,
    _q8_gemv_scan,
    _qdot,
    cosine_topk,
    cosine_topk_quantized,
    quantize_embeddings,
)

N = int(os.environ.get("BENCH_Q8_N", "300000"))
DIM = int(os.environ.get("BENCH_Q8_DIM", "128"))


def timed(fn, repeats=3):
    fn()  # warmup
    walls = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        walls.append(time.perf_counter() - t0)
    return round(statistics.median(walls), 3), [round(w, 3) for w in walls]


def main() -> None:
    spark = get_spark(
        app_name="bench_q8", cores=os.environ.get("SPARK_GRAFT_CPUS", "16")
    )
    # deterministic pseudo-random unit-ish vectors: sin of a per-(id, i)
    # integer — no RNG state, identical across runs/partitionings
    emb = (
        spark.range(N)
        .select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(0), F.lit(DIM - 1)),
                lambda i: F.sin(F.col("id") * DIM + i).cast("float"),
            ).alias("embedding"),
        )
        .repartition(32)
        .localCheckpoint(eager=True)
    )
    qt = quantize_embeddings(emb).localCheckpoint(eager=True)
    qrow = qt.filter(F.col("vec_id") == 0).select("qv").first()

    def scan_hof():
        qq = qt.filter(F.col("vec_id") == 0).select(
            F.col("qv").alias("qqv"),
            _qdot(F.col("qv"), F.col("qv")).alias("qqn"),
        )
        (
            qt.filter(F.col("vec_id") != 0)
            .crossJoin(F.broadcast(qq))
            .select(
                "vec_id",
                _cos(
                    _qdot(F.col("qv"), F.col("qqv")),
                    _qdot(F.col("qv"), F.col("qv")),
                    F.col("qqn"),
                ).alias("acos_"),
            )
            .orderBy(F.desc("acos_"), F.asc("vec_id"))
            .limit(40)
            .collect()
        )

    def scan_gemv():
        scored, qn_q = _q8_gemv_scan(qt, 0, "vec_id")
        (
            scored.select(
                "vec_id",
                _cos(F.col("dot"), F.col("qn"), F.lit(qn_q)).alias("acos_"),
            )
            .orderBy(F.desc("acos_"), F.asc("vec_id"))
            .limit(40)
            .collect()
        )

    hof_med, hof_all = timed(scan_hof)
    gemv_med, gemv_all = timed(scan_gemv)

    e2e_hof, _ = timed(
        lambda: cosine_topk_quantized(emb, 0, k=10, kernel="hof").collect()
    )
    e2e_gemv, _ = timed(
        lambda: cosine_topk_quantized(emb, 0, k=10, kernel="gemv").collect()
    )
    e2e_brute, _ = timed(lambda: cosine_topk(emb, 0, k=10).collect())

    # agreement guard: identical output rows
    a = [tuple(r) for r in cosine_topk_quantized(emb, 0, 10, kernel="gemv").collect()]
    b = [tuple(r) for r in cosine_topk_quantized(emb, 0, 10, kernel="hof").collect()]
    assert a == b, "kernel outputs diverge"

    print(json.dumps({
        "n": N, "dim": DIM,
        "scan_only_hof_sec": hof_med, "scan_only_hof_all": hof_all,
        "scan_only_gemv_sec": gemv_med, "scan_only_gemv_all": gemv_all,
        "scan_speedup_gemv_over_hof": round(hof_med / gemv_med, 2),
        "e2e_q8_hof_sec": e2e_hof,
        "e2e_q8_gemv_sec": e2e_gemv,
        "e2e_brute_float_sec": e2e_brute,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
