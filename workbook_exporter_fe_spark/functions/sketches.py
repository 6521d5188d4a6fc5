"""Count-min sketch: bounded-memory token histograms for 100 TB rollups.

The exact token histogram (operators/tiers.token_histogram) is the oracle
at test scale; at 10^12 sequences the per-bucket map blows up on wide
vocabularies, so the scale path is a count-min sketch per (source, bucket):
a (depth × width) int64 matrix updated vectorized in numpy inside
``applyInPandas``. Sketches are mergeable by elementwise addition — the
same decomposability contract the tier cascade relies on for sum/min/max —
so tier-2/3 sketches re-aggregate tier-1 sketches without touching raw data.

Hash family: row r uses xxhash-free portable mixing
``(a_r * token + b_r) mod P mod width`` with fixed odd constants — identical
in any runtime, cheap to vectorize.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

P = (1 << 61) - 1  # Mersenne prime
_A = np.array([0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9, 0x27D4EB2F165667C5], dtype=np.uint64)
_B = np.array([0x85EBCA77C2B2AE63, 0xD6E8FEB86659FD93, 0xA5A5A5A5A5A5A5A5, 0x123456789ABCDEF1], dtype=np.uint64)

SKETCH_SCHEMA = "source string, bucket_ts timestamp, depth int, width int, sketch binary"


def _rows_cols(tokens: np.ndarray, depth: int, width: int) -> np.ndarray:
    t = tokens.astype(np.uint64)
    idx = np.empty((depth, len(t)), dtype=np.int64)
    for r in range(depth):
        h = (_A[r] * t + _B[r]) % np.uint64(P)
        idx[r] = (h % np.uint64(width)).astype(np.int64)
    return idx


def cms_build(tokens: np.ndarray, depth: int = 4, width: int = 1024) -> np.ndarray:
    """Vectorized build: (depth, width) int64 counts from a token array."""
    sk = np.zeros((depth, width), dtype=np.int64)
    if len(tokens) == 0:
        return sk
    idx = _rows_cols(np.asarray(tokens), depth, width)
    for r in range(depth):
        np.add.at(sk[r], idx[r], 1)
    return sk


def cms_query(sk: np.ndarray, token: int) -> int:
    depth, width = sk.shape
    idx = _rows_cols(np.array([token]), depth, width)
    return int(min(sk[r, idx[r, 0]] for r in range(depth)))


def cms_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return a + b


def sketch_token_histogram(
    events: DataFrame, tier: str = "1m", depth: int = 4, width: int = 1024
) -> DataFrame:
    """Per-(source, bucket) count-min sketch over exploded tokens.

    applyInPandas groups are (source, bucket) — bounded by events/minute —
    and the build is whole-array numpy. Output sketch is a binary blob
    (depth×width int64, row-major) + dims for self-describing merges.
    """
    from workbook_exporter_fe_spark.operators.tiers import TIER_TRUNC

    bucket = F.date_trunc(TIER_TRUNC[tier], F.col("event_ts")).alias("bucket_ts")
    toks = events.select("source", bucket, "tokens")

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        all_tokens = np.concatenate([np.asarray(t) for t in pdf["tokens"]]) if len(pdf) else np.array([])
        sk = cms_build(all_tokens, depth, width)
        return pd.DataFrame(
            {
                "source": [pdf["source"].iloc[0]],
                "bucket_ts": [pdf["bucket_ts"].iloc[0]],
                "depth": [depth],
                "width": [width],
                "sketch": [sk.tobytes()],
            }
        )

    return toks.groupBy("source", "bucket_ts").applyInPandas(build, SKETCH_SCHEMA)


HH_SCHEMA = (
    "source string, bucket_ts timestamp, depth int, width int, sketch binary, "
    "cand array<long>, cand_n array<long>"
)


def heavy_hitters_tier(
    events: DataFrame, tier: str = "1m", k: int = 20, slack: int = 4,
    depth: int = 4, width: int = 1024,
) -> DataFrame:
    """Mergeable approximate top-k tokens per (source, bucket): count-min
    sketch + a candidate list of the bucket's exact top ``k·slack`` tokens.

    The classic distributed heavy-hitters pattern: exact per-bucket top
    lists can't re-aggregate (a tier-2 top-k is NOT the union of tier-1
    top-ks), but CMS counts are mergeable and a global heavy hitter is a
    local heavy hitter in at least some child buckets — so each row carries
    (sketch, candidates) and a merge sums sketches, unions candidates, and
    re-ranks against the merged sketch. ``slack`` is the recall knob (CMS
    only over-estimates, so false negatives need a token absent from EVERY
    child's padded top list)."""
    from workbook_exporter_fe_spark.operators.tiers import TIER_TRUNC

    bucket = F.date_trunc(TIER_TRUNC[tier], F.col("event_ts")).alias("bucket_ts")
    toks = events.select("source", bucket, "tokens")
    cap = k * slack

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        all_tokens = (
            np.concatenate([np.asarray(t) for t in pdf["tokens"]])
            if len(pdf)
            else np.array([], dtype=np.int64)
        )
        sk = cms_build(all_tokens, depth, width)
        vals, counts = np.unique(all_tokens, return_counts=True)
        top = np.argsort(-counts, kind="stable")[:cap]
        return pd.DataFrame(
            {
                "source": [pdf["source"].iloc[0]],
                "bucket_ts": [pdf["bucket_ts"].iloc[0]],
                "depth": [depth],
                "width": [width],
                "sketch": [sk.tobytes()],
                "cand": [vals[top].astype(np.int64).tolist()],
                "cand_n": [counts[top].astype(np.int64).tolist()],
            }
        )

    return toks.groupBy("source", "bucket_ts").applyInPandas(build, HH_SCHEMA)


def _cms_estimate_many(sk: np.ndarray, tokens: np.ndarray) -> np.ndarray:
    depth, width = sk.shape
    idx = _rows_cols(tokens, depth, width)
    ests = np.stack([sk[r, idx[r]] for r in range(depth)])
    return ests.min(axis=0)


def merge_heavy_hitters(
    hh: DataFrame, to: str, k: int = 20, slack: int = 4
) -> DataFrame:
    """Re-aggregate heavy-hitter rows to a coarser tier: sum the sketches,
    union the candidates, re-estimate every candidate against the MERGED
    sketch, keep the top ``k·slack``."""
    from workbook_exporter_fe_spark.operators.tiers import TIER_TRUNC

    bucket = F.date_trunc(TIER_TRUNC[to], F.col("bucket_ts")).alias("bucket_ts")
    cap = k * slack

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        depth, width = int(pdf["depth"].iloc[0]), int(pdf["width"].iloc[0])
        acc = np.zeros((depth, width), dtype=np.int64)
        for blob in pdf["sketch"]:
            acc += np.frombuffer(bytes(blob), dtype=np.int64).reshape(depth, width)
        cand = np.unique(np.concatenate([np.asarray(c, dtype=np.int64) for c in pdf["cand"]]))
        est = _cms_estimate_many(acc, cand) if len(cand) else np.array([], dtype=np.int64)
        top = np.argsort(-est, kind="stable")[:cap]
        return pd.DataFrame(
            {
                "source": [pdf["source"].iloc[0]],
                "bucket_ts": [pdf["bucket_ts"].iloc[0]],
                "depth": [depth],
                "width": [width],
                "sketch": [acc.tobytes()],
                "cand": [cand[top].tolist()],
                "cand_n": [est[top].astype(np.int64).tolist()],
            }
        )

    return (
        hh.select("source", bucket, "depth", "width", "sketch", "cand", "cand_n")
        .groupBy("source", "bucket_ts")
        .applyInPandas(merge, HH_SCHEMA)
    )


def heavy_hitters_topk(hh: DataFrame, k: int = 20) -> DataFrame:
    """(source, bucket_ts, token, est_n, rank): the top-k rows per bucket
    from a heavy-hitter tier (candidates are stored pre-ranked)."""
    pairs = F.arrays_zip(
        F.slice("cand", 1, k).alias("cand"), F.slice("cand_n", 1, k).alias("cand_n")
    )
    exploded = hh.select(
        "source", "bucket_ts", F.posexplode(pairs).alias("pos", "pair")
    )
    return exploded.select(
        "source",
        "bucket_ts",
        F.col("pair.cand").alias("token"),
        F.col("pair.cand_n").alias("est_n"),
        (F.col("pos") + 1).alias("rank"),
    )


def merge_sketches(sketches: DataFrame, to: str) -> DataFrame:
    """Re-aggregate sketches to a coarser tier by elementwise addition."""
    from workbook_exporter_fe_spark.operators.tiers import TIER_TRUNC

    bucket = F.date_trunc(TIER_TRUNC[to], F.col("bucket_ts")).alias("bucket_ts")

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        depth, width = int(pdf["depth"].iloc[0]), int(pdf["width"].iloc[0])
        acc = np.zeros((depth, width), dtype=np.int64)
        for blob in pdf["sketch"]:
            acc += np.frombuffer(bytes(blob), dtype=np.int64).reshape(depth, width)
        return pd.DataFrame(
            {
                "source": [pdf["source"].iloc[0]],
                "bucket_ts": [pdf["bucket_ts"].iloc[0]],
                "depth": [depth],
                "width": [width],
                "sketch": [acc.tobytes()],
            }
        )

    return (
        sketches.select("source", bucket, "depth", "width", "sketch")
        .groupBy("source", "bucket_ts")
        .applyInPandas(merge, SKETCH_SCHEMA)
    )
