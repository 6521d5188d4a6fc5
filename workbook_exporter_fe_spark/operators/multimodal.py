"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real — schemas, Arrow batch shapes, grouped
partitioning, batched `mapInPandas` UDFs — while the actual media decode is
stubbed behind ``DECODERS`` (the image/audio libraries are not in this
container). Swapping a real decoder in changes one dict entry, nothing in
the plan.

Schema convention:
    media(media_id string, kind string, payload binary,
          meta struct<width:int, height:int, sample_rate:int, n_frames:int>)

Scale design: payloads are the wide column — every operator here projects
(media_id, kind, payload) only and processes Arrow batches, so executor
memory is bounded by (#rows/batch × payload size); tune
``spark.sql.execution.arrow.maxRecordsPerBatch`` for large media. Feature
vectors come back as fixed-width arrays (columnar, splittable); frame
sampling fans out via explode-style multi-row yield inside the same batch.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id string, kind string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int>"
)

FEATURE_DIM = 16


def _stub_decode_image(payload: bytes, meta) -> np.ndarray:
    """STUB: deterministic fake pixel stats derived from payload bytes.

    A real implementation would be `PIL.Image.open(io.BytesIO(payload))`;
    not installed here, so features are byte-level statistics — the UDF
    signature, batching, and output schema are exactly what the real
    decoder would use."""
    a = np.frombuffer(payload, dtype=np.uint8)
    if len(a) == 0:
        return np.zeros(FEATURE_DIM)
    chunks = np.array_split(a.astype(np.float64), FEATURE_DIM)
    return np.array([c.mean() if len(c) else 0.0 for c in chunks])


def _stub_decode_audio(payload: bytes, meta) -> np.ndarray:
    a = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
    if len(a) == 0:
        return np.zeros(FEATURE_DIM)
    # fake "waveform energy bands": strided RMS
    chunks = np.array_split(a, FEATURE_DIM)
    return np.array([float(np.sqrt((c**2).mean())) if len(c) else 0.0 for c in chunks])


def _unsupported(payload: bytes, meta) -> np.ndarray:
    raise NotImplementedError("no decoder for this media kind in this build")


DECODERS: dict[str, Callable[[bytes, object], np.ndarray]] = {
    "image": _stub_decode_image,
    "audio": _stub_decode_audio,
    "video": _unsupported,
}


def gen_media(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table (payload = seeded bytes)."""
    df = spark.range(0, n)
    kind = F.when(F.col("id") % 3 == 0, "image").when(F.col("id") % 3 == 1, "audio").otherwise("video")
    payload = F.sha2(F.concat(F.lit(seed), F.col("id")), 512).cast("binary")
    meta = F.struct(
        (F.col("id") % 640 + 1).cast("int").alias("width"),
        (F.col("id") % 480 + 1).cast("int").alias("height"),
        F.lit(16000).cast("int").alias("sample_rate"),
        (F.col("id") % 120 + 1).cast("int").alias("n_frames"),
    )
    return df.select(
        F.format_string("media-%09d", F.col("id")).alias("media_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        meta.alias("meta"),
    )


def extract_features(media: DataFrame, kinds: tuple[str, ...] = ("image", "audio")) -> DataFrame:
    """(media_id, kind, features array<double>) via batched mapInPandas.

    Rows whose kind has no decoder are filtered out plan-side (predicate
    pushdown) rather than raising inside the UDF."""
    out_schema = "media_id string, kind string, features array<double>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                DECODERS[k](bytes(p), m)
                for k, p, m in zip(pdf["kind"], pdf["payload"], pdf["meta"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "features": [f.tolist() for f in feats],
                }
            )

    pruned = media.filter(F.col("kind").isin(list(kinds))).select(
        "media_id", "kind", "payload", "meta"
    )
    return pruned.mapInPandas(run, schema=out_schema)


def sample_frames(media: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled frame index.

    Frame *extraction* is stubbed (payload passthrough slice); the fan-out,
    schema, and per-batch multi-row yield are the real shape."""
    out_schema = "media_id string, frame_idx int, frame_payload binary"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, payloads = [], [], []
            for mid, p, meta in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                n_frames = int(meta["n_frames"]) if meta is not None else 0
                raw = bytes(p)
                for fi in range(0, n_frames, every_n):
                    ids.append(mid)
                    idxs.append(fi)
                    # STUB: real impl decodes frame fi; fake = rolling slice
                    off = fi % max(len(raw) - 8, 1)
                    payloads.append(raw[off : off + 8])
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_payload": payloads}
            )

    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", "payload", "meta")
        .mapInPandas(run, schema=out_schema)
    )


def resize_images(
    media: DataFrame, width: int = 64, height: int = 64
) -> DataFrame:
    """(media_id, width, height, payload binary): image resize plumbing.

    STUB decode/encode (no image libs in this container): the "resize"
    maps the payload bytes onto a deterministic width×height grid by
    nearest-neighbour index sampling — exactly the array-shape contract a
    real `PIL.Image.resize` implementation would fill in (swap the body,
    keep the schema/batching). Only rows with kind='image' are read
    (plan-side pruning), and output payload size is bounded at
    width×height bytes regardless of input size — the property that makes
    the shuffle/write after a resize predictable at 100 TB."""
    out_schema = "media_id string, width int, height int, payload binary"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height
        for pdf in batches:
            payloads = []
            for p in pdf["payload"]:
                a = np.frombuffer(bytes(p), dtype=np.uint8)
                if len(a) == 0:
                    payloads.append(b"\x00" * target)
                    continue
                idx = (np.arange(target) * len(a)) // target
                payloads.append(a[idx].tobytes())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": width,
                    "height": height,
                    "payload": payloads,
                }
            )

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "payload")
        .mapInPandas(run, schema=out_schema)
    )
