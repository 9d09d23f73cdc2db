"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side machinery (schemas, batch shapes, partitioning, UDF
signatures) is real and tested; the actual media decoding is STUBBED — the
image/audio libraries are not in this container — behind
``decode_image_stub``, which derives deterministic fake properties from the
bytes. Swap ``decode_image_stub`` for a Pillow/ffmpeg call in a real
deployment; nothing else changes.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha256", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)


def decode_image_stub(payload: bytes) -> dict:
    """STUB decode: deterministic fake dimensions derived from a content
    hash. Replace with a real decoder (PIL.Image.open etc.) in production —
    NotImplementedError semantics are modeled as deterministic fakes so the
    pipeline is testable end to end."""
    digest = hashlib.sha256(payload).digest()
    return {
        "width": 64 + digest[0] * 8,
        "height": 64 + digest[1] * 8,
        "n_frames": 1 + digest[2] % 4,
    }


def extract_media_metadata(
    media: DataFrame,
    decode: Callable[[bytes], dict] = decode_image_stub,
    media_type: str = "image",
) -> DataFrame:
    """``(doc_id, payload binary)`` → typed metadata rows.

    One Arrow batch at a time; payload bytes never leave the executor. At
    scale, partition the input by storage locality — the stage is
    embarrassingly parallel and shuffle-free.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for doc_id, payload in zip(batch["doc_id"], batch["payload"]):
                blob = bytes(payload) if payload is not None else b""
                meta = decode(blob)
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "media_type": media_type,
                        "n_bytes": len(blob),
                        "sha256": hashlib.sha256(blob).hexdigest(),
                        **meta,
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "media_type",
                    "n_bytes",
                    "sha256",
                    "width",
                    "height",
                    "n_frames",
                ],
            )

    return media.select("doc_id", "payload").mapInPandas(run, MEDIA_META_SCHEMA)


# --- resize ------------------------------------------------------------------

RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def resize_image_stub(payload: bytes, width: int, height: int) -> bytes:
    """STUB resize: deterministic bytes derived from (content, target dims).
    Replace with PIL ``Image.resize`` + re-encode in production."""
    seed = hashlib.sha256(payload + f"{width}x{height}".encode()).digest()
    return seed * (1 + min(len(payload), 4096) // len(seed))


def resize_images(
    media: DataFrame,
    width: int,
    height: int,
    resize: Callable[[bytes, int, int], bytes] = resize_image_stub,
) -> DataFrame:
    """``(doc_id, payload)`` → fixed-dimension re-encoded payloads.

    Shuffle-free mapInPandas; output partitioning == input partitioning, so a
    downstream write preserves storage locality. Target dims ship as plain
    Python closure constants (broadcast via task serialization, zero-cost)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = pd.DataFrame(
                {
                    "doc_id": batch["doc_id"].astype("int64"),
                    "width": width,
                    "height": height,
                    "payload": [
                        resize(bytes(p) if p is not None else b"", width, height)
                        for p in batch["payload"]
                    ],
                }
            )
            out["width"] = out["width"].astype("int32")
            out["height"] = out["height"].astype("int32")
            yield out

    return media.select("doc_id", "payload").mapInPandas(run, RESIZED_SCHEMA)


# --- video frame sampling ----------------------------------------------------

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_sha256", T.StringType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames_stub(payload: bytes, every_n: int) -> list[bytes]:
    """STUB frame sampler: deterministic per-index frame payloads, count
    derived from the content hash (1..8 frames before sampling). Replace
    with an ffmpeg/pyav keyframe extractor in production."""
    digest = hashlib.sha256(payload).digest()
    n_frames = 1 + digest[2] % 8
    return [
        hashlib.sha256(payload + idx.to_bytes(4, "little")).digest()
        for idx in range(0, n_frames, max(1, every_n))
    ]


def sample_video_frames(
    media: DataFrame,
    every_n: int = 2,
    sampler: Callable[[bytes, int], list[bytes]] = sample_frames_stub,
) -> DataFrame:
    """``(doc_id, payload)`` → one row per sampled frame (1→N flatMap).

    The Arrow batch shape changes cardinality (flatMap), which mapInPandas
    expresses natively; no explode of a materialized array column, so frame
    bytes are emitted once and never buffered whole-video-wide."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for doc_id, payload in zip(batch["doc_id"], batch["payload"]):
                blob = bytes(payload) if payload is not None else b""
                for idx, frame in enumerate(sampler(blob, every_n)):
                    rows.append(
                        {
                            "doc_id": int(doc_id),
                            "frame_idx": idx,
                            "frame_sha256": hashlib.sha256(frame).hexdigest(),
                            "frame": frame,
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "frame_sha256", "frame"]
            )

    return media.select("doc_id", "payload").mapInPandas(run, FRAME_SCHEMA)


# --- feature extraction ------------------------------------------------------

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]
)


def embed_media_stub(payload: bytes, dim: int) -> list[float]:
    """STUB feature extractor: deterministic unit-norm pseudo-embedding from
    the content hash. Replace with a CLIP/ViT forward pass in production —
    the (doc_id, array<float>) contract feeds ann_cosine_topk / ann_ivf_topk
    unchanged."""
    import numpy as np

    digest = hashlib.sha256(payload).digest()
    rng = np.random.default_rng(int.from_bytes(digest[:8], "little"))
    vec = rng.standard_normal(dim).astype("float32")
    vec /= max(float(np.linalg.norm(vec)), 1e-12)
    return [float(x) for x in vec]


def extract_media_features(
    media: DataFrame,
    dim: int = 16,
    embed: Callable[[bytes, int], list[float]] = embed_media_stub,
) -> DataFrame:
    """``(doc_id, payload)`` → ``(doc_id, embedding array<float>)``; the
    multimodal on-ramp into the ANN / embedding-dedup operators."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            yield pd.DataFrame(
                {
                    "doc_id": batch["doc_id"].astype("int64"),
                    "embedding": [
                        embed(bytes(p) if p is not None else b"", dim)
                        for p in batch["payload"]
                    ],
                }
            )

    return media.select("doc_id", "payload").mapInPandas(run, FEATURE_SCHEMA)
