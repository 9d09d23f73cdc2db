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
