"""Multimodal plumbing: binary payload → typed metadata via mapInPandas
(decode stubbed deterministically; Spark-side machinery real)."""

import hashlib

from frontier.multimodal import (
    decode_image_stub,
    embed_media_stub,
    extract_media_features,
    extract_media_metadata,
    resize_images,
    sample_frames_stub,
    sample_video_frames,
)


def test_extract_media_metadata(spark):
    rows = [(i, f"fake-image-bytes-{i}".encode()) for i in range(10)] + [(10, None)]
    media = spark.createDataFrame(rows, "doc_id long, payload binary")
    meta = extract_media_metadata(media).orderBy("doc_id").collect()

    assert len(meta) == 11
    first = meta[0]
    expected = decode_image_stub(b"fake-image-bytes-0")
    assert (first.width, first.height, first.n_frames) == (
        expected["width"],
        expected["height"],
        expected["n_frames"],
    )
    assert first.n_bytes == len(b"fake-image-bytes-0")
    assert meta[-1].n_bytes == 0  # null payload handled
    # determinism: same bytes → same sha/fake-dims
    again = extract_media_metadata(media).orderBy("doc_id").collect()
    assert [tuple(r) for r in meta] == [tuple(r) for r in again]


def _media(spark, n=6):
    rows = [(i, f"vid-{i}".encode() * (i + 1)) for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, payload binary")


def test_resize_images(spark):
    out = resize_images(_media(spark), 224, 224).orderBy("doc_id").collect()
    assert len(out) == 6
    assert all((r.width, r.height) == (224, 224) for r in out)
    # deterministic and dimension-sensitive
    out2 = resize_images(_media(spark), 224, 224).orderBy("doc_id").collect()
    assert [bytes(r.payload) for r in out] == [bytes(r.payload) for r in out2]
    other = resize_images(_media(spark), 64, 64).orderBy("doc_id").collect()
    assert bytes(out[0].payload) != bytes(other[0].payload)


def test_sample_video_frames(spark):
    out = sample_video_frames(_media(spark), every_n=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, frames in by_doc.items():
        payload = f"vid-{doc_id}".encode() * (doc_id + 1)
        expected = sample_frames_stub(payload, 2)
        frames.sort(key=lambda r: r.frame_idx)
        assert [bytes(r.frame) for r in frames] == expected
        assert [r.frame_sha256 for r in frames] == [
            hashlib.sha256(f).hexdigest() for f in expected
        ]
    assert set(by_doc) == set(range(6))


def test_extract_media_features(spark):
    out = extract_media_features(_media(spark), dim=16).orderBy("doc_id").collect()
    assert len(out) == 6
    for r in out:
        assert len(r.embedding) == 16
        norm = sum(x * x for x in r.embedding) ** 0.5
        assert abs(norm - 1.0) < 1e-3
    payload = b"vid-0"
    assert out[0].embedding == embed_media_stub(payload, 16)
