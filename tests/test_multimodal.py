"""Multimodal plumbing: binary payload → typed metadata via mapInPandas
(decode stubbed deterministically; Spark-side machinery real)."""

from frontier.multimodal import decode_image_stub, extract_media_metadata


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
