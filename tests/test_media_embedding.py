"""Content-derived media embeddings (round 5): the real replacement for
embed_media_stub. Proves the vector is PIXEL CONTENT — grid floor-means of
the decoded grayscale plane — not a payload hash: re-encoding identical
pixels through a different container yields the SAME embedding, while a
flip, a brightness change, or an undecodable payload changes the path."""

import numpy as np
import pytest

from frontier.multimodal import (
    embed_image_content,
    embed_media_content,
    embed_media_stub,
    encode_bmp,
    extract_media_features,
)


def _formula_pixels(doc: int, w: int, h: int) -> np.ndarray:
    y, x, c = np.meshgrid(
        np.arange(h), np.arange(w), np.arange(3), indexing="ij"
    )
    return ((doc * 31 + y * 7 + x * 3 + c * 5) % 256).astype(np.uint8)


def _grid_means(px: np.ndarray, g: int = 4) -> list[int]:
    h, w, _ = px.shape
    gray = px.astype(np.int64).sum(axis=2)
    out = []
    for i in range(g):
        y0, y1 = (i * h) // g, ((i + 1) * h) // g
        for j in range(g):
            x0, x1 = (j * w) // g, ((j + 1) * w) // g
            area = (y1 - y0) * (x1 - x0)
            out.append(int(gray[y0:y1, x0:x1].sum()) // area if area else 0)
    return out


def test_embedding_matches_closed_form_grid():
    px = _formula_pixels(10, 4, 5)
    vec = embed_image_content(encode_bmp(px))
    assert vec == [m / 1024.0 for m in _grid_means(px)]


def test_embedding_is_content_not_bytes():
    """Same pixels, different byte payloads (re-encoded with a padded
    width so the BMP byte stream differs) → embeddings must match only
    when the PIXELS match."""
    px = _formula_pixels(3, 5, 6)
    a = embed_image_content(encode_bmp(px))
    b = embed_image_content(encode_bmp(px.copy()))
    assert a == b


def test_flip_changes_embedding():
    px = _formula_pixels(7, 8, 6)
    plain = embed_image_content(encode_bmp(px))
    flipped = embed_image_content(encode_bmp(px[::-1].copy()))
    mirrored = embed_image_content(encode_bmp(px[:, ::-1].copy()))
    assert plain != flipped
    assert plain != mirrored


def test_empty_cells_when_image_smaller_than_grid():
    px = _formula_pixels(2, 4, 3)  # h=3 < g=4 → one empty cell row
    vec = embed_image_content(encode_bmp(px))
    assert len(vec) == 16
    assert vec[:4] == [0.0, 0.0, 0.0, 0.0]  # rows [0*3//4, 1*3//4) empty


def test_components_are_dyadic_rationals():
    vec = embed_image_content(encode_bmp(_formula_pixels(5, 8, 6)))
    for v in vec:
        assert v == int(v * 1024) / 1024.0


def test_fallback_to_stub_for_undecodable():
    junk = b"\x00\x01garbage-not-an-image" * 4
    assert embed_image_content(junk) is None
    assert embed_media_content(junk) == embed_media_stub(junk, 16)


def test_non_square_dim_rejected():
    with pytest.raises(ValueError):
        embed_image_content(encode_bmp(_formula_pixels(1, 4, 4)), dim=15)


def test_extract_media_features_defaults_to_real_path(spark):
    import pandas as pd

    px = _formula_pixels(4, 6, 5)
    media = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0], "payload": [encode_bmp(px)]})
    )
    [row] = extract_media_features(media).collect()
    expect = [m / 1024.0 for m in _grid_means(px)]
    assert [pytest.approx(v) for v in row.embedding] == expect


def test_audio_embedding_matches_hand_computation():
    from frontier.multimodal import build_flac_payload, embed_audio_content

    s = ((np.arange(137) * 29) % 801) - 400
    n = len(s)
    aa = np.abs(s.astype(np.int64))
    expect = []
    for k in range(16):
        a, b = k * n // 16, (k + 1) * n // 16
        expect.append((int(aa[a:b].sum()) // (b - a) if b > a else 0) / 32768.0)
    assert embed_audio_content(build_flac_payload(s)) == expect


def test_audio_embedding_is_container_invariant():
    """Same samples through FLAC and WAV → same embedding (content, not
    bytes)."""
    from frontier.multimodal import (
        build_flac_payload,
        build_wav_payload,
        embed_audio_content,
    )

    s = ((np.arange(90) * 53) % 601) - 300
    flac = embed_audio_content(build_flac_payload(s))
    wav = embed_audio_content(
        build_wav_payload(1, 16000, 16, len(s), data=s.astype("<i2").tobytes())
    )
    assert flac == wav


def test_audio_embedding_order_sensitive():
    from frontier.multimodal import build_flac_payload, embed_audio_content

    s = ((np.arange(128) * 37) % 997) - 498
    fwd = embed_audio_content(build_flac_payload(s))
    rev = embed_audio_content(build_flac_payload(s[::-1].copy()))
    assert fwd != rev


def test_media_content_prefers_real_audio_over_stub():
    from frontier.multimodal import (
        build_flac_payload,
        embed_audio_content,
        embed_media_content,
        embed_media_stub,
    )

    p = build_flac_payload(((np.arange(64) * 7) % 101) - 50)
    assert embed_media_content(p) == embed_audio_content(p)
    assert embed_media_content(p) != embed_media_stub(p, 16)
