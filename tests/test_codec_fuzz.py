"""Property-based fuzz for the REAL media codecs (no Spark needed):
BMP and PNG encode→decode round-trips over random pixel arrays, shapes,
and PNG filter selections, plus never-raises on random garbage bytes —
the same adversarial posture as the parse-kernel fuzz suites."""

import numpy as np
from hypothesis import given, settings, strategies as st

from frontier.multimodal import (
    decode_bmp_pixels,
    decode_png_pixels,
    decode_wav_samples,
    encode_bmp,
    encode_png,
    parse_image_header,
)


@st.composite
def _pixel_arrays(draw):
    w = draw(st.integers(min_value=1, max_value=12))
    h = draw(st.integers(min_value=1, max_value=10))
    data = draw(
        st.binary(min_size=w * h * 3, max_size=w * h * 3)
    )
    return np.frombuffer(data, dtype=np.uint8).reshape(h, w, 3).copy()


@settings(max_examples=60, deadline=None)
@given(_pixel_arrays())
def test_bmp_roundtrip_fuzz(pixels):
    payload = encode_bmp(pixels)
    # header parser agrees with the encode dims
    meta = parse_image_header(payload)
    assert (meta["width"], meta["height"]) == (
        pixels.shape[1], pixels.shape[0],
    )
    back = decode_bmp_pixels(payload)
    assert (back == pixels).all()


@settings(max_examples=40, deadline=None)
@given(
    _pixel_arrays(),
    st.lists(st.integers(min_value=0, max_value=4), min_size=10, max_size=10),
)
def test_png_roundtrip_fuzz(pixels, filters):
    payload = encode_png(pixels, filter_for_row=lambda y: filters[y % 10])
    meta = parse_image_header(payload)
    assert (meta["width"], meta["height"]) == (
        pixels.shape[1], pixels.shape[0],
    )
    back = decode_png_pixels(payload)
    assert (back == pixels).all()


@settings(max_examples=80, deadline=None)
@given(st.binary(max_size=512))
def test_decoders_never_raise_on_garbage(blob):
    decode_bmp_pixels(blob)
    decode_png_pixels(blob)
    decode_wav_samples(blob)
    parse_image_header(blob)


@settings(max_examples=80, deadline=None)
@given(st.binary(max_size=256))
def test_decoders_never_raise_on_magic_prefixed_garbage(blob):
    """Garbage wearing a real magic number exercises the deep branches."""
    for prefix in (b"BM", b"\x89PNG\r\n\x1a\n", b"RIFF", b"RIFFxxxxWAVE"):
        decode_bmp_pixels(prefix + blob)
        decode_png_pixels(prefix + blob)
        decode_wav_samples(prefix + blob)
        parse_image_header(prefix + blob)
