"""REAL TIFF codec (round 5, sixth cascade format): baseline 8-bit
gray/RGB, both byte orders, uncompressed + PackBits, multi-strip."""

import numpy as np

from frontier.multimodal import (
    _packbits_decode,
    _packbits_encode,
    decode_image_pixels,
    decode_tiff_pixels,
    encode_tiff,
)


def _formula_pixels(doc: int) -> np.ndarray:
    w, h = 4 + doc % 5, 3 + doc % 4
    y, x, c = np.meshgrid(
        np.arange(h), np.arange(w), np.arange(3), indexing="ij"
    )
    return ((doc * 31 + y * 7 + x * 3 + c * 5) % 256).astype(np.uint8)


def test_packbits_roundtrip_fuzz():
    import random

    random.seed(7)
    for _ in range(300):
        data = bytes(random.choices(range(6), k=random.randrange(0, 400)))
        assert _packbits_decode(_packbits_encode(data)) == data


def test_rgb_roundtrip_all_variants():
    for doc in range(40):
        px = _formula_pixels(doc)
        for bo in ("<", ">"):
            for comp in (1, 32773):
                for rps in (1, 2, 100):
                    out = decode_tiff_pixels(
                        encode_tiff(px, byteorder=bo, compression=comp,
                                    rows_per_strip=rps)
                    )
                    assert out is not None and np.array_equal(out, px)


def test_gray_replicates_to_rgb():
    g = _formula_pixels(9)[:, :, 0]
    out = decode_tiff_pixels(encode_tiff(g, compression=32773))
    assert np.array_equal(out, np.repeat(g[:, :, None], 3, axis=2))


def test_cascade_dispatches_tiff():
    px = _formula_pixels(11)
    assert np.array_equal(decode_image_pixels(encode_tiff(px)), px)
    assert np.array_equal(
        decode_image_pixels(encode_tiff(px, byteorder=">")), px
    )


def test_unsupported_and_garbage_rejected():
    px = _formula_pixels(3)
    payload = bytearray(encode_tiff(px))
    assert decode_tiff_pixels(b"garbage") is None
    assert decode_tiff_pixels(b"II*\x00\x08") is None
    # truncated strip data
    assert decode_tiff_pixels(bytes(payload[:-2])) is None
    # unsupported compression tag (LZW = 5)
    lzw = bytearray(encode_tiff(px))
    idx = lzw.find((259).to_bytes(2, "little"), 8)
    lzw[idx + 8] = 5
    assert decode_tiff_pixels(bytes(lzw)) is None
