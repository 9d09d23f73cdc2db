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
        assert all(0.0 <= x < 1.0 for x in r.embedding)
    payload = b"vid-0"
    assert out[0].embedding == embed_media_stub(payload, 16)
    # components are hash bytes / 256 (exact dyadic rationals; the
    # media_features oracle recomputes the squared norm from SQL)
    digest = hashlib.sha256(payload).digest()
    assert out[0].embedding == [digest[i] / 256.0 for i in range(16)]
    # dim > 32 extends the digest chain deterministically
    long = embed_media_stub(payload, 48)
    assert long[:32] == [b / 256.0 for b in digest]


# --- real image header parsing (PNG/GIF/BMP/JPEG, pure stdlib) ---------------


def test_parse_image_header_roundtrip():
    from frontier.multimodal import build_image_payload, parse_image_header

    for fmt in ("png", "gif", "bmp", "jpeg"):
        for w, h in [(1, 1), (123, 45), (640, 480), (5000, 3)]:
            payload = build_image_payload(fmt, w, h, b"pixels" * 3)
            meta = parse_image_header(payload)
            assert meta == {
                "media_type": fmt,
                "width": w,
                "height": h,
                "n_frames": 1,
            }, (fmt, w, h, meta)


def test_parse_image_header_edge_cases():
    import struct

    from frontier.multimodal import build_image_payload, parse_image_header

    # BMP top-down rows encode a negative height; dimension is its magnitude
    bmp = bytearray(build_image_payload("bmp", 10, 20))
    bmp[22:26] = struct.pack("<i", -20)
    assert parse_image_header(bytes(bmp)) == {
        "media_type": "bmp", "width": 10, "height": 20, "n_frames": 1,
    }
    # JPEG with APP0/JFIF segment before SOF0 (the common layout)
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof = build_image_payload("jpeg", 77, 88)[2:]
    assert parse_image_header(b"\xff\xd8" + app0 + sof) == {
        "media_type": "jpeg", "width": 77, "height": 88, "n_frames": 1,
    }
    # garbage / truncated payloads return None, never raise
    for junk in (
        b"",
        b"BM",
        b"\x89PNG\r\n\x1a\n",
        b"\x89PNG\r\n\x1a\n" + b"\x00" * 8 + b"XXXX" + b"\x00" * 8,
        b"\xff\xd8\xff",
        b"\xff\xd8" + b"\x00" * 40,
        b"GIF89a\x01",
        b"plain text, not an image",
    ):
        assert parse_image_header(junk) is None, junk


def test_extract_media_metadata_real_headers(spark):
    from frontier.multimodal import build_image_payload

    rows = [
        (0, build_image_payload("png", 320, 200, b"f" * 10)),
        (1, build_image_payload("gif", 16, 9)),
        (2, build_image_payload("bmp", 800, 600, b"zz")),
        (3, build_image_payload("jpeg", 1920, 1080)),
        (4, b"not an image at all"),
    ]
    media = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r for r in extract_media_metadata(media).collect()}
    assert (got[0].media_type, got[0].width, got[0].height) == ("png", 320, 200)
    assert (got[1].media_type, got[1].width, got[1].height) == ("gif", 16, 9)
    assert (got[2].media_type, got[2].width, got[2].height) == ("bmp", 800, 600)
    assert (got[3].media_type, got[3].width, got[3].height) == ("jpeg", 1920, 1080)
    # non-image falls back to the deterministic stub under the given label
    assert got[4].media_type == "image"
    stub = decode_image_stub(b"not an image at all")
    assert (got[4].width, got[4].height, got[4].n_frames) == (
        stub["width"], stub["height"], stub["n_frames"],
    )


def test_synth_media_payloads_contract(spark):
    """The oracle's closed form: fmt/dims/sizes derive from doc_id/text."""
    from frontier.multimodal import parse_image_header
    from frontier.synth import synth_media_payloads

    docs = spark.createDataFrame(
        [(i, "word " * (i + 1)) for i in range(8)], "doc_id long, text string"
    )
    out = {r.doc_id: bytes(r.payload) for r in synth_media_payloads(docs).collect()}
    fmts = ["png", "gif", "bmp", "jpeg"]
    hdr = {"png": 57, "gif": 14, "bmp": 54, "jpeg": 21}
    for i in range(8):
        meta = parse_image_header(out[i])
        fmt = fmts[i % 4]
        assert meta["media_type"] == fmt
        assert meta["width"] == 1 + i % 640
        assert meta["height"] == 1 + (i * 7) % 480
        text_bytes = min(64, len("word " * (i + 1)))
        assert len(out[i]) == hdr[fmt] + text_bytes


# --- audio (WAV) headers ---------------------------------------------------------


def test_parse_wav_header_roundtrip():
    from frontier.multimodal import build_wav_payload, parse_wav_header

    for ch, rate, bits, n in [
        (1, 8000, 8, 1),          # odd data size -> pad byte
        (2, 44100, 16, 2000),
        (1, 22050, 16, 441),
        (2, 16000, 8, 7),
    ]:
        wav = build_wav_payload(ch, rate, bits, n)
        meta = parse_wav_header(wav)
        assert meta == {
            "media_type": "wav",
            "audio_format": 1,
            "channels": ch,
            "sample_rate_hz": rate,
            "bits_per_sample": bits,
            "n_samples": n,
            "duration_ms": (n * 1000) // rate,
        }
        data = n * ch * (bits // 8)
        assert len(wav) == 44 + data + (data & 1)


def test_parse_wav_header_chunk_walk_and_garbage():
    import struct

    from frontier.multimodal import build_wav_payload, parse_wav_header

    # a stranger chunk (odd-sized LIST, word-aligned) before fmt/data
    wav = build_wav_payload(1, 8000, 16, 4)
    stranger = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"
    spliced = wav[:12] + stranger + wav[12:]
    spliced = b"RIFF" + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    meta = parse_wav_header(spliced)
    assert meta is not None and meta["n_samples"] == 4

    assert parse_wav_header(b"") is None
    assert parse_wav_header(b"RIFF\x00\x00\x00\x00JUNK") is None
    assert parse_wav_header(b"not audio at all") is None
    # truncated right after the WAVE tag: no chunks -> None
    assert parse_wav_header(wav[:12]) is None
    # fmt present but no data chunk
    no_data = wav[: 12 + 8 + 16]
    assert parse_wav_header(no_data) is None


def test_extract_audio_metadata_real_and_stub(spark):
    from frontier.multimodal import build_wav_payload, extract_audio_metadata

    rows = [
        (0, build_wav_payload(2, 44100, 16, 441)),  # real WAV: 10 ms
        (1, b"\xffOggS pretend-stream"),            # stub fallback
        (2, None),                                   # null payload -> stub
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in extract_audio_metadata(df).collect()}
    assert got[0]["media_type"] == "wav"
    assert got[0]["channels"] == 2
    assert got[0]["sample_rate_hz"] == 44100
    assert got[0]["duration_ms"] == 10
    assert got[0]["n_bytes"] == 44 + 441 * 2 * 2
    assert got[1]["media_type"] == "audio"  # stub label
    assert got[1]["channels"] in (1, 2)
    assert got[2]["media_type"] == "audio"


try:
    from hypothesis import given, settings, strategies as st

    _HAS_HYP = True
except ImportError:  # pragma: no cover
    _HAS_HYP = False


if _HAS_HYP:

    @given(payload=st.binary(max_size=300))
    @settings(max_examples=200, deadline=None)
    def test_parse_wav_header_never_raises(payload):
        from frontier.multimodal import parse_wav_header

        meta = parse_wav_header(payload)
        assert meta is None or meta["media_type"] == "wav"

    @given(
        ch=st.integers(1, 8),
        rate=st.integers(1, 192000),
        bits=st.sampled_from([8, 16, 24, 32]),
        n=st.integers(0, 5000),
    )
    @settings(max_examples=100, deadline=None)
    def test_wav_roundtrip_property(ch, rate, bits, n):
        from frontier.multimodal import build_wav_payload, parse_wav_header

        meta = parse_wav_header(build_wav_payload(ch, rate, bits, n))
        assert meta is not None
        assert (meta["channels"], meta["sample_rate_hz"],
                meta["bits_per_sample"], meta["n_samples"]) == (ch, rate, bits, n)
        assert meta["duration_ms"] == (n * 1000) // rate


def test_parse_mp3_header_roundtrip_and_tables():
    from frontier.multimodal import build_mp3_payload, parse_mp3_header

    # all valid (bitrate, rate) table entries roundtrip
    rates = [44100, 48000, 32000]
    brs = [32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]
    for bi in range(1, 15):
        for ri in range(3):
            meta = parse_mp3_header(build_mp3_payload(bi, ri, mono=bool(bi % 2)))
            assert meta == {
                "media_type": "mp3",
                "channels": 1 if bi % 2 else 2,
                "sample_rate_hz": rates[ri],
                "bitrate_kbps": brs[bi - 1],
            }


def test_parse_mp3_header_id3_skip_and_rejects():
    from frontier.multimodal import build_mp3_payload, parse_mp3_header

    # ID3v2 tag skipped via syncsafe size (including sizes > 127)
    tagged = build_mp3_payload(9, 0, mono=False, id3_pad=300)
    meta = parse_mp3_header(tagged)
    assert meta is not None and meta["bitrate_kbps"] == 128
    assert len(tagged) == 10 + 300 + 4 + 100

    assert parse_mp3_header(b"") is None
    assert parse_mp3_header(b"ID3\x04\x00\x00\x00\x00\x00\x05trunc") is None
    assert parse_mp3_header(b"\xff\xe0\x00\x00") is None  # MPEG2.5 reserved
    # free bitrate (0) and invalid (15) indices reject
    assert parse_mp3_header(build_mp3_payload(0, 0, False)) is None
    assert parse_mp3_header(build_mp3_payload(15, 0, False)) is None
    # reserved sample-rate index rejects
    assert parse_mp3_header(build_mp3_payload(9, 3, False)) is None
    assert parse_mp3_header(b"plain text, not audio") is None


def test_extract_mp3_metadata_dataframe(spark):
    from frontier.multimodal import build_mp3_payload, extract_mp3_metadata

    df = spark.createDataFrame(
        [(0, build_mp3_payload(14, 1, mono=True, n_data=50)),
         (1, b"OggS not an mp3"), (2, None)],
        "doc_id long, payload binary",
    )
    got = {r["doc_id"]: r for r in extract_mp3_metadata(df).collect()}
    assert got[0]["media_type"] == "mp3"
    assert got[0]["bitrate_kbps"] == 320
    assert got[0]["sample_rate_hz"] == 48000
    assert got[0]["channels"] == 1
    assert got[0]["n_bytes"] == 4 + 50
    assert got[1]["media_type"] == "unknown"
    assert got[1]["bitrate_kbps"] is None
    assert got[2]["media_type"] == "unknown"


# --- REAL pixel / PCM decode layer -------------------------------------------

def test_bmp_pixel_roundtrip_all_paddings():
    """decode(encode(a)) == a for every width mod 4 (each hits a different
    row-padding size) and both tall/flat shapes."""
    import numpy as np
    from frontier.multimodal import decode_bmp_pixels, encode_bmp

    rng = np.random.default_rng(7)
    for w in (1, 2, 3, 4, 5, 6, 7, 8):
        for h in (1, 3, 5):
            a = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            back = decode_bmp_pixels(encode_bmp(a))
            assert back is not None
            assert (back == a).all(), (w, h)


def test_bmp_decode_orientation_and_channels():
    """A single marked pixel at logical (x=1, y=0, red) comes back at the
    same logical spot — the bottom-up flip and BGR swap must both happen."""
    import numpy as np
    from frontier.multimodal import decode_bmp_pixels, encode_bmp

    a = np.zeros((2, 3, 3), dtype=np.uint8)
    a[0, 1, 0] = 200  # top row, middle column, red channel
    back = decode_bmp_pixels(encode_bmp(a))
    assert back[0, 1, 0] == 200
    assert back.sum() == 200


def test_bmp_decode_rejects_non_decodable():
    from frontier.multimodal import build_image_payload, decode_bmp_pixels

    assert decode_bmp_pixels(b"") is None
    assert decode_bmp_pixels(b"BMgarbage") is None
    assert decode_bmp_pixels(build_image_payload("png", 4, 4)) is None
    # header-only BMP (no pixel array) must not decode
    assert decode_bmp_pixels(build_image_payload("bmp", 64, 64)) is None


def test_resize_nearest_floor_mapping():
    """8x6 -> 4x3 with the floor mapping selects exactly src (2x, 2y)."""
    import numpy as np
    from frontier.multimodal import resize_nearest

    a = np.arange(8 * 6 * 3, dtype=np.uint8).reshape(6, 8, 3)
    r = resize_nearest(a, 4, 3)
    assert r.shape == (3, 4, 3)
    for y in range(3):
        for x in range(4):
            assert (r[y, x] == a[2 * y, 2 * x]).all()


def test_resize_image_real_falls_back_for_codecs():
    from frontier.multimodal import (
        build_image_payload, resize_image_real, resize_image_stub,
    )

    jpeg = build_image_payload("jpeg", 10, 10, b"xx")
    assert resize_image_real(jpeg, 4, 3) == resize_image_stub(jpeg, 4, 3)


def test_wav_sample_roundtrip_and_framing():
    """int16 samples survive encode->decode byte-exactly, including through
    an odd-sized preceding chunk (word-alignment walk)."""
    import struct

    import numpy as np
    from frontier.multimodal import build_wav_payload, decode_wav_samples

    samples = np.array([0, 1, -1, 32767, -32768, 5], dtype="<i2")
    payload = build_wav_payload(1, 16000, 16, 6, data=samples.tobytes())
    out, meta = decode_wav_samples(payload)
    assert (out == samples).all()
    assert meta["n_samples"] == 6

    # splice an odd-length LIST chunk between fmt and data: the walk must
    # skip its pad byte and still frame the data chunk correctly
    fmt_end = 12 + 8 + 16
    spliced = (
        payload[:fmt_end]
        + b"LIST" + struct.pack("<I", 3) + b"abc\x00"
        + payload[fmt_end:]
    )
    riff_size = len(spliced) - 8
    spliced = spliced[:4] + struct.pack("<I", riff_size) + spliced[8:]
    out2, _ = decode_wav_samples(spliced)
    assert (out2 == samples).all()


def test_pixel_stats_kernel_real_values(spark):
    """image_pixel_stats over a hand-built 2x2 BMP: exact sums + moments."""
    import numpy as np
    from frontier.multimodal import encode_bmp, image_pixel_stats

    a = np.array(
        [[[10, 20, 30], [40, 50, 60]],
         [[70, 80, 90], [100, 110, 120]]],
        dtype=np.uint8,
    )
    df = spark.createDataFrame(
        [(1, bytearray(encode_bmp(a)))], "doc_id long, payload binary"
    )
    row = image_pixel_stats(df).collect()[0]
    assert (row.width, row.height) == (2, 2)
    assert row.sum_r == 10 + 40 + 70 + 100
    assert row.sum_g == 20 + 50 + 80 + 110
    assert row.sum_b == 30 + 60 + 90 + 120
    assert row.moment_x == (40 + 50 + 60) + (100 + 110 + 120)
    assert row.moment_y == (70 + 80 + 90) + (100 + 110 + 120)


def test_pcm_stats_kernel_real_values(spark):
    import numpy as np
    from frontier.multimodal import audio_pcm_stats, build_wav_payload

    samples = np.array([3, -2, -2, 5, 0, -1], dtype="<i2")
    payload = build_wav_payload(1, 8000, 16, 6, data=samples.tobytes())
    df = spark.createDataFrame(
        [(1, bytearray(payload)), (2, bytearray(b"not a wav"))],
        "doc_id long, payload binary",
    )
    rows = audio_pcm_stats(df).collect()
    assert len(rows) == 1  # non-WAV yields no row
    r = rows[0]
    assert r.n_samples == 6
    assert r.sum_amp == 3
    assert r.sum_abs == 13
    # sign(x) = x < 0: 3,-2 | -2,5 | 5,0(no) | 0,-1 -> 3 crossings
    assert r.zero_crossings == 3


def test_png_roundtrip_every_filter():
    """decode(encode(a, f)) == a for each single filter type and the
    cycling selector, across widths that stress the left-neighbor logic."""
    import numpy as np
    from frontier.multimodal import decode_png_pixels, encode_png

    rng = np.random.default_rng(11)
    for w in (1, 2, 5, 8):
        a = rng.integers(0, 256, size=(5, w, 3), dtype=np.uint8)
        for f in (0, 1, 2, 3, 4):
            back = decode_png_pixels(encode_png(a, lambda y, f=f: f))
            assert back is not None and (back == a).all(), (w, f)
        back = decode_png_pixels(encode_png(a, lambda y: y % 5))
        assert (back == a).all(), w


def test_png_decode_rejects_unsupported():
    from frontier.multimodal import build_image_payload, decode_png_pixels

    # build_image_payload PNGs are color type 6 (RGBA) with junk IDAT:
    # honest None, not garbage pixels
    assert decode_png_pixels(build_image_payload("png", 4, 4, b"zz")) is None
    assert decode_png_pixels(b"") is None
    assert decode_png_pixels(b"\x89PNG\r\n\x1a\ngarbage") is None


def test_resize_image_real_png_path():
    """PNG resize goes through the REAL path: decode the resized output and
    check the floor-mapped source pixels were selected."""
    import numpy as np
    from frontier.multimodal import (
        decode_png_pixels, encode_png, resize_image_real,
    )

    a = np.arange(6 * 8 * 3, dtype=np.uint8).reshape(6, 8, 3)
    out = resize_image_real(encode_png(a, lambda y: y % 5), 4, 3)
    back = decode_png_pixels(out)
    assert back.shape == (3, 4, 3)
    for y in range(3):
        for x in range(4):
            assert (back[y, x] == a[2 * y, 2 * x]).all()


def test_image_dhash_kernel_exact_bits(spark):
    """image_dhash over a hand-built BMP: recompute the 64 dHash bits in
    plain Python (floor-mapped 9x8 resample, integer gray, right>left
    comparisons, 16-bit row-pair bands) and demand exact band values."""
    import numpy as np
    from frontier.multimodal import encode_bmp, image_dhash

    rng = np.random.default_rng(7)
    a = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
    df = spark.createDataFrame(
        [(1, bytearray(encode_bmp(a))), (2, bytearray(b"junk"))],
        "doc_id long, payload binary",
    )
    rows = image_dhash(df).collect()
    assert len(rows) == 1  # undecodable payload yields no row
    h, w = a.shape[:2]
    gray = [
        [int(a[(gy * h) // 8, (gx * w) // 9].astype(int).sum()) // 3
         for gx in range(9)]
        for gy in range(8)
    ]
    bands = [0, 0, 0, 0]
    for gy in range(8):
        for gx in range(8):
            if gray[gy][gx + 1] > gray[gy][gx]:
                bands[gy // 2] |= 1 << ((gy % 2) * 8 + gx)
    r = rows[0]
    assert (r.b0, r.b1, r.b2, r.b3) == tuple(bands)


def test_image_dhash_neardup_invariance(spark):
    """The planted near-dup payloads (uniform brightness shift) hash to
    identical dHash bands — the property the dedup_image_dhash pairing
    relies on — while an unrelated base image differs."""
    from frontier.multimodal import image_dhash
    from frontier.synth import synth_bmp_neardup_payloads

    docs = spark.createDataFrame(
        [(i,) for i in (0, 1, 2, 3)], "doc_id long"
    )
    rows = {
        r.doc_id: (r.b0, r.b1, r.b2, r.b3)
        for r in image_dhash(synth_bmp_neardup_payloads(docs)).collect()
    }
    assert rows[0] == rows[1] == rows[2]  # same base, brightness variants
    assert len(rows) == 4
