import numpy as np
import pyspark.sql.functions as F
import pytest

from docopenie_spark.operators import multimodal, textstats


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "The quick brown fox jumps over the lazy dog. It is a fine day for the park, and the team is happy to be out in the sun with friends."),
            (2, "el la de que los el la de que los"),
            (3, "xxxx"),
        ],
        "doc_id bigint, text string",
    )


def test_profile_columns_and_values(docs):
    rows = {r.doc_id: r for r in textstats.profile(docs, "doc_id", "text").collect()}
    r1 = rows[1]
    assert r1.n_tokens == 30
    assert r1.n_pieces > r1.n_tokens  # punctuation counted separately
    assert r1.lang_pred == "en"
    assert 0.0 < r1.stopword_ratio < 1.0
    assert r1.quality >= 0.5
    assert rows[2].lang_pred == "es"
    assert rows[3].lang_pred == "und"
    assert rows[3].quality < 0.5


def test_fingerprint_ws_insensitive(spark):
    df = spark.createDataFrame(
        [(1, "a  b\tc"), (2, "a b c"), (3, "a b d")], "doc_id bigint, text string"
    )
    fps = {r.doc_id: r.fp for r in df.select("doc_id", textstats.fingerprint(F.col("text")).alias("fp")).collect()}
    assert fps[1] == fps[2] != fps[3]


def test_rolling_fingerprints_overlap(spark):
    df = spark.createDataFrame(
        [
            (1, "shared prefix content here then tail one"),
            (2, "shared prefix content here then tail two"),
            (3, "entirely different body of words throughout"),
        ],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: set(r.fp) for r in df.select(
        "doc_id", textstats.rolling_fingerprints("text").alias("fp")).collect()}
    overlap_12 = len(out[1] & out[2]) / len(out[1] | out[2])
    overlap_13 = len(out[1] & out[3]) / len(out[1] | out[3])
    assert overlap_12 > 0.5 > overlap_13


def test_multimodal_fake_features(spark):
    media = multimodal.synthetic_media(spark, 12)
    out = multimodal.extract_features(media, dim=8, fake=True)
    rows = out.collect()
    assert len(rows) == 12
    for r in rows:
        assert len(r.features) == 8
        assert all(0.0 <= x <= 1.0 for x in r.features)
    # deterministic: same payload → same features
    again = {r.media_id: r.features for r in multimodal.extract_features(media, dim=8, fake=True).collect()}
    assert {r.media_id: r.features for r in rows} == again


def test_multimodal_real_image_decode_roundtrip():
    """PPM and BMP decode are REAL kernels: exact pixel recovery."""
    import numpy as np

    img = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    assert (multimodal.decode_image(multimodal.encode_ppm(img)) == img).all()

    # hand-built 2x2 24-bit bottom-up BMP (rows padded to 4 bytes)
    px = np.array([[[255, 0, 0], [0, 255, 0]],
                   [[0, 0, 255], [10, 20, 30]]], dtype=np.uint8)
    rows = b""
    for r in px[::-1]:  # bottom-up storage
        row = b"".join(bytes([p[2], p[1], p[0]]) for p in r)  # BGR
        rows += row + b"\0" * ((4 - len(row) % 4) % 4)
    header = (b"BM" + (54 + len(rows)).to_bytes(4, "little") + b"\0\0\0\0"
              + (54).to_bytes(4, "little")
              + (40).to_bytes(4, "little")
              + (2).to_bytes(4, "little") + (2).to_bytes(4, "little")
              + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
              + (0).to_bytes(4, "little") + len(rows).to_bytes(4, "little")
              + b"\0" * 16)
    assert (multimodal.decode_image(header + rows) == px).all()


def test_multimodal_real_audio_decode_and_features():
    import numpy as np

    t = np.arange(8000, dtype=np.float32) / 8000.0
    x = 0.5 * np.sin(2 * np.pi * 440 * t)
    y, sr = multimodal.decode_audio(multimodal.encode_wav(x, 8000))
    assert sr == 8000 and len(y) == len(x)
    assert float(np.abs(y - x).max()) < 1e-3  # PCM16 quantization only
    feats = multimodal.audio_features(y, 4)
    # RMS of a 0.5-amplitude sine = 0.5/sqrt(2)
    assert all(abs(f - 0.5 / np.sqrt(2)) < 0.01 for f in feats)


def test_multimodal_real_features_via_spark(spark):
    """fake=False is the REAL path for decodable kinds: Spark-side
    features equal the local kernel output exactly."""
    import numpy as np

    media = multimodal.synthetic_media(spark, 12)
    decodable = media.where(media.kind != "video")
    got = {r.media_id: r.features
           for r in multimodal.extract_features(decodable, dim=16, fake=False).collect()}
    assert len(got) == 8
    for r in decodable.collect():
        p = bytes(r.payload)
        if r.kind == "image":
            want = multimodal.image_features(multimodal.decode_image(p), 16)
        else:
            want = multimodal.audio_features(multimodal.decode_audio(p)[0], 16)
        assert np.allclose(got[r.media_id], want)


def test_multimodal_video_stub_raises(spark):
    """Video decode needs ffmpeg (absent) — the remaining disclosed stub."""
    media = multimodal.synthetic_media(spark, 3).where("kind = 'video'")
    out = multimodal.extract_features(media, fake=False)
    import pytest as _pt
    with _pt.raises(Exception):
        out.collect()


def test_frame_sample_plan(spark):
    media = multimodal.synthetic_media(spark, 9)
    plan = multimodal.frame_sample_plan(media, every_ms=1000)
    rows = plan.collect()
    assert rows and all(r.frame_ts_ms % 1000 == 0 for r in rows)
    by_media = {}
    for r in rows:
        by_media.setdefault(r.media_id, []).append(r.frame_idx)
    for idxs in by_media.values():
        assert sorted(idxs) == list(range(len(idxs)))  # dense 0-based


def _test_img(h=40, w=56):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [(yy * 7 + xx * 3) % 256, (xx * xx + yy) % 256, (yy * xx + 13) % 256], axis=2
    ).astype(np.uint8)


def test_png_roundtrip_every_filter():
    """The PNG decoder is a REAL kernel (stdlib zlib + closed-form
    unfilters): decode(encode(img, f)) must be byte-identical for every
    scanline filter type 0-4 — Sub's vectorized prefix-sum path and the
    sequential Average/Paeth path both included."""
    img = _test_img()
    for f in range(5):
        out = multimodal.decode_image(multimodal.encode_png(img, filter_type=f))
        assert out.dtype == np.uint8 and out.shape == img.shape
        assert np.array_equal(out, img), f"filter {f}"


def test_png_gray_palette_rgba_decode():
    """Hand-rolled minimal PNGs for the non-RGB color types: 8-bit
    grayscale replicates to 3 channels, palette indexes resolve through
    PLTE, RGBA drops alpha."""
    import zlib

    def chunk(typ, data):
        body = typ + data
        return (
            len(data).to_bytes(4, "big") + body
            + (zlib.crc32(body) & 0xFFFFFFFF).to_bytes(4, "big")
        )

    def png(w, h, ctype, scanlines, extra=b""):
        ihdr = w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([8, ctype, 0, 0, 0])
        return (
            b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + extra
            + chunk(b"IDAT", zlib.compress(scanlines)) + chunk(b"IEND", b"")
        )

    gray = multimodal.decode_image(png(2, 2, 0, b"\x00\x10\x20\x00\x30\x40"))
    assert np.array_equal(gray[:, :, 0], [[0x10, 0x20], [0x30, 0x40]])
    assert np.array_equal(gray[:, :, 0], gray[:, :, 1])
    assert np.array_equal(gray[:, :, 0], gray[:, :, 2])

    plte = chunk(b"PLTE", bytes([255, 0, 0, 0, 255, 0]))
    pal = multimodal.decode_image(png(2, 1, 3, b"\x00\x01\x00", extra=plte))
    assert np.array_equal(pal[0], [[0, 255, 0], [255, 0, 0]])

    rgba = multimodal.decode_image(
        png(1, 1, 6, b"\x00\x09\x08\x07\x80")
    )
    assert np.array_equal(rgba[0, 0], [9, 8, 7])


def test_png_malformed_fails_loud():
    """Malformed payloads must raise, never hang or return garbage
    (the PPM-livelock lesson applied to the new codec)."""
    import pytest as _pt

    good = multimodal.encode_png(_test_img(8, 8), filter_type=4)
    with _pt.raises(ValueError):
        multimodal.decode_image(good[:40])  # truncated mid-chunk
    corrupt = bytearray(good)
    corrupt[50] ^= 0xFF  # damage IDAT → zlib error or filter-byte error
    with _pt.raises((ValueError, NotImplementedError)):
        multimodal.decode_image(bytes(corrupt))
    # 16-bit depth and Adam7 are disclosed NotImplementedError paths
    import zlib as _z

    def chunk(typ, data):
        body = typ + data
        return (
            len(data).to_bytes(4, "big") + body
            + (_z.crc32(body) & 0xFFFFFFFF).to_bytes(4, "big")
        )

    for depth, interlace in ((16, 0), (8, 1)):
        ihdr = (1).to_bytes(4, "big") * 2 + bytes([depth, 2, 0, 0, interlace])
        p = (
            b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", _z.compress(b"\x00\x00\x00\x00")) + chunk(b"IEND", b"")
        )
        with _pt.raises(NotImplementedError):
            multimodal.decode_image(p)


def test_png_flows_through_spark_features(spark):
    """synthetic_media now emits alternating PPM/PNG payloads — the
    mapInPandas feature path must decode both identically to the local
    kernels (the existing PPM test's contract, extended to PNG)."""
    media = multimodal.synthetic_media(spark, 24).where("kind = 'image'")
    payloads = {r.media_id: bytes(r.payload) for r in media.collect()}
    assert any(p[:8] == b"\x89PNG\r\n\x1a\n" for p in payloads.values())
    assert any(p[:2] == b"P6" for p in payloads.values())
    got = {r.media_id: r.features
           for r in multimodal.extract_features(media, dim=16, fake=False).collect()}
    for mid, p in payloads.items():
        want = multimodal.image_features(multimodal.decode_image(p), 16)
        assert np.allclose(got[mid], want)


def test_png_roundtrip_fuzz_mixed_filters():
    """Hypothesis fuzz over the PNG kernel: random image content, random
    dimensions, and a random PER-ROW filter choice (real encoders mix
    filters per scanline — this exercises row-to-row unfilter chaining,
    e.g. Paeth reading an Up-filtered previous row). decode∘encode must
    be the identity everywhere."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(
        st.integers(min_value=1, max_value=12),
        st.integers(min_value=1, max_value=12),
        st.integers(min_value=0, max_value=2**32 - 1),
        st.lists(st.integers(min_value=0, max_value=4), min_size=12, max_size=12),
    )
    @settings(max_examples=150, deadline=None)
    def check(h, w, seed, filters):
        rng = np.random.RandomState(seed % 2**31)
        img = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        payload = multimodal.encode_png(img, filter_type=filters[:h])
        assert np.array_equal(multimodal.decode_image(payload), img)

    check()
