"""No-dependency media codecs (BMP/PPM/WAV struct parsing) — golden
round-trips, exact feature statistics, and parity between the engine
decoder (NumPy) and the independent byte-walking oracle decoder
(VERDICT r2 next-round #6)."""

from __future__ import annotations

import numpy as np
import pytest

from pears_fruit_fly_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_bmp,
    decode_ppm,
    decode_wav,
    encode_bmp,
    encode_ppm,
    encode_wav,
    media_features,
)
from pears_fruit_fly_spark.oracle.media_oracle import media_features_oracle


@pytest.mark.parametrize("w,h", [(1, 1), (2, 2), (3, 5), (4, 3), (17, 9)])
def test_bmp_roundtrip(w, h):
    """Pixel-exact BMP round-trip, including widths whose 3*w is not a
    multiple of 4 (row padding)."""
    rng = np.random.default_rng(w * 100 + h)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    data = encode_bmp(px)
    assert data[:2] == b"BM"
    out = decode_bmp(data)
    assert out.shape == (h, w, 3)
    assert np.array_equal(out, px)


@pytest.mark.parametrize("w,h", [(1, 1), (3, 2), (16, 16)])
def test_ppm_roundtrip(w, h):
    rng = np.random.default_rng(w + h)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    data = encode_ppm(px)
    assert data[:2] == b"P6"
    assert np.array_equal(decode_ppm(data), px)


@pytest.mark.parametrize("ch,n", [(1, 1), (1, 100), (2, 64), (2, 333)])
def test_wav_roundtrip(ch, n):
    rng = np.random.default_rng(ch * 1000 + n)
    samples = rng.integers(-32768, 32768, size=(n, ch)).astype(np.int16)
    data = encode_wav(samples, 16000)
    rate, got_ch, got = decode_wav(data)
    assert (rate, got_ch) == (16000, ch)
    assert np.array_equal(got, samples)


def test_wav_skips_unknown_chunks():
    """Chunk-walking parse: an extra LIST chunk between fmt and data must
    not break decoding (real-world WAVs carry metadata chunks)."""
    samples = np.arange(-5, 5, dtype=np.int16).reshape(10, 1)
    data = bytearray(encode_wav(samples, 8000))
    # splice a LIST chunk (odd size -> exercises word alignment) after fmt
    insert_at = 12 + 8 + 16  # RIFF hdr + fmt chunk
    import struct

    extra = struct.pack("<4sI", b"LIST", 5) + b"INFOx" + b"\x00"
    data[insert_at:insert_at] = extra
    struct.pack_into("<I", data, 4, len(data) - 8)
    rate, ch, got = decode_wav(bytes(data))
    assert rate == 8000 and ch == 1
    assert np.array_equal(got, samples)


def test_image_features_golden():
    """Known 2x2 image -> exact hand-computed feature values."""
    px = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [10, 20, 30]]],
        dtype=np.uint8,
    )
    for enc, tag in [(encode_bmp, 1.0), (encode_ppm, 2.0)]:
        f = media_features(enc(px))
        assert f[0] == tag
        assert (f[1], f[2], f[3]) == (2.0, 2.0, 3.0)
        assert f[4] == np.float32((255 + 0 + 0 + 10) / 4)   # mean R
        assert f[5] == np.float32((0 + 255 + 0 + 20) / 4)   # mean G
        assert f[6] == np.float32((0 + 0 + 255 + 30) / 4)   # mean B
        assert (f[7], f[8], f[9]) == (0.0, 255.0, 4.0)
        assert all(x == 0.0 for x in f[10:])


def test_wav_features_golden():
    samples = np.array([[100], [-100], [300], [-300]], dtype=np.int16)
    f = media_features(encode_wav(samples, 8000))
    assert f[0] == 3.0
    assert (f[1], f[2], f[3]) == (8000.0, 1.0, 4.0)
    assert f[4] == np.float32(0.0)  # mean
    assert f[5] == np.float32(np.sqrt((100**2 + 100**2 + 300**2 + 300**2) / 4))
    assert (f[6], f[7]) == (-300.0, 300.0)
    assert f[8] == 3.0  # sign transitions: + - + -


def test_malformed_payloads_fall_back_to_hash():
    """Truncated/corrupt containers must yield hash features, not raise."""
    import struct

    # channels=0 fmt chunk: must fall back, not ZeroDivisionError
    zero_ch = (
        struct.pack("<4sI", b"RIFF", 40) + b"WAVE"
        + struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 0, 8000, 0, 0, 16)
        + struct.pack("<4sI", b"data", 4) + b"\x01\x02\x03\x04"
    )
    bad = [b"BM\x00\x01", b"P6\n9 9\n255", b"RIFF\x00\x00\x00\x00WAVE",
           zero_ch, b"\x89PNG\r\n", b""]
    for payload in bad[:-1]:
        f = media_features(payload)
        assert f[0] == 0.0 and len(f) == FEATURE_DIM
        assert all(0.0 <= x <= 1.0 for x in f[1:])


def test_engine_vs_independent_oracle_parity():
    """Engine decoder (NumPy) and oracle decoder (byte loops) must agree
    bit-for-bit on every fixture payload class, incl. the hash fallback."""
    rng = np.random.default_rng(7)
    payloads = []
    for w, h in [(3, 4), (8, 8), (31, 17)]:
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        payloads += [encode_bmp(px), encode_ppm(px)]
    for ch in (1, 2):
        s = rng.integers(-32768, 32768, size=(777, ch)).astype(np.int16)
        payloads.append(encode_wav(s, 44100))
    payloads.append(bytes(rng.integers(0, 256, size=500, dtype=np.uint8)))
    # truncated PPM headers: the oracle's token scan must terminate (it
    # used to spin past the end of the buffer — review finding) and agree
    # with the engine's hash fallback
    payloads += [b"P6\n12", b"P6", b"P6 3 4", b"P6\n9 9\n255"]
    for p in payloads:
        engine = [float(x) for x in media_features(p)]
        oracle = media_features_oracle(p)
        assert engine == oracle, (p[:8], engine, oracle)


def test_decode_media_real_fails_fast_without_pillow(spark):
    """Pillow-free environments (this sandbox) must get ONE clear driver
    error at plan-build time, not per-task ImportErrors mid-job."""
    try:
        import PIL  # noqa: F401
        pytest.skip("pillow installed here; the guard branch is inert")
    except ImportError:
        pass
    from pears_fruit_fly_spark.operators.multimodal import (
        decode_media_real,
        make_media_fixture,
    )

    with pytest.raises(RuntimeError, match="requires pillow"):
        decode_media_real(make_media_fixture(spark, n=3))


def test_decode_media_real_decodes_compressed_images(spark):
    """With Pillow present, PNG payloads decode to the same exact-integer
    pixel stats the native path computes for BMP (tag aside), and
    non-image payloads fall back to the no-dependency features."""
    Image = pytest.importorskip("PIL.Image")
    import io

    from pears_fruit_fly_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        PIL_IMAGE_TAG,
        decode_media_real,
    )

    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, size=(7, 11, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(px).save(buf, format="PNG")
    png = buf.getvalue()
    wav = encode_wav(
        rng.integers(-32768, 32768, size=(64, 1)).astype(np.int16), 8000
    )
    df = spark.createDataFrame(
        [(0, "image", bytearray(png), "image/png", 11, 7, None),
         (1, "audio", bytearray(wav), "audio/wav", None, None, 8)],
        MEDIA_SCHEMA,
    )
    got = {r["media_id"]: r["features"] for r in decode_media_real(df).collect()}
    sums = px.reshape(-1, 3).astype(np.int64).sum(axis=0)
    n_px = 7 * 11
    exp = [PIL_IMAGE_TAG, 11.0, 7.0, 3.0,
           np.float32(sums[0] / n_px), np.float32(sums[1] / n_px),
           np.float32(sums[2] / n_px),
           float(int(px.min())), float(int(px.max())), float(n_px)] + [0.0] * 6
    assert got[0] == pytest.approx(exp)
    assert got[1] == pytest.approx([float(x) for x in media_features(wav)])
