"""Pure-numpy media codecs + END-TO-END multimodal feature extraction on
real encoded bytes (no injected fake decoder)."""

from __future__ import annotations

import numpy as np
import pytest

from global_stock_data_warehouse_spark.operators.media_codecs import (
    decode_ppm,
    decode_wav,
    default_decode,
    encode_ppm,
    encode_wav_pcm16,
    resize_nearest,
)
from global_stock_data_warehouse_spark.operators.multimodal import extract_features


def test_ppm_roundtrip():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(5, 4, 3), dtype=np.uint8)
    assert np.array_equal(decode_ppm(encode_ppm(img)), img)


def test_ppm_header_comments_and_whitespace():
    img = np.arange(12, dtype=np.uint8).reshape(2, 2, 3)
    raw = b"P6\n# a comment\n 2 \t2\n# another\n255\n" + img.tobytes()
    assert np.array_equal(decode_ppm(raw), img)


def test_ppm_truncated_rejected():
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="truncated"):
        decode_ppm(encode_ppm(img)[:-5])


def test_wav_roundtrip():
    t = np.linspace(0, 1, 1600, endpoint=False)
    wave = 0.5 * np.sin(2 * np.pi * 440 * t)
    back = decode_wav(encode_wav_pcm16(wave, 16000))
    assert back.shape == wave.shape
    assert np.abs(back - wave).max() < 1.0 / 32000  # one quantization step


def test_wav_rejects_non_pcm():
    data = bytearray(encode_wav_pcm16(np.zeros(8)))
    data[20] = 3  # audio format -> IEEE float
    with pytest.raises(ValueError, match="only PCM"):
        decode_wav(bytes(data))


def test_resize_nearest():
    img = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    small = resize_nearest(img, 2, 2)
    assert small.shape == (2, 2, 3)
    assert np.array_equal(small[0, 0], img[0, 0])


def test_default_decode_dispatch():
    img = np.full((2, 2, 3), 9, dtype=np.uint8)
    assert default_decode(encode_ppm(img), "image").shape == (2, 2, 3)
    assert default_decode(encode_wav_pcm16(np.zeros(4)), "audio").shape == (4,)
    with pytest.raises(ValueError, match="undecodable"):
        default_decode(b"\x00\x01\x02\x03", "image")


def test_extract_features_end_to_end_real_bytes(spark):
    """The full Spark path — binary column in, Arrow batches, DEFAULT
    decoder, pooled feature vector out — on genuinely encoded media."""
    img = np.full((4, 4, 3), 128, dtype=np.uint8)  # mid-gray image
    wav = encode_wav_pcm16(np.full(160, 0.25))  # constant-amplitude audio
    rows = [
        (1, "image", bytearray(encode_ppm(img)), "{}"),
        (2, "audio", bytearray(wav), "{}"),
    ]
    df = spark.createDataFrame(
        rows, "media_id long, media_type string, payload binary, meta string"
    )
    out = {r.media_id: r for r in extract_features(df, feature_dim=4).collect()}
    # image: every pooled bucket is the constant pixel value
    assert out[1].n_bytes == len(encode_ppm(img))
    assert all(abs(f - 128.0) < 1e-6 for f in out[1].feature)
    # audio: constant 0.25 signal pools to ~0.25 everywhere
    assert all(abs(f - 0.25) < 1e-3 for f in out[2].feature)


def test_bmp_roundtrip_and_variants():
    from global_stock_data_warehouse_spark.operators.media_codecs import (
        decode_bmp,
        encode_bmp,
    )

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(5, 3, 3), dtype=np.uint8)  # w=3 -> row padding
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)

    # top-down variant (negative height) decodes to the same pixels
    data = bytearray(encode_bmp(img))
    import struct as _s

    # flip to top-down: negate height and reverse stored row order
    h, w = img.shape[:2]
    stride = (w * 3 + 3) & ~3
    off = _s.unpack_from("<I", data, 10)[0]
    body = bytes(data[off:])
    rows = [body[i * stride:(i + 1) * stride] for i in range(h)][::-1]
    td = bytes(data[:off]) + b"".join(rows)
    td = bytearray(td)
    _s.pack_into("<i", td, 22, -h)
    assert np.array_equal(decode_bmp(bytes(td)), img)

    # compressed (RLE) BMPs must refuse, not mis-decode
    bad = bytearray(encode_bmp(img))
    _s.pack_into("<I", bad, 30, 1)  # BI_RLE8
    with pytest.raises(ValueError, match="unsupported BMP variant"):
        decode_bmp(bytes(bad))


def test_default_decode_dispatches_bmp():
    from global_stock_data_warehouse_spark.operators.media_codecs import (
        default_decode,
        encode_bmp,
    )

    img = np.full((2, 2, 3), 7, dtype=np.uint8)
    assert np.array_equal(default_decode(encode_bmp(img), "image"), img)
