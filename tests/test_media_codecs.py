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


# ---------------------------------------------------------------------------
# Real feature kernels
# ---------------------------------------------------------------------------


def test_audio_features_sine_wave_physics():
    import numpy as np

    from global_stock_data_warehouse_spark.operators.media_codecs import (
        audio_features,
    )

    sr = 16000
    t = np.arange(sr) / sr  # exactly 1 second
    x = 0.5 * np.sin(2 * np.pi * 440 * t)
    f = audio_features(x, sample_rate=sr)
    rms, zcr_hz, centroid, rolloff, bandwidth, flatness, peak, dur = f
    assert abs(rms - 0.5 / np.sqrt(2)) < 1e-3        # sine RMS = A/sqrt(2)
    assert abs(zcr_hz - 440) < 2                      # 2 crossings per cycle
    assert abs(centroid - 440) < 25                   # energy at the tone
    assert abs(rolloff - 440) < 25
    assert flatness < 0.2                             # tonal, not noise
    assert abs(peak - 0.5) < 1e-3
    assert abs(dur - 1.0) < 1e-6


def test_image_features_channels_and_gradients():
    import numpy as np

    from global_stock_data_warehouse_spark.operators.media_codecs import (
        image_features,
    )

    # constant red image: zero gradients, exact channel means
    img = np.zeros((10, 20, 3), dtype=np.uint8)
    img[:, :, 0] = 200
    f = image_features(img)
    assert list(f[:3]) == [200.0, 0.0, 0.0]
    assert f[4] == 0.0 and f[5] == 0.0                # no edges
    assert abs(f[6] - 2.0) < 1e-6                     # aspect 20/10
    assert f[7] == 200.0                              # 10*20 pixels
    # vertical step edge -> horizontal gradient energy only
    img2 = np.zeros((8, 8), dtype=np.uint8)
    img2[:, 4:] = 255
    f2 = image_features(img2)
    assert f2[4] > 0 and f2[5] == 0.0


def test_typed_features_dispatch_roundtrip():
    import numpy as np

    from global_stock_data_warehouse_spark.operators.media_codecs import (
        encode_bmp,
        encode_wav_pcm16,
        typed_features,
    )

    wav = encode_wav_pcm16(0.25 * np.sin(np.arange(4000) * 0.2), sample_rate=8000)
    fa = typed_features(wav, "audio")
    assert fa.shape == (8,) and fa[0] > 0.1           # rms of the tone
    img = np.full((4, 6, 3), 128, dtype=np.uint8)
    fi = typed_features(encode_bmp(img), "image")
    assert fi.shape == (8,) and abs(fi[0] - 128.0) < 1e-5


def test_extract_features_typed_end_to_end(spark):
    """Typed kernel through the full Spark path: audio rows get DSP
    features, image rows get channel/gradient features, per modality."""
    from global_stock_data_warehouse_spark.operators.multimodal import (
        extract_features_typed,
    )

    sr = 16000
    t = np.arange(sr // 4) / sr
    wav = encode_wav_pcm16(0.5 * np.sin(2 * np.pi * 440 * t), sample_rate=sr)
    img = np.full((4, 8, 3), 64, dtype=np.uint8)
    df = spark.createDataFrame(
        [
            (1, "audio", bytearray(wav), "{}"),
            (2, "image", bytearray(encode_ppm(img)), "{}"),
        ],
        "media_id long, media_type string, payload binary, meta string",
    )
    out = {r.media_id: r for r in extract_features_typed(df).collect()}
    rms, zcr_hz = out[1].feature[0], out[1].feature[1]
    assert abs(rms - 0.5 / np.sqrt(2)) < 1e-2
    assert abs(zcr_hz - 440) < 10
    assert abs(out[1].feature[7] - 0.25) < 1e-6       # duration
    assert list(out[2].feature[:3]) == [64.0, 64.0, 64.0]
    assert abs(out[2].feature[6] - 2.0) < 1e-6        # aspect 8/4
