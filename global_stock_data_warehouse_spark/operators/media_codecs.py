"""Pure-numpy media codecs: PPM (P6) images and WAV (PCM16) audio.

The container ships no image/audio libraries, but these two formats need
none — PPM is a whitespace-delimited header + raw RGB bytes, WAV is RIFF
chunks + little-endian PCM — so the multimodal pipeline's decode kernel
(operators/multimodal.py) can run END-TO-END on real bytes instead of an
injected fake. ``default_decode`` sniffs the magic and dispatches; unknown
payloads fail loudly (a silent zero-vector for an undecodable blob would
poison downstream similarity search).

Everything is numpy-vectorized — these run inside Arrow-batched
``mapInPandas`` workers, so per-byte Python loops are off the table.
"""

from __future__ import annotations

import struct

import numpy as np


# ---------------------------------------------------------------------------
# PPM (P6): image
# ---------------------------------------------------------------------------


def encode_ppm(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> binary PPM bytes."""
    a = np.asarray(img, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) image, got {a.shape}")
    h, w = a.shape[:2]
    return f"P6\n{w} {h}\n255\n".encode() + a.tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    """Binary PPM bytes -> (h, w, 3) uint8. Handles comments and arbitrary
    whitespace in the header, per the netpbm spec."""
    if not data.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    # tokenize the header: magic, width, height, maxval; '#' starts a
    # comment running to end-of-line; ONE whitespace byte follows maxval
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        tokens.append(data[start:pos])
    pos += 1  # the single whitespace after maxval
    w, h, maxval = int(tokens[0]), int(tokens[1]), int(tokens[2])
    if maxval != 255:
        raise ValueError(f"only maxval 255 supported, got {maxval}")
    need = w * h * 3
    if len(data) - pos < need:
        raise ValueError("truncated PPM payload")
    return np.frombuffer(data, dtype=np.uint8, count=need, offset=pos).reshape(h, w, 3)


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize via index gather — pure numpy, O(out pixels)."""
    h, w = img.shape[:2]
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[ys[:, None], xs[None, :]]


# ---------------------------------------------------------------------------
# WAV (RIFF / PCM16): audio
# ---------------------------------------------------------------------------


def encode_wav_pcm16(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """float samples in [-1, 1] (or int16) -> mono PCM16 WAV bytes."""
    a = np.asarray(samples)
    if a.dtype != np.int16:
        a = np.clip(np.asarray(a, dtype=np.float64), -1.0, 1.0)
        a = (a * 32767.0).round().astype(np.int16)
    payload = a.tobytes()
    byte_rate = sample_rate * 2
    hdr = b"RIFF" + struct.pack("<I", 36 + len(payload)) + b"WAVE"
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, byte_rate, 2, 16)
    return hdr + fmt + b"data" + struct.pack("<I", len(payload)) + payload


def decode_wav(data: bytes) -> np.ndarray:
    """WAV bytes -> float64 samples in [-1, 1] (channels interleaved as-is).
    Walks RIFF chunks (fmt may not be first), supports PCM16 only."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, bits, n_channels, payload = 12, None, None, None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, n_channels = struct.unpack("<HH", body[0:4])
            (bits,) = struct.unpack("<H", body[14:16])
            if audio_fmt != 1:
                raise ValueError(f"only PCM supported, got format {audio_fmt}")
        elif cid == b"data":
            payload = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if bits != 16 or payload is None:
        raise ValueError("expected a PCM16 data chunk")
    return np.frombuffer(payload, dtype="<i2").astype(np.float64) / 32768.0


# ---------------------------------------------------------------------------
# BMP (uncompressed 24/32-bit): image
# ---------------------------------------------------------------------------


def encode_bmp(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> uncompressed 24-bit BMP (BITMAPINFOHEADER,
    bottom-up rows, 4-byte row padding)."""
    a = np.asarray(img, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) image, got {a.shape}")
    h, w = a.shape[:2]
    row = w * 3
    pad = (-row) % 4
    bgr = a[::-1, :, ::-1]  # bottom-up, BGR
    body = b"".join(bgr[r].tobytes() + b"\x00" * pad for r in range(h))
    pixel_off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", pixel_off + len(body), 0, 0, pixel_off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return header + info + body


def decode_bmp(data: bytes) -> np.ndarray:
    """Uncompressed 24/32-bit BMP -> (h, w, 3) uint8 RGB. Handles
    bottom-up AND top-down (negative height) row order and 4-byte row
    padding; compressed or paletted BMPs raise (they need a real codec)."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    pixel_off = struct.unpack_from("<I", data, 10)[0]
    hdr_size = struct.unpack_from("<I", data, 14)[0]
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    w, h_signed = struct.unpack_from("<ii", data, 18)
    bpp = struct.unpack_from("<H", data, 28)[0]
    compression = struct.unpack_from("<I", data, 30)[0]
    # compression=3 (BI_BITFIELDS) carries channel masks this decoder does
    # not parse — accepting it would silently swap channels for non-BGR(A)
    # masks, so it is refused along with RLE/paletted variants
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(
            f"unsupported BMP variant (bpp={bpp}, compression={compression}); "
            "only uncompressed BI_RGB 24/32-bit is decodable without a codec library"
        )
    h = abs(h_signed)
    bytes_pp = bpp // 8
    stride = (w * bytes_pp + 3) & ~3
    raw = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=pixel_off)
    rows = raw.reshape(h, stride)[:, : w * bytes_pp].reshape(h, w, bytes_pp)
    if h_signed > 0:
        rows = rows[::-1]  # bottom-up -> top-down
    return np.ascontiguousarray(rows[:, :, 2::-1])  # BGR(A) -> RGB


# ---------------------------------------------------------------------------
# dispatch
# ---------------------------------------------------------------------------


def default_decode(payload: bytes, media_type: str) -> np.ndarray:
    """Magic-sniffing decode used as ``extract_features``'s default kernel.
    ``media_type`` is advisory (the bytes win); unknown formats raise."""
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    if payload[:4] == b"RIFF":
        return decode_wav(payload)
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    raise ValueError(
        f"undecodable media payload (media_type={media_type!r}, "
        f"magic={payload[:4]!r}); supported: PPM P6, BMP 24/32-bit, WAV PCM16"
    )


# ---------------------------------------------------------------------------
# Real feature kernels (pure numpy — no external DSP/vision libs)
# ---------------------------------------------------------------------------


def audio_features(samples: np.ndarray, sample_rate: int = 16000) -> np.ndarray:
    """8-dim audio descriptor from mono PCM float samples:
    [rms, zero-crossing rate (Hz), spectral centroid (Hz), spectral
    rolloff-85 (Hz), spectral bandwidth (Hz), spectral flatness,
    peak amplitude, duration (s)].

    One rFFT over the clip — O(n log n), numpy-vectorized; no per-sample
    Python. Centroid/rolloff/bandwidth are magnitude-weighted moments of
    the spectrum, flatness is geometric/arithmetic mean ratio.
    """
    x = np.asarray(samples, dtype=np.float64).ravel()
    n = x.size
    if n == 0:
        return np.zeros(8, dtype=np.float32)
    rms = float(np.sqrt(np.mean(x * x)))
    zc = float(np.count_nonzero(np.signbit(x[1:]) != np.signbit(x[:-1])))
    zcr_hz = zc / 2.0 / (n / sample_rate)
    mag = np.abs(np.fft.rfft(x))
    freqs = np.fft.rfftfreq(n, d=1.0 / sample_rate)
    total = mag.sum()
    if total > 0:
        centroid = float((freqs * mag).sum() / total)
        cum = np.cumsum(mag)
        rolloff = float(freqs[np.searchsorted(cum, 0.85 * total)])
        bandwidth = float(
            np.sqrt(((freqs - centroid) ** 2 * mag).sum() / total)
        )
        pos = mag[mag > 0]
        flatness = float(np.exp(np.mean(np.log(pos))) / (mag.mean() or 1.0))
    else:
        centroid = rolloff = bandwidth = flatness = 0.0
    return np.array(
        [rms, zcr_hz, centroid, rolloff, bandwidth, flatness,
         float(np.abs(x).max()), n / sample_rate],
        dtype=np.float32,
    )


def image_features(img: np.ndarray) -> np.ndarray:
    """8-dim image descriptor from an (H, W, C) or (H, W) uint8/float
    array: [mean R, mean G, mean B, global std, horizontal gradient
    energy, vertical gradient energy, aspect ratio, n_pixels].

    Finite-difference gradients (numpy slicing) — the edge-energy proxy a
    blur/quality filter thresholds on; grayscale inputs broadcast their
    channel mean across RGB slots.
    """
    a = np.asarray(img, dtype=np.float64)
    if a.size == 0:
        return np.zeros(8, dtype=np.float32)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w = a.shape[:2]
    chan = a.mean(axis=(0, 1))
    rgb = np.resize(chan, 3)
    gray = a.mean(axis=2)
    gx = np.abs(np.diff(gray, axis=1)).mean() if w > 1 else 0.0
    gy = np.abs(np.diff(gray, axis=0)).mean() if h > 1 else 0.0
    return np.array(
        [rgb[0], rgb[1], rgb[2], a.std(), gx, gy, w / h, float(h * w)],
        dtype=np.float32,
    )


def typed_features(payload: bytes, media_type: str) -> np.ndarray:
    """Dispatch decode + REAL feature extraction: WAV -> ``audio_features``
    over decoded PCM, PPM/BMP -> ``image_features`` over decoded pixels.
    Bytes win over the advisory ``media_type`` (same contract as
    ``default_decode``); undecodable formats raise loudly."""
    decoded = default_decode(payload, media_type)
    if payload[:4] == b"RIFF":
        return audio_features(decoded)
    return image_features(decoded)
