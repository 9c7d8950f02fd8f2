"""Independent driver-side oracle for multimodal feature extraction.

Re-derives operators/multimodal.media_features with deliberately different
code: headers parsed with manual byte arithmetic (not struct-format reuse
where avoidable), pixels/samples walked with plain Python loops over
``bytes`` (not NumPy frombuffer/reshape), statistics accumulated as exact
Python ints divided once. Only the final float32 narrowing mirrors the
engine dtype (np.float32 cast), so staged expected values are
bit-identical when the engine is correct.

__spark_entry__.q_multimodal_features stages this oracle's rows to parquet
and oracle_sql() SELECTs them (VERDICT r2 next-round #1 and #6).
"""

from __future__ import annotations

import hashlib
import math

import numpy as np

FEATURE_DIM = 16


def _u16(b: bytes, o: int) -> int:
    return b[o] | (b[o + 1] << 8)


def _u32(b: bytes, o: int) -> int:
    return b[o] | (b[o + 1] << 8) | (b[o + 2] << 16) | (b[o + 3] << 24)


def _i32(b: bytes, o: int) -> int:
    v = _u32(b, o)
    return v - (1 << 32) if v >= 1 << 31 else v


def _i16(b: bytes, o: int) -> int:
    v = _u16(b, o)
    return v - (1 << 16) if v >= 1 << 15 else v


def _image_stats(rgb_triples) -> tuple:
    """Iterable of (r, g, b) -> exact sums / extrema via Python ints."""
    sr = sg = sb = 0
    mn, mx = 255, 0
    n = 0
    for r, g, b in rgb_triples:
        sr += r
        sg += g
        sb += b
        lo, hi = min(r, g, b), max(r, g, b)
        mn = lo if lo < mn else mn
        mx = hi if hi > mx else mx
        n += 1
    return n, sr, sg, sb, mn, mx


def _bmp_features(data: bytes) -> list[float]:
    pix_off = _u32(data, 10)
    w = _i32(data, 18)
    h = _i32(data, 22)
    bpp = _u16(data, 28)
    comp = _u32(data, 30)
    if bpp != 24 or comp != 0 or h <= 0 or w <= 0:
        raise ValueError("unsupported BMP")
    stride = (w * 3 + 3) // 4 * 4
    triples = []
    for row in range(h):  # bottom-up rows, BGR byte order
        base = pix_off + row * stride
        for col in range(w):
            o = base + col * 3
            triples.append((data[o + 2], data[o + 1], data[o]))
    n, sr, sg, sb, mn, mx = _image_stats(triples)
    return [1.0, float(w), float(h), 3.0, sr / n, sg / n, sb / n,
            float(mn), float(mx), float(n)]


def _ppm_features(data: bytes) -> list[float]:
    pos, fields = 2, []
    while len(fields) < 3:
        # every scan is bounds-checked: a truncated header must raise (and
        # fall back to hash features) — b''.isspace() is False, so an
        # unguarded token scan spins forever past the end (review finding;
        # the engine's decode_ppm guards identically)
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if pos >= len(data):
            raise ValueError("truncated PPM header")
        if data[pos : pos + 1] == b"#":
            raise ValueError("comments unsupported")
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        if pos >= len(data):
            raise ValueError("truncated PPM header")
        fields.append(int(data[start:pos]))
    pos += 1
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError("unsupported maxval")
    triples = [
        (data[pos + 3 * i], data[pos + 3 * i + 1], data[pos + 3 * i + 2])
        for i in range(w * h)
    ]
    n, sr, sg, sb, mn, mx = _image_stats(triples)
    return [2.0, float(w), float(h), 3.0, sr / n, sg / n, sb / n,
            float(mn), float(mx), float(n)]


def _wav_features(data: bytes) -> list[float]:
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not RIFF/WAVE")
    pos = 12
    rate = ch = None
    raw = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        size = _u32(data, pos + 4)
        body = pos + 8
        if cid == b"fmt ":
            ch = _u16(data, body + 2)
            if _u16(data, body) != 1 or _u16(data, body + 14) != 16 or ch < 1:
                raise ValueError("unsupported WAV")
            rate = _u32(data, body + 4)
        elif cid == b"data":
            raw = data[body : body + size]
        pos = body + size + (size & 1)
    if rate is None or raw is None:
        raise ValueError("missing chunks")
    n = len(raw) // 2
    n_frames = n // ch
    n = n_frames * ch
    total = sumsq = 0
    mn, mx = 32767, -32768
    crossings = 0
    prev_neg = None
    for i in range(n):
        v = _i16(raw, 2 * i)
        total += v
        sumsq += v * v
        mn = v if v < mn else mn
        mx = v if v > mx else mx
        if i % ch == 0:  # channel 0
            neg = v < 0
            if prev_neg is not None and neg != prev_neg:
                crossings += 1
            prev_neg = neg
    return [3.0, float(rate), float(ch), float(n_frames),
            total / n if n else 0.0,
            math.sqrt(sumsq / n) if n else 0.0,
            float(mn) if n else 0.0, float(mx) if n else 0.0,
            float(crossings)]


def _hash_features_py(data: bytes) -> list[float]:
    h = hashlib.sha256(data).digest()
    out = [0.0]
    for j in range(FEATURE_DIM - 1):
        u = h[2 * j] | (h[2 * j + 1] << 8)
        out.append(float(np.float32(u) / np.float32(65535.0)))
    return out


def media_features_oracle(payload: bytes) -> list[float]:
    """FEATURE_DIM python floats, each the double value of the engine's
    float32 feature (np.float32 narrowing applied like the engine does)."""
    vals: list[float] | None = None
    try:
        if payload[:2] == b"BM":
            vals = _bmp_features(payload)
        elif payload[:2] == b"P6":
            vals = _ppm_features(payload)
        elif payload[:4] == b"RIFF":
            vals = _wav_features(payload)
    except (ValueError, IndexError):
        vals = None
    if vals is None:
        vals = _hash_features_py(payload)
    vals = vals + [0.0] * (FEATURE_DIM - len(vals))
    return [float(np.float32(v)) for v in vals]
