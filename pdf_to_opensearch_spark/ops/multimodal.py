"""Multimodal binary columns: real header+raw decoders, numpy-only
(driver mandate).

Images/audio/video ride as opaque ``binary`` columns with a typed
metadata struct. This container has no image/audio libraries, so the
decoders implemented here are the UNCOMPRESSED header+raw formats that
pure numpy can parse exactly:

- ``P6`` binary PPM images (and a trivial concatenated-PPM "video"
  container: frames are back-to-back P6 images);
- 24-bit uncompressed ``BM`` BMP images (BI_RGB, bottom-up rows);
- 16-bit PCM ``RIFF/WAVE`` audio.

Compressed formats (JPEG/PNG/MP3/H.264) still raise — honestly out of
scope without codec libraries — and ``fake=True`` keeps the deterministic
digest stand-in for plumbing tests that don't care about pixels.

Scale notes: media payloads dominate row size → media tables should be
read with the payload column pruned except in the decode stage;
``decode_features`` uses ``mapInPandas`` so one Arrow batch holds many
payloads; resize is numpy index striding (no per-pixel Python).
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("url", T.StringType(), True),
    T.StructField("kind", T.StringType(), False),     # image | audio | video
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("meta", T.StructType([
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("mime", T.StringType(), True),
    ]), True),
])

FEATURE_DIM = 16


# ----------------------------------------------------------- codecs (real)

def encode_ppm(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → binary PPM (P6)."""
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + img.astype(np.uint8).tobytes()


def decode_ppm(payload: bytes, offset: int = 0) -> tuple[np.ndarray, int]:
    """P6 PPM → ((h, w, 3) uint8, next offset) — numpy-only."""
    if payload[offset:offset + 2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    pos = offset + 2
    fields = []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":  # comment line
            while payload[pos:pos + 1] not in (b"\n", b""):
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError("only maxval=255 PPM supported")
    n = w * h * 3
    img = np.frombuffer(payload, dtype=np.uint8, count=n,
                        offset=pos).reshape(h, w, 3)
    return img, pos + n


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP → (h, w, 3) uint8 RGB — numpy-only."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    comp = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or comp != 0:
        raise ValueError("only 24-bit BI_RGB BMP supported")
    row_bytes = (w * 3 + 3) & ~3  # 4-byte row padding
    rows = np.frombuffer(payload, dtype=np.uint8, count=row_bytes * abs(h),
                         offset=data_off).reshape(abs(h), row_bytes)
    img = rows[:, : w * 3].reshape(abs(h), w, 3)[..., ::-1]  # BGR → RGB
    if h > 0:  # positive height = bottom-up storage
        img = img[::-1]
    return np.ascontiguousarray(img)


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """16-bit PCM WAV → (float32 samples in [-1, 1], sample_rate)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    rate, bits, data = 0, 0, b""
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            rate = struct.unpack_from("<I", body, 4)[0]
            bits = struct.unpack_from("<H", body, 14)[0]
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)
    if bits != 16:
        raise ValueError("only 16-bit PCM WAV supported")
    samples = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
    return samples, rate


def iter_ppm_frames(payload: bytes):
    """Concatenated-P6 'video' container → yields (h, w, 3) frames."""
    off = 0
    while off < len(payload):
        frame, off = decode_ppm(payload, off)
        yield frame


def decode_image(payload: bytes) -> np.ndarray:
    """Magic-byte dispatch: P6 PPM or 24-bit BMP → (h, w, 3) uint8."""
    if payload[:2] == b"P6":
        return decode_ppm(payload)[0]
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    raise NotImplementedError(
        "compressed image formats need codec libraries absent from this "
        "container (supported: P6 PPM, 24-bit BMP)")


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbour resize via index striding — no per-pixel Python."""
    h, w = img.shape[:2]
    ys = (np.arange(out_h) * h // out_h)
    xs = (np.arange(out_w) * w // out_w)
    return img[ys][:, xs]


# -------------------------------------------------------------- features

def image_features(img: np.ndarray) -> np.ndarray:
    """FEATURE_DIM floats: per-channel mean/std + 3×3 grayscale grid,
    pixel values normalized to [0, 1]."""
    f = img.astype(np.float64) / 255.0
    chan = np.concatenate([f.mean(axis=(0, 1)), f.std(axis=(0, 1))])
    gray = f.mean(axis=2)
    grid = resize_nearest(gray, 3, 3).ravel()
    out = np.concatenate([chan, grid, [img.shape[0] / 4096.0,
                                       img.shape[1] / 4096.0]])
    return out[:FEATURE_DIM].astype(np.float32)


def audio_features(samples: np.ndarray, rate: int) -> np.ndarray:
    """FEATURE_DIM floats: rms, zero-crossing rate, 12 coarse spectrum
    bands (|rfft| energy, log1p), duration + rate scalars."""
    if samples.size == 0:
        return np.zeros(FEATURE_DIM, dtype=np.float32)
    rms = float(np.sqrt(np.mean(samples ** 2)))
    zc = float(np.mean(np.abs(np.diff(np.signbit(samples).astype(np.int8)))))
    spec = np.abs(np.fft.rfft(samples[: 1 << 14]))
    bands = np.array_split(spec, 12)
    bandpow = np.array([np.log1p(b.sum()) for b in bands])
    out = np.concatenate([[rms, zc], bandpow,
                          [samples.size / rate / 60.0 if rate else 0.0,
                           rate / 48000.0]])
    return out[:FEATURE_DIM].astype(np.float32)


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic digest stand-in (plumbing tests)."""
    digest = hashlib.sha256(payload).digest()
    raw = np.frombuffer(digest[: FEATURE_DIM * 2], dtype=np.uint16)
    return (raw.astype(np.float32) / 65535.0)


def _features_one(kind: str, payload: bytes) -> list:
    if kind == "image":
        return image_features(decode_image(payload)).tolist()
    if kind == "audio":
        return audio_features(*decode_wav(payload)).tolist()
    if kind == "video":
        frames = list(iter_ppm_frames(payload))
        if not frames:
            return [0.0] * FEATURE_DIM
        per = np.stack([image_features(fr) for fr in frames])
        return per.mean(axis=0).astype(np.float32).tolist()
    raise ValueError(f"unknown media kind: {kind}")


def decode_features(media: DataFrame, fake: bool = False) -> DataFrame:
    """payload binary → feature vector array<float> via mapInPandas.

    Real decode for P6 PPM / 24-bit BMP / 16-bit WAV / concatenated-PPM
    video; ``fake=True`` swaps in the digest stand-in."""

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            feats = []
            for kind, p in zip(pdf["kind"], pdf["payload"]):
                if p is None:
                    feats.append(None)
                elif fake:
                    feats.append(_fake_decode(bytes(p)).tolist())
                else:
                    feats.append(_features_one(kind, bytes(p)))
            yield pd.DataFrame({
                "media_id": pdf["media_id"].to_numpy(np.int64),
                "kind": pdf["kind"],
                "features": feats,
            })

    return media.select("media_id", "kind", "payload").mapInPandas(
        kernel, schema="media_id long, kind string, features array<float>")


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per frame timestamp to decode —
    pure column expressions (sequence/explode), no payload touched, so the
    planner output is cheap to shuffle to decode executors."""
    return (media.filter(F.col("kind") == "video")
            .select("media_id",
                    F.explode(F.sequence(
                        F.lit(0),
                        F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
                        F.lit(every_ms))).alias("frame_ts_ms")))


def make_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table with REAL payloads: gradient
    PPM images, sine-wave WAVs, multi-frame concatenated-PPM videos."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        if kind == "image":
            h, w = int(rng.integers(8, 40)), int(rng.integers(8, 40))
            yy, xx = np.mgrid[0:h, 0:w]
            img = np.stack([(yy * 7 + i) % 256, (xx * 11) % 256,
                            ((yy + xx) * 3) % 256], axis=2).astype(np.uint8)
            payload = encode_ppm(img)
            meta = (w, h, None, "image/x-portable-pixmap")
        elif kind == "audio":
            rate = 8000
            t = np.arange(int(rng.integers(1000, 4000))) / rate
            sig = (0.5 * np.sin(2 * np.pi * (200 + 20 * (i % 7)) * t))
            pcm = (sig * 32767).astype("<i2").tobytes()
            fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
            payload = (b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
                       + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                       + b"data" + struct.pack("<I", len(pcm)) + pcm)
            meta = (None, None, int(len(t) / rate * 1000), "audio/wav")
        else:
            n_frames = int(rng.integers(2, 5))
            frames = []
            for fidx in range(n_frames):
                img = np.full((6, 6, 3), (i * 13 + fidx * 29) % 256,
                              dtype=np.uint8)
                frames.append(encode_ppm(img))
            payload = b"".join(frames)
            meta = (6, 6, n_frames * 1000, "video/x-ppm-frames")
        rows.append((i, f"https://example.org/media/{i}", kind, payload,
                     meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
