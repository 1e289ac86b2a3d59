"""Multimodal column plumbing: opaque binary payloads → typed metadata,
features, resizes, and frame samples, all as Arrow-batched pandas stages.

The container ships no image/audio codecs (no PIL/ffmpeg), so the *decode*
innermost step is stubbed two ways, per the build contract:

  * real formats (JPEG/PNG/WAV magic bytes) raise ``NotImplementedError``
    inside the per-row try (surfaced as ``status='error'`` rows — the same
    fail-soft error tier as corrupt PDFs, core/indexer.py:114-116);
  * a deterministic FAKE container format exercises the full pipeline:
      image: b"FIMG" + u32 width + u32 height + width*height gray bytes
      video: b"FVID" + u32 n_frames + u32 frame_len + frames…
      audio: b"FAUD" + u32 sample_rate + i16 samples…

Everything around the decode — schema, batch iteration, partitioning, the
explode of sampled frames, the hash-projected feature vectors — is real
Spark plumbing, identical to what a codec-equipped cluster would run. Frame
sampling reuses the reference's evenly-spaced page-sampling arithmetic
(core/parser.py:30-38: ``max(1, n // k)`` stride, cap k).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FAKE_IMG = b"FIMG"
FAKE_VID = b"FVID"
FAKE_AUD = b"FAUD"
_REAL_MAGICS = {
    b"\xff\xd8\xff": "jpeg", b"\x89PNG": "png", b"RIFF": "wav/avi",
}

MEDIA_META_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("media_type", T.StringType(), True),
    T.StructField("status", T.StringType(), False),
    T.StructField("error", T.StringType(), True),
    T.StructField("n_bytes", T.LongType(), False),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("n_frames", T.IntegerType(), True),
    T.StructField("sample_rate", T.IntegerType(), True),
    T.StructField("duration_s", T.DoubleType(), True),
    T.StructField("feature", T.ArrayType(T.FloatType()), True),
])

_FEAT_DIM = 16


def _decode_one(payload: bytes) -> dict:
    """Decode the fake container; refuse real codecs explicitly."""
    for magic, name in _REAL_MAGICS.items():
        if payload.startswith(magic):
            raise NotImplementedError(
                f"real {name} decode requires a codec library not present "
                "in this environment")
    kind = payload[:4]
    if kind == FAKE_IMG:
        w, h = struct.unpack_from("<II", payload, 4)
        # header fields are attacker-controlled u32s: bound them against the
        # actual payload size BEFORE allocating (decompression-bomb tier, same
        # contract as the DOCX MAX_DOCUMENT_XML_BYTES cap)
        if w == 0 or h == 0:
            raise ValueError("image with zero width/height")
        if 12 + w * h > len(payload):
            raise ValueError(
                f"image header claims {w}x{h} pixels but payload has only "
                f"{len(payload) - 12} data bytes")
        pix = np.frombuffer(payload, np.uint8, count=w * h, offset=12)
        return {"media_type": "image", "width": w, "height": h, "pix": pix}
    if kind == FAKE_VID:
        n, flen = struct.unpack_from("<II", payload, 4)
        if flen == 0:
            raise ValueError("video with zero frame length")
        if 12 + n * flen > len(payload):
            raise ValueError(
                f"video header claims {n} frames x {flen} bytes but payload "
                f"has only {len(payload) - 12} data bytes")
        frames = [payload[12 + i * flen: 12 + (i + 1) * flen]
                  for i in range(n)]
        return {"media_type": "video", "n_frames": n, "frames": frames}
    if kind == FAKE_AUD:
        (sr,) = struct.unpack_from("<I", payload, 4)
        if sr == 0:
            raise ValueError("audio payload with sample_rate=0")
        samples = np.frombuffer(payload, np.int16, offset=8)
        return {"media_type": "audio", "sample_rate": sr, "samples": samples}
    raise ValueError("unknown media container")


def _feature(buf: np.ndarray) -> list[float]:
    """Deterministic histogram feature over raw bytes (stand-in for a model
    embedding; vectorized numpy, no per-element Python)."""
    if buf.size == 0:
        return [0.0] * _FEAT_DIM
    hist, _ = np.histogram(buf.astype(np.uint8), bins=_FEAT_DIM,
                           range=(0, 256))
    v = hist.astype(np.float32)
    n = float(np.linalg.norm(v))
    return (v / n if n else v).tolist()


def describe_media(media: DataFrame) -> DataFrame:
    """(url, payload binary) → typed metadata + feature rows (fail-soft)."""
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, payload in zip(pdf["url"], pdf["payload"]):
                row = {k: None for k in MEDIA_META_SCHEMA.fieldNames()}
                row.update(url=url, status="ok", error=None,
                           n_bytes=len(payload) if payload is not None else 0)
                try:
                    if payload is None:
                        raise ValueError("null payload")
                    d = _decode_one(bytes(payload))
                    row["media_type"] = d["media_type"]
                    if d["media_type"] == "image":
                        row["width"], row["height"] = d["width"], d["height"]
                        row["feature"] = _feature(d["pix"])
                    elif d["media_type"] == "video":
                        row["n_frames"] = d["n_frames"]
                        row["feature"] = _feature(np.frombuffer(
                            b"".join(d["frames"]), np.uint8))
                    else:
                        row["sample_rate"] = d["sample_rate"]
                        row["duration_s"] = (len(d["samples"])
                                             / d["sample_rate"])
                        row["feature"] = _feature(
                            (d["samples"].astype(np.int32) + 32768)
                            .astype(np.uint16).view(np.uint8))
                except (NotImplementedError, ValueError, struct.error) as e:
                    row["status"], row["error"] = "error", str(e)
                rows.append(row)
            yield pd.DataFrame(rows, columns=MEDIA_META_SCHEMA.fieldNames())
    return (media.select("url", "payload")
            .mapInPandas(fn, schema=MEDIA_META_SCHEMA))


FRAME_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("frame_idx", T.IntegerType(), False),
    T.StructField("frame", T.BinaryType(), False),
])


def sample_frames(media: DataFrame, max_frames: int = 10) -> DataFrame:
    """Evenly sample ≤ max_frames per video (explode → one row per frame).

    Sampling arithmetic mirrors the reference's PDF page sampler
    (core/parser.py:30-38): stride = max(1, n // k), first frame of each
    stride window, capped at k. Decode errors drop the row (fail-soft);
    counting them is describe_media's job.
    """
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, idxs, frames = [], [], []
            for url, payload in zip(pdf["url"], pdf["payload"]):
                if payload is None:
                    continue
                try:
                    d = _decode_one(bytes(payload))
                except (NotImplementedError, ValueError, struct.error):
                    continue
                if d.get("media_type") != "video":
                    continue
                n = d["n_frames"]
                stride = max(1, n // max_frames)
                picked = list(range(0, n, stride))[:max_frames]
                for i in picked:
                    urls.append(url)
                    idxs.append(i)
                    frames.append(d["frames"][i])
            yield pd.DataFrame({"url": urls, "frame_idx": idxs,
                                "frame": frames})
    return media.select("url", "payload").mapInPandas(fn, schema=FRAME_SCHEMA)


def resize_images(media: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Nearest-neighbor resize of fake images (real formats → error rows).

    The resample itself is vectorized numpy indexing — the exact batch shape
    a PIL/opencv-backed UDF would have.
    """
    schema = T.StructType([
        T.StructField("url", T.StringType(), False),
        T.StructField("status", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
    ])

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, payload in zip(pdf["url"], pdf["payload"]):
                try:
                    if payload is None:
                        raise ValueError("null payload")
                    d = _decode_one(bytes(payload))
                    if d.get("media_type") != "image":
                        raise ValueError("not an image")
                    pix = d["pix"].reshape(d["height"], d["width"])
                    ys = (np.arange(target_h) * d["height"]) // target_h
                    xs = (np.arange(target_w) * d["width"]) // target_w
                    out = pix[np.ix_(ys, xs)].tobytes()
                    new = (FAKE_IMG + struct.pack("<II", target_w, target_h)
                           + out)
                    rows.append({"url": url, "status": "ok", "payload": new})
                except (NotImplementedError, ValueError, struct.error) as e:
                    rows.append({"url": url, "status": f"error: {e}",
                                 "payload": None})
            yield pd.DataFrame(rows, columns=["url", "status", "payload"])
    return media.select("url", "payload").mapInPandas(fn, schema=schema)


# --- deterministic fake payload builders (test/bench corpus) ----------------

def build_fake_image(w: int, h: int, seed: int = 0) -> bytes:
    rng = np.random.default_rng(seed)
    return FAKE_IMG + struct.pack("<II", w, h) + rng.integers(
        0, 256, w * h, dtype=np.uint8).tobytes()


def build_fake_video(n_frames: int, frame_len: int = 64,
                     seed: int = 0) -> bytes:
    rng = np.random.default_rng(seed)
    frames = rng.integers(0, 256, n_frames * frame_len,
                          dtype=np.uint8).tobytes()
    return FAKE_VID + struct.pack("<II", n_frames, frame_len) + frames


def build_fake_audio(sample_rate: int, n_samples: int, seed: int = 0) -> bytes:
    rng = np.random.default_rng(seed)
    return FAKE_AUD + struct.pack("<I", sample_rate) + rng.integers(
        -2000, 2000, n_samples, dtype=np.int16).tobytes()
