"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The decode/feature-extraction kernels need codec libraries this container
does not ship — they are STUBBED behind ``decode_fn`` (default raises
NotImplementedError; tests inject a deterministic fake). Everything
Spark-side is real and tested: the schema, the Arrow batch shape through
``mapInPandas``, the partition sizing, and the metadata projection.

Schema convention:
    media(media_id string, kind string, payload binary,
          meta struct<width:int, height:int, duration_ms:int, codec:string>)
"""

from __future__ import annotations

from typing import Callable, Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "media_id string, kind string, payload binary, "
    "meta struct<width:int, height:int, duration_ms:int, codec:string>"
)

FEATURE_SCHEMA = "media_id string, kind string, n_bytes int, feature array<float>"


def _default_decode(kind: str, payload: bytes) -> np.ndarray:
    raise NotImplementedError(
        "media decode requires codec libraries not present in this image; "
        "inject decode_fn (tests use a deterministic byte-histogram fake)"
    )


# ---------------------------------------------------------------------------
# real decoders — pure-Python parsers for container formats that need no
# codec library: PPM (P6), BMP (uncompressed 24-bit BI_RGB), WAV (16-bit
# PCM). These make one end-to-end decode path non-fake; formats that DO
# need codecs (jpeg/mp4/...) remain behind the injectable decode_fn.
# ---------------------------------------------------------------------------

def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) → uint8 array (height, width, 3)."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    # header = magic, width, height, maxval — whitespace/comment separated
    fields, pos = [], 2
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while payload[pos : pos + 1] not in (b"\n", b""):
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError("only maxval=255 supported")
    pix = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
    return pix.reshape(h, w, 3)


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BI_RGB BMP → uint8 array (height, width, 3),
    top-down row order, RGB channel order."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    data_offset = int.from_bytes(payload[10:14], "little")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    compression = int.from_bytes(payload[30:34], "little")
    if bpp != 24 or compression != 0:
        raise ValueError("only uncompressed 24-bit BMP supported")
    flip = h > 0  # positive height = bottom-up storage
    h = abs(h)
    stride = (w * 3 + 3) & ~3  # rows padded to 4 bytes
    rows = []
    for r in range(h):
        off = data_offset + r * stride
        row = np.frombuffer(payload, dtype=np.uint8, count=w * 3, offset=off)
        rows.append(row.reshape(w, 3)[:, ::-1])  # BGR → RGB
    img = np.stack(rows)
    return img[::-1] if flip else img


def decode_wav(payload: bytes) -> tuple:
    """16-bit PCM WAV → (sample_rate, float32 samples in [-1, 1], channels)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos, rate, channels, samples = 12, None, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = int.from_bytes(body[0:2], "little")
            if fmt != 1:
                raise ValueError("only PCM supported")
            channels = int.from_bytes(body[2:4], "little")
            rate = int.from_bytes(body[4:8], "little")
            bits = int.from_bytes(body[14:16], "little")
            if bits != 16:
                raise ValueError("only 16-bit PCM supported")
        elif cid == b"data":
            samples = np.frombuffer(body, dtype="<i2").astype(np.float32) / 32768.0
        pos += 8 + size + (size & 1)
    if rate is None or samples is None:
        raise ValueError("missing fmt/data chunk")
    return rate, samples, channels


def real_decode(kind: str, payload: bytes) -> np.ndarray:
    """Format-dispatching decode → 18-dim feature vector: images (ppm/bmp)
    yield a 16-bin luminance histogram (L1) + normalized (width, height);
    audio (wav) yields a 16-bin amplitude histogram + (rms, duration_s)."""
    if not payload:
        return np.zeros(18, dtype=np.float32)
    if payload[:2] == b"P6":
        img = decode_ppm(payload)
    elif payload[:2] == b"BM":
        img = decode_bmp(payload)
    elif payload[:4] == b"RIFF":
        rate, samples, _ = decode_wav(payload)
        hist = np.histogram(samples, bins=16, range=(-1.0, 1.0))[0].astype(np.float32)
        hist /= max(hist.sum(), 1.0)
        rms = float(np.sqrt(np.mean(samples**2))) if samples.size else 0.0
        dur = samples.size / rate if rate else 0.0
        return np.concatenate([hist, np.float32([rms, dur])])
    else:
        raise ValueError(f"no pure-python decoder for {kind} payload")
    lum = (
        0.299 * img[..., 0].astype(np.float32)
        + 0.587 * img[..., 1].astype(np.float32)
        + 0.114 * img[..., 2].astype(np.float32)
    )
    hist = np.histogram(lum, bins=16, range=(0.0, 256.0))[0].astype(np.float32)
    hist /= max(hist.sum(), 1.0)
    h, w = img.shape[:2]
    return np.concatenate([hist, np.float32([w / 1000.0, h / 1000.0])])


def byte_histogram_decode(kind: str, payload: bytes) -> np.ndarray:
    """Deterministic fake decoder used in tests: 16-bin byte histogram,
    L1-normalized — exercises the exact batch/shape contract of a real
    decoder without any codec dependency."""
    if not payload:
        return np.zeros(16, dtype=np.float32)
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr >> 4, minlength=16).astype(np.float32)
    return hist / hist.sum()


def extract_features(
    media: DataFrame,
    decode_fn: Optional[Callable[[str, bytes], np.ndarray]] = None,
    batch_size_hint: int = 256,
) -> DataFrame:
    """media table → per-item feature vectors via Arrow-batched mapInPandas.

    The payload column stays binary end-to-end (never stringified); batches
    arrive as pandas object-arrays of bytes. At scale, set
    spark.sql.execution.arrow.maxRecordsPerBatch ≈ batch_size_hint so one
    Arrow batch of payloads fits executor memory."""
    decode = decode_fn or _default_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for kind, payload in zip(pdf["kind"], pdf["payload"]):
                vec = decode(kind, bytes(payload) if payload is not None else b"")
                feats.append([float(x) for x in vec])
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "feature": feats,
                }
            )
            # empty batches must keep the array column object-typed, or
            # Arrow fails converting a float64 column to list<float>
            out["feature"] = out["feature"].astype(object)
            yield out

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def media_metadata_stats(media: DataFrame) -> DataFrame:
    """Pure-projection metadata rollup (no decode): per kind, payload sizes
    and metadata aggregates — the 'scan 100 TB of blobs without decoding
    them' query shape (column pruning keeps payload unread)."""
    return (
        media.select(
            "kind",
            F.length("payload").alias("n_bytes"),
            F.col("meta.width").alias("width"),
            F.col("meta.duration_ms").alias("duration_ms"),
        )
        .groupBy("kind")
        .agg(
            F.count("*").alias("n_items"),
            F.sum("n_bytes").alias("total_bytes"),
            F.avg("width").alias("avg_width"),
            F.avg("duration_ms").alias("avg_duration_ms"),
        )
    )


def sample_frames(
    media: DataFrame,
    every_ms: int = 1000,
    decode_fn: Optional[Callable[[str, bytes], np.ndarray]] = None,
) -> DataFrame:
    """Frame-sampling plumbing for video rows: one output row per sampled
    timestamp (UDTF-style explode), decode stubbed like extract_features."""
    decode = decode_fn or _default_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_ms": [], "feature": []}
            for mid, kind, payload, meta in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"], pdf["meta"]
            ):
                if kind != "video":
                    continue
                duration = (meta or {}).get("duration_ms") or 0
                for ts in range(0, int(duration), every_ms):
                    vec = decode(kind, bytes(payload) if payload is not None else b"")
                    out["media_id"].append(mid)
                    out["frame_ms"].append(ts)
                    out["feature"].append([float(x) for x in vec])
            pdf_out = pd.DataFrame(out)
            pdf_out["feature"] = pdf_out["feature"].astype(object)
            pdf_out["frame_ms"] = pdf_out["frame_ms"].astype("int64")
            yield pdf_out

    return media.mapInPandas(run, schema="media_id string, frame_ms int, feature array<float>")
