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
