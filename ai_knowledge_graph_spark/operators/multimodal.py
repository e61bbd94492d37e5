"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads ride as ``binary`` columns; decode / feature
extraction / resize / frame sampling run as Arrow-batched ``mapInPandas``
operators. The decode step itself is STUBBED (no image/audio libs in this
container): ``decode_stub=True`` derives deterministic fake features from the
payload bytes so the Spark-side plumbing — schema, batching, partitioning,
UDF signature — is real and tested; wiring a real decoder is a one-function
swap (see ``_decode_payload``).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "url string, media_type string, n_bytes long, sha256 string, "
    "width int, height int, n_frames int, feature array<float>"
)


def _decode_payload(payload: bytes, media_type: str) -> dict:
    """STUB decoder. A real deployment swaps this body for PIL/ffmpeg/etc.
    Deterministic fake: dimensions and an 8-dim feature derived from the
    payload digest — stable across runs/partitions, so tests can assert
    exact values without the media libs."""
    digest = hashlib.sha256(payload).digest()
    rng = np.frombuffer(digest[:16], dtype=np.uint32)
    width = int(64 + rng[0] % 1920)
    height = int(64 + rng[1] % 1080)
    n_frames = int(1 + rng[2] % 240) if media_type == "video" else 1
    feature = (np.frombuffer(digest, dtype=np.uint8)[:8] / 255.0).astype(np.float32)
    return {
        "width": width,
        "height": height,
        "n_frames": n_frames,
        "feature": feature.tolist(),
    }


def extract_media_metadata(
    media: DataFrame,
    url_col: str = "url",
    payload_col: str = "payload",
    type_col: str = "media_type",
) -> DataFrame:
    """(url, payload, media_type) -> typed metadata + feature vector.

    One Arrow batch in, one out; payload bytes never leave the executor.
    """

    def batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "url", "media_type", "n_bytes", "sha256",
            "width", "height", "n_frames", "feature",
        ]
        for pdf in batches:
            rows = []
            for url, payload, mtype in zip(pdf["url"], pdf["payload"], pdf["media_type"]):
                payload = bytes(payload) if payload is not None else b""
                meta = _decode_payload(payload, mtype)
                rows.append(
                    {
                        "url": url,
                        "media_type": mtype,
                        "n_bytes": len(payload),
                        "sha256": hashlib.sha256(payload).hexdigest(),
                        **meta,
                    }
                )
            yield pd.DataFrame(rows, columns=cols)

    projected = media.select(
        F.col(url_col).alias("url"),
        F.col(payload_col).alias("payload"),
        F.col(type_col).alias("media_type"),
    )
    return projected.mapInPandas(batch, schema=MEDIA_META_SCHEMA)


def sample_frames(
    media: DataFrame,
    every_n: int = 30,
    url_col: str = "url",
    payload_col: str = "payload",
) -> DataFrame:
    """Frame-sampling plumbing: one row per sampled frame index with a
    deterministic per-frame payload slice (stub: real impl decodes frames).
    Output: (url, frame_idx, frame_sha256)."""

    def batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["url", "frame_idx", "frame_sha256"]
        for pdf in batches:
            rows = []
            for url, payload in zip(pdf["url"], pdf["payload"]):
                payload = bytes(payload) if payload is not None else b""
                meta = _decode_payload(payload, "video")
                for idx in range(0, meta["n_frames"], every_n):
                    frame_bytes = payload + idx.to_bytes(4, "big")
                    rows.append(
                        {
                            "url": url,
                            "frame_idx": idx,
                            "frame_sha256": hashlib.sha256(frame_bytes).hexdigest(),
                        }
                    )
            yield pd.DataFrame(rows, columns=cols)

    return media.select(
        F.col(url_col).alias("url"), F.col(payload_col).alias("payload")
    ).mapInPandas(batch, schema="url string, frame_idx int, frame_sha256 string")
