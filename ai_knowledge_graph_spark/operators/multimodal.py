"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads ride as ``binary`` columns; decode / feature
extraction / resize / frame sampling run as Arrow-batched ``mapInPandas``
operators. Decoding is REAL for the stdlib-parsable container formats —
BMP and PPM/PGM images (dims, channels), RIFF/WAV audio (sample rate,
channels, duration), PNG (IHDR fixed-offset read) and JPEG (SOFn marker
scan) — all parsed from the actual bytes with pure ``struct`` arithmetic,
no media libraries. Only formats whose headers genuinely need codec libs
(MP4/WebM/...) fall back to a clearly-documented deterministic stub
(dimensions derived from the payload digest) so the Spark-side plumbing
still exercises end-to-end; a real deployment swaps ``_decode_other`` for
PIL/ffmpeg.

The tiny encoders (make_bmp / make_ppm / make_wav) exist so tests and the
``multimodal_stats`` oracle query can synthesize real payload bytes
deterministically — the decode path is then verified round-trip against
parameters the DuckDB oracle recomputes arithmetically.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "url string, media_type string, codec string, n_bytes long, sha256 string, "
    "width int, height int, n_channels int, sample_rate int, duration_ms long, "
    "n_frames int, feature array<float>"
)


# --- encoders (deterministic fixtures; also double as format documentation) --


def make_bmp(width: int, height: int, seed: int = 0) -> bytes:
    """Minimal 24-bit BITMAPINFOHEADER BMP with deterministic pixel bytes."""
    row = ((3 * width + 3) // 4) * 4  # rows pad to 4-byte boundaries
    pix = bytes((seed + i) % 256 for i in range(row * height))
    info = (
        (40).to_bytes(4, "little")
        + width.to_bytes(4, "little", signed=True)
        + height.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")  # planes
        + (24).to_bytes(2, "little")  # bits per pixel
        + b"\x00" * 24
    )
    header = (
        b"BM"
        + (54 + len(pix)).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + (54).to_bytes(4, "little")
    )
    return header + info + pix


def make_ppm(width: int, height: int, seed: int = 0, gray: bool = False) -> bytes:
    """Binary PPM (P6) or PGM (P5) with deterministic pixel bytes."""
    ch = 1 if gray else 3
    hdr = f"{'P5' if gray else 'P6'}\n{width} {height}\n255\n".encode()
    return hdr + bytes((seed + i) % 256 for i in range(ch * width * height))


def make_wav(
    sample_rate: int, n_samples: int, channels: int = 1, seed: int = 0
) -> bytes:
    """Canonical 16-bit PCM RIFF/WAVE with deterministic sample bytes."""
    block = channels * 2
    byte_rate = sample_rate * block
    data = bytes((seed + i) % 256 for i in range(n_samples * block))
    fmt = (
        (1).to_bytes(2, "little")  # PCM
        + channels.to_bytes(2, "little")
        + sample_rate.to_bytes(4, "little")
        + byte_rate.to_bytes(4, "little")
        + block.to_bytes(2, "little")
        + (16).to_bytes(2, "little")  # bits per sample
    )
    return (
        b"RIFF"
        + (4 + 8 + 16 + 8 + len(data)).to_bytes(4, "little")
        + b"WAVE"
        + b"fmt "
        + (16).to_bytes(4, "little")
        + fmt
        + b"data"
        + len(data).to_bytes(4, "little")
        + data
    )


def make_png(width: int, height: int, seed: int = 0, gray: bool = False) -> bytes:
    """Real minimal PNG (signature + IHDR + one IDAT + IEND, CRCs correct).
    IDAT deflates at level 0 (stored blocks), so for raw scanline bytes
    <= 65535 the file size is exactly ``68 + height * (1 + ch * width)`` —
    what the multimodal_stats oracle recomputes arithmetically."""
    import zlib

    ch = 1 if gray else 3
    raw = b"".join(
        b"\x00"  # filter byte: None
        + bytes((seed + y * width * ch + i) % 256 for i in range(width * ch))
        for y in range(height)
    )
    comp = zlib.compress(raw, 0)

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            len(data).to_bytes(4, "big")
            + typ
            + data
            + zlib.crc32(typ + data).to_bytes(4, "big")
        )

    ihdr = (
        width.to_bytes(4, "big")
        + height.to_bytes(4, "big")
        + bytes([8, 0 if gray else 2, 0, 0, 0])  # depth, color type, ...
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", comp)
        + chunk(b"IEND", b"")
    )


def make_jpeg(
    width: int, height: int, seed: int = 0, gray: bool = False, n_entropy: int = 24
) -> bytes:
    """Structurally-valid JFIF/JPEG header stream: SOI, APP0, SOF0 (the
    dims), SOS, ``n_entropy`` deterministic entropy bytes (mod 255 — never
    a 0xFF marker prefix), EOI. Size is exactly ``40 + 5 * ncomp +
    n_entropy`` bytes."""
    n = 1 if gray else 3
    app0 = (
        b"\xff\xe0" + (16).to_bytes(2, "big")
        + b"JFIF\x00\x01\x01\x00" + b"\x00\x01\x00\x01" + b"\x00\x00"
    )
    sof0 = (
        b"\xff\xc0" + (8 + 3 * n).to_bytes(2, "big") + bytes([8])
        + height.to_bytes(2, "big") + width.to_bytes(2, "big") + bytes([n])
        + b"".join(bytes([i + 1, 0x11, 0]) for i in range(n))
    )
    sos = (
        b"\xff\xda" + (6 + 2 * n).to_bytes(2, "big") + bytes([n])
        + b"".join(bytes([i + 1, 0]) for i in range(n))
        + bytes([0, 63, 0])
    )
    entropy = bytes((seed + i) % 255 for i in range(n_entropy))
    return b"\xff\xd8" + app0 + sof0 + sos + entropy + b"\xff\xd9"


# --- decoders ----------------------------------------------------------------


# PNG color type -> sample channels (3 = palette: 1 index byte per pixel)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _decode_png(b: bytes) -> dict:
    # IHDR is mandated to be the first chunk: width/height u32 BE at fixed
    # offsets 16/20 (8-byte signature + 4-byte length + "IHDR"), color
    # type byte at 25.
    return {
        "codec": "png",
        "width": int.from_bytes(b[16:20], "big"),
        "height": int.from_bytes(b[20:24], "big"),
        "n_channels": _PNG_CHANNELS.get(b[25], 3),
        "n_frames": 1,
    }


def _decode_jpeg(b: bytes) -> dict | None:
    # Marker scan for SOFn (0xC0-0xCF minus DHT 0xC4 / JPG 0xC8 / DAC
    # 0xCC): precision u8, height u16 BE, width u16 BE, ncomp u8. Returns
    # None if no SOF frame header exists (truncated stream) -> stub path.
    i = 2
    while i + 9 < len(b):
        if b[i] != 0xFF:
            i += 1
            continue
        marker = b[i + 1]
        if marker == 0xFF:  # fill byte
            i += 1
            continue
        if marker in (0x01, 0xD8) or 0xD0 <= marker <= 0xD9:  # no-length
            i += 2
            continue
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            return {
                "codec": "jpeg",
                "width": int.from_bytes(b[i + 7 : i + 9], "big"),
                "height": int.from_bytes(b[i + 5 : i + 7], "big"),
                "n_channels": b[i + 9],
                "n_frames": 1,
            }
        i += 2 + int.from_bytes(b[i + 2 : i + 4], "big")
    return None


def _decode_bmp(b: bytes) -> dict:
    # BITMAPFILEHEADER (14 bytes) + BITMAPINFOHEADER: width/height int32 LE
    # at offsets 18/22, bpp uint16 at 28. Negative height = top-down rows.
    width = int.from_bytes(b[18:22], "little", signed=True)
    height = abs(int.from_bytes(b[22:26], "little", signed=True))
    bpp = int.from_bytes(b[28:30], "little")
    return {
        "codec": "bmp",
        "width": width,
        "height": height,
        "n_channels": max(1, bpp // 8),
        "n_frames": 1,
    }


def _decode_ppm(b: bytes) -> dict:
    # ASCII header: magic, width, height, maxval separated by whitespace;
    # '#' starts a comment running to end-of-line.
    toks: list[bytes] = []
    i = 2  # past magic
    tok = b""
    while i < len(b) and len(toks) < 3:
        c = b[i : i + 1]
        if c == b"#":
            while i < len(b) and b[i : i + 1] != b"\n":
                i += 1
        elif c in (b" ", b"\t", b"\r", b"\n"):
            if tok:
                toks.append(tok)
                tok = b""
        else:
            tok += c
        i += 1
    magic = b[:2]
    return {
        "codec": "ppm",
        "width": int(toks[0]),
        "height": int(toks[1]),
        "n_channels": 3 if magic in (b"P3", b"P6") else 1,
        "n_frames": 1,
    }


def _decode_wav(b: bytes) -> dict:
    # RIFF chunk walk (not fixed offsets: extensible-fmt / LIST chunks move
    # the data chunk). fmt: channels u16@+2, sample_rate u32@+4, bps u16@+14.
    pos, fmt, data_size = 12, None, 0
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        size = int.from_bytes(b[pos + 4 : pos + 8], "little")
        if cid == b"fmt ":
            fmt = b[pos + 8 : pos + 8 + size]
        elif cid == b"data":
            data_size = size
        pos += 8 + size + (size & 1)  # chunks pad to even offsets
    channels = int.from_bytes(fmt[2:4], "little")
    rate = int.from_bytes(fmt[4:8], "little")
    bps = int.from_bytes(fmt[14:16], "little")
    block = max(1, channels * max(1, bps // 8))
    n_frames = data_size // block
    return {
        "codec": "wav",
        "width": None,
        "height": None,
        "n_channels": channels,
        "sample_rate": rate,
        "duration_ms": n_frames * 1000 // max(1, rate),
        "n_frames": int(n_frames),
    }


def _decode_other(payload: bytes, media_type: str) -> dict:
    """STUB for formats that need real codec libraries (JPEG/PNG/MP4/...).
    Deterministic fake dimensions from the payload digest — stable across
    runs/partitions so tests can assert exact values without media libs. A
    real deployment swaps this body for PIL/ffmpeg; everything else in the
    operator (schema, batching, hashing, features) is production code."""
    digest = hashlib.sha256(payload).digest()
    rng = np.frombuffer(digest[:16], dtype=np.uint32)
    return {
        "codec": "stub",
        "width": int(64 + rng[0] % 1920),
        "height": int(64 + rng[1] % 1080),
        "n_channels": 3,
        "n_frames": int(1 + rng[2] % 240) if media_type == "video" else 1,
    }


def _decode_payload(payload: bytes, media_type: str) -> dict:
    """Sniff the container magic and parse for real where stdlib suffices;
    fall back to the documented stub otherwise. Always returns the full
    metadata key set plus an 8-dim digest feature (the feature-extraction
    stage runs on decoded pixels/samples in a real deployment; the digest
    stand-in keeps the column shape and determinism)."""
    meta: dict = {
        "codec": "empty",
        "width": None,
        "height": None,
        "n_channels": None,
        "sample_rate": None,
        "duration_ms": None,
        "n_frames": 0,
    }
    if payload[:2] == b"BM" and len(payload) >= 30:
        meta.update(_decode_bmp(payload))
    elif payload[:2] in (b"P2", b"P3", b"P5", b"P6") and len(payload) >= 8:
        meta.update(_decode_ppm(payload))
    elif payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        meta.update(_decode_wav(payload))
    elif payload[:8] == b"\x89PNG\r\n\x1a\n" and len(payload) >= 26:
        meta.update(_decode_png(payload))
    elif payload[:2] == b"\xff\xd8":
        meta.update(_decode_jpeg(payload) or _decode_other(payload, media_type))
    elif payload:
        meta.update(_decode_other(payload, media_type))
    digest = hashlib.sha256(payload).digest()
    meta["feature"] = (
        (np.frombuffer(digest, dtype=np.uint8)[:8] / 255.0).astype(np.float32).tolist()
    )
    return meta


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
            "url", "media_type", "codec", "n_bytes", "sha256",
            "width", "height", "n_channels", "sample_rate", "duration_ms",
            "n_frames", "feature",
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
    deterministic per-frame payload slice (video decode itself needs codec
    libs -> frame count comes from _decode_payload, stub for non-WAV).
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
