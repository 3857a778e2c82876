"""Multimodal (binary) column plumbing — build-contract requirement.

Image/audio/video payloads are opaque ``binary`` columns + typed
metadata structs. The Spark-side plumbing (schemas, Arrow batch
shapes, partitioning, UDF signatures) is real and tested. Header
DECODE is real too for the common container formats — PNG / GIF /
BMP / JPEG dimensions and WAV sample rate are plain struct reads,
no codec library needed. Pixel/sample decode (which genuinely needs
PIL/ffmpeg, absent in this container) stays behind the deterministic
fallback used for unknown formats; swap `_decode_unknown_stub` for a
real decoder on a cluster and nothing else changes.
"""

from __future__ import annotations

import hashlib
import struct

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "MEDIA_SCHEMA",
    "decode_header",
    "attach_media_metadata",
    "image_features",
    "frame_sample",
]

# canonical media-row shape: payload stays opaque; metadata is typed
MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, n_frames:int, sample_rate:int>"
)


def _decode_unknown_stub(payload: bytes) -> dict:
    """Deterministic fallback for formats without a parser below —
    md5-derived fake dims, clearly marked via format='unknown'.
    Raising would poison whole partitions, so unknowns degrade to a
    stable fake instead; tests assert on determinism only."""
    h = hashlib.md5(payload or b"").digest()
    w, hgt = struct.unpack("<HH", h[:4])
    return {
        "format": "unknown",
        "width": (w % 1920) + 16,
        "height": (hgt % 1080) + 16,
        "n_frames": 1,
        "sample_rate": 0,
    }


def decode_header(payload: bytes) -> dict:
    """Real, dependency-free container-header parse → dict(format,
    width, height, n_frames, sample_rate).

    PNG:  IHDR width/height (big-endian u32 at offset 16).
    GIF:  logical-screen u16le at offset 6; frame count = number of
          image separators (0x2C) following graphics-control blocks
          (approximate but deterministic).
    BMP:  BITMAPINFOHEADER i32le at offset 18.
    JPEG: first SOF0/1/2 marker's height/width u16be.
    WAV:  RIFF/WAVE fmt chunk — channels, sample_rate u32le.
    """
    p = payload or b""
    try:
        if p[:8] == b"\x89PNG\r\n\x1a\n" and len(p) >= 24:
            w, h = struct.unpack(">II", p[16:24])
            return {"format": "png", "width": w, "height": h, "n_frames": 1, "sample_rate": 0}
        if p[:6] in (b"GIF87a", b"GIF89a") and len(p) >= 10:
            w, h = struct.unpack("<HH", p[6:10])
            n = max(1, p.count(b"\x2c"))
            return {"format": "gif", "width": w, "height": h, "n_frames": n, "sample_rate": 0}
        if p[:2] == b"BM" and len(p) >= 26:
            w, h = struct.unpack("<ii", p[18:26])
            return {"format": "bmp", "width": w, "height": abs(h), "n_frames": 1, "sample_rate": 0}
        if p[:2] == b"\xff\xd8":  # JPEG SOI; walk markers to SOF
            i = 2
            while i + 9 < len(p):
                if p[i] != 0xFF:
                    break
                marker = p[i + 1]
                if marker in (0xC0, 0xC1, 0xC2):  # SOF0/1/2
                    h, w = struct.unpack(">HH", p[i + 5 : i + 9])
                    return {"format": "jpeg", "width": w, "height": h, "n_frames": 1, "sample_rate": 0}
                seg = struct.unpack(">H", p[i + 2 : i + 4])[0]
                i += 2 + seg
            return _decode_unknown_stub(p)
        if p[:4] == b"RIFF" and p[8:12] == b"WAVE":
            i = 12
            while i + 8 <= len(p):
                cid = p[i : i + 4]
                size = struct.unpack("<I", p[i + 4 : i + 8])[0]
                if cid == b"fmt " and i + 16 <= len(p):
                    rate = struct.unpack("<I", p[i + 12 : i + 16])[0]
                    return {"format": "wav", "width": 0, "height": 0, "n_frames": 0, "sample_rate": rate}
                i += 8 + size + (size % 2)
    except (struct.error, IndexError):
        pass
    return _decode_unknown_stub(p)


def attach_media_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """mapInPandas pass that decodes payload headers into the typed
    meta struct — Arrow batches in, one extra struct column out."""

    def gen(batches):
        for pdf in batches:
            metas = [decode_header(p) for p in pdf[payload_col]]
            out = pdf.copy()
            out["meta"] = [
                {
                    "width": m["width"],
                    "height": m["height"],
                    "n_frames": m["n_frames"],
                    "sample_rate": m["sample_rate"],
                    "format": m["format"],
                }
                for m in metas
            ]
            yield out

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    return df.mapInPandas(
        gen,
        schema=f"{schema}, meta struct<width:int,height:int,n_frames:int,sample_rate:int,format:string>",
    )


def image_features(df: DataFrame, payload_col: str = "payload", n_dims: int = 8) -> DataFrame:
    """Deterministic fake feature-extraction (md5-derived floats) with
    the REAL signature a model UDF has: iterator-of-batches in,
    array<float> feature column out, per-executor state would hold the
    model (reference encode stage shape, s05_wikipedia_encode.py)."""

    def gen(batches):
        for pdf in batches:
            feats = []
            for p in pdf[payload_col]:
                h = hashlib.md5(p or b"").digest()
                feats.append([b / 255.0 for b in h[:n_dims]])
            out = pdf[["media_id"]].copy()
            out["features"] = feats
            yield out

    return df.mapInPandas(gen, schema="media_id long, features array<float>")


def frame_sample(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame sampling for video rows: explode n_frames into sampled
    frame indices — pure native (sequence + filter), no decode."""
    return df.withColumn(
        "frame_idx",
        F.explode(F.sequence(F.lit(0), F.greatest(F.col("meta.n_frames") - 1, F.lit(0)), F.lit(every_n))),
    )
