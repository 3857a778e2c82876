"""Multimodal (binary) column plumbing — build-contract requirement.

Image/audio/video payloads are opaque ``binary`` columns + typed
metadata structs. The Spark-side plumbing (schemas, Arrow batch
shapes, partitioning, UDF signatures) is real and tested; the actual
codec work is STUBBED behind `_decode_image_stub` because no
image/audio library ships in this container — swap the stub for
PIL/torchaudio on a real cluster and nothing else changes.
"""

from __future__ import annotations

import hashlib
import struct

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "MEDIA_SCHEMA",
    "attach_media_metadata",
    "image_features",
    "frame_sample",
]

# canonical media-row shape: payload stays opaque; metadata is typed
MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, n_frames:int, sample_rate:int>"
)


def _decode_image_stub(payload: bytes) -> tuple[int, int]:
    """STUB decode: deterministic fake (width, height) derived from the
    payload hash. Replace with `PIL.Image.open(io.BytesIO(payload))`
    on a cluster with codecs installed. Raising NotImplementedError
    here would poison whole partitions, so the stub is a marked fake
    instead — tests assert on its deterministic output only."""
    h = hashlib.md5(payload or b"").digest()
    w, hgt = struct.unpack("<HH", h[:4])
    return (w % 1920) + 16, (hgt % 1080) + 16


def attach_media_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """mapInPandas pass that decodes payload headers into the typed
    meta struct — the real Arrow plumbing around the stubbed codec."""

    def gen(batches):
        for pdf in batches:
            metas = [_decode_image_stub(p) for p in pdf[payload_col]]
            out = pdf.copy()
            out["meta"] = [
                {"width": w, "height": h, "n_frames": 1, "sample_rate": 0} for (w, h) in metas
            ]
            yield out

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    return df.mapInPandas(gen, schema=f"{schema}, meta struct<width:int,height:int,n_frames:int,sample_rate:int>")


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
