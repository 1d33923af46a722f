"""Multimodal column plumbing: image/audio/video as opaque binary
columns + typed metadata, processed by Arrow-batched pandas UDFs.

The decode step is STUBBED (no image/audio libraries in this runtime):
``decode_image_stub`` produces a deterministic fake decode derived from
the payload hash, and ``NotImplementedError``-raising hooks mark where
a real codec (Pillow/ffmpeg) plugs in. Everything Spark-side — schema,
partition flow, UDF signatures, Arrow batch shapes — is real and
tested, so swapping in a real decoder is a one-function change.

Schema convention:
  asset:  (asset_id long, kind string, payload binary, meta struct<...>)
  feature: (asset_id long, kind string, width int, height int,
            n_frames int, feature array<float>)
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

FEATURE_DIM = 16
FEATURE_SCHEMA = (
    "asset_id long, kind string, width int, height int, n_frames int, feature array<float>"
)


def real_decode(payload: bytes, kind: str):
    """Plug point for a real decoder. Not available in this runtime."""
    raise NotImplementedError(
        "image/audio decoding libraries are not installed in this runtime; "
        "swap this for PIL.Image.open / av.open in production"
    )


def _fake_decode(payload: bytes, kind: str) -> tuple[int, int, int, np.ndarray]:
    """Deterministic fake decode: dims + FEATURE_DIM float feature
    derived from sha256(payload). Same payload → same feature.

    The derivation chains through HEX STRINGS on purpose: every step is
    recomputable in ANSI-ish SQL (DuckDB's sha256 takes VARCHAR only),
    so the whole decode→feature→similarity pipeline is oracle-checkable
    end-to-end (entry ``multimodal_feature_topk``):
      h  = hex(sha256(payload))          -- sha256(text) in SQL
      meta bytes = unhex(h)[0..2]        -- substr(h, 2i+1, 2) as int
      f  = unhex(hex(sha256(ascii(h))))  -- sha256(sha256(text)) in SQL
      feature[i] = float32(f[i] / 255.0) -- double divide, then f32 cast
    """
    h = hashlib.sha256(payload).hexdigest()
    hb = bytes.fromhex(h)
    width = 64 + hb[0] % 192
    height = 64 + hb[1] % 192
    n_frames = 1 if kind == "image" else 1 + hb[2] % 32
    raw = np.frombuffer(hashlib.sha256(h.encode()).digest(), dtype=np.uint8)
    feature = (raw[:FEATURE_DIM].astype(np.float64) / 255.0).astype(np.float32)
    return width, height, n_frames, feature


def extract_features(assets: DataFrame, id_col: str = "asset_id") -> DataFrame:
    """mapInPandas feature extraction over binary payloads (Arrow
    batches; per-batch loop only, no per-row Python at the API layer)."""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = [
                (_fake_decode(bytes(p), k)) for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf[id_col].to_numpy(),
                    "kind": pdf["kind"].to_numpy(),
                    "width": np.array([r[0] for r in rows], dtype=np.int32),
                    "height": np.array([r[1] for r in rows], dtype=np.int32),
                    "n_frames": np.array([r[2] for r in rows], dtype=np.int32),
                    "feature": [r[3] for r in rows],
                }
            )

    return assets.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample(features: DataFrame, every_n: int = 8) -> DataFrame:
    """Frame-sampling plumbing: explode n_frames into sampled frame ids
    (JVM sequence/explode — the real video path would carry per-frame
    payloads through the same shape)."""
    return features.select(
        "asset_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_n))
        ).alias("frame_id"),
    )


def resize_meta(features: DataFrame, max_side: int = 128) -> DataFrame:
    """Resize bookkeeping (aspect-preserving target dims) as pure column
    math; the pixel op itself belongs in real_decode."""
    scale = F.least(
        F.lit(float(max_side)) / F.col("width"), F.lit(float(max_side)) / F.col("height"), F.lit(1.0)
    )
    return features.select(
        "asset_id",
        "width",
        "height",
        F.round(F.col("width") * scale).cast("int").alias("out_w"),
        F.round(F.col("height") * scale).cast("int").alias("out_h"),
    )
