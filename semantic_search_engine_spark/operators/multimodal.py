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


def encode_bmp(pixels: np.ndarray, top_down: bool = False) -> bytes:
    """Serialize an (h, w, 3) uint8 RGB array as an uncompressed 24-bit
    BI_RGB Windows bitmap (BITMAPINFOHEADER, rows padded to 4 bytes,
    bottom-up unless ``top_down``). Test/fixture helper for the real
    decoder below — pure NumPy, no image library."""
    import struct

    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    row_bytes = (w * 3 + 3) & ~3
    body = bytearray()
    order = range(h) if top_down else range(h - 1, -1, -1)
    for r in order:
        row = px[r, :, ::-1].tobytes()  # RGB → BGR
        body += row + b"\x00" * (row_bytes - len(row))
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + len(body), 0, 0, 54
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, -h if top_down else h, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return bytes(header) + bytes(body)


def decode_bmp_pixels(payload: bytes) -> np.ndarray:
    """(h, w, 3) uint8 RGB from an uncompressed 24-bit BI_RGB bitmap —
    real pixel parsing (header offsets, row padding, bottom-up vs
    top-down row order), pure NumPy."""
    import struct

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    w, h_raw = struct.unpack_from("<ii", payload, 18)
    bpp, comp = struct.unpack_from("<H", payload, 28)[0], struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or comp != 0:
        raise NotImplementedError(f"only uncompressed 24-bit BMP supported (bpp={bpp}, compression={comp})")
    top_down = h_raw < 0
    h = abs(h_raw)
    row_bytes = (w * 3 + 3) & ~3
    raw = np.frombuffer(payload, dtype=np.uint8, count=h * row_bytes, offset=data_offset)
    rows = raw.reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR → RGB


def decode_ppm_pixels(payload: bytes) -> np.ndarray:
    """(h, w, 3) uint8 RGB from a binary PPM (P6) / PGM (P5, replicated
    to 3 channels) payload — whitespace/comment-tolerant header parse."""
    if payload[:2] not in (b"P6", b"P5"):
        raise ValueError("not a binary PPM/PGM payload")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise NotImplementedError("16-bit PPM not supported")
    ch = 3 if payload[:2] == b"P6" else 1
    px = np.frombuffer(payload, dtype=np.uint8, count=h * w * ch, offset=pos).reshape(h, w, ch)
    return np.repeat(px, 3, axis=2) if ch == 1 else px.copy()


def pool_feature(pixels: np.ndarray) -> np.ndarray:
    """FEATURE_DIM mean-pooled luminance grid: split the image into a
    4×4 grid of (near-)equal blocks, mean each block's grayscale, /255.
    Deterministic pixel math — works for any (h, w) ≥ (4, 4) and
    degrades gracefully below (np.array_split allows empty blocks only
    when a side < 4, which encode paths never produce)."""
    g = np.asarray(pixels, dtype=np.float64).mean(axis=2)
    side = int(np.sqrt(FEATURE_DIM))
    feat = np.array(
        [
            blk.mean() if blk.size else 0.0
            for rows in np.array_split(g, side, axis=0)
            for blk in np.array_split(rows, side, axis=1)
        ]
    )
    return (feat / 255.0).astype(np.float32)


def real_decode(payload: bytes, kind: str) -> tuple[int, int, int, np.ndarray]:
    """REAL decode for the formats expressible without external codec
    libraries: uncompressed 24-bit BMP and binary PPM/PGM are parsed
    with genuine pixel math (header fields, row padding, channel
    order), then mean-pooled into the FEATURE_DIM grid feature.
    Compressed formats (JPEG/PNG) and audio/video still need
    Pillow/ffmpeg and raise here — ``_fake_decode`` remains the
    SQL-oracle-checkable stand-in for those paths."""
    payload = bytes(payload)
    if kind == "image" and payload[:2] == b"BM":
        px = decode_bmp_pixels(payload)
    elif kind == "image" and payload[:2] in (b"P6", b"P5"):
        px = decode_ppm_pixels(payload)
    else:
        raise NotImplementedError(
            f"no pure-NumPy decoder for kind={kind!r} magic={payload[:2]!r}; "
            "swap in PIL.Image.open / av.open for compressed or a/v formats"
        )
    h, w = px.shape[:2]
    return w, h, 1, pool_feature(px)


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


def synthetic_bmp_assets(
    docs: DataFrame, id_col: str = "doc_id", seed: int = 42
) -> DataFrame:
    """(asset_id, kind, payload) with a REAL uncompressed-BMP payload
    per row — pixels and dimensions are a pure function of (seed, id),
    so the table is deterministic under any partitioning. Variable
    (w, h) per asset exercises genuine header parsing + row padding
    downstream (odd widths produce non-trivial 4-byte pad)."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf[id_col].to_numpy()
            payloads = []
            for i in ids:
                i = int(i)
                rng = np.random.default_rng([seed, i])
                w, h = 8 + i % 9, 8 + (i // 7) % 9
                payloads.append(
                    encode_bmp(rng.integers(0, 256, (h, w, 3), dtype=np.uint8))
                )
            yield pd.DataFrame(
                {"asset_id": ids, "kind": "image", "payload": payloads}
            )

    return docs.select(id_col).mapInPandas(gen, "asset_id long, kind string, payload binary")


def extract_features(
    assets: DataFrame, id_col: str = "asset_id", decode: str = "fake"
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads (Arrow
    batches; per-batch loop only, no per-row Python at the API layer).

    ``decode="fake"`` uses the deterministic sha256 stand-in (SQL-
    oracle-checkable end-to-end); ``decode="real"`` runs
    :func:`real_decode` — genuine pixel parsing for BMP/PPM payloads."""
    decoder = real_decode if decode == "real" else _fake_decode

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = [
                (decoder(bytes(p), k)) for p, k in zip(pdf["payload"], pdf["kind"])
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
