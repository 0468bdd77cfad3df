"""Multimodal binary-column plumbing — image/audio/video as opaque
`binary` columns with typed metadata (north-star op; no reference analog —
the reference stores text only, TencentVDB.py:76-78).

The container has no image/audio libs, so DECODING is split in two:
  * container parsing (headers, dimensions, frame offsets) — implemented
    for a deterministic fake container format, fully real Spark plumbing:
    binary column in parquet-compatible schema, Arrow batches through
    mapInPandas, struct-typed metadata out.
  * pixel/sample decode (PIL/ffmpeg) — stubbed behind import-try +
    NotImplementedError, with a deterministic fake feature extractor so the
    downstream pipeline (feature → embedding → kNN) is testable end-to-end.

Fake container format "FKM1": 4-byte magic | uint16 width | uint16 height |
uint8 kind | payload bytes (row-major fake pixels / frames).
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAGIC = b"FKM1"
KINDS = ("image", "audio", "video")


def synth_media(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministically synthesize a media blob per row (stand-in for a
    real binary ingest): dims/kind derived from the id, payload from a
    seeded RNG — reproducible across runs and engines."""

    def _make(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for i in pdf[id_col]:
                w, h = 16 + int(i) % 48, 16 + (int(i) * 7) % 32
                kind = int(i) % 3
                rng = np.random.default_rng(int(i))
                payload = rng.integers(0, 256, size=w * h, dtype=np.uint8).tobytes()
                blobs.append(MAGIC + struct.pack("<HHB", w, h, kind) + payload)
            yield pd.DataFrame({id_col: pdf[id_col], "media": blobs})

    return docs.select(id_col).mapInPandas(_make, schema=f"{id_col} long, media binary")


def decode_media_meta(media_df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Container parse: binary → typed metadata struct.  Pure column ops —
    header fields are fixed-offset, so substring/conversion stays JVM-side
    (no Python for the metadata path)."""
    byte_at = lambda off: F.conv(  # noqa: E731
        F.hex(F.expr(f"substring(media, {off}, 1)")), 16, 10
    ).cast("int")
    little_u16 = lambda off: byte_at(off) + byte_at(off + 1) * 256  # noqa: E731
    return media_df.select(
        F.col(id_col),
        F.expr("substring(media, 1, 4)").cast("string").alias("magic"),
        little_u16(5).alias("width"),
        little_u16(7).alias("height"),
        byte_at(9).alias("kind_id"),
        (F.length("media") - 9).alias("payload_bytes"),
    ).withColumn(
        "kind",
        F.element_at(F.array(*[F.lit(k) for k in KINDS]), F.col("kind_id") + 1),
    )


def extract_features(media_df: DataFrame, id_col: str = "doc_id", bins: int = 16) -> DataFrame:
    """Feature extraction over the payload (the real-decoder seam).

    A real image pipeline would decode pixels here (PIL/torchvision —
    unavailable in this container; see `real_decode_stub`).  The
    deterministic fallback computes a byte histogram — shape-compatible
    with a real embedding (array<float>, unit norm) so downstream kNN/dedup
    is exercised for real."""

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for blob in pdf["media"]:
                payload = np.frombuffer(bytes(blob)[9:], dtype=np.uint8)
                hist = np.bincount(payload >> 4, minlength=bins).astype(np.float64)
                n = np.linalg.norm(hist)
                feats.append((hist / n if n > 0 else hist).astype(np.float32))
            yield pd.DataFrame({id_col: pdf[id_col], "features": feats})

    return media_df.select(id_col, "media").mapInPandas(
        _feat, schema=f"{id_col} long, features array<float>"
    )


def sample_frames(
    media_df: DataFrame, every_n: int = 4, frame_bytes: int = 64, id_col: str = "doc_id"
) -> DataFrame:
    """Video-shaped op: treat the payload as fixed-size frames, keep every
    n-th (the frame-sampling stage of a video pipeline).  Emits one row per
    sampled frame — the explode shape a real decoder would produce."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fidx, frames = [], [], []
            for i, blob in zip(pdf[id_col], pdf["media"]):
                payload = bytes(blob)[9:]
                n_frames = len(payload) // frame_bytes
                for f in range(0, n_frames, every_n):
                    ids.append(i)
                    fidx.append(f)
                    frames.append(payload[f * frame_bytes : (f + 1) * frame_bytes])
            yield pd.DataFrame({id_col: ids, "frame_idx": fidx, "frame": frames})

    return media_df.select(id_col, "media").mapInPandas(
        _sample, schema=f"{id_col} long, frame_idx int, frame binary"
    )


def resize_media(
    media_df: DataFrame, factor: int = 2, id_col: str = "doc_id"
) -> DataFrame:
    """Resize stage: nearest-neighbor downsample of the payload grid by
    `factor` along both axes, re-encoded as a valid FKM1 blob with updated
    header dims.  The numpy strided slice is the stand-in for a real
    interpolating resize (PIL/torchvision seam, real_decode_stub); the
    Spark plumbing — binary in, binary out, Arrow batches, header rewrite
    — is exactly what a production thumbnailing pass does."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            ws, hs = [], []
            for blob in pdf["media"]:
                b = bytes(blob)
                w, h, kind = struct.unpack("<HHB", b[4:9])
                grid = np.frombuffer(b[9 : 9 + w * h], dtype=np.uint8).reshape(h, w)
                small = grid[::factor, ::factor]
                nh, nw = small.shape
                out.append(
                    MAGIC + struct.pack("<HHB", nw, nh, kind) + small.tobytes()
                )
                ws.append(nw)
                hs.append(nh)
            yield pd.DataFrame(
                {id_col: pdf[id_col], "media": out, "width": ws, "height": hs}
            )

    return media_df.select(id_col, "media").mapInPandas(
        _resize, schema=f"{id_col} long, media binary, width int, height int"
    )


def real_decode_stub(blob: bytes):
    """The seam where a real decoder plugs in.  Raises unless PIL exists
    (it doesn't in this container — by design, see module docstring)."""
    try:
        from PIL import Image  # noqa: PLC0415
        import io  # noqa: PLC0415

        return Image.open(io.BytesIO(blob))
    except ImportError as e:
        raise NotImplementedError(
            "pixel decode requires PIL/pillow; not available in this image"
        ) from e
