"""Multimodal (image/audio/video) column plumbing for the training-data
pipeline: payloads are opaque `binary` columns with a typed metadata
struct; decode/feature steps are Arrow-batched UDFs whose Spark-side
contract (schema, batch shape, partitioning) is real and tested, while the
codec itself is stubbed — the image/audio libraries are not in this
container, so ``decoder='real'`` raises NotImplementedError and
``decoder='fake'`` runs a deterministic stand-in with the same shapes.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, n_frames:int, sample_rate:int, codec:string>"
)


def make_media_table(spark, n: int, kind: str = "image") -> DataFrame:
    """Deterministic fake media rows (payload = seeded bytes) for testing
    the plumbing at any scale."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                payload = bytes(((i * 131 + k * 17) % 251) for k in range(64))
                rows.append(
                    (i, kind, payload,
                     {"width": 32 + i % 64, "height": 32 + (i * 3) % 64,
                      "n_frames": 1 + i % 30, "sample_rate": 16000,
                      "codec": "fake"})
                )
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload", "meta"])

    return spark.range(n).mapInPandas(gen, MEDIA_SCHEMA)


def _fake_decode(payload: bytes, w: int, h: int) -> np.ndarray:
    """Deterministic stand-in 'decode': tile the payload bytes to (h, w)."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    reps = int(np.ceil(w * h / len(arr)))
    return np.tile(arr, reps)[: w * h].reshape(h, w)


def decode_features(
    media: DataFrame,
    decoder: str = "fake",
    resize_to: int = 8,
) -> DataFrame:
    """→ (media_id, kind, feat array<float>): decode → resize (block mean
    to resize_to×resize_to) → flatten. 'real' is a documented stub: plug a
    PIL/ffmpeg decode here; batch shape and output schema stay identical."""
    if decoder not in ("fake", "real"):
        raise ValueError("decoder must be 'fake' or 'real'")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload, meta in zip(pdf["payload"], pdf["meta"]):
                if decoder == "real":
                    raise NotImplementedError(
                        "real image/audio decode requires codec libs not in "
                        "this container; use decoder='fake'"
                    )
                w, h = int(meta["width"]), int(meta["height"])
                img = _fake_decode(bytes(payload), w, h).astype(np.float64)
                # block-mean resize to (resize_to, resize_to)
                ys = np.linspace(0, h, resize_to + 1).astype(int)
                xs = np.linspace(0, w, resize_to + 1).astype(int)
                out = np.empty((resize_to, resize_to))
                for a in range(resize_to):
                    for b in range(resize_to):
                        blk = img[ys[a]:max(ys[a + 1], ys[a] + 1),
                                  xs[b]:max(xs[b + 1], xs[b] + 1)]
                        out[a, b] = blk.mean()
                feats.append((out / 255.0).ravel().astype(np.float32).tolist())
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "kind": pdf["kind"], "feat": feats}
            )

    return media.mapInPandas(run, "media_id long, kind string, feat array<float>")


def sample_frames(media: DataFrame, every_n: int = 5) -> DataFrame:
    """Frame-sampling plumbing: explode frame indices 0..n_frames-1, keep
    every n-th — pure Catalyst; the per-frame decode hangs off
    decode_features."""
    return media.select(
        "media_id",
        "kind",
        F.explode(F.sequence(F.lit(0), F.col("meta.n_frames") - 1)).alias("frame_idx"),
    ).where(F.col("frame_idx") % every_n == 0)
