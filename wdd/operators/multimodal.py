"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed through mapInPandas with real Spark-side schema/partitioning/batch
shape — the decode kernels themselves are STUBBED (image/audio libraries are
not available in this container).

The stub boundary is explicit: `decode_image` raises NotImplementedError
unless `deterministic_fake=True`, in which case it produces a seeded,
content-derived fake (stable across runs/executors) so the distributed
plumbing — schemas, Arrow batching, partition-parallel decode, downstream
joins — is fully exercised and tested. Swapping in a real decoder is a
one-function change with the same signature.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = ("media_id long, kind string, payload binary, "
                "width int, height int, sample_rate int, n_frames int")

IMAGE_FEATURES_SCHEMA = ("media_id long, width int, height int, "
                         "feature array<float>, decode_ok boolean")

FRAME_SAMPLE_SCHEMA = ("media_id long, frame_idx int, frame_sha1 string")

AUDIO_CHUNK_SCHEMA = ("media_id long, chunk_idx int, start_sample long, "
                      "n_samples int, chunk_sha1 string")


def decode_image(payload: bytes, deterministic_fake: bool = False) -> np.ndarray:
    """STUB: decode an image payload to an HxWx3 array.

    Real implementation requires an image codec (PIL/opencv), absent here.
    `deterministic_fake=True` derives a tiny pseudo-image from the payload's
    sha1 so plumbing tests are deterministic.
    """
    if not deterministic_fake:
        raise NotImplementedError(
            "image decode requires an image codec library; not available in "
            "this environment — pass deterministic_fake=True for plumbing tests")
    seed = int.from_bytes(hashlib.sha1(payload).digest()[:8], "big")
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)


def image_features(media: DataFrame, deterministic_fake: bool = True,
                   feature_dim: int = 16) -> DataFrame:
    """Decode -> resize -> feature-extract over image rows via mapInPandas.

    Batch shape: one Arrow batch in, one feature row per input row out;
    decode failures yield decode_ok=false rather than task failure (the
    reference's never-throw UDF discipline, F6 / discover.py:45-48).
    """
    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, oks = [], []
            for payload in pdf["payload"]:
                try:
                    if payload is None:
                        # NULL payload: undecodable row, never-throw (F6)
                        raise NotImplementedError("null payload")
                    img = decode_image(bytes(payload),
                                       deterministic_fake=deterministic_fake)
                    # "resize" to 4x4 mean-pool + flatten, then pad/trim
                    pooled = img.reshape(4, 2, 4, 2, 3).mean(axis=(1, 3))
                    v = pooled.mean(axis=2).ravel().astype(np.float32)
                    v = np.resize(v, feature_dim)
                    feats.append(v.tolist())
                    oks.append(True)
                except NotImplementedError:
                    feats.append([0.0] * feature_dim)
                    oks.append(False)
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "width": pdf.get("width", pd.Series([0] * len(pdf))),
                "height": pdf.get("height", pd.Series([0] * len(pdf))),
                "feature": feats,
                "decode_ok": oks,
            })

    return (media.where(F.col("kind") == "image")
            .mapInPandas(_extract, IMAGE_FEATURES_SCHEMA))


def sample_frames(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame sampling for video rows: emits one row per sampled frame index.

    The frame decode is stubbed (sha1 of payload+index stands in for frame
    bytes); the table-generating fan-out shape (mapInPandas emitting multiple
    rows per input) is real.
    """
    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_idx, out_sha = [], [], []
            for mid, payload, n_frames in zip(pdf["media_id"], pdf["payload"],
                                              pdf["n_frames"]):
                # NULL payload rows are dropped (same guard as audio_chunks:
                # bytes(None) would raise TypeError in the worker)
                if payload is None:
                    continue
                for idx in range(0, int(n_frames or 0), every_n):
                    out_id.append(mid)
                    out_idx.append(idx)
                    out_sha.append(hashlib.sha1(
                        bytes(payload) + idx.to_bytes(4, "big")).hexdigest())
            yield pd.DataFrame({"media_id": out_id, "frame_idx": out_idx,
                                "frame_sha1": out_sha})

    return (media.where(F.col("kind") == "video")
            .mapInPandas(_sample, FRAME_SAMPLE_SCHEMA))


def audio_chunks(media: DataFrame, chunk_ms: int = 250) -> DataFrame:
    """Fixed-duration audio chunking for audio rows via mapInPandas.

    The waveform decode is stubbed (no audio codec in this container): the
    payload byte length stands in for the sample count (1 byte/sample PCM8
    surrogate), so chunk boundaries — the real Spark-side plumbing under
    test — are a pure function of (octet_length(payload), sample_rate,
    chunk_ms) and fully oracle-checkable. chunk_sha1 hashes the chunk's
    payload slice, standing in for per-chunk feature extraction.

    Completes the image/audio/video triad next to `image_features` (fan-in)
    and `sample_frames` (frame fan-out): this is metadata-driven fan-out
    where the output row count per input depends on typed metadata
    (sample_rate), not a constant.
    """
    def _chunk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {k: [] for k in
                                    ("media_id", "chunk_idx", "start_sample",
                                     "n_samples", "chunk_sha1")}
            for mid, payload, rate in zip(pdf["media_id"], pdf["payload"],
                                          pdf["sample_rate"]):
                # NULL payload / non-positive sample_rate rows are dropped —
                # bytes(None) would raise in the worker, and a degenerate
                # step=1 fallback would emit one chunk per byte; the oracle
                # (and any sane consumer) drops such rows instead.
                if payload is None or rate is None or int(rate) <= 0:
                    continue
                buf = bytes(payload)
                n_samples = len(buf)
                step = max(1, int(rate) * chunk_ms // 1000)
                for ci, start in enumerate(range(0, n_samples, step)):
                    piece = buf[start:start + step]
                    out["media_id"].append(mid)
                    out["chunk_idx"].append(ci)
                    out["start_sample"].append(start)
                    out["n_samples"].append(len(piece))
                    out["chunk_sha1"].append(hashlib.sha1(piece).hexdigest())
            yield pd.DataFrame(out)

    return (media.where(F.col("kind") == "audio")
            .mapInPandas(_chunk, AUDIO_CHUNK_SCHEMA))
