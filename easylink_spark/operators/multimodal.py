"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata structs;
decode / feature-extraction run as Arrow-batched ``mapInPandas`` operators so
bytes cross the JVM/Python boundary once per batch.  The actual codecs
(PIL/ffmpeg/torchaudio) are NOT in this container, so the decode kernels are
stubbed: ``decode=deterministic_fake`` produces seeded-deterministic features
(shape-correct, testable plumbing); ``decode=real`` raises NotImplementedError
pointing at the dependency.  The Spark-side contract — schema, partitioning,
UDF signature, batch shape — is real and tested.

Schema convention:

    media(media_id string, kind string,            -- image|audio|video
          payload binary, meta struct<
            mime string, width int, height int,
            sample_rate int, duration_ms int>)
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id string, kind string, payload binary, "
    "meta struct<mime string, width int, height int, sample_rate int, "
    "duration_ms int>"
)

FEATURE_DIM = 32


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in for a real encoder: features derived from the
    payload digest so tests can assert stability and batch shapes."""
    h = hashlib.sha256(payload or b"").digest()
    rng = np.random.default_rng(int.from_bytes(h[:8], "little"))
    return rng.standard_normal(dim).astype(float).tolist()


def extract_features(
    media: DataFrame,
    decode: str = "deterministic_fake",
    batch_partitions: int | None = None,
) -> DataFrame:
    """media -> (media_id, kind, feature array<double>, n_bytes).

    The mapInPandas kernel receives Arrow batches of (media_id, kind,
    payload); real decoders would replace ``_fake_features``.  Partition
    count is forced up-front: payload bytes dominate partition sizing, and
    decode cost scales with items, so we spread by id hash rather than
    bytes (same reasoning as minhash_signatures).
    """
    if decode == "real":
        raise NotImplementedError(
            "real media decoding requires PIL/ffmpeg/torchaudio, not "
            "available in this environment; use decode='deterministic_fake' "
            "for plumbing tests"
        )
    if decode != "deterministic_fake":
        raise ValueError(f"unknown decode mode {decode!r}")

    n_parts = batch_partitions or media.sparkSession.sparkContext.defaultParallelism
    slim = media.select("media_id", "kind", "payload").repartition(
        n_parts, "media_id"
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _fake_features(p if p is not None else b"")
                for p in pdf["payload"]
            ]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "feature": feats,
                "n_bytes": [len(p) if p is not None else 0
                            for p in pdf["payload"]],
            })

    return slim.mapInPandas(
        kernel,
        schema="media_id string, kind string, feature array<double>, "
               "n_bytes long",
    )


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize operator — stubbed decode; the plan (filter pushdown on
    kind, meta rewrite, payload passthrough) is real."""
    images = media.filter(F.col("kind") == "image")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # real impl: PIL decode -> resize -> re-encode; stub keeps bytes
            yield pdf.assign(width=width, height=height)

    slim = images.select("media_id", "payload")
    return slim.mapInPandas(
        kernel, schema="media_id string, payload binary, width int, height int"
    )


def sample_video_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling operator: one output row per sampled frame timestamp
    (frame payload stubbed as the digest of (video bytes, ts))."""
    videos = media.filter(F.col("kind") == "video").select(
        "media_id", "payload", F.col("meta.duration_ms").alias("duration_ms")
    )
    ts = F.explode(
        F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                   F.lit(every_ms))
    ).alias("frame_ts_ms")
    frames = videos.select("media_id", "payload", ts)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frame_bytes = [
                hashlib.sha256(
                    (p if p is not None else b"") + int(t).to_bytes(8, "little")
                ).digest()
                for p, t in zip(pdf["payload"], pdf["frame_ts_ms"])
            ]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "frame_ts_ms": pdf["frame_ts_ms"],
                "frame": frame_bytes,
            })

    return frames.mapInPandas(
        kernel, schema="media_id string, frame_ts_ms long, frame binary"
    )
