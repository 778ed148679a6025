"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed through Arrow-batched UDFs.

The Spark-side machinery here is real and tested — schemas, batching,
partition-safe UDF signatures, metadata propagation. The actual media
decoding is STUBBED: this environment ships no image/audio libraries, so
`decode_image` raises NotImplementedError unless a deterministic fake
decoder is requested (used by tests to exercise the full pipeline shape).

Scale notes: media bytes never leave the executor that read them (no
shuffle in any of these transforms); batch size is bounded by Arrow's
maxRecordsPerBatch so one 4K frame burst cannot OOM a worker.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

MEDIA_META_SCHEMA = ("media_type string, width int, height int, "
                     "n_bytes long, sha256 string")


def attach_media_meta(df: DataFrame, media_col: str,
                      media_type: str = "image") -> DataFrame:
    """Typed metadata for an opaque binary media column (JVM-side where
    possible; width/height need decoding and stay null until then)."""
    return (df.withColumn("media_type", F.lit(media_type))
            .withColumn("n_bytes", F.length(media_col).cast("long"))
            .withColumn("sha256", F.sha2(F.col(media_col), 256)))


def _fake_decode(payload: bytes, target: int) -> np.ndarray:
    """Deterministic fake decoder: expands the payload hash into a
    (target, target, 3) uint8 'image'. Exercises the exact batch shapes a
    real decoder (PIL/libjpeg) would produce."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (target, target, 3), dtype=np.uint8)


def decode_and_featurize(df: DataFrame, media_col: str, target: int = 32,
                         fake: bool = False) -> DataFrame:
    """binary -> decode -> resize(target x target) -> channel-mean feature
    vector, as one mapInPandas pass (media bytes never cross executors).

    fake=True uses the deterministic stub decoder; fake=False requires a
    real image library and raises NotImplementedError here.
    """
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            widths = []
            heights = []
            for payload in pdf[media_col]:
                if not fake:
                    raise NotImplementedError(
                        "no image decoder available in this environment; "
                        "pass fake=True for the deterministic stub")
                img = _fake_decode(bytes(payload), target)
                feats.append((img.reshape(-1, 3).mean(axis=0) / 255.0).tolist())
                heights.append(img.shape[0])
                widths.append(img.shape[1])
            out = pdf.drop(columns=[media_col])
            out["width"] = np.array(widths, dtype=np.int32)
            out["height"] = np.array(heights, dtype=np.int32)
            out["feature"] = feats
            yield out

    keep = [f for f in df.schema.fields if f.name != media_col]
    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in keep)
    return df.mapInPandas(
        fn, f"{fields}, width int, height int, feature array<double>")


def media_embeddings(df: DataFrame, media_col: str, id_col: str,
                     dim: int = 16, fake: bool = False) -> DataFrame:
    """binary media -> embedding column (array<double>, L2-normalized),
    ready for the similarity operators (brute_force_topk / ivf_build /
    cosine_neardup_pairs): the multimodal near-dup pipeline is
    media_embeddings -> ann ops, all batch-vectorized, no shuffle here.

    The embedding network is STUBBED like the decoders (no ML libs in this
    environment): fake=True derives a deterministic unit vector from the
    decoded fake image's channel statistics; fake=False raises."""
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            embs = []
            for payload in pdf[media_col]:
                if not fake:
                    raise NotImplementedError(
                        "no embedding model available in this environment; "
                        "pass fake=True for the deterministic stub")
                img = _fake_decode(bytes(payload), max(8, dim))
                v = img.reshape(-1)[: dim].astype(np.float64)
                v = v - v.mean()
                norm = np.linalg.norm(v)
                embs.append((v / norm if norm else v).tolist())
            yield pd.DataFrame({id_col: pdf[id_col].values,
                                "embedding": embs})

    return df.select(id_col, media_col).mapInPandas(
        fn, f"{id_col} long, embedding array<double>")


def frame_sample(df: DataFrame, media_col: str, every_n_bytes: int = 1024,
                 max_frames: int = 8) -> DataFrame:
    """'Video' frame sampling stand-in: emits one row per sampled byte
    offset (the exploded shape a real frame sampler produces), keeping the
    per-frame payload slice as binary. Real codec decode is stubbed the
    same way as decode_and_featurize."""
    offs = F.sequence(
        F.lit(0),
        F.least(F.length(media_col) - 1, F.lit(every_n_bytes * (max_frames - 1))),
        F.lit(every_n_bytes))
    return (df.withColumn("frame_offset", F.explode(offs))
            .withColumn("frame_bytes",
                        F.substring(F.col(media_col).cast("binary"),
                                    F.col("frame_offset") + 1, every_n_bytes))
            .drop(media_col))
