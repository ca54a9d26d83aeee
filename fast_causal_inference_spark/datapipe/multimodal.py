"""Multimodal (image/audio/video) column plumbing.

Modality payloads are opaque ``binary`` columns plus a typed metadata struct;
all heavy per-item work (decode, resize, feature-extract, frame-sample) runs
as Arrow-batched ``mapInPandas`` so executors stream fixed-size batches
instead of materializing whole partitions.

The decode kernels themselves are STUBBED — this container has no
image/audio codecs (no PIL/cv2/ffmpeg). Each stub either raises
``NotImplementedError`` (``strict=True``) or produces a deterministic fake
derived from the payload bytes (``strict=False``, default) so the Spark-side
plumbing — schema, batching, partitioning, UDF signatures — is real and
testable end-to-end. Swap ``_fake_*`` for real codecs on a cluster with the
libraries installed.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fast_causal_inference_spark.serialization import ensure_udf_serializable

MEDIA_META_SCHEMA = T.StructType([
    T.StructField("media_type", T.StringType()),     # image | audio | video
    T.StructField("format", T.StringType()),         # jpeg | wav | mp4 | ...
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("duration_ms", T.LongType()),
    T.StructField("sample_rate", T.IntegerType()),
])


def attach_media_metadata(df: DataFrame, payload_col: str,
                          media_type: str, fmt: str) -> DataFrame:
    """Attach a typed metadata struct for an opaque binary payload column."""
    meta = F.struct(
        F.lit(media_type).alias("media_type"), F.lit(fmt).alias("format"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
        F.lit(None).cast("int").alias("sample_rate"))
    return df.withColumn(f"{payload_col}_meta", meta)


def _fake_image_features(payload: bytes, n_features: int) -> np.ndarray:
    """Deterministic stand-in for a CNN embedding: seeded by content digest."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.standard_normal(n_features).astype(np.float32)


def image_features(df: DataFrame, payload_col: str = "payload",
                   n_features: int = 64, batch_size_hint: int = 256,
                   strict: bool = False) -> DataFrame:
    """Decode + feature-extract an image column → ``features array<float>``.

    STUB decode (see module docstring): real Arrow plumbing, fake kernel.
    """
    ensure_udf_serializable()
    out_schema = T.StructType(df.schema.fields
                              + [T.StructField("features",
                                               T.ArrayType(T.FloatType()))])
    cols = [f.name for f in df.schema.fields]

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if strict:
            raise NotImplementedError(
                "image decode requires PIL/cv2 — not present in this container")
        for pdf in batches:
            feats = [
                _fake_image_features(bytes(p) if p is not None else b"",
                                     n_features).tolist()
                for p in pdf[payload_col]
            ]
            pdf = pdf.copy()
            pdf["features"] = feats
            yield pdf[cols + ["features"]]

    return df.mapInPandas(extract, out_schema)


def image_resize(df: DataFrame, payload_col: str = "payload",
                 width: int = 224, height: int = 224,
                 strict: bool = False) -> DataFrame:
    """Resize an image column (STUB kernel: truncated content hash bytes)."""
    ensure_udf_serializable()
    out_schema = T.StructType(df.schema.fields
                              + [T.StructField("resized", T.BinaryType())])
    cols = [f.name for f in df.schema.fields]

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if strict:
            raise NotImplementedError("image resize requires PIL/cv2")
        for pdf in batches:
            pdf = pdf.copy()
            pdf["resized"] = [
                hashlib.sha256((bytes(p) if p is not None else b"")
                               + f"{width}x{height}".encode()).digest()
                for p in pdf[payload_col]
            ]
            yield pdf[cols + ["resized"]]

    return df.mapInPandas(resize, out_schema)


def video_frame_sample(df: DataFrame, payload_col: str = "payload",
                       every_ms: int = 1000, max_frames: int = 8,
                       strict: bool = False) -> DataFrame:
    """Explode a video column into sampled frames (frame_idx, frame bytes).

    STUB decode; the row-multiplying plumbing (one output row per frame,
    preserving all input columns) is real.
    """
    ensure_udf_serializable()
    out_schema = T.StructType(df.schema.fields
                              + [T.StructField("frame_idx", T.IntegerType()),
                                 T.StructField("frame", T.BinaryType())])
    cols = [f.name for f in df.schema.fields]

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if strict:
            raise NotImplementedError("video decode requires ffmpeg")
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                payload = bytes(r[payload_col]) if r[payload_col] is not None else b""
                n = (int.from_bytes(hashlib.sha256(payload).digest()[:2], "big")
                     % max_frames) + 1
                for i in range(n):
                    row = {c: r[c] for c in cols}
                    row["frame_idx"] = i
                    row["frame"] = hashlib.sha256(
                        payload + i.to_bytes(4, "big")).digest()
                    rows.append(row)
            yield pd.DataFrame(rows, columns=cols + ["frame_idx", "frame"])

    return df.mapInPandas(sample, out_schema)


def synthesize_media_column(df: DataFrame, from_col: str,
                            payload_col: str = "payload") -> DataFrame:
    """Create a deterministic binary payload from an existing column — lets
    the multimodal pipeline be exercised on the text testdata."""
    return df.withColumn(
        payload_col, F.sha2(F.col(from_col).cast("string"), 256).cast("binary"))


def audio_features(df: DataFrame, payload_col: str = "payload",
                   n_mfcc: int = 13, strict: bool = False) -> DataFrame:
    """Decode + MFCC-style feature-extract an audio column
    → ``audio_features array<float>`` (STUB kernel — no audio codecs in
    this container; deterministic content-seeded stand-in)."""
    ensure_udf_serializable()
    out_schema = T.StructType(df.schema.fields
                              + [T.StructField("audio_features",
                                               T.ArrayType(T.FloatType()))])
    cols = [f.name for f in df.schema.fields]

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if strict:
            raise NotImplementedError(
                "audio decode requires soundfile/librosa — not in container")
        for pdf in batches:
            feats = []
            for p in pdf[payload_col]:
                payload = bytes(p) if p is not None else b""
                seed = int.from_bytes(
                    hashlib.sha256(payload).digest()[:8], "big")
                rng = np.random.default_rng(seed)
                feats.append(rng.standard_normal(n_mfcc)
                             .astype(np.float32).tolist())
            pdf = pdf.copy()
            pdf["audio_features"] = feats
            yield pdf[cols + ["audio_features"]]

    return df.mapInPandas(extract, out_schema)
