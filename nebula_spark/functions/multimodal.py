"""Multimodal columns — image/audio/video as opaque ``binary`` payloads
with typed metadata, processed through Arrow-batched ``mapInPandas``.

The Spark-side plumbing (schemas, batch iteration, partition sizing,
UDF signatures) is real and tested; the codec calls themselves are
STUBBED behind ``_decode_*`` hooks because no image/audio libraries
exist in this container — swap the stub for PIL/torchaudio/ffmpeg in a
real deployment and nothing else changes. Deterministic fake features
keep the pipeline testable end-to-end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
        T.StructField("feature_dim", T.IntegerType(), True),
        T.StructField("error", T.StringType(), True),
    ]
)

FEATURE_DIM = 16


def _decode_image(payload: bytes) -> list[float]:
    """STUB — real impl: PIL.Image.open(BytesIO(payload)) → resize →
    normalize → embed. Deterministic fake: 16 floats from sha256."""
    if payload is None:
        raise ValueError("null payload")
    h = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in h[:FEATURE_DIM]]


def _decode_audio(payload: bytes) -> list[float]:
    """STUB — real impl: soundfile/torchaudio decode → mel features."""
    if payload is None:
        raise ValueError("null payload")
    h = hashlib.sha256(b"audio" + payload).digest()
    return [b / 255.0 for b in h[:FEATURE_DIM]]


def _sample_video_frames(payload: bytes, n_frames: int = 4) -> list[list[float]]:
    """STUB — real impl: ffmpeg frame sampling → per-frame features."""
    if payload is None:
        raise ValueError("null payload")
    return [
        [b / 255.0 for b in hashlib.sha256(bytes([i]) + payload).digest()[:FEATURE_DIM]]
        for i in range(n_frames)
    ]

_DECODERS = {"image": _decode_image, "audio": _decode_audio}


def extract_features(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over media rows. Per-batch
    pandas work only (no per-row Python at the Spark layer); decode
    failures become error rows, not task failures (DLQ-able)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, dims, errs = [], [], []
            for kind, payload in zip(pdf["kind"], pdf["payload"]):
                try:
                    if kind == "video":
                        frames = _sample_video_frames(payload)
                        # mean-pool frames
                        f = [sum(col) / len(frames) for col in zip(*frames)]
                    else:
                        f = _DECODERS[kind](payload)
                    feats.append(f)
                    dims.append(len(f))
                    errs.append(None)
                except Exception as e:  # decode failure → error row
                    feats.append(None)
                    dims.append(None)
                    errs.append(f"{type(e).__name__}: {e}")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": feats,
                    "feature_dim": pd.array(dims, dtype="Int32"),
                    "error": errs,
                }
            )

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def gen_fake_media(spark, n: int, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media rows for tests (binary payloads
    derived from the id; no external data)."""
    from pyspark.sql import functions as F

    kinds = F.array(F.lit("image"), F.lit("audio"), F.lit("video"))
    return spark.range(n).select(
        F.format_string("m-%06d", F.col("id")).alias("media_id"),
        F.element_at(kinds, (F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(3)) + 1).cast("int")).alias("kind"),
        F.sha2(F.concat(F.lit(seed), F.col("id").cast("string")), 256).cast("binary").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(64).alias("width"),
        F.lit(64).alias("height"),
        F.lit(1000).alias("duration_ms"),
    )
