"""Multimodal columns (SURVEY.md X5): opaque binary payloads + typed
metadata, with Arrow-batched decode/transform plumbing.

The container has no image/audio libraries, so the decode kernels are
deterministic fakes / explicit NotImplementedError stubs — but the
Spark-side contract (schema, batch shape, partitioning, mapInPandas
signature) is real and tested. Swapping in PIL/torchaudio later changes
only the kernel body.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Canonical multimodal record: payload is opaque bytes; metadata is typed.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image | audio | video | text
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Build a media table from documents: text payload as binary +
    named_struct metadata (X5 struct plumbing, SURVEY.md F11)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("text").alias("modality"),
        F.encode("text", "UTF-8").alias("payload"),
        F.named_struct(
            F.lit("mime"), F.lit("text/plain"),
            F.lit("width"), F.lit(None).cast("int"),
            F.lit("height"), F.lit(None).cast("int"),
            F.lit("duration_ms"), F.lit(None).cast("long"),
        ).alias("meta"),
    )


def media_manifest(media: DataFrame) -> DataFrame:
    """Byte-level manifest (size + content hash) — the integrity pass a
    100 TB media crawl runs before any decode. Pure built-ins."""
    return media.select(
        "media_id",
        "modality",
        F.length("payload").alias("n_bytes"),
        F.md5("payload").alias("payload_md5"),
    )


# --- decode / feature-extract kernels (Arrow-batched) ---------------------

FEATURE_SCHEMA = "media_id long, modality string, n_bytes int, feature array<double>"


def _fake_decode_features(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a real decoder: folds payload bytes
    into a fixed-dim feature vector. Replace with PIL/librosa decode →
    model features in production."""
    acc = [0] * dim
    for i, byte in enumerate(payload or b""):
        acc[i % dim] = (acc[i % dim] + byte) % 997
    return [x / 997.0 for x in acc]


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """mapInPandas decode pipeline: Arrow batches of binary payloads →
    per-row feature vectors. The iterator-of-batches shape keeps
    executor memory flat regardless of partition size."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pdf["payload"].map(lambda p: len(p) if p is not None else 0),
                    "feature": pdf["payload"].map(lambda p: _fake_decode_features(p, dim)),
                }
            )

    return media.mapInPandas(kernel, schema=FEATURE_SCHEMA)


def decode_image(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image decode + resize. Requires an imaging library not present in
    this container — the Spark contract is defined; the kernel is a stub."""
    raise NotImplementedError(
        "image decode requires PIL/opencv (not in container); "
        "use extract_features() for the plumbing-tested fake-decode path"
    )


def sample_frames(media: DataFrame, every_ms: int) -> DataFrame:
    """Video frame sampling stub — same contract as decode_image."""
    raise NotImplementedError(
        "video frame sampling requires ffmpeg bindings (not in container)"
    )
