"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The reference's media handling (video decode via ffmpeg subprocess,
/root/reference/src/transcribe/groq_backend.py:21-28; OCR via tesseract,
src/ocr/reader.py:10-19) maps to Spark as binary columns processed by
Arrow-batched UDFs over `mapInPandas`. The image/audio codec libraries are
not in this container, so the *decode kernels* are stubbed behind
`NotImplementedError` with a deterministic fake for tests — the Spark-side
plumbing (schema, partitioning, UDF signatures, batch shapes) is real and
covered by tests/test_multimodal.py.

Schema convention:
  media(doc_id long, kind string, payload binary,
        meta struct<mime:string, width:int, height:int, duration_ms:long>)
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = (
    "doc_id long, kind string, n_bytes int, payload_sha int, feature array<float>"
)


def synthesize_media(spark, docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic fake media table derived from doc ids — payload is a
    seeded byte pattern; lets the distributed plumbing be exercised with
    no codec libraries."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.when(F.col(id_col) % 3 == 0, "image")
        .when(F.col(id_col) % 3 == 1, "audio")
        .otherwise("video")
        .alias("kind"),
        F.encode(
            F.concat(F.lit("payload:"), F.col(id_col).cast("string")), "utf-8"
        ).cast("binary").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(64).cast("int").alias("width"),
            F.lit(64).cast("int").alias("height"),
            (F.col(id_col) % 10000).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def decode_image(payload: bytes) -> "object":
    """Real deployments: cv2.imdecode / PIL.Image.open. Not available in
    this container."""
    raise NotImplementedError(
        "image codecs not present in this environment; use "
        "fake_feature_extract for the tested plumbing path"
    )


def decode_audio(payload: bytes) -> "object":
    """Real deployments: ffmpeg/pydub decode (reference: chunker.py:17-28)."""
    raise NotImplementedError(
        "audio codecs not present in this environment; use "
        "fake_feature_extract for the tested plumbing path"
    )


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a decode+embed kernel: byte-histogram
    moments. Replaced by a real decoder in production; identical batch
    shape and dtype contract."""
    import numpy as np

    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float32)
    if arr.size == 0:
        return [0.0] * dim
    out = []
    for i in range(dim):
        out.append(float(arr[i::dim].sum() % 997) / 997.0)
    return out


def feature_extract(media: DataFrame, batch_probe: dict | None = None) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    This is the production shape for decode/resize/frame-sample kernels:
    Arrow batches in, narrow feature rows out, media partition-parallel.
    `batch_probe` (tests only) records observed batch sizes to assert the
    batching contract."""

    import hashlib

    def _sha31(b: bytes) -> int:
        # content-addressed digest truncated to the int32 schema slot;
        # hashlib (not builtin hash()) so the value is stable across
        # worker processes and PYTHONHASHSEED values — the determinism
        # contract every extractor in this repo carries
        return int.from_bytes(hashlib.sha256(b).digest()[:4], "big") % 2**31

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if batch_probe is not None:
                batch_probe.setdefault("sizes", []).append(len(pdf))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len),
                    "payload_sha": pdf["payload"].map(lambda b: _sha31(bytes(b))),
                    "feature": pdf["payload"].map(lambda b: _fake_feature(bytes(b))),
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan shape: one output row per sampled timestamp per
    video payload (the reference's 1-frame-per-N-seconds sampler,
    extractor.py:109,140). The decode is stubbed; the explode and
    partitioning are real."""
    n_frames = F.greatest((F.col("meta.duration_ms") / every_ms).cast("int"), F.lit(1))
    return (
        media.where(F.col("kind") == "video")
        .withColumn("_f", F.explode(F.sequence(F.lit(0), n_frames - 1)))
        .withColumn("frame_ms", F.col("_f") * every_ms)
        .select("doc_id", "frame_ms", "payload")
    )
