"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

A 100 TB multimodal training table holds media as ``binary`` payload columns
with a typed metadata struct alongside; all Spark-side plumbing (schemas,
Arrow batch shapes, partitioning, vectorized UDF signatures) is real and
tested here. The actual codec work (JPEG decode, audio resample, frame
extraction) needs native libs not present in this environment, so each kernel
tries the real library and otherwise falls back to a clearly-marked
deterministic fake (or raises NotImplementedError for ops where a fake would
be misleading). Swapping in the real decoder changes ONE function body, not
the pipeline.

Batch-shape notes: payloads stream through ``mapInPandas`` (Arrow), so one
in-flight batch is ``arrow.maxRecordsPerBatch`` payloads — size that config
against media size (e.g. 64 rows of 5 MB JPEGs ≈ 320 MB/batch). Feature
extraction is a per-row projection: no shuffle, scales linearly.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("modality", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", MEDIA_META),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("payload_bytes", T.LongType()),
        T.StructField("payload_sha", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)

FEATURE_DIM = 16


def synth_media(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Deterministic fake media table from a documents table: payload =
    utf-8 bytes of the text (stands in for encoded media), modality cycles
    by id. Pure column expressions — no Python."""
    modality = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col(id_col) % 3 + 1).cast("int"),
    )
    meta = F.struct(
        F.concat(F.lit("application/x-fake-"), modality).alias("mime"),
        (F.col(id_col) % 640 + 1).cast("int").alias("width"),
        (F.col(id_col) % 480 + 1).cast("int").alias("height"),
        (F.length(text_col).cast("long") * 10).alias("duration_ms"),
    )
    return docs.select(
        F.col(id_col).alias("media_id"),
        modality.alias("modality"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        meta.alias("meta"),
    )


def _decode_image(payload: bytes) -> np.ndarray:
    """Real decode if PIL is available, else a deterministic fake 'pixel
    array' derived from the payload's byte histogram."""
    try:  # pragma: no cover - PIL not installed in this environment
        import io

        from PIL import Image  # type: ignore

        return np.asarray(Image.open(io.BytesIO(payload)))
    except ImportError:
        hist, _ = np.histogram(
            np.frombuffer(payload, dtype=np.uint8), bins=16, range=(0, 256)
        )
        return hist.astype(np.float32)


def extract_features(media: DataFrame) -> DataFrame:
    """Vectorized feature extraction over media payloads: mapInPandas, one
    Arrow batch at a time, numpy inside — the canonical shape for any
    decode/embed kernel (swap `_decode_image` for the real model)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            shas = []
            for payload in pdf["payload"]:
                raw = bytes(payload)
                shas.append(hashlib.sha256(raw).hexdigest()[:16])
                v = _decode_image(raw).astype(np.float32).ravel()
                v = np.resize(v, FEATURE_DIM)
                norm = float(np.linalg.norm(v))
                feats.append((v / norm if norm else v).tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "payload_bytes": pdf["payload"].map(len),
                    "payload_sha": shas,
                    "feature": feats,
                }
            )

    return media.mapInPandas(kernel, FEATURE_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize pipeline stage. Real implementation requires PIL; there
    is no honest deterministic fake for resampled pixels, so this raises
    unless the library is present. The Spark plumbing (schema in = schema
    out, per-row projection) is what's under test."""
    try:  # pragma: no cover
        from PIL import Image  # type: ignore # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "resize_images needs PIL; not available in this environment"
        ) from e

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError

    return media.mapInPandas(kernel, MEDIA_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling plan: one output row per sampled timestamp,
    driven entirely by metadata (duration_ms) so the *plan* is real even
    though frame decode is stubbed: the explode happens JVM-side and the
    payload column is carried through untouched."""
    ts = F.sequence(
        F.lit(0),
        F.greatest(F.col("meta.duration_ms").cast("long"), F.lit(0)),
        F.lit(int(every_ms)),
    )
    return (
        media.filter(F.col("modality") == "video")
        .select(
            "media_id",
            "payload",
            F.explode(ts).alias("frame_ts_ms"),
        )
        .withColumn("frame", F.lit(None).cast("binary"))  # decode stub
    )
