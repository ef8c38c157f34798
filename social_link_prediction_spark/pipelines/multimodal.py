"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, with decode / feature-extract / resize / frame-sample as
Arrow-batched mapInPandas stages.

The Spark-side plumbing — schema, partitioning, UDF signature, batch
shape — is real and tested. The pixel/sample DECODING is stubbed
(this environment has no image/audio libs): ``decode_image`` raises
NotImplementedError unless ``fake=True``, which produces a
deterministic stand-in derived from the bytes so downstream operators
(dedup by content hash, embedding by feature vector) are exercised
end-to-end.

Scale notes: binaries stay in their column through shuffles only when
needed — metadata-only operations prune the binary at the parquet scan
(columnar format = free). Batch size per Arrow chunk is controlled by
``spark.sql.execution.arrow.maxRecordsPerBatch``.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, IntegerType, LongType,
    StringType, StructField, StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),       # image | audio | video
        StructField("mime", StringType()),
        StructField("width", IntegerType()),      # image/video
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),   # audio/video
        StructField("content", BinaryType()),
    ]
)

FEATURE_DIM = 16


def content_hash(df: DataFrame, out: str = "content_hash") -> DataFrame:
    """Exact binary dedup key — JVM md5 over the binary column, no
    Python in the loop."""
    return df.withColumn(out, F.md5(F.col("content")))


def _fake_decode(data: bytes) -> list[float]:
    """Deterministic stand-in for a real decoder: FEATURE_DIM floats
    derived from the content digest. Stable across processes/runs."""
    dig = hashlib.sha256(data or b"").digest()
    return [b / 255.0 for b in dig[:FEATURE_DIM]]


def extract_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batches). Output
    schema: input minus content, plus features array<float>. A real
    implementation replaces ``_fake_decode`` with PIL/torchvision/
    librosa calls — the Spark plumbing is identical.
    """
    if not fake:
        raise NotImplementedError(
            "real media decoding requires image/audio libraries not present "
            "in this environment; pass fake=True for the deterministic stub"
        )
    out_schema = StructType(
        [f for f in df.schema.fields if f.name != "content"]
        + [StructField("features", ArrayType(FloatType()))]
    )
    other_cols = [f.name for f in out_schema.fields if f.name != "features"]

    def batches(it: Iterator) -> Iterator:
        for pdf in it:
            feats = pdf["content"].map(lambda b: _fake_decode(bytes(b) if b is not None else b""))
            res = pdf[other_cols].copy()
            res["features"] = feats
            yield res

    return df.mapInPandas(batches, schema=out_schema)


def resize_plan(df: DataFrame, max_side: int = 512) -> DataFrame:
    """Resize planning is pure metadata arithmetic (JVM): compute the
    scale factor and output dims without touching bytes; the byte
    transform itself is an extract_features-style mapInPandas stage."""
    scale = F.when(
        F.greatest("width", "height") > max_side,
        max_side / F.greatest("width", "height").cast("double"),
    ).otherwise(F.lit(1.0))
    return (
        df.withColumn("scale", scale)
        .withColumn("out_width", F.floor(F.col("width") * F.col("scale")).cast("int"))
        .withColumn("out_height", F.floor(F.col("height") * F.col("scale")).cast("int"))
    )


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one output row per sampled timestamp
    (explode over a sequence) — the decode of each frame is the
    mapInPandas stage. Metadata explodes JVM-side; bytes are carried
    once per video, not per frame."""
    return df.filter(F.col("kind") == "video").withColumn(
        "frame_ts_ms",
        F.explode(F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms))),
    )
