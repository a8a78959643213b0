"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design for a 100 TB media corpus: media lives in parquet as an opaque
``binary`` column (or an object-store URI for large blobs) next to typed
metadata (mime, width/height, duration, sample rate). Decode / feature
extraction runs as ``mapInPandas`` — per-partition Arrow batches into a
Python worker holding the codec, so the expensive decoder initializes once
per partition, not once per row, and batches amortize the transfer.

The image/audio codec libraries are not available in this container, so
the decode kernel is STUBBED: ``decode_stub=True`` derives deterministic
fake features from the payload bytes (tested end-to-end); with
``decode_stub=False`` the operator raises NotImplementedError at the point
where a real codec (PIL/librosa/ffmpeg) would be invoked — the Spark-side
plumbing (schema, batching, partitioning) is identical either way.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table (payload = repeated id bytes) for
    exercising the plumbing without codec libraries."""
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        F.when(F.col("id") % 2 == 0, "image/png").otherwise("audio/wav").alias("mime"),
        F.encode(
            F.concat(F.lit("payload-"), F.col("id").cast("string")), "utf-8"
        ).alias("payload"),
        F.lit(64).alias("width"),
        F.lit(48).alias("height"),
    )


def extract_features(
    media: DataFrame, dim: int = 8, decode_stub: bool = True
) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batch iterator).

    Scale: one Python worker per partition; the decoder (or model) loads
    once per partition in the closure; batches stream through Arrow. The
    output schema is fixed (FEATURE_SCHEMA) so downstream similarity /
    dedup operators compose directly."""
    import numpy as np
    import pandas as pd

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per-partition init happens HERE (codec/model load) — once, not per row
        if not decode_stub:
            raise NotImplementedError(
                "real media decode requires PIL/librosa/ffmpeg, not present "
                "in this environment — run with decode_stub=True"
            )
        for pdf in it:
            feats = []
            for payload in pdf["payload"]:
                b = np.frombuffer(payload, dtype=np.uint8).astype(np.float32)
                # deterministic fake embedding: resampled byte histogram
                hist = np.resize(b, dim) / 255.0
                feats.append(hist)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "feature": feats,
                }
            )

    return media.mapInPandas(batches, FEATURE_SCHEMA)


def frame_sample_plan(
    media: DataFrame,
    stride: int = 10,
    duration_col: str = "duration_s",
    fps_col: str = "fps",
) -> DataFrame:
    """Metadata-driven video frame sampling: one row per sampled frame
    index (0, stride, 2*stride, ... < duration*fps), exploded Spark-side
    so the decode UDF receives (media, frame_idx) pairs — the decode
    itself is stubbed (see extract_features).

    Scale: the explode multiplies rows by duration*fps/stride but carries
    only ids + indices (payload bytes are joined back per-batch inside the
    decode stage, or fetched by URI), so the frame manifest is a narrow
    shuffle-free projection."""
    n_frames = (F.col(duration_col) * F.col(fps_col)).cast("bigint")
    return (
        media.filter(F.col("mime").startswith("video/"))
        .withColumn("n_frames", n_frames)
        # zero-length assets have no frames to sample; Spark's sequence()
        # raises on (0, -1) boundaries where the SQL generate_series would
        # return empty, so they are filtered, not exploded
        .filter(F.col("n_frames") > 0)
        .select(
            "media_id",
            "n_frames",
            F.explode(
                F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(stride))
            ).alias("frame_idx"),
        )
    )


THUMB_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("in_w", T.IntegerType()),
        T.StructField("in_h", T.IntegerType()),
        T.StructField("out_w", T.IntegerType()),
        T.StructField("out_h", T.IntegerType()),
        T.StructField("out_bytes", T.LongType()),
    ]
)


def resize_plan(
    media: DataFrame, target: int = 128, decode_stub: bool = True
) -> DataFrame:
    """Aspect-fit thumbnail resize via mapInPandas (same per-partition
    codec plumbing as extract_features: the real pixel resample needs
    PIL/ffmpeg and raises behind ``decode_stub=False``; the stub computes
    the EXACT output geometry a resampler would produce).

    Fit rule (pure integer arithmetic, oracle-mirrorable): never
    upscale; otherwise the longer edge becomes ``target`` and the short
    edge scales as ``floor(short * target / long)`` (≥ 1). ``out_bytes``
    is the RGB24 buffer size out_w*out_h*3 — the number a downstream
    storage planner budgets with.

    Scale: only (media_id, mime, width, height) travel — payload bytes
    stay at rest until the real decode stage; batches amortize Arrow
    transfer and the codec init happens once per partition."""
    import pandas as pd

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if not decode_stub:
            raise NotImplementedError(
                "real thumbnail resampling requires PIL/ffmpeg, not present "
                "in this environment — run with decode_stub=True"
            )
        for pdf in it:
            w = pdf["width"].astype("int64")
            h = pdf["height"].astype("int64")
            long_e = w.where(w >= h, h)
            needs = long_e > target
            out_w = w.where(
                ~needs,
                (w * target // long_e).where(w < long_e, target).clip(lower=1),
            )
            out_h = h.where(
                ~needs,
                (h * target // long_e).where(h < long_e, target).clip(lower=1),
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    # input geometry rides along so downstream accounting
                    # needs no second scan/join back to the media table
                    "in_w": w.astype("int32"),
                    "in_h": h.astype("int32"),
                    "out_w": out_w.astype("int32"),
                    "out_h": out_h.astype("int32"),
                    "out_bytes": (out_w * out_h * 3).astype("int64"),
                }
            )

    return media.mapInPandas(batches, THUMB_SCHEMA)
