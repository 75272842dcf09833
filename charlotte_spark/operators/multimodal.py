"""Multimodal column handling (SURVEY §2.2 D72).

Media assets are opaque ``binary`` columns plus a typed metadata
struct — the layout a 100 TB multimodal corpus uses (bytes inline for
small assets, or a URI + byte-range for large ones; both shapes below).
Decode / feature-extraction runs as Arrow-batched ``mapInPandas`` so
each task processes a columnar batch of blobs without JVM round-trips
per asset.

The image/audio codec libraries are NOT in this container, so
``decode_image_batch``'s pixel path is a deterministic stub (derived
from the bytes' md5) behind ``CHARLOTTE_FAKE_DECODE=1`` — the Spark
plumbing (schemas, batching, partitioning, UDF signatures) is real and
tested; swap `_fake_decode` for PIL/libvips in a real deployment.
"""

from __future__ import annotations

import hashlib
import os

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("content_length", T.LongType()),
        T.StructField("content_md5", T.StringType()),
        T.StructField("uri", T.StringType()),  # optional: external asset
    ]
)

DECODED_IMAGE = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("format", T.StringType()),
        T.StructField("mean_luma", T.DoubleType()),
    ]
)


def attach_media_meta(df: DataFrame, binary_col: str, kind: str) -> DataFrame:
    """Add the typed metadata struct next to an opaque binary column."""
    b = F.col(binary_col)
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(kind).alias("kind"),
            F.length(b).cast("long").alias("content_length"),
            F.md5(b).alias("content_md5"),
            F.lit(None).cast("string").alias("uri"),
        ),
    )


def _fake_decode(data: bytes) -> tuple[int, int, int, str, float]:
    """Deterministic stand-in for an image codec (md5-derived)."""
    h = hashlib.md5(data).digest()
    width = 64 + h[0] * 4
    height = 64 + h[1] * 4
    channels = 3 if h[2] % 2 == 0 else 1
    fmt = ("png", "jpeg", "webp")[h[3] % 3]
    mean_luma = h[4] / 255.0
    return width, height, channels, fmt, mean_luma


def decode_image_batch(df: DataFrame, id_col: str, binary_col: str) -> DataFrame:
    """Arrow-batched decode: (id, bytes) -> DECODED_IMAGE rows.

    In production the body calls the real codec per batch; here the
    decode is stubbed (see module docstring) unless a codec is present.
    """
    if not os.environ.get("CHARLOTTE_FAKE_DECODE", "1") == "1":
        raise NotImplementedError(
            "real image codecs are not available in this container; "
            "set CHARLOTTE_FAKE_DECODE=1 for the deterministic stub"
        )

    def decode(batches):
        for pdf in batches:
            decoded = [_fake_decode(bytes(b)) for b in pdf[binary_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].values,
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "channels": [d[2] for d in decoded],
                    "format": [d[3] for d in decoded],
                    "mean_luma": [d[4] for d in decoded],
                }
            )

    return df.select(F.col(id_col), F.col(binary_col)).mapInPandas(decode, DECODED_IMAGE)


def sample_frames(df: DataFrame, id_col: str, binary_col: str, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: one row per sampled frame index.

    Frame count is stubbed from the blob length (a real build reads the
    container header); the explode/batch shape is the production one.
    """
    n_frames = (F.length(binary_col) % 100 + 1).cast("int")
    return df.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))).alias("frame_idx"),
    )
