"""Multimodal column queries (SURVEY §2.2 D72).

``documents.text`` bytes stand in for media blobs (the real corpus
stores image/audio bytes the same way: opaque binary + typed metadata).
The fingerprint query is hash-checked against DuckDB; the decode
pipeline (stubbed codec, real plumbing) is rows-only checked plus
dedicated schema tests in tests/test_multimodal.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.multimodal import attach_media_meta, decode_image_batch
from ..registry import query


@query(
    "d72_binary_fingerprint",
    tags=("D72", "R12"),
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS content_length,
           md5(text) AS content_md5,
           lower(hex(encode(substring(text, 1, 8)))) AS head_hex,
           'image' AS kind
    FROM documents
    ORDER BY doc_id
    """,
)
def d72_binary_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary column + typed metadata: length, md5 fingerprint, head
    bytes in lowercase hex (R12 semantics)."""
    d = load_table(spark, sf_dir, "documents").withColumn(
        "blob", F.col("text").cast("binary")
    )
    d = attach_media_meta(d, "blob", "image")
    return d.select(
        "doc_id",
        F.col("media_meta.content_length").alias("content_length"),
        F.col("media_meta.content_md5").alias("content_md5"),
        F.lower(F.hex(F.substring("blob", 1, 8))).alias("head_hex"),
        F.col("media_meta.kind").alias("kind"),
    ).orderBy("doc_id")


@query("d72_decode_pipeline", tags=("D72", "D61"))
def d72_decode_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched decode pipeline over binary blobs (stubbed codec,
    real mapInPandas plumbing). Rows-only check: the fake decode is
    Python-side md5 math that SQL shouldn't replicate."""
    d = load_table(spark, sf_dir, "documents").withColumn(
        "blob", F.col("text").cast("binary")
    )
    decoded = decode_image_batch(d, "doc_id", "blob")
    return decoded.orderBy("doc_id")
