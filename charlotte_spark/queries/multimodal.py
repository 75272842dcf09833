"""Multimodal column queries (SURVEY §2.2 D72).

``documents.text`` bytes stand in for media blobs (the real corpus
stores image/audio bytes the same way: opaque binary + typed metadata).
The fingerprint query is hash-checked against DuckDB directly; the
decode pipeline (stubbed codec, real plumbing) is hash-checked via the
round-trip digest pattern (queries/roundtrip.py) plus dedicated schema
tests in tests/test_multimodal.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.multimodal import attach_media_meta, decode_image_batch
from ..registry import query
from .roundtrip import rt_digest, rt_oracle


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


@query(
    "d72_decode_pipeline",
    tags=("D72", "D61"),
    oracle=rt_oracle("decode_pipeline", "format"),
)
def d72_decode_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched decode pipeline over binary blobs (stubbed codec,
    real mapInPandas plumbing), folded to per-format round-trip digests
    (``roundtrip.rt_digest``): SQL can't replicate the Python-side
    decode, so the driver hash pins the materialized decode output via
    two independent digest folds instead. The registry row FORCES the
    deterministic stub (CHARLOTTE_FAKE_DECODE) so the hash is stable
    whether or not a codec is installed; the real-codec path is covered
    by tests/test_multimodal.py when Pillow is present."""
    d = load_table(spark, sf_dir, "documents").withColumn(
        "blob", F.col("text").cast("binary")
    )
    prev = os.environ.get("CHARLOTTE_FAKE_DECODE")
    os.environ["CHARLOTTE_FAKE_DECODE"] = "1"
    try:
        # the stub/real choice is captured driver-side at plan build
        decoded = decode_image_batch(d, "doc_id", "blob")
    finally:
        if prev is None:
            os.environ.pop("CHARLOTTE_FAKE_DECODE", None)
        else:
            os.environ["CHARLOTTE_FAKE_DECODE"] = prev
    rows = decoded.select(
        "format",
        F.concat_ws(
            "|",
            F.col("doc_id").cast("string"),
            F.col("width").cast("string"),
            F.col("height").cast("string"),
            F.col("channels").cast("string"),
            F.col("mean_luma").cast("string"),
        ).alias("payload"),
    )
    return rt_digest(rows, "decode_pipeline", "format")


@query(
    "d85_frame_sampling",
    tags=("D85", "D72", "D61"),
    oracle="""
    WITH ascii_docs AS (
        SELECT doc_id, text, octet_length(encode(text)) AS blen
        FROM documents
        WHERE length(text) = octet_length(encode(text))
          AND octet_length(encode(text)) > 0
    ),
    framed AS (
        SELECT doc_id, blen,
               CAST((blen + 63) // 64 AS BIGINT) AS n_frames
        FROM ascii_docs
    )
    SELECT f.doc_id,
           f.n_frames,
           CAST((f.n_frames + 3) // 4 AS BIGINT) AS n_sampled,
           md5(substring(a.text, 1, 64)) AS first_frame_md5,
           CAST(CASE WHEN (f.n_frames - 1) % 4 = 0
                THEN 64 * ((f.n_frames + 3) // 4 - 1) + (f.blen - 64 * (f.n_frames - 1))
                ELSE 64 * ((f.n_frames + 3) // 4) END AS BIGINT) AS sampled_bytes
    FROM framed f JOIN ascii_docs a USING (doc_id)
    ORDER BY doc_id
    """,
)
def d85_frame_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over opaque media blobs: treat each blob as a
    fixed-frame 'video' (64-byte frames — a deterministic stand-in for
    a real codec's frame boundaries, since the container has no media
    libs), keep every 4th frame, report per-doc frame counts, sampled
    byte volume and the first sampled frame's fingerprint.

    The Spark side is the REAL multimodal plumbing — Arrow-batched
    mapInPandas over binary columns, one pass, no shuffle, schema'd
    output — with the codec swapped for byte-slicing. The oracle
    replicates the frame math in SQL over ascii-only docs (DuckDB can't
    slice BLOBs, so the corpus is restricted to rows where char length
    equals byte length and VARCHAR slicing is byte slicing)."""
    import hashlib

    import pandas as pd

    d = (
        load_table(spark, sf_dir, "documents")
        # empty blobs excluded on BOTH sides: a zero-length blob has no
        # frames, but the oracle's md5(substring(text,1,64)) would emit
        # md5('') where the sampler emits no frame — divergent on the
        # first empty doc (ADVICE r02).
        .filter((F.length("text") == F.octet_length("text")) & (F.octet_length("text") > 0))
        .select("doc_id", F.col("text").cast("binary").alias("blob"))
    )

    def sample_frames(batches):
        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                b = bytes(blob)
                frames = [b[i : i + 64] for i in range(0, len(b), 64)]
                sampled = frames[::4]
                rows.append(
                    (
                        int(doc_id),
                        len(frames),
                        len(sampled),
                        hashlib.md5(sampled[0]).hexdigest() if sampled else None,
                        sum(len(fr) for fr in sampled),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_frames", "n_sampled", "first_frame_md5", "sampled_bytes"],
            )

    out_schema = (
        "doc_id bigint, n_frames bigint, n_sampled bigint, "
        "first_frame_md5 string, sampled_bytes bigint"
    )
    return d.mapInPandas(sample_frames, out_schema).orderBy("doc_id")


# ---------------------------------------------------------------------------
# D168: media-type sniffing from magic bytes
# ---------------------------------------------------------------------------

# (magic-hex-prefix, detected type) in sniff order — the public file
# signatures; anything else is 'unknown'. Synthesis wraps each doc's
# text bytes in one of these headers by doc_id % 4 (deterministic in
# both engines), so the oracle knows the GROUND-TRUTH type without
# parsing bytes: a sniffing bug (wrong magic constant, wrong prefix
# length, wrong precedence) mis-buckets rows and fails the hash.
_MAGIC = (
    ("FFD8FFE0", "jpeg"),
    ("89504E47", "png"),
    ("47494638", "gif"),
    ("52494646", "riff"),
)


@query(
    "d168_media_type_sniff",
    tags=("D168", "D72"),
    oracle=f"""
    WITH synth AS (
        SELECT doc_id,
               CASE doc_id % 4 WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png'
                               WHEN 2 THEN 'gif' ELSE 'riff' END AS true_type,
               4 + octet_length(encode(text)) AS n_bytes
        FROM documents WHERE text IS NOT NULL
    )
    SELECT true_type AS detected_type,
           CAST(count(*) AS BIGINT) AS n_files,
           CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
           CAST(min(n_bytes) AS BIGINT) AS min_bytes,
           CAST(max(n_bytes) AS BIGINT) AS max_bytes
    FROM synth GROUP BY true_type ORDER BY detected_type
    """,
)
def d168_media_type_sniff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media-type sniffing over opaque binary columns: detect the
    container format from the leading magic bytes (JPEG/PNG/GIF/RIFF
    signatures) and roll up per-type file counts and byte volumes — the
    first triage a multimodal ingest runs before routing blobs to
    decoders. Blobs are synthesized by prepending a real 4-byte magic
    header (chosen by doc_id % 4) to the text bytes; the Spark side
    GENUINELY sniffs the binary (hex of the first 4 bytes against the
    signature table) while the oracle derives the ground-truth type
    from the synthesis rule — any sniffing defect mis-buckets and
    breaks the hash (the D149 recompute-from-source proof shape).

    Plan shape: header prepend, sniff, and byte length are one
    codegen'd scan-stage projection over the binary column (unhex /
    concat / substring / hex — zero UDF, zero Python); then one
    partial-agg groupBy on the detected type (<= 5 keys). At 100 TB:
    map-only until a 5-key rollup."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    hdr = F.when(F.col("doc_id") % 4 == 0, F.lit(_MAGIC[0][0]))
    for i, (hx, _) in enumerate(_MAGIC[1:], start=1):
        cond = F.col("doc_id") % 4 == i
        hdr = hdr.when(cond, F.lit(hx))
    blob = F.concat(F.unhex(hdr), F.encode("text", "UTF-8"))
    b = d.select(blob.alias("blob"))
    magic = F.hex(F.substring("blob", 1, 4))
    det = None
    for hx, name in _MAGIC:
        det = (F.when(magic == hx, name) if det is None else det.when(magic == hx, name))
    det = det.otherwise("unknown")
    return (
        b.select(det.alias("detected_type"), F.length("blob").alias("n_bytes"))
        .groupBy("detected_type")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("n_bytes").alias("total_bytes"),
            F.min("n_bytes").alias("min_bytes"),
            F.max("n_bytes").alias("max_bytes"),
        )
        .orderBy("detected_type")
    )
