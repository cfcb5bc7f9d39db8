"""Multimodal-plumbing queries: binary payload + metadata (oracle-checked)
and Arrow-batched fake-decode feature extraction (rows-only; values
pinned by tests/test_multimodal.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from masd_spark.operators.multimodal import attach_binary_payload, byte_stats_features
from masd_spark.queries import register
from masd_spark.sources.tables import load_table


@register(
    "multimodal_metadata",
    oracle="""
    SELECT doc_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio'
                ELSE 'video' END AS media_kind,
           CAST(octet_length(unhex(md5(text) || md5(reverse(text)))) AS BIGINT)
               AS n_bytes,
           CAST((doc_id % 16) * 64 + 64 AS BIGINT) AS media_width,
           CAST((doc_id % 9) * 64 + 64 AS BIGINT) AS media_height
    FROM documents
    """,
)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload attachment + typed metadata over documents. The
    payload column itself is exercised via its length (portable across
    engines); payload bytes are identical md5 material on both sides.
    """
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    mm = attach_binary_payload(docs)
    return mm.select(
        "doc_id",
        "media_kind",
        F.length(F.col("payload")).cast("bigint").alias("n_bytes"),
        "media_width",
        "media_height",
    )


@register(
    "multimodal_frame_sample",
    oracle="""
    WITH p AS (
        SELECT doc_id, md5(text) || md5(reverse(text)) AS payload_hex
        FROM documents
        WHERE doc_id % 3 = 2
          AND text IS NOT NULL  -- no payload bytes -> no frames
    )
    SELECT doc_id,
           CAST(j AS BIGINT) AS frame_idx,
           substr(payload_hex, j * 16 + 1, 16) AS frame_hex
    FROM p CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS j)
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over the video payloads: the mapInPandas 1->N
    expansion emits real binary frame rows; the oracle reproduces each
    8-byte frame as the matching 16-char slice of the payload's hex
    (payload bytes ARE md5 material on both sides), so the frame CONTENT
    is value-checked, not just counted.
    """
    from pyspark.sql import functions as F

    from masd_spark.operators.multimodal import frame_sample

    docs = load_table(spark, sf_dir, "documents")
    videos = docs.filter((F.col("doc_id") % 3) == 2)
    frames = frame_sample(attach_binary_payload(videos), frame_len=8, stride=8)
    return frames.select(
        "doc_id",
        "frame_idx",
        F.lower(F.hex("frame")).alias("frame_hex"),
    )


@register(
    "multimodal_resize",
    oracle="""
    WITH p AS (
        SELECT doc_id, md5(text) || md5(reverse(text)) AS ph
        FROM documents
    )
    -- stride-2 sampling of the 32-byte payload -> 16 bytes: hex chars at
    -- positions 4i+1..4i+2 for i in 0..15
    SELECT doc_id,
           array_to_string([substr(ph, 4*i + 1, 2) for i in range(0, 16)], '')
               AS resized_hex
    FROM p
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plumbing (operators/multimodal.py:resize_payload): payloads
    downsampled 32 -> 16 bytes by stride sampling through the mapInPandas
    binary-in/binary-out path; the oracle reproduces the sampled bytes as
    hex-slice arithmetic, so resized CONTENT is value-checked.
    """
    from pyspark.sql import functions as F

    from masd_spark.operators.multimodal import resize_payload

    docs = load_table(spark, sf_dir, "documents")
    resized = resize_payload(attach_binary_payload(docs), target_bytes=16)
    return resized.select(
        "doc_id", F.lower(F.hex("resized")).alias("resized_hex")
    )


@register("multimodal_byte_features")
def multimodal_byte_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fake-decode feature extraction through the real mapInPandas Arrow
    path. Deterministic (md5-derived payloads) but not SQL-expressible ->
    rows-only check; tests pin exact values against hashlib.
    """
    docs = load_table(spark, sf_dir, "documents")
    return byte_stats_features(attach_binary_payload(docs))
