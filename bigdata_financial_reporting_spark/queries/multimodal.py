"""Multimodal-column queries (SURVEY.md §2B.9): binary payloads with
typed metadata, identity hashing, base64 transport, stubbed decode via
mapInPandas, frame-sampling arithmetic."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_financial_reporting_spark.operators.multimodal import (
    decode_stub,
    frame_sample_plan,
    resize_stub,
    with_payload,
)
from bigdata_financial_reporting_spark.queries.registry import register
from bigdata_financial_reporting_spark.sources.catalog import load_table


@register(
    "mm_binary_metadata",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           sha256(text) AS content_sha256,
           base64(encode(text)) AS payload_b64
    FROM documents WHERE doc_id < 100
    """,
    category="multimodal",
)
def mm_binary_metadata(spark, sf_dir):
    """Binary payload + metadata struct + base64 transport encoding —
    the canonical multimodal row: content identity is the byte hash,
    never the (undecodable-on-the-engine) media itself."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    p = with_payload(d, "text", "doc_id")
    # Spark's base64 emits MIME-chunked output (CRLF every 76 chars);
    # strip to the canonical unchunked form.
    b64 = F.regexp_replace(F.base64("payload"), r"[\r\n]", "")
    return p.select(
        "doc_id",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.content_sha256").alias("content_sha256"),
        b64.alias("payload_b64"),
    )


@register(
    "mm_base64_roundtrip",
    oracle="""
    SELECT doc_id,
           CAST(from_base64(base64(encode(text))) AS VARCHAR) = text AS roundtrip_ok,
           length(base64(encode(text))) AS b64_len
    FROM documents WHERE doc_id < 100
    """,
    category="multimodal",
)
def mm_base64_roundtrip(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    b = F.encode(F.col("text"), "UTF-8")
    b64 = F.regexp_replace(F.base64(b), r"[\r\n]", "")
    return d.select(
        "doc_id",
        (F.decode(F.unbase64(b64), "UTF-8") == F.col("text")).alias("roundtrip_ok"),
        F.length(b64).alias("b64_len"),
    )


@register(
    "mm_decode_features",
    oracle="""
    SELECT doc_id, 'text' AS modality,
           CAST(octet_length(encode(text)) AS INT) AS n_bytes,
           substr(sha256(text), 1, 16) AS content_fp,
           true AS feature_ok
    FROM documents
    """,
    category="multimodal",
)
def mm_decode_features(spark, sf_dir):
    """The (stubbed) decode/feature-extract step over mapInPandas: Arrow
    batches of binary payloads into Python, deterministic fake features
    out. The oracle reproduces the fake (sha256 prefix), proving the
    distributed plumbing end-to-end; a real decoder drops in without
    plan changes."""
    d = load_table(spark, sf_dir, "documents")
    return decode_stub(with_payload(d, "text", "doc_id"))


@register(
    "mm_resize_stub",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS INT) AS orig_bytes,
           CAST(greatest(octet_length(encode(text)) // 4, 1) AS INT) AS resized_bytes,
           sha256(substr(text, 1, greatest(octet_length(encode(text)) // 4, 1)))
             AS resized_sha256
    FROM documents WHERE doc_id < 200
    """,
    category="multimodal",
)
def mm_resize_stub(spark, sf_dir):
    """The resize/downscale slot: Arrow batches of payloads into
    Python, deterministic 1/4-size fake resize out, with the resized
    content hash for downstream dedup. The oracle reproduces the fake
    byte-prefix resize, proving batch shape + hashing end-to-end.
    (Fixture text is ASCII, so the byte-prefix equals the substr the
    oracle hashes.)"""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return resize_stub(with_payload(d, "text", "doc_id"), 1, 4)


@register(
    "mm_frame_sampling",
    oracle="""
    SELECT doc_id,
           CAST(floor(octet_length(encode(text)) / 16) AS BIGINT) AS n_frames,
           CAST(ceil(floor(octet_length(encode(text)) / 16) / 4.0) AS BIGINT) AS n_sampled
    FROM documents
    """,
    category="multimodal",
)
def mm_frame_sampling(spark, sf_dir):
    """Deterministic frame-sampling plan (every 4th 16-byte 'frame') —
    pure arithmetic over payload sizes; the real sampler slices the
    binary at these offsets inside the same mapInPandas step."""
    d = load_table(spark, sf_dir, "documents")
    p = with_payload(d, "text", "doc_id")
    n_bytes = F.col("meta.n_bytes")
    return p.select(
        "doc_id",
        F.floor(n_bytes / 16).cast("long").alias("n_frames"),
        frame_sample_plan(n_bytes, 16, 4).alias("n_sampled"),
    )
