"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride along as ``binary`` columns with a metadata
struct (modality, byte length, content hash). The Spark-side machinery
— schema, partition-friendly batch processing via ``mapInPandas``,
Arrow batch shapes — is real and tested; the actual codec step is
STUBBED (``decode_stub``) because media libraries are not available in
this environment. Swap ``_fake_decode`` for PIL/torchaudio/ffmpeg in a
real deployment; nothing else changes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Result schema of the (stubbed) feature extraction step.
DECODE_SCHEMA = (
    "doc_id long, modality string, n_bytes int, content_fp string, feature_ok boolean"
)


def with_payload(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Wrap a text column as a binary payload + metadata struct —
    the canonical multimodal row shape."""
    payload = F.encode(F.col(text_col), "UTF-8")
    meta = F.struct(
        F.lit("text").alias("modality"),
        F.octet_length(payload).alias("n_bytes"),
        F.sha2(payload, 256).alias("content_sha256"),
    )
    return df.select(
        F.col(id_col).alias("doc_id"), payload.alias("payload"), meta.alias("meta")
    )


def decode_stub(df: DataFrame, real_decoder=None) -> DataFrame:
    """'Decode' binary payloads with a partition-wise Pandas batch UDF.

    ``real_decoder``: optional callable(bytes) -> features for real
    deployments (e.g. PIL image decode / resize). The default is a
    deterministic fake (sha256 prefix) so the distributed plumbing is
    testable without media libraries.
    """

    def _fake_decode(b: bytes) -> str:
        return hashlib.sha256(b).hexdigest()[:16]

    decoder = real_decoder or _fake_decode

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": [m["modality"] for m in pdf["meta"]],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "content_fp": [decoder(bytes(p)) for p in pdf["payload"]],
                    "feature_ok": True,
                }
            )
            yield out

    return df.mapInPandas(process, schema=DECODE_SCHEMA)


def resize_stub(df: DataFrame, scale_num: int = 1, scale_den: int = 4) -> DataFrame:
    """'Resize' binary payloads to scale_num/scale_den of their size
    with a partition-wise Pandas batch UDF — the image/video downscale
    slot. The fake resize keeps a deterministic byte prefix (a real
    deployment swaps in PIL/ffmpeg; the Arrow batch shape, schema, and
    partitioning stay identical). Output carries both sizes + the
    content hash of the resized payload so downstream dedup can run on
    resized content."""
    import hashlib

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = [
                bytes(p)[: max(1, (len(p) * scale_num) // scale_den)]
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "orig_bytes": [len(p) for p in pdf["payload"]],
                    "resized_bytes": [len(r) for r in resized],
                    "resized_sha256": [
                        hashlib.sha256(r).hexdigest() for r in resized
                    ],
                }
            )

    return df.mapInPandas(
        process,
        schema="doc_id long, orig_bytes int, resized_bytes int, resized_sha256 string",
    )


def frame_sample_plan(n_bytes: Column, frame_size: int, every_k: int) -> Column:
    """Deterministic frame-sampling plan for a fixed-size-frame payload:
    number of frames kept when sampling every k-th frame. Pure
    arithmetic (the real sampler would slice the binary at these
    offsets)."""
    n_frames = F.floor(n_bytes / frame_size)
    return F.ceil(n_frames / every_k).cast("long")
