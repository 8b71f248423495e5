"""Multimodal-column queries (SURVEY.md §2B.9): binary payloads with
typed metadata, identity hashing, base64 transport, REAL codecs (PPM
image decode + resize, RIFF/WAV audio decode) and frame extraction via
mapInPandas — each verified byte-exactly against an arithmetic DuckDB
reconstruction of the expected decode."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_financial_reporting_spark.operators.multimodal import (
    decode_ppm,
    decode_wav,
    frame_extract,
    frame_sample_plan,
    ppm_payload,
    resize_ppm,
    wav_payload,
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


# Shared oracle CTE: rebuild the synthesized PPM's dimensions and pixel
# bytes engine-independently (fixture text is ASCII + nonempty, so
# character ops equal byte ops). Mirrors operators/multimodal.ppm_payload.
_PPM_PIX_CTE = """
    WITH dims AS (
      SELECT doc_id, text,
             CAST(4 + doc_id % 5 AS INT) AS w,
             CAST(3 + doc_id % 4 AS INT) AS h
      FROM documents WHERE doc_id < 100 AND length(text) > 0
    ), pix AS (
      SELECT doc_id, w, h, w*h*3 AS npix,
             substr(repeat(text, CAST(ceil(CAST(w*h*3 AS DOUBLE) / length(text)) AS INT)),
                    1, w*h*3) AS p
      FROM dims
    )
"""


@register(
    "mm_decode_features",
    oracle=_PPM_PIX_CTE
    + """
    SELECT doc_id, true AS valid, w AS width, h AS height, 255 AS maxval,
           3 AS channels, CAST(npix AS INT) AS n_pixel_bytes,
           CAST(list_sum(list_transform(generate_series(1, npix),
                                        i -> ord(substr(p, i, 1)))) AS BIGINT)
             AS pixel_sum,
           sha256(p) AS pixel_sha256
    FROM pix
    """,
    category="multimodal",
)
def mm_decode_features(spark, sf_dir):
    """REAL image decode over mapInPandas: per-row PPM (P6) payloads are
    synthesized from fixture text with pure expressions (ppm_payload),
    then a real header parser extracts width/height/maxval and the pixel
    block's sum + sha256. The oracle reconstructs the identical pixel
    bytes arithmetically, so a wrong header-offset or pixel-slice in the
    decoder fails the hash — the codec is verified, not just the
    plumbing."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return decode_ppm(ppm_payload(d, "text", "doc_id"))


@register(
    "mm_resize_ppm",
    oracle=_PPM_PIX_CTE
    + """
    SELECT doc_id, w AS width, h AS height,
           CAST(w // 2 AS INT) AS new_width, CAST(h // 2 AS INT) AS new_height,
           sha256(array_to_string(
             list_transform(generate_series(0, (w//2)*(h//2)*3 - 1),
               i -> substr(p, ((i // ((w//2)*3)) * 2 * w
                               + ((i % ((w//2)*3)) // 3) * 2) * 3
                              + (i % 3) + 1, 1)),
             '')) AS resized_sha256
    FROM pix
    """,
    category="multimodal",
)
def mm_resize_ppm(spark, sf_dir):
    """REAL nearest-neighbor 1/2 downscale: decode the PPM, sample
    source pixel (2r, 2c) per output pixel, hash the resized pixel
    block. The oracle re-derives every sampled byte's source offset
    independently, so an off-by-one in the resampler's row stride or
    channel indexing fails the hash. Replaces the round-2
    mm_resize_stub (byte-prefix fake)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return resize_ppm(ppm_payload(d, "text", "doc_id"), factor=2)


@register(
    "mm_decode_wav",
    oracle="""
    WITH dims AS (
      SELECT doc_id, text,
             8000 + (doc_id % 4) * 4000 AS rate,
             64 + (doc_id % 97) * 3 AS ns
      FROM documents WHERE doc_id < 100 AND length(text) > 0
    ), smp AS (
      SELECT doc_id, rate, ns,
             substr(repeat(text, CAST(ceil(CAST(ns AS DOUBLE) / length(text)) AS INT)),
                    1, ns) AS s
      FROM dims
    )
    SELECT doc_id, true AS valid, 1 AS audio_format, 1 AS channels,
           CAST(rate AS INT) AS sample_rate, 8 AS bits_per_sample,
           CAST(ns AS INT) AS n_samples,
           CAST(ns * 1000 // rate AS INT) AS duration_ms,
           CAST(list_sum(list_transform(generate_series(1, ns),
                                        i -> ord(substr(s, i, 1)))) AS BIGINT)
             AS sample_sum,
           sha256(s) AS sample_sha256
    FROM smp
    """,
    category="multimodal",
)
def mm_decode_wav(spark, sf_dir):
    """REAL audio decode over mapInPandas: per-row RIFF/WAVE payloads
    (8-bit mono PCM, with a decoy LIST chunk between fmt and data) are
    synthesized deterministically from fixture text, then a real chunk
    walker parses fmt and extracts the PCM samples. The oracle
    reconstructs the sample bytes arithmetically, so a wrong chunk
    offset, fmt unpack, or data slice fails the hash — the second real
    codec next to PPM (image); the same slot fits mp3/flac decoders."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return decode_wav(wav_payload(d, "text", "doc_id"))


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


@register(
    "mm_frame_extract",
    oracle="""
    WITH p AS (
      SELECT doc_id, encode(text) AS b, octet_length(encode(text)) // 16 AS nf
      FROM documents WHERE doc_id < 100
    )
    SELECT doc_id,
           CAST(fi AS INT) AS frame_idx,
           sha256(substr(CAST(b AS VARCHAR), fi * 16 + 1, 16)) AS frame_sha256
    FROM p, LATERAL unnest(generate_series(0, nf - 1, 4)) t(fi)
    WHERE nf > 0
    """,
    category="multimodal",
)
def mm_frame_extract(spark, sf_dir):
    """REAL frame extraction (the video analogue): every 4th 16-byte
    frame of the payload is sliced and content-hashed, one output row
    per kept frame — the fan-out shape a frame-embedding stage
    consumes. The oracle re-slices each kept frame with substr
    arithmetic, so stride or offset bugs fail the hash. Upgrades
    mm_frame_sampling's count-only plan into the actual sampler.
    (Fixture text is ASCII, so byte slicing equals character slicing.)"""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return frame_extract(with_payload(d, "text", "doc_id"), frame_size=16, every_k=4)


@register(
    "mm_ahash_dedup_groups",
    oracle=_PPM_PIX_CTE
    + """
    , lum AS (
      SELECT doc_id, w, h,
             list_transform(generate_series(0, w*h - 1),
               i -> (ord(substr(p, 3*i + 1, 1))
                     + ord(substr(p, 3*i + 2, 1))
                     + ord(substr(p, 3*i + 3, 1))) // 3) AS lums
      FROM pix
    ), hashed AS (
      SELECT doc_id, w, h,
             CAST(list_sum(list_transform(generate_series(1, w*h),
               i -> CASE WHEN lums[i] > list_sum(lums) / CAST(w*h AS DOUBLE)
                    THEN (1::BIGINT << (i - 1)) ELSE 0 END)) AS BIGINT) AS ahash
      FROM lum
    )
    SELECT doc_id, w, h, ahash,
           count(*) OVER (PARTITION BY w, h, ahash) AS n_same_hash
    FROM hashed
    """,
    category="multimodal",
)
def mm_ahash_dedup_groups(spark, sf_dir):
    """Perceptual-hash (aHash) near-dup screen over REAL decoded
    images: decode the PPM, compute per-pixel integer luminance, set a
    bit per pixel above the image's mean luminance, then group by
    (dims, hash) — the cheap first-pass image dedup before any
    embedding model runs. Decode+hash is one mapInPandas pass with no
    shuffle; the only exchange is the (w, h, ahash) group count. The
    oracle rebuilds every luminance and every hash bit arithmetically
    from the deterministic payload synthesis, so a single wrong bit
    anywhere in the decode or threshold fails the match."""
    from pyspark.sql import Window

    from bigdata_financial_reporting_spark.operators.multimodal import (
        ahash_ppm,
        ppm_payload,
    )

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    hashed = ahash_ppm(ppm_payload(d, "text", "doc_id"))
    w = Window.partitionBy("w", "h", "ahash")
    return hashed.select(
        "doc_id", "w", "h", "ahash",
        F.count(F.lit(1)).over(w).alias("n_same_hash"),
    )


@register(
    "mm_audio_rms_windows",
    oracle="""
    WITH dims AS (
      SELECT doc_id, text,
             64 + (doc_id % 97) * 3 AS ns
      FROM documents WHERE doc_id < 100 AND length(text) > 0
    ), smp AS (
      SELECT doc_id, ns,
             substr(repeat(text,
               CAST(ceil(CAST(ns AS DOUBLE) / length(text)) AS INT)),
               1, ns) AS s
      FROM dims
    ), wins AS (
      SELECT doc_id, ns, s,
             unnest(generate_series(0, (ns - 1) // 32)) AS w
      FROM smp
    )
    SELECT doc_id, CAST(w AS INT) AS win_idx,
           CAST(least(32, ns - w * 32) AS INT) AS n_in_win,
           round(sqrt(list_avg(list_transform(
             generate_series(CAST(w * 32 + 1 AS BIGINT),
                             CAST(least(ns, w * 32 + 32) AS BIGINT)),
             i -> pow(ord(substr(s, CAST(i AS INT), 1)) - 128.0, 2)))), 6)
             AS rms,
           CAST(list_max(list_transform(
             generate_series(CAST(w * 32 + 1 AS BIGINT),
                             CAST(least(ns, w * 32 + 32) AS BIGINT)),
             i -> abs(ord(substr(s, CAST(i AS INT), 1)) - 128))) AS INT)
             AS peak
    FROM wins
    """,
    category="multimodal",
)
def mm_audio_rms_windows(spark, sf_dir):
    """Windowed audio loudness (32-sample RMS + peak of the centered
    8-bit PCM amplitude) over REAL WAV decodes — the silence/clipping
    screen an audio-curation pipeline runs before training. The
    payloads are the same deterministic RIFF/WAV containers
    mm_decode_wav verifies byte-exactly, so the oracle rebuilds every
    window's arithmetic from the generation rule (sample i = codepoint
    of the repeated text). One Arrow-batched mapInPandas pass, no
    shuffle; rows fan out ~n_samples/32 per clip."""
    from bigdata_financial_reporting_spark.operators.multimodal import (
        rms_windows_wav,
        wav_payload,
    )

    d = (
        load_table(spark, sf_dir, "documents")
        .filter((F.col("doc_id") < 100) & (F.length("text") > 0))
    )
    payload = wav_payload(d, "text", "doc_id")
    out = rms_windows_wav(payload, win=32)
    return out.select(
        "doc_id", "win_idx", "n_in_win", F.round("rms", 6).alias("rms"), "peak"
    )
