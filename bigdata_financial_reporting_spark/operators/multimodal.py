"""Multimodal column plumbing: opaque binary payloads + typed metadata,
with a REAL dependency-free image codec for the PPM (P6) format.

Images/audio/video ride along as ``binary`` columns with a metadata
struct (modality, byte length, content hash). The Spark-side machinery
— schema, partition-friendly batch processing via ``mapInPandas``,
Arrow batch shapes — is real and tested. For decode/resize, rather than
stubbing behind unavailable media libraries, the engine implements the
binary PPM "P6" format (the classic uncompressed RGB interchange
format: ASCII header ``P6 <w> <h> <maxval>`` with ``#`` comments, then
``w*h*3`` raw bytes). The parser and nearest-neighbor resampler are
pure Python over Arrow batches; a JPEG/PNG/ffmpeg decoder drops into
the same ``mapInPandas`` slot without plan changes.

Fixture payloads are synthesized deterministically from the documents
table with pure Catalyst expressions (``ppm_payload``), so the DuckDB
oracle can reconstruct the exact pixel bytes and verify the decoder
end-to-end (header parse offset, pixel extraction, resample indexing).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Result schema of the real PPM feature-extraction step.
PPM_DECODE_SCHEMA = (
    "doc_id long, valid boolean, width int, height int, maxval int, "
    "channels int, n_pixel_bytes int, pixel_sum bigint, pixel_sha256 string"
)

PPM_RESIZE_SCHEMA = (
    "doc_id long, width int, height int, new_width int, new_height int, "
    "resized_sha256 string"
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


def ppm_payload(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Synthesize a real binary PPM (P6) image per row, deterministically
    from the row's text: width ``4 + id % 5``, height ``3 + id % 4``,
    pixel bytes = the text's (ASCII) bytes repeated cyclically to fill
    ``w*h*3``. Pure Catalyst expressions — an engine-independent oracle
    can rebuild the identical payload with ``repeat``/``substr``.

    Rows with empty text are dropped (cannot fill pixels)."""
    did = F.col(id_col).cast("long")
    w = (F.lit(4) + did % 5).cast("int")
    h = (F.lit(3) + did % 4).cast("int")
    npix = (w * h * F.lit(3)).cast("int")
    src = df.filter(F.length(F.col(text_col)) > 0).select(
        did.alias("doc_id"),
        w.alias("w"),
        h.alias("h"),
        npix.alias("npix"),
        F.col(text_col).alias("_t"),
    )
    filled = src.select(
        "doc_id",
        "w",
        "h",
        F.expr(
            "substr(repeat(_t, CAST(ceil(CAST(npix AS DOUBLE) / length(_t)) AS INT)), 1, npix)"
        ).alias("pix"),
    )
    header = F.concat_ws(
        "", F.lit("P6\n"), F.col("w").cast("string"), F.lit(" "),
        F.col("h").cast("string"), F.lit("\n255\n"),
    )
    return filled.select(
        "doc_id",
        F.encode(F.concat(header, F.col("pix")), "UTF-8").alias("payload"),
    )


def _parse_p6(b: bytes):
    """Parse a binary PPM (P6) header per the Netpbm spec: ``P6``, then
    three whitespace-separated decimal fields (width, height, maxval),
    ``#``-to-end-of-line comments allowed in the header, then exactly
    one whitespace byte before the raw pixel data. Returns
    ``(width, height, maxval, pixel_offset)`` or ``None``."""
    if not b.startswith(b"P6"):
        return None
    i, vals = 2, []
    while len(vals) < 3:
        while i < len(b):
            c = b[i : i + 1]
            if c.isspace():
                i += 1
            elif c == b"#":
                while i < len(b) and b[i] != 0x0A:
                    i += 1
            else:
                break
        j = i
        while j < len(b) and b[j : j + 1].isdigit():
            j += 1
        if j == i:
            return None
        vals.append(int(b[i:j]))
        i = j
    if i >= len(b) or not b[i : i + 1].isspace():
        return None
    return vals[0], vals[1], vals[2], i + 1


def decode_ppm(df: DataFrame) -> DataFrame:
    """Real decode/feature-extract over ``mapInPandas``: Arrow batches
    of PPM payloads in, parsed image properties out — dimensions from
    the header, channel count, and the pixel block's byte sum + sha256
    (content identity of the DECODED image, not the container).

    Invalid/truncated payloads yield ``valid=false`` with NULL
    properties instead of failing the batch — malformed media must
    never kill a 100 TB scan."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                parsed = _parse_p6(b)
                if parsed is None:
                    rows.append((doc_id, False, None, None, None, None, None, None, None))
                    continue
                w, h, maxval, off = parsed
                pix = b[off : off + w * h * 3]
                if len(pix) != w * h * 3:
                    rows.append((doc_id, False, w, h, maxval, 3, None, None, None))
                    continue
                rows.append(
                    (doc_id, True, w, h, maxval, 3, len(pix), int(sum(pix)),
                     hashlib.sha256(pix).hexdigest())
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "valid", "width", "height", "maxval",
                         "channels", "n_pixel_bytes", "pixel_sum", "pixel_sha256"],
            )

    return df.mapInPandas(process, schema=PPM_DECODE_SCHEMA)


def resize_ppm(df: DataFrame, factor: int = 2) -> DataFrame:
    """Real nearest-neighbor downscale by ``1/factor`` over
    ``mapInPandas``: decode the PPM, sample source pixel
    ``(r*factor, c*factor)`` for each output pixel, and report the
    resized pixel block's sha256 for downstream dedup on resized
    content. Pure-Python indexing over Arrow batches — same slot a
    PIL/ffmpeg resampler would fill."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                parsed = _parse_p6(b)
                if parsed is None:
                    continue
                w, h, _maxval, off = parsed
                pix = b[off : off + w * h * 3]
                if len(pix) != w * h * 3:
                    continue
                nw, nh = max(1, w // factor), max(1, h // factor)
                out = bytes(
                    pix[((r * factor) * w + c * factor) * 3 + ch]
                    for r in range(nh)
                    for c in range(nw)
                    for ch in range(3)
                )
                rows.append(
                    (doc_id, w, h, nw, nh, hashlib.sha256(out).hexdigest())
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "new_width",
                         "new_height", "resized_sha256"],
            )

    return df.mapInPandas(process, schema=PPM_RESIZE_SCHEMA)


def frame_sample_plan(n_bytes: Column, frame_size: int, every_k: int) -> Column:
    """Deterministic frame-sampling plan for a fixed-size-frame payload:
    number of frames kept when sampling every k-th frame. Pure
    arithmetic (the real sampler would slice the binary at these
    offsets)."""
    n_frames = F.floor(n_bytes / frame_size)
    return F.ceil(n_frames / every_k).cast("long")


#: Result schema of the real WAV feature-extraction step.
WAV_DECODE_SCHEMA = (
    "doc_id long, valid boolean, audio_format int, channels int, "
    "sample_rate int, bits_per_sample int, n_samples int, duration_ms int, "
    "sample_sum bigint, sample_sha256 string"
)


def wav_payload(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Synthesize a real RIFF/WAVE payload per row (8-bit unsigned PCM,
    mono): sample rate ``8000 + (id % 4) * 4000``, sample count
    ``64 + (id % 97) * 3``, sample bytes = the text's (ASCII) bytes
    repeated cyclically. A decorative LIST chunk sits between fmt and
    data so a decoder must genuinely walk chunks rather than assume a
    fixed 44-byte header.

    The container header needs little-endian binary integers, so
    assembly happens in a Pandas batch UDF — but every DECODED feature
    (rate, counts, sample bytes) is a pure function of (id, text) that
    an engine-independent oracle recomputes arithmetically."""
    import struct

    def build(doc_id: int, text: str) -> bytes:
        rate = 8000 + (doc_id % 4) * 4000
        ns = 64 + (doc_id % 97) * 3
        # utf-8, not ascii: a stray non-ASCII doc must not kill the
        # batch (oracle parity assumes ASCII fixtures, where character
        # arithmetic equals byte arithmetic — documented in the query)
        raw = text.encode("utf-8")
        data = (raw * (ns // len(raw) + 1))[:ns]
        fmt = struct.pack("<HHIIHH", 1, 1, rate, rate, 1, 8)
        chunks = (
            b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"LIST" + struct.pack("<I", 4) + b"INFO"
            + b"data" + struct.pack("<I", len(data)) + data
        )
        return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [
                        build(int(i), t) for i, t in zip(pdf["doc_id"], pdf["text"])
                    ],
                }
            )

    src = df.filter(F.length(F.col(text_col)) > 0).select(
        F.col(id_col).cast("long").alias("doc_id"), F.col(text_col).alias("text")
    )
    return src.mapInPandas(process, schema="doc_id long, payload binary")


def _parse_riff_wave(b: bytes):
    """Walk a RIFF/WAVE container: returns ``(fmt_fields, data_bytes)``
    with ``fmt_fields = (audio_format, channels, sample_rate,
    bits_per_sample)``, or ``None`` if malformed. Handles unknown
    chunks and RIFF's even-byte chunk padding per the spec."""
    import struct

    if len(b) < 12 or b[0:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    declared = struct.unpack("<I", b[4:8])[0]
    if declared + 8 > len(b):
        return None
    fmt_fields = None
    data = None
    i = 12
    while i + 8 <= len(b):
        cid = b[i : i + 4]
        (size,) = struct.unpack("<I", b[i + 4 : i + 8])
        body = b[i + 8 : i + 8 + size]
        if len(body) < size:
            return None
        if cid == b"fmt " and size >= 16:
            af, ch, rate, _br, _ba, bits = struct.unpack("<HHIIHH", body[:16])
            fmt_fields = (af, ch, rate, bits)
        elif cid == b"data":
            data = body
        i += 8 + size + (size % 2)  # chunks pad to even length
    if fmt_fields is None or data is None:
        return None
    return fmt_fields, data


def decode_wav(df: DataFrame) -> DataFrame:
    """Real audio decode over ``mapInPandas``: RIFF chunk walk, fmt
    parse, PCM sample extraction; emits per-row audio properties plus
    the sample block's byte sum + sha256 (content identity of the
    decoded AUDIO, not the container). Malformed payloads yield
    ``valid=false`` with NULL properties — bad media must never kill a
    100 TB scan. 8-bit mono PCM is fully supported; other widths
    report properties with sample stats over raw data bytes."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                parsed = _parse_riff_wave(bytes(payload))
                if parsed is None:
                    rows.append(
                        (doc_id, False, None, None, None, None, None, None, None, None)
                    )
                    continue
                (af, ch, rate, bits), data = parsed
                bytes_per_sample = max(1, (bits // 8)) * max(1, ch)
                ns = len(data) // bytes_per_sample
                dur = ns * 1000 // rate if rate else None
                rows.append(
                    (doc_id, True, af, ch, rate, bits, ns, dur, int(sum(data)),
                     hashlib.sha256(data).hexdigest())
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "valid", "audio_format", "channels",
                         "sample_rate", "bits_per_sample", "n_samples",
                         "duration_ms", "sample_sum", "sample_sha256"],
            )

    return df.mapInPandas(process, schema=WAV_DECODE_SCHEMA)


def frame_extract(
    df: DataFrame, frame_size: int, every_k: int
) -> DataFrame:
    """Real frame extraction for fixed-size-frame payloads (the video
    analogue of the PPM/WAV decoders): slice the binary into
    ``frame_size``-byte frames, keep every ``every_k``-th, and emit one
    row per kept frame with its index and content sha256 — the shape a
    frame-level embedding or perceptual-hash stage consumes. Trailing
    partial frames are dropped (standard fixed-frame semantics).

    One input row fans out to ceil(n_frames / every_k) output rows
    inside the same Arrow batch — no shuffle; downstream partitioning
    is inherited."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                n_frames = len(b) // frame_size
                for fi in range(0, n_frames, every_k):
                    frame = b[fi * frame_size : (fi + 1) * frame_size]
                    rows.append(
                        (doc_id, fi, hashlib.sha256(frame).hexdigest())
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "frame_sha256"]
            )

    return df.mapInPandas(
        process, schema="doc_id long, frame_idx int, frame_sha256 string"
    )


def ahash_ppm(df: DataFrame) -> DataFrame:
    """Average-hash (aHash) perceptual fingerprint over REAL decoded
    PPM payloads: per pixel, integer luminance ``(r+g+b) // 3``; the
    hash sets bit i (row-major) where luminance exceeds the image's
    mean luminance. Identical images hash identically; small payload
    edits flip few bits — the classic cheap near-dup screen for image
    corpora. Decode + hash run in one ``mapInPandas`` pass (Arrow
    batches, no shuffle); the hash is a plain BIGINT so downstream
    grouping is a vanilla hash agg.

    Images with more than 64 pixels fold bit i onto bit i % 64 (XOR),
    and the accumulated value wraps two's-complement into the signed
    BIGINT — without the fold/wrap, any image of >= 64 pixels would
    set bit 63+ and overflow the int64 column (fixture payloads are
    <= 48 px, so their hashes are unchanged by either guard; real
    corpora are not). Hashes remain comparable only between
    same-dimension images, as with any aHash.

    Input: ``doc_id, payload``; output: ``doc_id, w, h, ahash``.
    Invalid payloads are dropped.
    """
    import pandas as pd

    def hash_batches(batches):
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                parsed = _parse_p6(bytes(payload))
                if parsed is None:
                    continue
                w, h, maxval, off = parsed
                pix = bytes(payload)[off : off + w * h * 3]
                if len(pix) < w * h * 3:
                    continue
                n = w * h
                lums = [
                    (pix[3 * i] + pix[3 * i + 1] + pix[3 * i + 2]) // 3
                    for i in range(n)
                ]
                mean = sum(lums) / n
                ahash = 0
                for i, l in enumerate(lums):
                    if l > mean:
                        ahash ^= 1 << (i % 64)
                if ahash >= 1 << 63:  # two's-complement wrap for int64
                    ahash -= 1 << 64
                out.append((doc_id, w, h, ahash))
            yield pd.DataFrame(
                out, columns=["doc_id", "w", "h", "ahash"]
            ).astype({"doc_id": "int64", "w": "int32", "h": "int32", "ahash": "int64"})

    return df.mapInPandas(
        hash_batches, schema="doc_id long, w int, h int, ahash long"
    )


RMS_WINDOW_SCHEMA = (
    "doc_id long, win_idx int, n_in_win int, rms double, peak int"
)


def rms_windows_wav(df: DataFrame, win: int = 32) -> DataFrame:
    """Windowed loudness over decoded 8-bit PCM: split each payload's
    sample block into ``win``-sample windows and emit per-window RMS
    (of the 128-centered amplitude) and peak |amplitude| — the
    feature extraction an audio-curation pipeline runs to drop
    silence/clipping before training. Same Arrow-batched
    ``mapInPandas`` shape as decode_wav: one pass, no shuffle, rows
    fan out ~n_samples/win per clip. Malformed payloads are skipped
    (the decode queries already surface them), and so are formats the
    decoder below cannot represent — the sample loop assumes 8-bit
    unsigned MONO PCM, so a 16-bit or multi-channel WAV that parses
    fine would otherwise yield silently wrong RMS/peak (ADVICE
    round 4)."""
    import numpy as np

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                parsed = _parse_riff_wave(bytes(payload))
                if parsed is None:
                    continue
                (_af, _ch, _rate, _bits), data = parsed
                if _bits != 8 or _ch != 1:
                    continue  # decoder handles 8-bit mono only
                a = np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0
                for w in range(0, len(a), win):
                    seg = a[w : w + win]
                    out.append(
                        (
                            doc_id,
                            w // win,
                            len(seg),
                            float(np.sqrt(np.mean(seg * seg))),
                            int(np.max(np.abs(seg))),
                        )
                    )
            yield pd.DataFrame(
                out, columns=["doc_id", "win_idx", "n_in_win", "rms", "peak"]
            )

    return df.mapInPandas(process, schema=RMS_WINDOW_SCHEMA)
