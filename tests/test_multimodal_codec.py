"""PPM (P6) codec tests: the real parser/resampler must handle the
Netpbm spec's header shapes (comments, arbitrary whitespace), reject
malformed/truncated payloads without failing the batch, and agree with
an independent pixel-index computation for resize."""

from __future__ import annotations

import hashlib

from pyspark.sql import Row

from bigdata_financial_reporting_spark.operators.multimodal import (
    _parse_p6,
    decode_ppm,
    ppm_payload,
    resize_ppm,
)
from bigdata_financial_reporting_spark.sources.catalog import load_table


def _ppm(w: int, h: int, pix: bytes, header: bytes | None = None) -> bytes:
    return (header or f"P6\n{w} {h}\n255\n".encode()) + pix


def test_parse_p6_plain_and_comments():
    pix = bytes(range(2 * 2 * 3))
    assert _parse_p6(_ppm(2, 2, pix)) == (2, 2, 255, 11)
    # comments + weird whitespace between header fields are legal
    hdr = b"P6 # a comment\n  2\t2 # another\n255 "
    w, h, maxval, off = _parse_p6(hdr + pix)
    assert (w, h, maxval) == (2, 2, 255)
    assert (hdr + pix)[off:] == pix


def test_parse_p6_rejects_malformed():
    assert _parse_p6(b"P5\n2 2\n255\n" + b"\x00" * 12) is None  # wrong magic
    assert _parse_p6(b"P6\n2 x\n255\n") is None  # non-numeric field
    assert _parse_p6(b"P6\n2 2\n255") is None  # missing ws after maxval
    assert _parse_p6(b"") is None


def test_decode_ppm_flags_truncated_payload(spark):
    good = _ppm(2, 2, bytes(range(12)))
    truncated = _ppm(4, 4, b"\x01\x02\x03")  # header claims 48 pixel bytes
    garbage = b"GIF89a not a ppm"
    df = spark.createDataFrame(
        [Row(doc_id=1, payload=bytearray(good)),
         Row(doc_id=2, payload=bytearray(truncated)),
         Row(doc_id=3, payload=bytearray(garbage))],
        "doc_id long, payload binary",
    )
    rows = {r.doc_id: r for r in decode_ppm(df).collect()}
    assert rows[1].valid and rows[1].n_pixel_bytes == 12
    assert rows[1].pixel_sum == sum(range(12))
    assert rows[1].pixel_sha256 == hashlib.sha256(bytes(range(12))).hexdigest()
    assert rows[2].valid is False and rows[2].width == 4  # header parsed, pixels short
    assert rows[3].valid is False and rows[3].width is None


def test_resize_ppm_nearest_neighbor_indexing(spark):
    # 4x2 image with distinct bytes; factor 2 -> 2x1 keeping pixels (0,0),(0,2)
    pix = bytes(range(4 * 2 * 3))
    df = spark.createDataFrame(
        [Row(doc_id=1, payload=bytearray(_ppm(4, 2, pix)))],
        "doc_id long, payload binary",
    )
    [r] = resize_ppm(df, factor=2).collect()
    assert (r.width, r.height, r.new_width, r.new_height) == (4, 2, 2, 1)
    expected = bytes([pix[0], pix[1], pix[2], pix[6], pix[7], pix[8]])
    assert r.resized_sha256 == hashlib.sha256(expected).hexdigest()


def test_resize_ppm_skips_invalid_rows(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, payload=bytearray(b"junk")),
         Row(doc_id=2, payload=bytearray(_ppm(2, 2, bytes(12))))],
        "doc_id long, payload binary",
    )
    rows = resize_ppm(df).collect()
    assert [r.doc_id for r in rows] == [2]


def test_ppm_payload_is_valid_ppm_and_deterministic(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").filter("doc_id < 20")
    p1 = {r.doc_id: bytes(r.payload) for r in ppm_payload(d, "text", "doc_id").collect()}
    p2 = {r.doc_id: bytes(r.payload) for r in ppm_payload(d, "text", "doc_id").collect()}
    assert p1 == p2 and p1
    for doc_id, b in p1.items():
        parsed = _parse_p6(b)
        assert parsed is not None, doc_id
        w, h, maxval, off = parsed
        assert (w, h) == (4 + doc_id % 5, 3 + doc_id % 4)
        assert maxval == 255
        assert len(b) - off == w * h * 3


# ---- WAV (RIFF) codec ----

import struct

from bigdata_financial_reporting_spark.operators.multimodal import (
    _parse_riff_wave,
    decode_wav,
    wav_payload,
)


def _wav(data: bytes, rate: int = 8000, bits: int = 8, ch: int = 1,
         extra_chunk: bytes = b"") -> bytes:
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * ch * (bits // 8 or 1),
                      ch * (bits // 8 or 1), bits)
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + extra_chunk
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_parse_riff_walks_unknown_and_odd_chunks():
    # odd-sized unknown chunk forces the even-padding rule
    odd = b"junk" + struct.pack("<I", 3) + b"abc" + b"\x00"
    data = bytes(range(16))
    got = _parse_riff_wave(_wav(data, extra_chunk=odd))
    assert got == ((1, 1, 8000, 8), data)


def test_parse_riff_rejects_malformed():
    assert _parse_riff_wave(b"RIFX1234WAVE") is None          # bad magic
    assert _parse_riff_wave(b"RIFF" + struct.pack("<I", 999) + b"WAVE") is None
    good = _wav(bytes(8))
    assert _parse_riff_wave(good[:20]) is None                 # truncated
    # fmt present but no data chunk
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    nodata = b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt)) + b"WAVE" \
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    assert _parse_riff_wave(nodata) is None


def test_decode_wav_properties_and_invalid_rows(spark):
    import hashlib

    data = bytes(range(100))
    df = spark.createDataFrame(
        [Row(doc_id=1, payload=bytearray(_wav(data, rate=16000))),
         Row(doc_id=2, payload=bytearray(b"not audio at all"))],
        "doc_id long, payload binary",
    )
    rows = {r.doc_id: r for r in decode_wav(df).collect()}
    r = rows[1]
    assert (r.valid, r.audio_format, r.channels, r.sample_rate,
            r.bits_per_sample) == (True, 1, 1, 16000, 8)
    assert r.n_samples == 100 and r.duration_ms == 100 * 1000 // 16000
    assert r.sample_sum == sum(data)
    assert r.sample_sha256 == hashlib.sha256(data).hexdigest()
    assert rows[2].valid is False and rows[2].sample_rate is None


def test_wav_payload_roundtrips_through_decoder(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").filter("doc_id < 20")
    out = {r.doc_id: r for r in decode_wav(wav_payload(d, "text", "doc_id")).collect()}
    assert out and all(r.valid for r in out.values())
    for doc_id, r in out.items():
        assert r.sample_rate == 8000 + (doc_id % 4) * 4000
        assert r.n_samples == 64 + (doc_id % 97) * 3


def test_frame_extract_slices_and_strides(spark):
    import hashlib

    from bigdata_financial_reporting_spark.operators.multimodal import (
        frame_extract,
    )

    payload = bytes(range(100))  # 6 full 16-byte frames + 4 trailing bytes
    df = spark.createDataFrame(
        [Row(doc_id=1, payload=bytearray(payload)),
         Row(doc_id=2, payload=bytearray(b"tiny"))],  # < 1 frame -> no rows
        "doc_id long, payload binary",
    )
    rows = frame_extract(df, frame_size=16, every_k=4).collect()
    got = {(r.doc_id, r.frame_idx): r.frame_sha256 for r in rows}
    assert set(got) == {(1, 0), (1, 4)}  # frames 0 and 4 of 6; doc 2 empty
    for (_, fi), h in got.items():
        expected = hashlib.sha256(payload[fi * 16 : (fi + 1) * 16]).hexdigest()
        assert h == expected


def test_ahash_survives_images_of_64_plus_pixels(spark):
    """Regression (review finding): bit-per-pixel accumulation used to
    set bit 63+ for any image of >= 64 pixels and overflow the int64
    column. Large images must hash (bits fold onto i % 64, value
    wraps two's-complement) and identical images must still collide."""
    from pyspark.sql import Row

    from bigdata_financial_reporting_spark.operators.multimodal import (
        ahash_ppm,
    )

    def ppm(w, h, seed):
        px = bytes(((i * 37 + seed) % 251) for i in range(w * h * 3))
        return b"P6\n%d %d\n255\n" % (w, h) + px

    rows = [
        Row(doc_id=1, payload=ppm(16, 16, 0)),   # 256 px — folds
        Row(doc_id=2, payload=ppm(16, 16, 0)),   # identical twin
        Row(doc_id=3, payload=ppm(16, 16, 99)),  # different content
        Row(doc_id=4, payload=ppm(8, 8, 0)),     # exactly 64 px
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r["ahash"] for r in ahash_ppm(df).collect()}
    assert set(got) == {1, 2, 3, 4}
    assert got[1] == got[2]
    assert got[1] != got[3]
    for v in got.values():
        assert -(1 << 63) <= v < (1 << 63)


def test_rms_windows_skips_non_8bit_mono(spark):
    """ADVICE round 4: the RMS decoder assumes 8-bit unsigned mono; a
    16-bit or stereo WAV parses fine but would decode to garbage — it
    must be skipped like a malformed payload, not silently scored."""
    from pyspark.sql import Row

    from bigdata_financial_reporting_spark.operators.multimodal import (
        rms_windows_wav,
    )

    data = bytes(range(64))
    df = spark.createDataFrame(
        [
            Row(doc_id=1, payload=bytearray(_wav(data, bits=8, ch=1))),
            Row(doc_id=2, payload=bytearray(_wav(data, bits=16, ch=1))),
            Row(doc_id=3, payload=bytearray(_wav(data, bits=8, ch=2))),
        ],
        "doc_id long, payload binary",
    )
    got = rms_windows_wav(df, win=32).collect()
    assert {r.doc_id for r in got} == {1}
    assert len(got) == 2  # 64 samples / 32-sample windows
