"""Pure-stdlib PNG codec tests (functions/png.py) — the round-6 closure of
the image-decode honesty gap.

The round-trip property alone cannot catch a bug the encoder and decoder
share (e.g. a mirrored Paeth sign error cancels in encode→decode), so the
decoder is ALSO pinned against an INDEPENDENT in-test construction: the test
builds PNG bytes with its own filter arithmetic written directly from the
spec formulas and asserts the library decodes them to the intended pixels.
"""

from __future__ import annotations

import struct
import zlib

import hypothesis.strategies as st
import pytest
from hypothesis import given, settings

from kafka_spark_streaming_eval_spark.functions.png import (
    SIGNATURE,
    png_decode,
    png_encode,
)


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=9),
    h=st.integers(min_value=1, max_value=9),
    ctype=st.sampled_from([2, 6]),
    data=st.data(),
)
def test_roundtrip_identity(w, h, ctype, data):
    """encode→decode is the identity on any pixel buffer, both color types,
    covering every filter (encoder cycles row % 5)."""
    bpp = 3 if ctype == 2 else 4
    pixels = bytes(
        data.draw(
            st.lists(
                st.integers(0, 255), min_size=w * h * bpp, max_size=w * h * bpp
            )
        )
    )
    w2, h2, ct2, dec = png_decode(png_encode(w, h, pixels, ctype))
    assert (w2, h2, ct2, dec) == (w, h, ctype, pixels)


def test_all_filters_appear_in_stream():
    """A 5-row image must carry filter bytes 0..4 — otherwise the cycling
    encoder isn't exercising the unfilter paths it promises to."""
    blob = png_encode(2, 5, bytes(range(30)))
    # IDAT payload: find the chunk, decompress, read each row's filter byte
    pos = 8
    idat = b""
    while pos < len(blob):
        (length,) = struct.unpack(">I", blob[pos : pos + 4])
        if blob[pos + 4 : pos + 8] == b"IDAT":
            idat += blob[pos + 8 : pos + 8 + length]
        pos += 12 + length
    raw = zlib.decompress(idat)
    stride = 2 * 3
    assert [raw[r * (stride + 1)] for r in range(5)] == [0, 1, 2, 3, 4]


def _spec_filter(ftype, raw, prior, bpp):
    """Independent encoder-side filter, written directly from the PNG spec
    §9 formulas (NOT imported from the library under test)."""

    def paeth(a, b, c):
        p = a + b - c
        candidates = [(abs(p - a), a), (abs(p - b), b), (abs(p - c), c)]
        best = min(c for c, _ in candidates)
        for cost, v in candidates:  # tie order: left, up, up-left
            if cost == best:
                return v

    out = []
    for i, x in enumerate(raw):
        a = raw[i - bpp] if i >= bpp else 0
        b = prior[i]
        c = prior[i - bpp] if i >= bpp else 0
        pred = {0: 0, 1: a, 2: b, 3: (a + b) // 2, 4: paeth(a, b, c)}[ftype]
        out.append((x - pred) % 256)
    return bytes(out)


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=6),
    rows=st.lists(st.integers(0, 4), min_size=1, max_size=6),
    data=st.data(),
)
def test_decoder_against_independent_spec_construction(w, rows, data):
    """Decode PNGs built by the TEST's own filter implementation (arbitrary
    per-row filter choices, not the encoder's cycle) — a shared
    encoder/decoder bug cannot hide here."""
    h = len(rows)
    stride = w * 3
    pixels = bytes(
        data.draw(st.lists(st.integers(0, 255), min_size=stride * h, max_size=stride * h))
    )

    def chunk(ctype, payload):
        return (
            struct.pack(">I", len(payload))
            + ctype
            + payload
            + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
        )

    scan = bytearray()
    prior = b"\x00" * stride
    for r, ftype in enumerate(rows):
        raw = pixels[r * stride : (r + 1) * stride]
        scan.append(ftype)
        scan += _spec_filter(ftype, raw, prior, 3)
        prior = raw
    blob = (
        SIGNATURE
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(scan)))
        + chunk(b"IEND", b"")
    )
    assert png_decode(blob) == (w, h, 2, pixels)


def test_ancillary_chunks_skipped_and_split_idat():
    """tEXt chunks are skipped per spec; IDAT split across chunks still
    decodes (the spec allows any split of the zlib stream)."""
    pixels = bytes(range(36))
    blob = png_encode(3, 4, pixels)
    # re-split: inject a tEXt chunk and split IDAT into two chunks
    pos = 8
    parts = {b"IHDR": b"", b"IDAT": b"", b"IEND": b""}
    while pos < len(blob):
        (length,) = struct.unpack(">I", blob[pos : pos + 4])
        parts[blob[pos + 4 : pos + 8]] += blob[pos + 8 : pos + 8 + length]
        pos += 12 + length

    def chunk(ctype, payload):
        return (
            struct.pack(">I", len(payload))
            + ctype
            + payload
            + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
        )

    idat = parts[b"IDAT"]
    rebuilt = (
        SIGNATURE
        + chunk(b"IHDR", parts[b"IHDR"])
        + chunk(b"tEXt", b"Comment\x00spec says skip me")
        + chunk(b"IDAT", idat[:7])
        + chunk(b"IDAT", idat[7:])
        + chunk(b"IEND", b"")
    )
    assert png_decode(rebuilt) == (3, 4, 2, pixels)


def test_corruption_raises_not_garbage():
    blob = bytearray(png_encode(2, 2, bytes(12)))
    # flip one IDAT payload byte -> CRC must catch it
    pos = 8
    while pos < len(blob):
        (length,) = struct.unpack(">I", bytes(blob[pos : pos + 4]))
        if blob[pos + 4 : pos + 8] == b"IDAT":
            blob[pos + 8] ^= 0xFF
            break
        pos += 12 + length
    with pytest.raises(ValueError, match="CRC"):
        png_decode(bytes(blob))
    with pytest.raises(ValueError, match="signature"):
        png_decode(b"GIF89a not a png")
    with pytest.raises(ValueError, match="interlaced"):
        interlaced_ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 1)

        def chunk(ctype, payload):
            return (
                struct.pack(">I", len(payload))
                + ctype
                + payload
                + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
            )

        png_decode(SIGNATURE + chunk(b"IHDR", interlaced_ihdr) + chunk(b"IEND", b""))


def test_bad_deflate_raises_valueerror_not_zlib_error():
    """zlib.error is not a ValueError subclass — an IDAT-less blob or a
    corrupt deflate stream behind a RECOMPUTED chunk CRC must still honor
    the 'corrupt input raises ValueError' contract."""

    def chunk(ctype, payload):
        return (
            struct.pack(">I", len(payload))
            + ctype
            + payload
            + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 0)
    # no IDAT at all -> zlib.decompress(b"") raises zlib.error
    with pytest.raises(ValueError, match="IDAT"):
        png_decode(SIGNATURE + chunk(b"IHDR", ihdr) + chunk(b"IEND", b""))
    # garbage deflate bytes with a VALID chunk CRC (CRC covers the wire
    # bytes, not the deflate validity)
    with pytest.raises(ValueError, match="IDAT"):
        png_decode(
            SIGNATURE
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", b"\xff\xff\xff\xff")
            + chunk(b"IEND", b"")
        )


def test_huge_header_raises_valueerror_before_allocation():
    """A crafted IHDR (width=2^31-1) must hit the documented ValueError
    contract, not MemoryError from buffer allocation (ADVICE r6)."""

    def chunk(ctype, payload):
        return (
            struct.pack(">I", len(payload))
            + ctype
            + payload
            + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
        )

    for w, h in [(2**31 - 1, 1), (1, 2**31 - 1), (1 << 16, 1 << 16), (0, 4), (4, 0)]:
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        with pytest.raises(ValueError, match="IHDR|pixel cap|dimensions"):
            png_decode(SIGNATURE + chunk(b"IHDR", ihdr) + chunk(b"IEND", b""))


def test_decode_image_routes_png_and_keeps_gate():
    """decode_image: REAL result for PNG magic, NotImplementedError gate for
    anything else (no codec libs in this runtime)."""
    from kafka_spark_streaming_eval_spark.operators.multimodal import decode_image

    pixels = bytes(range(24, 24 + 18))
    assert decode_image(png_encode(3, 2, pixels)) == (3, 2, 2, pixels)
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff\xe0 fake jpeg header")


def test_mm_kernel_codec_mismatch_fails_loudly(spark, monkeypatch):
    """A codec mismatch inside the mm_png_decode_stats mapInPandas kernel
    must FAIL the job (raised ValueError), not leak garbage into the stats
    — and must do so even under `python -O` (VERDICT r6: the kernel used a
    bare assert).  The kernel captures png_decode at query-build time, so
    patching the module first makes the closure carry the broken codec."""
    import os

    from kafka_spark_streaming_eval_spark.functions import png as png_mod
    from kafka_spark_streaming_eval_spark.operators import multimodal

    def broken_decode(blob):
        w, h, ct, px = png_decode(blob)
        return w + 1, h, ct, px  # simulated width corruption

    monkeypatch.setattr(png_mod, "png_decode", broken_decode)
    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    df = multimodal.mm_png_decode_stats(spark, sf_dir)
    with pytest.raises(Exception, match="png roundtrip mismatch"):
        df.collect()
