"""netpbm P1–P6 codec (r13 — llm/netpbm.py): exact decode of the
plainest public image family, pinned against planted arithmetic.
"""

from __future__ import annotations

import numpy as np
import pytest

from sample_keyspaces_cdc_streams_connectors_spark.llm.netpbm import (
    decode_pnm_pixels,
    encode_pnm,
    parse_pnm_header,
)


def _plant(h, w, ch=None):
    if ch:
        g = np.arange(h * w * ch, dtype=np.uint32).reshape(h, w, ch)
        return ((g * 37 + 11) % 256).astype(np.uint8)
    g = np.arange(h * w, dtype=np.uint32).reshape(h, w)
    return ((g * 37 + 11) % 256).astype(np.uint8)


def test_all_six_variants_roundtrip():
    gray = _plant(5, 7)
    rgb = _plant(4, 6, 3)
    bits = (_plant(9, 13) & 1).astype(np.uint8)
    cases = [
        ("pgm", gray, True), ("pgm", gray, False),
        ("ppm", rgb, True), ("ppm", rgb, False),
        ("pbm", bits, True), ("pbm", bits, False),
    ]
    for variant, px, binary in cases:
        b = encode_pnm(px, variant, binary=binary)
        got = decode_pnm_pixels(b)
        assert got.shape == px.shape and got.dtype == np.uint8
        assert np.array_equal(got, px), (variant, binary)
    # header fields survive, comments are skipped
    v, w, h, maxval, _off, binary = parse_pnm_header(
        encode_pnm(gray, "pgm")
    )
    assert (v, w, h, maxval, binary) == ("pgm", 7, 5, 255, True)
    b = b"P2 # c1\n# c2\n7\t5 # c3\n255\n" + b" ".join(
        b"%d" % v for v in gray.reshape(-1)
    )
    assert np.array_equal(decode_pnm_pixels(b), gray)
    # P4 rows are byte-padded: width 13 forces 2-byte strides
    assert np.array_equal(
        decode_pnm_pixels(encode_pnm(bits, "pbm")), bits
    )
    # P1 bits may be adjacent without whitespace
    b = b"P1\n3 2\n101\n010\n"
    assert decode_pnm_pixels(b).tolist() == [[1, 0, 1], [0, 1, 0]]


def test_deep_rasters_and_value_contract():
    # maxval > 255: 2-byte big-endian samples, v*255 // maxval
    # presentation (the 16-bit top-bits convention)
    deep = np.array([[0, 1000, 65535], [32768, 4096, 65535]], np.uint32)
    b = encode_pnm(deep, "pgm", maxval=65535)
    got = decode_pnm_pixels(b)
    want = (deep * 255 // 65535).astype(np.uint8)
    assert np.array_equal(got, want)
    # raw values for maxval <= 255 (no rescale — exact as stored)
    low = np.array([[0, 50, 100]], np.uint8)
    assert np.array_equal(
        decode_pnm_pixels(encode_pnm(low, "pgm", maxval=100)), low
    )


def test_malformed_raise_and_dispatch():
    gray = _plant(3, 3)
    good = encode_pnm(gray, "pgm")
    with pytest.raises(ValueError, match="truncated netpbm raster"):
        decode_pnm_pixels(good[:-2])
    with pytest.raises(ValueError, match="not a netpbm"):
        decode_pnm_pixels(b"P7 arbitrary")
    with pytest.raises(ValueError, match="not a netpbm"):
        decode_pnm_pixels(b"Phello world")
    with pytest.raises(ValueError, match="maxval"):
        decode_pnm_pixels(b"P2 2 2 0\n0 0 0 0")
    with pytest.raises(ValueError, match="exceeds maxval"):
        decode_pnm_pixels(b"P2 2 1 10\n5 11")
    with pytest.raises(ValueError, match="header token"):
        decode_pnm_pixels(b"P5 12 \xff\xff")
    # decode_image_pixels dispatches pnm for media payloads, while
    # parse_image_header deliberately does NOT claim the ASCII magic
    # (a text document may start with it — the fake-geometry path
    # must keep treating such payloads as text)
    from sample_keyspaces_cdc_streams_connectors_spark.llm.multimodal import (
        decode_image_pixels,
        parse_image_header,
    )

    assert np.array_equal(decode_image_pixels(good), gray)
    assert parse_image_header(good) == (None, None, None)
    assert parse_image_header(b"P2 is a label in prose") == (
        None, None, None,
    )
    with pytest.raises(NotImplementedError):
        decode_image_pixels(b"P2 is a label in prose")
