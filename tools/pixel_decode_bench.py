"""Measure the pure-Python image pixel decode kernels (MB/s of
DECODED pixel bytes) — the documented interpreted-Python boundary at
100 TB (SCALE.md).  PNG is measured per scanline-filter type (None/Up
/Sub are vectorized; Average/Paeth are sequential carry loops) and
GIF for sequential + interlaced LZW streams.

Usage: python tools/pixel_decode_bench.py [side=512] [reps=3]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from sample_keyspaces_cdc_streams_connectors_spark.llm.multimodal import (  # noqa: E402
    decode_gif_pixels,
    decode_png_pixels,
    encode_gif_gray8,
    encode_png_gray8,
)


def _png_single_filter(px: np.ndarray, ft: int) -> bytes:
    """A PNG whose every row uses filter ``ft`` (encode_png_gray8
    rotates by row; here the filter is pinned to isolate one
    inverse)."""
    import struct
    import zlib

    from sample_keyspaces_cdc_streams_connectors_spark.llm.multimodal import _paeth, _png_chunk

    h, w = px.shape
    raw = bytearray()
    prior = np.zeros(w, dtype=np.int64)
    for y in range(h):
        row = px[y].astype(np.int64)
        if ft == 0:
            enc = row
        elif ft == 1:
            enc = row - np.concatenate(([0], row[:-1]))
        elif ft == 2:
            enc = row - prior
        elif ft == 3:
            enc = row - (np.concatenate(([0], row[:-1])) + prior) // 2
        else:
            enc = np.empty(w, dtype=np.int64)
            for x in range(w):
                a = int(row[x - 1]) if x > 0 else 0
                c = int(prior[x - 1]) if x > 0 else 0
                enc[x] = row[x] - _paeth(a, int(prior[x]), c)
        raw.append(ft)
        raw.extend((enc % 256).astype(np.uint8).tobytes())
        prior = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def main() -> None:
    side = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, size=(side, side), dtype=np.uint8)
    mb = px.size / 1e6
    names = {0: "none", 1: "sub", 2: "up", 3: "average", 4: "paeth"}
    print(f"image {side}x{side} gray8 = {mb:.2f} MB decoded, min of {reps}")
    for ft, name in names.items():
        payload = _png_single_filter(px, ft)
        best = min(
            _timed(decode_png_pixels, payload, px) for _ in range(reps)
        )
        print(f"png_filter_{name}: {mb / best:8.1f} MB/s  ({best * 1e3:.0f} ms)")
    payload = encode_png_gray8(px)  # rotating filters = the gate shape
    best = min(_timed(decode_png_pixels, payload, px) for _ in range(reps))
    print(f"png_mixed_rot:    {mb / best:8.1f} MB/s  ({best * 1e3:.0f} ms)")
    for inter in (False, True):
        payload = encode_gif_gray8(px, interlace=inter)
        best = min(
            _timed(decode_gif_pixels, payload, px, gif=True)
            for _ in range(reps)
        )
        tag = "gif_interlaced " if inter else "gif_sequential"
        print(f"{tag}:   {mb / best:8.1f} MB/s  ({best * 1e3:.0f} ms)")


def _timed(fn, payload, px, gif: bool = False) -> float:
    t0 = time.time()
    out = fn(payload)
    dt = time.time() - t0
    ok = (out[:, :, 0] == px).all()
    assert ok, "decode mismatch"
    return dt


if __name__ == "__main__":
    main()
