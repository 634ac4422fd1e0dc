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
    # baseline JPEG (r11): three symbol-density regimes for the
    # Python Huffman loop — random@q=1 (pathological: nearly every AC
    # coded at max category), a natural-ish gradient at q=8 (EOB-heavy,
    # the realistic shape), and constant blocks (DC-only, best case)
    from sample_keyspaces_cdc_streams_connectors_spark.llm.multimodal import (  # noqa: E402
        decode_jpeg_pixels,
        encode_jpeg_gray8,
    )

    jside = min(side - side % 8, 256)
    jmb = jside * jside / 1e6

    def _jpeg_line(
        tag: str, img, quant: int, exact: bool, progressive: bool = False
    ) -> None:
        payload = encode_jpeg_gray8(
            img, quant=quant, progressive=progressive
        )
        best = float("inf")
        out = None
        for _ in range(reps):
            t0 = time.time()
            out = decode_jpeg_pixels(payload)
            best = min(best, time.time() - t0)
        if exact:
            assert (out[:, :, 0] == img).all()
        else:
            assert (
                np.abs(out[:, :, 0].astype(int) - img.astype(int)).max()
                <= 8 * quant
            )
        print(f"{tag}:   {jmb / best:8.2f} MB/s  ({best * 1e3:.0f} ms)")

    _jpeg_line(
        "jpeg_random_q1",
        rng.integers(0, 256, size=(jside, jside), dtype=np.uint8),
        1,
        exact=False,
    )
    gy, gx = np.mgrid[0:jside, 0:jside]
    _jpeg_line(
        "jpeg_gradnt_q8",
        ((gx + gy) * 2 % 256).astype(np.uint8),
        8,
        exact=False,
    )
    # progressive (r12): same regimes through the multi-scan decoder
    _jpeg_line(
        "jpeg_prog_rnd1",
        rng.integers(0, 256, size=(jside, jside), dtype=np.uint8),
        1,
        exact=False,
        progressive=True,
    )
    _jpeg_line(
        "jpeg_prog_grd8",
        ((gx + gy) * 2 % 256).astype(np.uint8),
        8,
        exact=False,
        progressive=True,
    )
    nb = jside // 8
    const = np.repeat(
        np.repeat(
            (np.arange(nb * nb) % 256).astype(np.uint8).reshape(nb, nb),
            8,
            axis=0,
        ),
        8,
        axis=1,
    )
    _jpeg_line("jpeg_const_blk", const, 1, exact=True)


def _timed(fn, payload, px, gif: bool = False) -> float:
    t0 = time.time()
    out = fn(payload)
    dt = time.time() - t0
    ok = (out[:, :, 0] == px).all()
    assert ok, "decode mismatch"
    return dt


if __name__ == "__main__":
    main()
