"""REAL netpbm (PBM/PGM/PPM) codec (r13) — the sixth image format.

The netpbm family is the plainest public image format there is (the
pbmplus man pages / netpbm documentation): a two-token magic ``P1``
… ``P6``, whitespace-separated ASCII header tokens (width, height,
and — except for bitmaps — maxval) with ``#`` comments, then the
raster either in ASCII decimals (P1/P2/P3) or binary (P4 packed
bits MSB-first with byte-padded rows, P5/P6 one or two
big-endian bytes per sample as maxval demands).  Scientific and
academic corpora carry these; decode is trivially exact.

Decoded values are RAW stored samples (0..maxval; PBM bits are
0 = white, 1 = black, as stored) for maxval ≤ 255, presented on the
uint8 surface; deeper rasters (maxval 256..65535, 2-byte samples)
present as ``v·255 // maxval`` — the same top-bits convention as the
16-bit PNG/TIFF paths, exact integer arithmetic either way.

Malformed payloads (truncated raster, missing tokens, maxval out of
the spec's 1..65535, sample over maxval) raise ``ValueError`` —
never silently wrong pixels.
"""

from __future__ import annotations

__all__ = [
    "decode_pnm_pixels",
    "encode_pnm",
    "parse_pnm_header",
]

_VARIANTS = {
    b"P1": ("pbm", False),
    b"P2": ("pgm", False),
    b"P3": ("ppm", False),
    b"P4": ("pbm", True),
    b"P5": ("pgm", True),
    b"P6": ("ppm", True),
}


def _tokens(b: bytes, start: int, count: int):
    """Read ``count`` whitespace-separated ASCII integer tokens from
    ``start``, honoring ``#`` comments; returns (values, next_pos)
    where next_pos is one past the single whitespace byte that
    terminates the last token (the binary-raster convention)."""
    vals = []
    i = start
    n = len(b)
    while len(vals) < count:
        while i < n:
            c = b[i]
            if c == 0x23:  # '#': comment to end of line
                while i < n and b[i] not in (0x0A, 0x0D):
                    i += 1
            elif c in (0x20, 0x09, 0x0A, 0x0D, 0x0B, 0x0C):
                i += 1
            else:
                break
        j = i
        while j < n and 0x30 <= b[j] <= 0x39:
            j += 1
        if j == i:
            raise ValueError("malformed netpbm header token")
        vals.append(int(b[i:j]))
        i = j
    if i < n and b[i : i + 1].isspace():
        i += 1  # the single whitespace before a binary raster
    return vals, i


def parse_pnm_header(payload: bytes | None):
    """``(variant, width, height, maxval, raster_off, binary)`` —
    ``variant`` in pbm/pgm/ppm; bitmaps report maxval 1."""
    b = payload or b""
    v = _VARIANTS.get(b[:2])
    if v is None or (len(b) > 2 and not b[2:3].isspace() and b[2:3] != b"#"):
        raise ValueError("not a netpbm payload")
    variant, binary = v
    if variant == "pbm":
        (w, h), off = _tokens(b, 2, 2)
        maxval = 1
    else:
        (w, h, maxval), off = _tokens(b, 2, 3)
    if w < 1 or h < 1:
        raise ValueError("netpbm geometry must be positive")
    if not 1 <= maxval <= 65535:
        raise ValueError(f"netpbm maxval {maxval} outside 1..65535")
    return variant, w, h, maxval, off, binary


def decode_pnm_pixels(payload: bytes | None):
    """Decode any P1–P6 raster to a numpy array: ``(h, w)`` for
    PBM/PGM, ``(h, w, 3)`` for PPM, uint8 (see the module docstring
    for the value conventions)."""
    import numpy as np

    b = payload or b""
    variant, w, h, maxval, off, binary = parse_pnm_header(b)
    channels = 3 if variant == "ppm" else 1
    n_samples = w * h * channels
    if variant == "pbm":
        if binary:  # P4: packed bits, rows byte-padded
            stride = (w + 7) // 8
            need = stride * h
            if len(b) < off + need:
                raise ValueError("truncated netpbm raster")
            rows = np.frombuffer(
                b[off : off + need], np.uint8
            ).reshape(h, stride)
            bits = np.unpackbits(rows, axis=1)[:, :w]
            return bits.astype(np.uint8)
        # P1: ASCII bits — digits may be adjacent, whitespace optional
        vals = []
        i = off
        while i < len(b) and len(vals) < n_samples:
            c = b[i]
            if c == 0x23:
                while i < len(b) and b[i] not in (0x0A, 0x0D):
                    i += 1
            elif c in (0x30, 0x31):
                vals.append(c - 0x30)
                i += 1
            elif bytes([c]).isspace():
                i += 1
            else:
                raise ValueError("malformed P1 raster character")
        if len(vals) < n_samples:
            raise ValueError("truncated netpbm raster")
        return np.array(vals, np.uint8).reshape(h, w)
    if binary:  # P5 / P6
        wide = maxval > 255
        need = n_samples * (2 if wide else 1)
        if len(b) < off + need:
            raise ValueError("truncated netpbm raster")
        raw = np.frombuffer(b[off : off + need], np.uint8)
        samples = (
            (raw[0::2].astype(np.uint32) << 8) | raw[1::2]
            if wide
            else raw.astype(np.uint32)
        )
    else:  # P2 / P3: ASCII integers
        vals, _ = _tokens(b, off - 1, n_samples)
        samples = np.array(vals, np.uint32)
    if int(samples.max(initial=0)) > maxval:
        raise ValueError("netpbm sample exceeds maxval")
    if maxval > 255:
        samples = samples * 255 // maxval
    out = samples.astype(np.uint8)
    if channels == 3:
        return out.reshape(h, w, 3)
    return out.reshape(h, w)


def encode_pnm(pixels, variant: str, binary: bool = True,
               maxval: int = 255) -> bytes:
    """Fixture mirror: serialize an array as P1–P6.  PBM takes a 0/1
    array; PGM ``(h, w)``; PPM ``(h, w, 3)``.  ``maxval > 255``
    writes 2-byte big-endian samples (the array is then taken as raw
    sample values up to maxval)."""
    import numpy as np

    px = np.asarray(pixels)
    if variant == "pbm":
        if px.ndim != 2 or int(px.max(initial=0)) > 1:
            raise ValueError("PBM needs a (h, w) 0/1 array")
        h, w = px.shape
        if binary:
            header = b"P4\n%d %d\n" % (w, h)
            return header + np.packbits(
                px.astype(np.uint8), axis=1
            ).tobytes()
        body = b"\n".join(
            b" ".join(b"%d" % v for v in row) for row in px
        )
        return b"P1\n%d %d\n" % (w, h) + body + b"\n"
    if variant == "pgm":
        if px.ndim != 2:
            raise ValueError("PGM needs a (h, w) array")
        h, w = px.shape
        magic = b"P5" if binary else b"P2"
    elif variant == "ppm":
        if px.ndim != 3 or px.shape[2] != 3:
            raise ValueError("PPM needs a (h, w, 3) array")
        h, w = px.shape[:2]
        magic = b"P6" if binary else b"P3"
    else:
        raise ValueError(f"unknown netpbm variant {variant!r}")
    if int(px.max(initial=0)) > maxval:
        raise ValueError("sample exceeds maxval")
    header = b"%s\n# engine fixture\n%d %d\n%d\n" % (magic, w, h, maxval)
    flat = px.reshape(-1).astype(np.uint32)
    if binary:
        if maxval > 255:
            body = flat.astype(">u2").tobytes()
        else:
            body = flat.astype(np.uint8).tobytes()
        return header + body
    return header + b" ".join(b"%d" % v for v in flat) + b"\n"
