"""REAL MP3 FRAME WALK (r13) — everything about an MPEG audio file
that is pure arithmetic, stopping honestly before sample decode.

An MPEG audio elementary stream is a sequence of self-delimiting
frames whose lengths derive from four header fields (version, layer,
bitrate index, padding) through public formulas (ISO 11172-3 §2.4.3
/ ISO 13818-3): Layer I frames are ``(12·bitrate/rate + pad)·4``
bytes, Layer II/III ``144·bitrate/rate + pad`` (``72·`` for Layer
III in MPEG-2/2.5, whose granule halves).  Walking the whole file
therefore yields EXACT frame count, total PCM sample count, duration,
and CBR/VBR-ness — the corpus statistics (duration filters, bitrate
screens, torn-file detection) a training pipeline needs from the
dominant lossy audio format in crawls — all without touching the
entropy-coded payload.  The VBR headers real encoders write (the
Xing/Info tag, Fraunhofer's VBRI) are parsed too, so the CHEAP
header pass can report frame counts without a full walk.

SAMPLE decode stays the documented boundary: Layer III requantization
+ IMDCT + synthesis needs the literal Huffman code tables of ISO
11172-3 Table B.7 and the 512-tap synthesis window of Table B.3 —
tabulated spec data that cannot be re-derived from first principles
offline; guessed constants would decode valid files to confidently
wrong samples (see SCALE.md "MP3 Layer III: why it stays a
boundary").  Everything in this module, by contrast, is
length-arithmetic validated structurally: a wrong formula desyncs the
walk immediately and raises, never miscounts silently.

The fixture encoder writes genuine frame sequences (correct headers
and lengths, deterministic filler payload, optional ID3v2/ID3v1 tags
and a real Xing header) — the mirror every decoder in this repo has.
"""

from __future__ import annotations

import struct

__all__ = [
    "encode_mp3_stream",
    "mp3_frame_walk",
    "parse_mp3_vbr_tag",
]

# bitrate tables in kbps, index 1..14 (index 0 = free format,
# 15 = forbidden); MPEG-2.5 shares the MPEG-2 tables
_BITRATES = {
    (1, 1): (32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384,
             416, 448),
    (1, 2): (32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256,
             320, 384),
    (1, 3): (32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
             256, 320),
    (2, 1): (32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192,
             224, 256),
    (2, 2): (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144,
             160),
    (2, 3): (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144,
             160),
}
_RATES = {
    3: (44100, 48000, 32000),  # MPEG-1
    2: (22050, 24000, 16000),  # MPEG-2
    0: (11025, 12000, 8000),  # MPEG-2.5
}


def _header_fields(h: bytes):
    """Decode one 4-byte frame header; ``None`` when the bytes are not
    a syncword.  Reserved version/layer/rate codes raise.  FREE-FORMAT
    headers (bitrate index 0; r14) return ``kbps 0`` and ``frame_len
    None`` — the walk measures the constant frame length from the
    first two sync distances, per spec."""
    if len(h) < 4 or h[0] != 0xFF or (h[1] & 0xE0) != 0xE0:
        return None
    vbits = (h[1] >> 3) & 0x03
    if vbits == 1:
        raise ValueError("reserved MPEG version code")
    layer_bits = (h[1] >> 1) & 0x03
    if layer_bits == 0:
        raise ValueError("reserved MPEG layer code")
    layer = 4 - layer_bits
    br_idx = (h[2] >> 4) & 0x0F
    if br_idx == 15:
        raise ValueError("forbidden MPEG bitrate index")
    sr_idx = (h[2] >> 2) & 0x03
    if sr_idx == 3:
        raise ValueError("reserved MPEG sample-rate code")
    rate = _RATES[vbits][sr_idx]
    padding = (h[2] >> 1) & 0x01
    mode = (h[3] >> 6) & 0x03
    if layer == 1:
        spf = 384
    elif layer == 3 and vbits != 3:
        spf = 576
    else:
        spf = 1152
    if br_idx == 0:
        # FREE FORMAT (r14): the frame length is not in the header —
        # the spec derives it from the distance between the first two
        # sync words (frames are then constant-size modulo the
        # padding slot).  kbps 0 marks it; frame_len None tells the
        # walk to measure.
        kbps, frame_len = 0, None
    else:
        group = 1 if vbits == 3 else 2
        kbps = _BITRATES[(group, layer)][br_idx - 1]
        if layer == 1:
            frame_len = (12 * kbps * 1000 // rate + padding) * 4
        elif layer == 3 and vbits != 3:
            frame_len = 72 * kbps * 1000 // rate + padding
        else:
            frame_len = 144 * kbps * 1000 // rate + padding
    return {
        "vbits": vbits,
        "layer": layer,
        "kbps": kbps,
        "rate": rate,
        "frame_len": frame_len,
        "padding": padding,
        "spf": spf,
        "mono": mode == 3,
        "crc": not (h[1] & 0x01),
    }


def _id3v2_end(b: bytes) -> int:
    """Byte offset past a leading ID3v2 tag (0 when absent): the tag
    size is a 28-bit syncsafe integer at bytes 6-9.  An ID3v2.4
    footer (header flags bit 0x10) adds 10 trailing bytes NOT counted
    in the syncsafe size."""
    if b[:3] != b"ID3" or len(b) < 10:
        return 0
    size = (
        ((b[6] & 0x7F) << 21)
        | ((b[7] & 0x7F) << 14)
        | ((b[8] & 0x7F) << 7)
        | (b[9] & 0x7F)
    )
    return 10 + size + (10 if b[5] & 0x10 else 0)


def _side_info_len(hdr: dict) -> int:
    """Layer III side-info size: 17/32 bytes (MPEG-1 mono/stereo),
    9/17 (MPEG-2/2.5) — where the Xing tag sits."""
    if hdr["vbits"] == 3:
        return 17 if hdr["mono"] else 32
    return 9 if hdr["mono"] else 17


def parse_mp3_vbr_tag(b: bytes, frame_off: int, hdr: dict):
    """Frame count from the first frame's VBR header, or ``None``:
    the Xing/Info tag (after the Layer III side info) or Fraunhofer's
    VBRI (at a fixed 32-byte offset).  This is what makes the CHEAP
    header pass able to report duration without walking the file."""
    if hdr["layer"] == 3:
        p = frame_off + 4 + (2 if hdr["crc"] else 0) + _side_info_len(hdr)
        tag = b[p : p + 4]
        if tag in (b"Xing", b"Info") and len(b) >= p + 12:
            (flags,) = struct.unpack(">I", b[p + 4 : p + 8])
            if flags & 0x01:
                (frames,) = struct.unpack(">I", b[p + 8 : p + 12])
                return frames
    p = frame_off + 4 + 32
    if b[p : p + 4] == b"VBRI" and len(b) >= p + 18:
        (frames,) = struct.unpack(">I", b[p + 14 : p + 18])
        return frames
    return None


def mp3_frame_walk(payload: bytes | None):
    """Walk EVERY frame of an MPEG audio stream: returns
    ``(n_frames, n_samples, sample_rate, duration_ms, is_vbr)`` with
    ``n_samples`` the exact PCM frame count (MPEG frames × samples
    per frame) and ``duration_ms = n_samples·1000 // rate`` (integer
    floor — oracle-reproducible).  Skips a leading ID3v2 tag and a
    trailing ID3v1 ``TAG`` block; enforces constant version / layer /
    sample rate across frames (a change means a corrupt or
    concatenated stream) while letting bitrate and padding vary
    (that IS VBR); raises ``ValueError`` on sync loss or a torn final
    frame — never a silent short count."""
    b = payload or b""
    off = _id3v2_end(b)
    first = _header_fields(b[off : off + 4])
    if first is None:
        raise ValueError("not an MPEG audio stream (no frame sync)")
    end = len(b)
    if end - off >= 128 and b[end - 128 : end - 125] == b"TAG":
        end -= 128
    slot = 4 if first["layer"] == 1 else 1
    free_base = None
    if first["frame_len"] is None:
        # free format (r14): measure the first frame — scan for the
        # next sync word whose header matches this stream's
        # version/layer/rate; the distance, minus the first frame's
        # padding slot, is the stream's constant base length (ISO
        # 11172-3 §2.4.2.3: free-format streams are fixed-bitrate)
        scan = off + 4
        while True:
            if scan + 4 > end:
                raise ValueError(
                    "free-format MPEG stream without a second frame "
                    "sync (frame length unmeasurable)"
                )
            if b[scan] == 0xFF and (b[scan + 1] & 0xE0) == 0xE0:
                try:
                    cand = _header_fields(b[scan : scan + 4])
                except ValueError:
                    cand = None
                if cand is not None and (
                    cand["vbits"],
                    cand["layer"],
                    cand["rate"],
                ) == (first["vbits"], first["layer"], first["rate"]):
                    break
            scan += 1
        free_base = (scan - off) - first["padding"] * slot
        if free_base < 4:
            raise ValueError("free-format MPEG frame impossibly short")
    n = 0
    pos = off
    kbps_seen = set()
    while pos < end:
        hdr = _header_fields(b[pos : pos + 4])
        if hdr is None:
            raise ValueError(f"MPEG frame sync lost at byte {pos}")
        if (hdr["vbits"], hdr["layer"], hdr["rate"]) != (
            first["vbits"],
            first["layer"],
            first["rate"],
        ):
            raise ValueError(
                "MPEG frame parameters change mid-stream "
                "(corrupt or concatenated file)"
            )
        if (hdr["frame_len"] is None) != (free_base is not None):
            raise ValueError(
                "MPEG stream mixes free-format and indexed bitrates"
            )
        frame_len = (
            free_base + hdr["padding"] * slot
            if free_base is not None
            else hdr["frame_len"]
        )
        if pos + frame_len > end:
            raise ValueError("torn final MPEG frame")
        kbps_seen.add(hdr["kbps"])
        n += 1
        pos += frame_len
    samples = n * first["spf"]
    return (
        n,
        samples,
        first["rate"],
        samples * 1000 // first["rate"],
        len(kbps_seen) > 1,
    )


def encode_mp3_stream(
    frame_kbps,
    version: int = 1,
    layer: int = 3,
    rate_idx: int = 0,
    mono: bool = False,
    pad_every: int = 0,
    xing: bool = False,
    id3v2_pad: int = 0,
    id3v1: bool = False,
    free_format_len: int | None = None,
) -> bytes:
    """Build a REAL MPEG audio frame sequence: one frame per entry of
    ``frame_kbps`` (each a legal bitrate for the version/layer), with
    correct headers and exact frame lengths, deterministic filler
    payload, optional padding bits every ``pad_every``-th frame,
    optional leading ID3v2 / trailing ID3v1 tags, and — with
    ``xing`` — a genuine Xing VBR header in the first frame carrying
    the TOTAL frame count.  The fixture mirror of
    :func:`mp3_frame_walk`: every length the walker checks, this
    encoder computes from the same public formulas (and the tests
    pin both against hand-computed frame sizes)."""
    vbits = {1: 3, 2: 2}.get(version)
    if vbits is None:
        raise ValueError("version must be 1 or 2")
    group = 1 if version == 1 else 2
    table = _BITRATES[(group, layer)]
    layer_bits = 4 - layer
    out = bytearray()
    if id3v2_pad:
        size = id3v2_pad
        out += b"ID3\x04\x00\x00" + bytes(
            [
                (size >> 21) & 0x7F,
                (size >> 14) & 0x7F,
                (size >> 7) & 0x7F,
                size & 0x7F,
            ]
        )
        out += bytes(size)
    frames = list(frame_kbps)
    if xing:
        frames = [frames[0]] + frames
    for k, kbps in enumerate(frames):
        # r14: a 0 entry writes a FREE-FORMAT frame (bitrate index 0)
        # whose length is ``free_format_len`` — the walker measures it
        # from the first two sync distances
        br_idx = 0 if kbps == 0 else table.index(kbps) + 1
        padding = 1 if (pad_every and k % pad_every == pad_every - 1) else 0
        h = bytes(
            [
                0xFF,
                0xE0 | (vbits << 3) | (layer_bits << 1) | 0x01,
                (br_idx << 4) | (rate_idx << 2) | (padding << 1),
                (0x03 if mono else 0x00) << 6,
            ]
        )
        hdr = _header_fields(h)
        if hdr["frame_len"] is None:
            if not free_format_len or free_format_len < 4:
                raise ValueError(
                    "free-format frames need free_format_len >= 4"
                )
            slot = 4 if layer == 1 else 1
            frame_len = free_format_len + padding * slot
        else:
            frame_len = hdr["frame_len"]
        body = bytearray(frame_len - 4)
        for i in range(len(body)):
            body[i] = (k * 37 + i * 11) % 251  # never 0xFF runs
        if xing and k == 0:
            p = _side_info_len(hdr)
            body[0:p] = bytes(p)
            body[p : p + 12] = (
                b"Xing" + struct.pack(">II", 0x01, len(frames))
            )
        out += h + bytes(body)
    if id3v1:
        out += b"TAG" + bytes(125)
    return bytes(out)
