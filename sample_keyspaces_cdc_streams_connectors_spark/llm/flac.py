"""REAL stdlib FLAC decode (r12) — audio's progressive-JPEG moment.

FLAC is the dominant LOSSLESS audio codec in speech/music corpora and
its format is fully public (RFC 9639 / the xiph FLAC specification).
Unlike MP3/OGG there is no psychoacoustic model: frames are linear
predictions (constant / verbatim / fixed-order polynomial / quantized
LPC) over rice-coded residuals — all integer arithmetic, so decode is
EXACT and a lossless round trip through the fixture encoder below is
bit-identical.  This closes the "compressed audio is metadata-only"
boundary for one major format; MP3/OGG/Opus (entropy-coded, lossy)
remain the documented boundary.

Decoder coverage: every subframe type (CONSTANT, VERBATIM, FIXED
orders 0-4, LPC any order), both residual coding methods (RICE 4-bit
and RICE2 5-bit parameters) including the escape-to-verbatim
partition, all four channel assignments (independent, left/side,
right/side, mid/side — side channels carry bps+1 bits per the spec),
arbitrary partition orders, wasted-bits shifts, and both header CRC-8
and frame CRC-16 validation (a corrupt frame raises ValueError, never
silent samples).  8/12/16-bit sample sizes map to the engine's int16
convention (8-bit scales ×256, 12-bit ×16, like the WAV path);
20/24/32-bit (r13 — 24-bit is the standard studio/speech-corpus
depth) return RAW int32 samples, no rescale, so the lossless round
trip stays bit-exact at every depth.  A STREAMINFO total_samples of 0
means UNKNOWN length per the spec (streaming encoders emit it), so
decode runs to end-of-payload instead of returning silence.

Scale posture: identical to the image codecs — a per-item interpreted
kernel inside ``mapInPandas`` (payloads never shuffle, never reach the
driver), with the measured MB/s recorded in SCALE.md and the r12
fast-decoder seam (``decoder=`` on the audio stages) as the
production path.  The fixture encoder exists so tests and the oracle
gate can PLANT waveforms: it rotates subframe types and channel
assignments deterministically, so one planted clip exercises the
whole decode matrix.

Reference tie-in: the reference ships media bytes opaquely
(AbstractAvroConverter.java:100-134 treats payloads as bytes); a
training-data engine has to see inside them.
"""

from __future__ import annotations

import struct

__all__ = [
    "decode_flac_samples",
    "encode_flac_pcm",
    "encode_flac_pcm16",
    "parse_flac_streaminfo",
]


# --- CRCs (FLAC spec: CRC-8 poly 0x07, CRC-16 poly 0x8005, init 0) ----------


def _crc_table(poly: int, width: int) -> list[int]:
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    table = []
    for byte in range(256):
        crc = byte << (width - 8)
        for _ in range(8):
            crc = ((crc << 1) ^ poly) if crc & top else (crc << 1)
        table.append(crc & mask)
    return table


_CRC8_TABLE = _crc_table(0x07, 8)
_CRC16_TABLE = _crc_table(0x8005, 16)


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = _CRC8_TABLE[crc ^ b]
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = _CRC16_TABLE[((crc >> 8) ^ b) & 0xFF] ^ ((crc << 8) & 0xFFFF)
    return crc


# --- bit I/O -----------------------------------------------------------------


class _BitReader:
    """MSB-first bit reader with byte-position access (CRC spans and
    frame boundaries are byte-aligned in FLAC)."""

    __slots__ = ("data", "pos", "acc", "nb")

    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos  # next byte to load
        self.acc = 0
        self.nb = 0

    def bits(self, n: int) -> int:
        while self.nb < n:
            if self.pos >= len(self.data):
                raise ValueError("FLAC bitstream truncated")
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.nb += 8
        self.nb -= n
        v = (self.acc >> self.nb) & ((1 << n) - 1)
        self.acc &= (1 << self.nb) - 1
        return v

    def sbits(self, n: int) -> int:
        v = self.bits(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def unary(self) -> int:
        q = 0
        while self.bits(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        self.nb -= self.nb % 8
        # drop any partial byte (callers align only at frame ends)
        self.acc &= (1 << self.nb) - 1

    def byte_pos(self) -> int:
        return self.pos - self.nb // 8


class _BitWriter:
    __slots__ = ("out", "acc", "nb")

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nb = 0

    def write(self, v: int, n: int) -> None:
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.nb += n
        while self.nb >= 8:
            self.nb -= 8
            self.out.append((self.acc >> self.nb) & 0xFF)
        self.acc &= (1 << self.nb) - 1

    def unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def pad_to_byte(self) -> None:
        if self.nb:
            self.write(0, 8 - self.nb)


# --- frame-header numbers -----------------------------------------------------

_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

_BLOCKSIZE_CODES = {1: 192}
for _i in range(2, 6):
    _BLOCKSIZE_CODES[_i] = 576 << (_i - 2)
for _i in range(8, 16):
    _BLOCKSIZE_CODES[_i] = 256 << (_i - 8)

_SAMPLE_SIZE_CODES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _utf8_number(rd: _BitReader) -> int:
    """The spec's UTF-8-style extended coded number (frame index)."""
    b0 = rd.bits(8)
    if b0 < 0x80:
        return b0
    n = 0
    probe = b0
    while probe & 0x40:
        n += 1
        probe <<= 1
    if n < 1 or n > 6:
        raise ValueError("invalid FLAC coded number")
    v = b0 & (0x3F >> n)
    for _ in range(n):
        c = rd.bits(8)
        if (c & 0xC0) != 0x80:
            raise ValueError("invalid FLAC coded-number continuation")
        v = (v << 6) | (c & 0x3F)
    return v


def _encode_utf8_number(wr: _BitWriter, v: int) -> None:
    if v < 0x80:
        wr.write(v, 8)
        return
    n = 1  # continuation bytes; lead carries 6-n payload bits
    while v >= (1 << (5 * n + 6)):
        n += 1
    lead = (0xFE << (6 - n)) & 0xFF
    wr.write(lead | (v >> (6 * n)), 8)
    for i in range(n - 1, -1, -1):
        wr.write(0x80 | ((v >> (6 * i)) & 0x3F), 8)


def parse_flac_streaminfo(b: bytes):
    """(min_bs, max_bs, rate, channels, bits, total_samples, frames_off)
    — the mandatory first metadata block, plus the byte offset where
    audio frames start (after the last metadata block)."""
    if b[:4] != b"fLaC":
        raise ValueError("not a FLAC payload")
    if len(b) < 8 or (b[4] & 0x7F) != 0:
        raise ValueError("FLAC without a leading STREAMINFO block")
    (blen,) = struct.unpack(">I", b"\x00" + b[5:8])
    if blen < 34 or len(b) < 8 + blen:
        raise ValueError("truncated FLAC STREAMINFO")
    info = int.from_bytes(b[8 : 8 + 34], "big")
    md5_stripped = info >> 128
    total = md5_stripped & ((1 << 36) - 1)
    bits = ((md5_stripped >> 36) & 0x1F) + 1
    chans = ((md5_stripped >> 41) & 0x07) + 1
    rate = (md5_stripped >> 44) & ((1 << 20) - 1)
    max_bs = (info >> (128 + 36 + 5 + 3 + 20 + 48)) & 0xFFFF
    min_bs = (info >> (128 + 36 + 5 + 3 + 20 + 48 + 16)) & 0xFFFF
    # walk the remaining metadata blocks to the audio frames
    pos = 4
    while True:
        if pos + 4 > len(b):
            raise ValueError("truncated FLAC metadata")
        last = b[pos] & 0x80
        (length,) = struct.unpack(">I", b"\x00" + b[pos + 1 : pos + 4])
        pos += 4 + length
        if last:
            break
    return (min_bs, max_bs, rate, chans, bits, total, pos)


def _decode_residual(rd: _BitReader, blocksize: int, order: int):
    """Rice-coded residual partitions (both coding methods + the
    escape-to-verbatim partition)."""
    method = rd.bits(2)
    if method > 1:
        raise ValueError("reserved FLAC residual coding method")
    plen = 5 if method else 4
    escape = (1 << plen) - 1
    porder = rd.bits(4)
    nparts = 1 << porder
    if blocksize % nparts:
        raise ValueError("invalid FLAC partition order")
    out = []
    for p in range(nparts):
        n = (blocksize >> porder) - (order if p == 0 else 0)
        if n < 0:
            raise ValueError("invalid FLAC partition order")
        param = rd.bits(plen)
        if param == escape:
            raw = rd.bits(5)
            if raw:
                out.extend(rd.sbits(raw) for _ in range(n))
            else:
                out.extend(0 for _ in range(n))
        else:
            for _ in range(n):
                q = rd.unary()
                u = (q << param) | rd.bits(param)
                out.append((u >> 1) ^ -(u & 1))
    return out


def _decode_subframe(rd: _BitReader, blocksize: int, bps: int):
    if rd.bits(1):
        raise ValueError("invalid FLAC subframe padding bit")
    ftype = rd.bits(6)
    wasted = 0
    if rd.bits(1):
        wasted = rd.unary() + 1
        bps -= wasted
    if ftype == 0:  # CONSTANT
        s = [rd.sbits(bps)] * blocksize
    elif ftype == 1:  # VERBATIM
        s = [rd.sbits(bps) for _ in range(blocksize)]
    elif 8 <= ftype <= 12:  # FIXED, order 0-4
        order = ftype - 8
        s = [rd.sbits(bps) for _ in range(order)]
        res = _decode_residual(rd, blocksize, order)
        coefs = _FIXED_COEFS[order]
        for r in res:
            pred = sum(c * s[-1 - j] for j, c in enumerate(coefs))
            s.append(pred + r)
    elif ftype >= 32:  # LPC, order 1-32
        order = (ftype & 0x1F) + 1
        s = [rd.sbits(bps) for _ in range(order)]
        prec = rd.bits(4) + 1
        if prec == 16:
            raise ValueError("invalid FLAC LPC precision")
        shift = rd.sbits(5)
        if shift < 0:
            raise ValueError("negative FLAC LPC shift")
        coefs = [rd.sbits(prec) for _ in range(order)]
        res = _decode_residual(rd, blocksize, order)
        for r in res:
            acc = sum(c * s[-1 - j] for j, c in enumerate(coefs))
            s.append((acc >> shift) + r)
    else:
        raise ValueError(f"reserved FLAC subframe type {ftype}")
    if wasted:
        s = [v << wasted for v in s]
    return s


def decode_flac_samples(payload: bytes | None):
    """REAL FLAC sample decode: ``(n_frames, n_channels)`` numpy
    array — int16 for 8/12/16-bit sources (8-bit widens ×256, 12-bit
    ×16), int32 RAW for 20/24/32-bit (r13; no rescale, so
    decode(encode(s)) == s bit-exactly at every depth).  A STREAMINFO
    ``total_samples`` of 0 means UNKNOWN (RFC 9639) — frames decode to
    end-of-payload.  Validates header CRC-8 and frame CRC-16 — raises
    ``ValueError`` on any malformed/corrupt structure, never wrong
    samples."""
    import numpy as np

    b = payload or b""
    (_minbs, _maxbs, _rate, chans, bits, total, pos) = (
        parse_flac_streaminfo(b)
    )
    if bits not in (8, 12, 16, 20, 24, 32):
        raise NotImplementedError(
            f"FLAC bit depth {bits} unsupported"
        )
    # total_samples == 0 is the spec's UNKNOWN marker (streaming
    # encoders that can't seek back); decode to end-of-payload then —
    # returning an empty array would be silent wrong samples.
    unknown = total == 0
    channels = [[] for _ in range(chans)]
    got = 0
    while (pos < len(b)) if unknown else (got < total):
        if pos >= len(b):
            raise ValueError("FLAC stream ends before total samples")
        frame_start = pos
        rd = _BitReader(b, pos)
        sync = rd.bits(14)
        if sync != 0x3FFE:
            raise ValueError("FLAC frame sync lost")
        if rd.bits(1):
            raise ValueError("invalid FLAC frame reserved bit")
        _blocking = rd.bits(1)
        bs_code = rd.bits(4)
        sr_code = rd.bits(4)
        ch_code = rd.bits(4)
        ss_code = rd.bits(3)
        if rd.bits(1):
            raise ValueError("invalid FLAC frame reserved bit 2")
        _fnum = _utf8_number(rd)
        if bs_code == 0:
            raise ValueError("reserved FLAC block size code")
        elif bs_code == 6:
            blocksize = rd.bits(8) + 1
        elif bs_code == 7:
            blocksize = rd.bits(16) + 1
        else:
            blocksize = _BLOCKSIZE_CODES[bs_code]
        if sr_code == 12:
            rd.bits(8)
        elif sr_code in (13, 14):
            rd.bits(16)
        elif sr_code == 15:
            raise ValueError("invalid FLAC sample rate code")
        if ss_code == 0:
            bps = bits
        else:
            bps = _SAMPLE_SIZE_CODES.get(ss_code)
            if bps is None:
                raise ValueError("reserved FLAC sample size code")
        header_end = rd.byte_pos()
        if rd.nb:
            raise ValueError("FLAC frame header not byte-aligned")
        crc8 = rd.bits(8)
        if _crc8(b[frame_start:header_end]) != crc8:
            raise ValueError("FLAC frame header CRC-8 mismatch")
        if ch_code <= 7:
            n_sub = ch_code + 1
            sides = [0] * n_sub
        elif ch_code in (8, 9, 10):
            n_sub = 2
            # which subframe carries the side channel (bps+1 bits)
            sides = [0, 1] if ch_code in (8, 10) else [1, 0]
        else:
            raise ValueError("reserved FLAC channel assignment")
        if n_sub != chans:
            raise ValueError(
                "FLAC frame channel count differs from STREAMINFO"
            )
        subs = []
        for c in range(n_sub):
            subs.append(
                _decode_subframe(rd, blocksize, bps + sides[c])
            )
        rd.align()
        data_end = rd.byte_pos()
        crc16 = rd.bits(16)
        if _crc16(b[frame_start:data_end]) != crc16:
            raise ValueError("FLAC frame CRC-16 mismatch")
        pos = rd.byte_pos()
        # undo inter-channel decorrelation
        if ch_code == 8:  # left/side
            left, side = subs
            subs = [left, [l - s for l, s in zip(left, side)]]
        elif ch_code == 9:  # right/side (side first)
            side, right = subs
            subs = [[r + s for r, s in zip(right, side)], right]
        elif ch_code == 10:  # mid/side
            mid, side = subs
            left = []
            right = []
            for m, s in zip(mid, side):
                m2 = (m << 1) | (s & 1)
                left.append((m2 + s) >> 1)
                right.append((m2 - s) >> 1)
            subs = [left, right]
        take = blocksize if unknown else min(blocksize, total - got)
        for c in range(chans):
            channels[c].extend(subs[c][:take])
        got += take
    arr = np.array(channels, dtype=np.int64).T  # (n, ch)
    if arr.size == 0:
        arr = arr.reshape(0, chans)
    if bits > 16:
        lo, hi = -(1 << (bits - 1)), (1 << (bits - 1)) - 1
        if arr.size and (arr.max() > hi or arr.min() < lo):
            raise ValueError(f"FLAC samples out of {bits}-bit range")
        return arr.astype(np.int32)
    if bits == 8:
        arr = arr * 256
    elif bits == 12:
        arr = arr * 16
    if arr.size and (arr.max() > 32767 or arr.min() < -32768):
        raise ValueError("FLAC samples out of 16-bit range")
    return arr.astype(np.int16)


# --- fixture encoder ----------------------------------------------------------


def _best_rice_param(res, plen: int) -> int:
    if not res:
        return 0
    mean = sum(abs(r) for r in res) / len(res) + 1
    p = max(0, int(mean).bit_length() - 1)
    return min(p, (1 << plen) - 2)


def _encode_residual(
    wr: _BitWriter,
    res,
    blocksize: int,
    order: int,
    porder: int,
    plen: int,
    escape_first: bool,
) -> None:
    """Partition layout per spec: 2^porder partitions of
    blocksize/2^porder sample slots each, the FIRST short by the
    predictor order (its warmup samples were coded verbatim).  Depth
    robustness (r13): when the 4-bit method's parameter cap (14)
    would leave huge unary runs for wide residuals (>16-bit sources)
    the method upgrades to RICE2 (5-bit, cap 30), and the escape
    partition falls back to rice when a residual needs more than the
    5-bit raw field's 31 bits — never a truncated sample."""
    ideal = _best_rice_param(res, 5)
    if plen == 4 and ideal > (1 << 4) - 2:
        plen = 5
    wr.write(0 if plen == 4 else 1, 2)
    wr.write(porder, 4)
    nparts = 1 << porder
    per = blocksize >> porder
    escape_code = (1 << plen) - 1
    start = 0
    for p in range(nparts):
        n = per - (order if p == 0 else 0)
        part = res[start : start + n]
        start += n
        raw = min(
            max((abs(v).bit_length() + 1 for v in part), default=1), 31
        )
        if (
            escape_first
            and p == 0
            and all(-(1 << (raw - 1)) <= v < (1 << (raw - 1)) for v in part)
        ):
            wr.write(escape_code, plen)
            wr.write(raw, 5)
            for v in part:
                wr.write(v & ((1 << raw) - 1), raw)
            continue
        param = _best_rice_param(part, plen)
        wr.write(param, plen)
        for v in part:
            u = (v << 1) if v >= 0 else ((-v) << 1) - 1
            wr.unary(u >> param)
            wr.write(u & ((1 << param) - 1), param)


_SAMPLE_SIZE_TO_CODE = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}


def encode_flac_pcm16(samples, sample_rate: int, blocksize: int = 1152):
    """16-bit entry point kept for the existing fixtures; see
    :func:`encode_flac_pcm`."""
    return encode_flac_pcm(samples, sample_rate, bits=16, blocksize=blocksize)


def encode_flac_pcm(
    samples,
    sample_rate: int,
    bits: int = 16,
    blocksize: int = 1152,
    mark_total_unknown: bool = False,
):
    """Minimal REAL FLAC encoder for integer PCM at any supported
    depth (8/12/16/20/24/32 — r13 adds >16-bit on an int32 surface) —
    the fixture mirror of :func:`decode_flac_samples` (same role the
    JPEG/PNG/GIF/WAV encoders play): rotates subframe types (VERBATIM
    → FIXED orders 1/2/3 → LPC order 2, CONSTANT when a channel is
    constant; the FIXED-order-2 frames force an escape partition) and,
    for stereo, channel assignments (independent → mid/side →
    left/side → right/side) per frame, so ONE planted clip walks the
    whole decode matrix.  Lossless: decode(encode(s)) == s bit-exactly
    at every depth.  ``mark_total_unknown`` writes STREAMINFO
    total_samples = 0 (the spec's UNKNOWN marker) so tests can pin the
    decoder's run-to-end-of-payload path."""
    import numpy as np

    if bits not in _SAMPLE_SIZE_TO_CODE:
        raise ValueError(f"FLAC bit depth must be 8/12/16/20/24/32, got {bits}")
    s = np.asarray(samples, dtype=np.int64)
    if s.ndim == 1:
        s = s[:, None]
    lo, hi = -(1 << (bits - 1)), (1 << (bits - 1)) - 1
    if s.size and (s.max() > hi or s.min() < lo):
        raise ValueError(f"samples out of {bits}-bit signed range")
    n, ch = s.shape
    if not 1 <= ch <= 8:
        raise ValueError(f"FLAC channels must be 1..8, got {ch}")
    info = 0
    info = (info << 16) | min(blocksize, n or 1)
    info = (info << 16) | min(blocksize, n or 1)
    info = (info << 24) | 0
    info = (info << 24) | 0
    info = (info << 20) | sample_rate
    info = (info << 3) | (ch - 1)
    info = (info << 5) | (bits - 1)
    info = (info << 36) | (0 if mark_total_unknown else n)
    info <<= 128  # md5 unset (optional integrity field)
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + (34).to_bytes(3, "big") + info.to_bytes(34, "big")

    def subframe(wr: _BitWriter, x, bps: int, kind: int) -> None:
        vals = [int(v) for v in x]
        bs = len(vals)
        if all(v == vals[0] for v in vals):
            wr.write(0, 1)
            wr.write(0, 6)  # CONSTANT
            wr.write(0, 1)
            wr.write(vals[0] & ((1 << bps) - 1), bps)
            return
        if kind in (1, 2, 3) and kind >= bs:
            kind = 0  # block too short for the predictor warmup
        if kind == 4 and bs < 3:
            kind = 0
        # wasted-bits: when every sample in the block shares a
        # power-of-2 factor the spec codes the shift once and the
        # subframe at reduced bps — emit it whenever present so the
        # decoder's wasted-bits path is under every fixture
        wasted = 0
        if any(vals):
            while wasted < bps - 1 and all(
                (v >> wasted) & 1 == 0 for v in vals
            ):
                wasted += 1
        if kind == 0:  # VERBATIM
            wr.write(0, 1)
            wr.write(1, 6)
            if wasted:
                wr.write(1, 1)
                wr.unary(wasted - 1)
                vals = [v >> wasted for v in vals]
                bps -= wasted
            else:
                wr.write(0, 1)
            for v in vals:
                wr.write(v & ((1 << bps) - 1), bps)
            return
        if kind in (1, 2, 3):  # FIXED order 1/2/3
            order = kind
            coefs = _FIXED_COEFS[order]
            wr.write(0, 1)
            wr.write(8 + order, 6)
            wr.write(0, 1)
            for v in vals[:order]:
                wr.write(v & ((1 << bps) - 1), bps)
            res = [
                vals[i]
                - sum(c * vals[i - 1 - j] for j, c in enumerate(coefs))
                for i in range(order, bs)
            ]
            porder = 1 if bs % 2 == 0 and bs // 2 > order else 0
            _encode_residual(
                wr, res, bs, order, porder, plen=4,
                escape_first=(kind == 2),
            )
            return
        # LPC order 2, coefficients [3, -1] at shift 1 (predicts
        # 1.5·s1 − 0.5·s2 — stable, integer-exact via the residual)
        order = 2
        coefs = [3, -1]
        shift = 1
        prec = 4
        wr.write(0, 1)
        wr.write(32 | (order - 1), 6)
        wr.write(0, 1)
        for v in vals[:order]:
            wr.write(v & ((1 << bps) - 1), bps)
        wr.write(prec - 1, 4)
        wr.write(shift, 5)
        for c in coefs:
            wr.write(c & ((1 << prec) - 1), prec)
        res = [
            vals[i]
            - (
                sum(c * vals[i - 1 - j] for j, c in enumerate(coefs))
                >> shift
            )
            for i in range(order, bs)
        ]
        _encode_residual(wr, res, bs, order, 0, plen=5, escape_first=False)

    fidx = 0
    start = 0
    while start < n or (n == 0 and fidx == 0):
        bs = min(blocksize, n - start)
        if bs <= 0:
            break
        block = s[start : start + bs]
        wr = _BitWriter()
        wr.write(0x3FFE, 14)
        wr.write(0, 1)
        wr.write(0, 1)  # fixed blocksize strategy
        wr.write(7, 4)  # blocksize: 16-bit at header end
        wr.write(0, 4)  # sample rate: from STREAMINFO
        assign = 0
        kinds = fidx % 5
        if ch == 2 and bs >= 2:
            assign = (0, 10, 8, 9)[fidx % 4]
        wr.write((ch - 1) if assign == 0 else assign, 4)
        wr.write(_SAMPLE_SIZE_TO_CODE[bits], 3)
        wr.write(0, 1)
        _encode_utf8_number(wr, fidx)
        wr.write(bs - 1, 16)
        wr.pad_to_byte()
        header = bytes(wr.out)
        body = _BitWriter()
        if assign == 0:
            for c in range(ch):
                subframe(body, block[:, c], bits, kinds)
        else:
            left = [int(v) for v in block[:, 0]]
            right = [int(v) for v in block[:, 1]]
            side = [l - r for l, r in zip(left, right)]
            if assign == 10:
                mid = [(l + r) >> 1 for l, r in zip(left, right)]
                subframe(body, mid, bits, kinds)
                subframe(body, side, bits + 1, kinds)
            elif assign == 8:
                subframe(body, left, bits, kinds)
                subframe(body, side, bits + 1, kinds)
            else:
                subframe(body, side, bits + 1, kinds)
                subframe(body, right, bits, kinds)
        body.pad_to_byte()
        frame = header + bytes([_crc8(header)]) + bytes(body.out)
        crc16 = _crc16(frame)
        out += frame + struct.pack(">H", crc16)
        start += bs
        fidx += 1
    return bytes(out)
