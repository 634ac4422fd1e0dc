"""REAL stdlib ADPCM WAV decode (r13) — the lossy speech-corpus codec
class that is still EXACTLY verifiable.

Unlike MP3/Vorbis (whose decode chains hinge on large tabulated spec
data — 34 Huffman code tables, a 512-tap synthesis window — that
cannot be responsibly reproduced without the tables themselves), both
ADPCM families are pure integer difference coders with tiny, public,
widely-cross-checked state machines:

- **IMA / DVI ADPCM** (WAVE format 0x11): 4-bit nibbles against an
  89-entry step-size table (the IMA "Recommended Practices for
  Enhancing Digital Audio Compatibility" table, reproduced in RFC
  3551 §4.5.1's DVI4 description and in every open codec) with a
  3-bit magnitude accumulation — all shifts and adds.
- **Microsoft ADPCM** (WAVE format 0x02): a second-order linear
  predictor whose COEFFICIENTS ARE CARRIED IN THE FILE'S OWN fmt
  chunk (wNumCoef + aCoef pairs), so the decoder needs no external
  table at all; only the 16-entry delta-adaptation table is fixed by
  the spec.

Both decoders are exact integer arithmetic — decode is bit-
reproducible, so tests pin the decoded samples against an
independent straight-from-the-pseudocode reference, and the fixture
encoders below make round-trip error bounds measurable (ADPCM is
lossy: ~SNR 30 dB at 4:1 compression, asserted as a bound, not a
hash).

Scale posture: identical to the other codecs — per-item interpreted
kernels inside ``mapInPandas`` (payloads never shuffle, never reach
the driver), with the ``decoder=`` fast seam as the production path.

Reference tie-in: the reference ships media bytes opaquely
(AbstractAvroConverter.java:100-134); a training-data engine has to
see inside them — telephony/speech corpora carry exactly these WAVs.
"""

from __future__ import annotations

import struct

__all__ = [
    "decode_ima_adpcm_wav",
    "decode_ms_adpcm_wav",
    "encode_ima_adpcm_wav",
    "encode_ms_adpcm_wav",
]

# IMA step-size table (89 entries) and index-adjust table — the two
# constants the IMA ADPCM state machine is defined by.
_IMA_STEPS = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767,
]
_IMA_INDEX_ADJUST = [-1, -1, -1, -1, 2, 4, 6, 8]

# MS ADPCM delta-adaptation table (16 entries, spec-fixed) and the
# seven STANDARD predictor coefficient pairs (scaled by 256) — the
# encoder writes these into the fmt chunk; the decoder always reads
# the pairs back from the file, never from here.
_MS_ADAPT = [
    230, 230, 230, 230, 307, 409, 512, 614,
    768, 614, 512, 409, 307, 230, 230, 230,
]
_MS_COEFS = [
    (256, 0), (512, -256), (0, 0), (192, 64),
    (240, 0), (460, -208), (392, -232),
]


def _clamp16(v: int) -> int:
    return -32768 if v < -32768 else (32767 if v > 32767 else v)


def _ima_decode_nibble(n: int, pred: int, index: int):
    """One IMA ADPCM step: returns (sample, new_index).  The
    shift-add magnitude accumulation is the spec's own formulation
    (diff = step·(m/4 + 1/8) built from the three magnitude bits)."""
    step = _IMA_STEPS[index]
    diff = step >> 3
    if n & 1:
        diff += step >> 2
    if n & 2:
        diff += step >> 1
    if n & 4:
        diff += step
    pred = _clamp16(pred - diff if n & 8 else pred + diff)
    index = index + _IMA_INDEX_ADJUST[n & 7]
    index = 0 if index < 0 else (88 if index > 88 else index)
    return pred, index


def _ima_encode_sample(sample: int, pred: int, index: int):
    """Quantize one sample against the current predictor state:
    returns (nibble, new_pred, new_index) with the update run through
    the DECODER step, so encoder and decoder states stay locked."""
    step = _IMA_STEPS[index]
    delta = sample - pred
    n = 0
    if delta < 0:
        n = 8
        delta = -delta
    if delta >= step:
        n |= 4
        delta -= step
    if delta >= step >> 1:
        n |= 2
        delta -= step >> 1
    if delta >= step >> 2:
        n |= 1
    pred, index = _ima_decode_nibble(n, pred, index)
    return n, pred, index


def _wav_chunks(b: bytes):
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    i = 12
    while i + 8 <= len(b):
        tag = b[i : i + 4]
        (clen,) = struct.unpack("<I", b[i + 4 : i + 8])
        body = b[i + 8 : i + 8 + clen]
        if len(body) < clen:
            raise ValueError("truncated WAV chunk")
        yield tag, body
        i += 8 + clen + (clen & 1)


def _wav_fmt_data(b: bytes):
    fmt_body = data = fact = None
    for tag, body in _wav_chunks(b):
        if tag == b"fmt ":
            fmt_body = body
        elif tag == b"data":
            data = body
        elif tag == b"fact" and len(body) >= 4:
            (fact,) = struct.unpack("<I", body[:4])
    if fmt_body is None or len(fmt_body) < 16:
        raise ValueError("WAV without a fmt chunk")
    if data is None:
        raise ValueError("WAV without a data chunk")
    return fmt_body, data, fact


def decode_ima_adpcm_wav(payload: bytes | None):
    """Decode a WAVE-format-0x11 (IMA/DVI ADPCM) file to an
    ``(n_frames, n_channels)`` int16 numpy array.  Walks the block
    structure for real: per-block per-channel 4-byte state headers
    (predictor int16 — which IS the block's first output sample —
    step index, reserved), then channel-interleaved 4-byte nibble
    words (low nibble first, 8 samples per word per channel).  A
    ``fact`` chunk bounds the decoded frame count (the final block is
    usually partial); structural inconsistencies raise ``ValueError``
    — never silent wrong samples."""
    import numpy as np

    b = payload or b""
    fmt_body, data, fact = _wav_fmt_data(b)
    audio_fmt, ch, _rate = struct.unpack("<HHI", fmt_body[:8])
    block_align, bits = struct.unpack("<HH", fmt_body[12:16])
    if audio_fmt != 0x11:
        raise ValueError(f"not an IMA ADPCM WAV (format {audio_fmt})")
    if bits != 4:
        raise NotImplementedError(
            f"IMA ADPCM with {bits}-bit nibbles is not supported"
        )
    if ch < 1:
        raise ValueError("WAV with zero channels")
    if block_align < 4 * ch or (block_align - 4 * ch) % (4 * ch):
        raise ValueError("IMA ADPCM block_align is not header+words")
    spb = (block_align - 4 * ch) * 2 // ch + 1
    if len(fmt_body) >= 20:
        (declared_spb,) = struct.unpack("<H", fmt_body[18:20])
        if declared_spb and declared_spb != spb:
            raise ValueError(
                "IMA ADPCM wSamplesPerBlock disagrees with block_align"
            )
    if len(data) % block_align:
        raise ValueError(
            "IMA ADPCM data is not a whole number of blocks"
        )
    n_blocks = len(data) // block_align
    words_per_ch = (block_align - 4 * ch) // (4 * ch)
    # per-channel nibbles per block = words × 8 = spb − 1 exactly (the
    # block_align check above guarantees whole words per channel)
    out = np.empty((n_blocks * spb, ch), dtype=np.int16)
    row = 0
    for blk in range(n_blocks):
        base = blk * block_align
        preds, idxs = [], []
        for c in range(ch):
            p = base + 4 * c
            (pred,) = struct.unpack("<h", data[p : p + 2])
            index = data[p + 2]
            if index > 88:
                raise ValueError("IMA ADPCM step index out of range")
            preds.append(pred)
            idxs.append(index)
            out[row, c] = pred  # the header predictor IS sample 0
        pos = base + 4 * ch
        for w in range(words_per_ch):
            for c in range(ch):
                word = data[pos : pos + 4]
                pos += 4
                r = row + 1 + w * 8
                for byte in word:
                    for n in (byte & 0x0F, byte >> 4):
                        preds[c], idxs[c] = _ima_decode_nibble(
                            n, preds[c], idxs[c]
                        )
                        out[r, c] = preds[c]
                        r += 1
        row += spb
    total = n_blocks * spb
    if fact is not None:
        if fact > total:
            raise ValueError(
                "IMA ADPCM fact chunk claims more frames than decoded"
            )
        out = out[:fact]
    return out


def decode_ms_adpcm_wav(payload: bytes | None):
    """Decode a WAVE-format-0x02 (Microsoft ADPCM) file to an
    ``(n_frames, n_channels)`` int16 numpy array.  The second-order
    predictor coefficients come from the file's OWN fmt-chunk
    extension (wNumCoef + aCoef pairs) — the format is
    self-describing; only the 16-entry delta-adaptation table is
    spec-fixed.  Per-block per-channel state: predictor index,
    initial delta, and the first TWO pcm samples (emitted oldest
    first), then channel-alternating 4-bit nibbles, high nibble
    first.  Integer division truncates toward zero (the spec's C
    semantics).  A ``fact`` chunk bounds the frame count; structural
    inconsistencies raise ``ValueError``."""
    import numpy as np

    b = payload or b""
    fmt_body, data, fact = _wav_fmt_data(b)
    audio_fmt, ch, _rate = struct.unpack("<HHI", fmt_body[:8])
    block_align, bits = struct.unpack("<HH", fmt_body[12:16])
    if audio_fmt != 0x02:
        raise ValueError(f"not an MS ADPCM WAV (format {audio_fmt})")
    if bits != 4:
        raise NotImplementedError(
            f"MS ADPCM with {bits}-bit nibbles is not supported"
        )
    if ch < 1:
        raise ValueError("WAV with zero channels")
    if len(fmt_body) < 22:
        raise ValueError("MS ADPCM fmt chunk without an extension")
    (spb,) = struct.unpack("<H", fmt_body[18:20])
    (n_coef,) = struct.unpack("<H", fmt_body[20:22])
    if n_coef < 1 or len(fmt_body) < 22 + 4 * n_coef:
        raise ValueError("MS ADPCM fmt chunk without coefficients")
    coefs = [
        struct.unpack("<hh", fmt_body[22 + 4 * k : 26 + 4 * k])
        for k in range(n_coef)
    ]
    header_bytes = 7 * ch
    if block_align <= header_bytes:
        raise ValueError("MS ADPCM block_align smaller than its header")
    want_spb = (block_align - header_bytes) * 2 // ch + 2
    if spb and spb != want_spb:
        raise ValueError(
            "MS ADPCM wSamplesPerBlock disagrees with block_align"
        )
    spb = want_spb
    if len(data) % block_align:
        raise ValueError("MS ADPCM data is not a whole number of blocks")

    def trunc_div(x: int, d: int) -> int:
        # C-style integer division: truncation toward zero
        q = abs(x) // d
        return -q if x < 0 else q

    n_blocks = len(data) // block_align
    out = np.empty((n_blocks * spb, ch), dtype=np.int16)
    row = 0
    for blk in range(n_blocks):
        base = blk * block_align
        c1s, c2s, deltas, s1s, s2s = [], [], [], [], []
        for c in range(ch):
            pred_idx = data[base + c]
            if pred_idx >= n_coef:
                raise ValueError(
                    "MS ADPCM predictor index out of coefficient range"
                )
            c1, c2 = coefs[pred_idx]
            c1s.append(c1)
            c2s.append(c2)
        p = base + ch
        for c in range(ch):
            (d0,) = struct.unpack("<h", data[p : p + 2])
            deltas.append(d0)
            p += 2
        for c in range(ch):
            (s1,) = struct.unpack("<h", data[p : p + 2])
            s1s.append(s1)
            p += 2
        for c in range(ch):
            (s2,) = struct.unpack("<h", data[p : p + 2])
            s2s.append(s2)
            p += 2
        for c in range(ch):
            out[row, c] = s2s[c]  # sample2 is the OLDER sample
            out[row + 1, c] = s1s[c]
        # data nibbles alternate channels (high nibble first); each
        # channel contributes spb − 2 more samples after its two
        # header samples; a trailing pad nibble (odd totals) is inert
        target = (spb - 2) * ch
        cnt = [0] * ch
        c = 0
        done = 0
        for pos in range(p, base + block_align):
            byte = data[pos]
            for n in (byte >> 4, byte & 0x0F):
                if done >= target:
                    break
                signed = n - 16 if n & 0x08 else n
                pred = trunc_div(
                    s1s[c] * c1s[c] + s2s[c] * c2s[c], 256
                )
                pred = _clamp16(pred + signed * deltas[c])
                s2s[c] = s1s[c]
                s1s[c] = pred
                deltas[c] = max(
                    16, (_MS_ADAPT[n] * deltas[c]) >> 8
                )
                out[row + 2 + cnt[c], c] = pred
                cnt[c] += 1
                done += 1
                c = (c + 1) % ch
        if done != target:
            raise ValueError("MS ADPCM block underruns its sample count")
        row += spb
    total = n_blocks * spb
    if fact is not None:
        if fact > total:
            raise ValueError(
                "MS ADPCM fact chunk claims more frames than decoded"
            )
        out = out[:fact]
    return out


def _wav_file(fmt_body: bytes, data: bytes, fact_frames: int) -> bytes:
    def ck(tag: bytes, body: bytes) -> bytes:
        return (
            tag
            + struct.pack("<I", len(body))
            + body
            + (b"\x00" if len(body) & 1 else b"")
        )

    riff = (
        b"WAVE"
        + ck(b"fmt ", fmt_body)
        + ck(b"fact", struct.pack("<I", fact_frames))
        + ck(b"data", data)
    )
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def encode_ima_adpcm_wav(
    samples, sample_rate: int, samples_per_block: int = 505
) -> bytes:
    """Encode an ``(n_frames, n_channels)`` int16 array as a REAL
    IMA-ADPCM WAV (format 0x11, fact chunk, full block structure —
    any audio tool reads it): the fixture mirror of
    :func:`decode_ima_adpcm_wav`.  The step index carries over
    between blocks (each block header re-anchors the predictor
    exactly, so drift never crosses a block boundary).
    ``samples_per_block − 1`` must be a multiple of 8 (whole nibble
    words per channel); the final partial block is padded by
    repeating the last sample, with the true frame count in
    ``fact``."""
    import numpy as np

    s = np.asarray(samples, dtype=np.int16)
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    if n < 1:
        raise ValueError("need at least one frame")
    if (samples_per_block - 1) % 8:
        raise ValueError("samples_per_block - 1 must be a multiple of 8")
    spb = samples_per_block
    block_align = 4 * ch + (spb - 1) // 2 * ch
    n_blocks = -(-n // spb)
    padded = np.vstack([s, np.repeat(s[-1:], n_blocks * spb - n, axis=0)])
    # seed the step index from the signal's own mean |first
    # difference| (it is carried in every block header, so any
    # decoder reproduces it) — starting at index 0 forces a slow
    # step ramp and a large transient on the first block
    idxs = []
    for c in range(ch):
        head = s[: min(n, 256), c].astype(np.int64)
        target = float(np.abs(np.diff(head)).mean()) if len(head) > 1 else 7.0
        idxs.append(
            min(range(89), key=lambda i: abs(_IMA_STEPS[i] - target))
        )
    blocks = []
    for blk in range(n_blocks):
        seg = padded[blk * spb : (blk + 1) * spb]
        header = b""
        preds = []
        for c in range(ch):
            pred = int(seg[0, c])
            header += struct.pack("<hBB", pred, idxs[c], 0)
            preds.append(pred)
        body = bytearray()
        # nibble words: 8 samples per channel per 4-byte word,
        # channels interleaved word by word
        for w0 in range(1, spb, 8):
            for c in range(ch):
                word = 0
                for k in range(8):
                    nib, preds[c], idxs[c] = _ima_encode_sample(
                        int(seg[w0 + k, c]), preds[c], idxs[c]
                    )
                    word |= nib << (4 * k)
                body += struct.pack("<I", word)
        block = header + bytes(body)
        if len(block) != block_align:
            raise AssertionError("IMA block size bookkeeping is wrong")
        blocks.append(block)
    fmt_body = struct.pack(
        "<HHIIHHHH",
        0x11,
        ch,
        sample_rate,
        sample_rate * block_align // spb,
        block_align,
        4,
        2,  # cbSize
        spb,
    )
    return _wav_file(fmt_body, b"".join(blocks), n)


def encode_ms_adpcm_wav(
    samples, sample_rate: int, samples_per_block: int = 500
) -> bytes:
    """Encode an ``(n_frames, n_channels)`` int16 array as a REAL
    Microsoft-ADPCM WAV (format 0x02): per-block predictor selection
    over the seven standard coefficient pairs (least squared nibble-
    quantization error on the block head), initial delta estimated
    from the block's mean absolute second difference — both written
    into the block header, so any decoder reproduces the encoder's
    states exactly.  The final partial block pads by repeating the
    last sample; ``fact`` carries the true frame count."""
    import numpy as np

    s = np.asarray(samples, dtype=np.int16)
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    if n < 2:
        raise ValueError("need at least two frames")
    spb = samples_per_block
    if ch == 1 and (spb - 2) % 2:
        raise ValueError("mono samples_per_block - 2 must be even")
    block_align = 7 * ch + -(-((spb - 2) * ch) // 2)
    n_blocks = -(-n // spb)
    padded = np.vstack([s, np.repeat(s[-1:], n_blocks * spb - n, axis=0)])

    def trunc_div(x: int, d: int) -> int:
        q = abs(x) // d
        return -q if x < 0 else q

    blocks = []
    for blk in range(n_blocks):
        seg = padded[blk * spb : (blk + 1) * spb].astype(np.int64)
        pred_idx, deltas = [], []
        for c in range(ch):
            # initial delta: mean |second difference| over the block
            # scaled to the 4-bit range (the classic estimator)
            dd = np.abs(np.diff(seg[:, c], 2)).mean() if spb > 2 else 0.0
            deltas.append(max(16, int(dd / 4) or 16))
            # predictor choice: least |error| of the linear predictor
            # over the first samples (deterministic, header-recorded)
            best, best_err = 0, None
            for kidx, (c1, c2) in enumerate(_MS_COEFS):
                err = 0
                s1, s2 = int(seg[1, c]), int(seg[0, c])
                for v in seg[2 : min(spb, 34), c]:
                    p = trunc_div(s1 * c1 + s2 * c2, 256)
                    err += abs(int(v) - p)
                    s2, s1 = s1, int(v)
                if best_err is None or err < best_err:
                    best, best_err = kidx, err
            pred_idx.append(best)
        header = bytes(pred_idx)
        for c in range(ch):
            header += struct.pack("<h", deltas[c])
        for c in range(ch):
            header += struct.pack("<h", int(seg[1, c]))
        for c in range(ch):
            header += struct.pack("<h", int(seg[0, c]))
        s1s = [int(seg[1, c]) for c in range(ch)]
        s2s = [int(seg[0, c]) for c in range(ch)]
        dls = list(deltas)
        nibbles = []
        for k in range(2, spb):
            for c in range(ch):
                c1, c2 = _MS_COEFS[pred_idx[c]]
                pred = trunc_div(s1s[c] * c1 + s2s[c] * c2, 256)
                want = int(seg[k, c]) - pred
                nib = trunc_div(want, dls[c])
                nib = -8 if nib < -8 else (7 if nib > 7 else nib)
                dec = _clamp16(pred + nib * dls[c])
                un = nib & 0x0F
                s2s[c] = s1s[c]
                s1s[c] = dec
                dls[c] = max(16, (_MS_ADAPT[un] * dls[c]) >> 8)
                nibbles.append(un)
        body = bytearray()
        for i in range(0, len(nibbles) - 1, 2):
            body.append((nibbles[i] << 4) | nibbles[i + 1])
        if len(nibbles) & 1:
            body.append(nibbles[-1] << 4)
        block = header + bytes(body)
        block += b"\x00" * (block_align - len(block))
        blocks.append(block)
    fmt_body = struct.pack(
        "<HHIIHHHHH",
        0x02,
        ch,
        sample_rate,
        sample_rate * block_align // spb,
        block_align,
        4,
        4 + 4 * len(_MS_COEFS),  # cbSize
        spb,
        len(_MS_COEFS),
    ) + b"".join(struct.pack("<hh", c1, c2) for c1, c2 in _MS_COEFS)
    return _wav_file(fmt_body, b"".join(blocks), n)
