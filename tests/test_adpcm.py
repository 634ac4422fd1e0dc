"""IMA/DVI and Microsoft ADPCM WAV codecs (r13 — llm/adpcm.py).

ADPCM is lossy, so round trips are pinned as SNR BOUNDS (documented:
≥ 30 dB on band-limited tones at 4:1 compression), while the decoder
itself is EXACT integer arithmetic — pinned here against (a)
hand-computed single-step vectors and (b) an independently-written
straight-from-the-pseudocode reference decoder, so a wrong interleave
or adaptation step fails even though the codec is lossy.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from sample_keyspaces_cdc_streams_connectors_spark.llm.adpcm import (
    _IMA_INDEX_ADJUST,
    _IMA_STEPS,
    _MS_ADAPT,
    _ima_decode_nibble,
    decode_ima_adpcm_wav,
    decode_ms_adpcm_wav,
    encode_ima_adpcm_wav,
    encode_ms_adpcm_wav,
)


def _tone(n: int, ch: int) -> np.ndarray:
    t = np.arange(n)
    wave = (
        12000 * np.sin(2 * np.pi * t / 50)
        + 4000 * np.sin(2 * np.pi * t / 13)
    ).astype(np.int16)
    return np.stack(
        [wave if c == 0 else np.roll(wave, 5) for c in range(ch)], axis=1
    )


def _snr_db(orig: np.ndarray, dec: np.ndarray) -> float:
    err = dec.astype(np.float64) - orig.astype(np.float64)
    return 10 * np.log10(
        (orig.astype(np.float64) ** 2).mean() / max((err**2).mean(), 1e-9)
    )


def test_ima_single_steps_hand_computed():
    # from (pred=0, index=0): step=7
    # n=2: diff = 7>>3 + 7>>1 = 0 + 3 = 3 → pred 3, index 0 + (-1) → 0
    assert _ima_decode_nibble(2, 0, 0) == (3, 0)
    # n=7: diff = 0 + 1 + 3 + 7 = 11 → pred 11, index 0 + 8 = 8
    assert _ima_decode_nibble(7, 0, 0) == (11, 8)
    # n=15 (sign bit): same magnitude, negative, same index move
    assert _ima_decode_nibble(15, 0, 0) == (-11, 8)
    # index clamps at 88, prediction clamps at int16
    p, i = _ima_decode_nibble(7, 32000, 88)
    assert p == 32767 and i == 88
    p, i = _ima_decode_nibble(15, -32000, 88)
    assert p == -32768 and i == 88
    # step table is the canonical 89-entry IMA table
    assert len(_IMA_STEPS) == 89
    assert _IMA_STEPS[0] == 7 and _IMA_STEPS[88] == 32767
    assert _IMA_INDEX_ADJUST == [-1, -1, -1, -1, 2, 4, 6, 8]


def _ref_decode_ima(b: bytes) -> np.ndarray:
    """Independent IMA reference: de-interleave every channel's nibble
    stream FIRST, then run the state machine per channel — a
    different shape from the module's in-place walk."""
    fmt = data = None
    i = 12
    while i + 8 <= len(b):
        tag = b[i : i + 4]
        (clen,) = struct.unpack("<I", b[i + 4 : i + 8])
        if tag == b"fmt ":
            fmt = b[i + 8 : i + 8 + clen]
        elif tag == b"data":
            data = b[i + 8 : i + 8 + clen]
        elif tag == b"fact":
            (fact,) = struct.unpack("<I", b[i + 8 : i + 12])
        i += 8 + clen + (clen & 1)
    _f, ch, _r = struct.unpack("<HHI", fmt[:8])
    (ba,) = struct.unpack("<H", fmt[12:14])
    spb = (ba - 4 * ch) * 2 // ch + 1
    rows = []
    for base in range(0, len(data), ba):
        block = data[base : base + ba]
        chans = []
        for c in range(ch):
            (pred,) = struct.unpack("<h", block[4 * c : 4 * c + 2])
            index = block[4 * c + 2]
            nibbles = []
            # channel c owns words c, c+ch, c+2ch, ... of the body
            body = block[4 * ch :]
            for w in range(c * 4, len(body), 4 * ch):
                for byte in body[w : w + 4]:
                    nibbles += [byte & 0x0F, byte >> 4]
            samples = [pred]
            for n in nibbles:
                pred, index = _ima_decode_nibble(n, pred, index)
                samples.append(pred)
            chans.append(samples[:spb])
        rows.append(np.array(chans, np.int16).T)
    out = np.vstack(rows)
    return out[:fact]


def test_ima_roundtrip_and_reference_parity():
    for ch in (1, 2):
        s = _tone(2000, ch)
        w = encode_ima_adpcm_wav(s, 8000, samples_per_block=505)
        d = decode_ima_adpcm_wav(w)
        assert d.shape == s.shape and d.dtype == np.int16
        # documented error bound: ≥ 30 dB SNR on band-limited tones
        assert _snr_db(s, d) > 30.0
        # decoder vs the independent reference: EXACT (decode is
        # deterministic integer arithmetic even though coding is lossy)
        assert np.array_equal(d, _ref_decode_ima(w))
    # partial last block: fact truncates to the true frame count
    s = _tone(777, 2)
    d = decode_ima_adpcm_wav(encode_ima_adpcm_wav(s, 8000, 505))
    assert d.shape == (777, 2)
    # stereo channels stay independent (ch1 is ch0 rolled by 5)
    assert _snr_db(s[:, 1:], d[:, 1:]) > 30.0


def test_ms_roundtrip_and_reference_parity():
    for ch in (1, 2):
        s = _tone(2000, ch)
        w = encode_ms_adpcm_wav(s, 8000, samples_per_block=500)
        d = decode_ms_adpcm_wav(w)
        assert d.shape == s.shape and d.dtype == np.int16
        assert _snr_db(s, d) > 30.0
    s = _tone(777, 2)
    d = decode_ms_adpcm_wav(encode_ms_adpcm_wav(s, 8000, 500))
    assert d.shape == (777, 2)
    # hand-check the predictor arithmetic on a crafted mono block:
    # coef pair 0 is (256, 0) → pred == sample1; nibble +1 with
    # delta 16 moves exactly +16; adaptation: (230·16)>>8 = 14 → 16
    fmt_body = struct.pack(
        "<HHIIHHHHH", 2, 1, 8000, 4000, 7 + 2, 4, 32, 6, 7
    ) + b"".join(
        struct.pack("<hh", c1, c2)
        for c1, c2 in [
            (256, 0), (512, -256), (0, 0), (192, 64),
            (240, 0), (460, -208), (392, -232),
        ]
    )
    block = bytes([0]) + struct.pack("<hhh", 16, 100, 50)
    block += bytes([(1 << 4) | 0x0F, (2 << 4) << 0])  # +1, -1, +2, pad0
    data = block
    riff = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
        + b"fact" + struct.pack("<II", 4, 4)
        + b"data" + struct.pack("<I", len(data)) + data
    )
    wav = b"RIFF" + struct.pack("<I", len(riff)) + riff
    d = decode_ms_adpcm_wav(wav)
    # samples: 50 (older), 100, then 100+1·16=116, 116−1·16=100,
    # 100+2·16=132 ... fact=4 keeps the first four
    assert d[:, 0].tolist() == [50, 100, 116, 100]


def test_adpcm_malformed_structures_raise():
    s = _tone(600, 1)
    good = bytearray(encode_ima_adpcm_wav(s, 8000, 505))
    # step index out of range
    bad = bytearray(good)
    i = bad.find(b"data") + 8 + 2
    bad[i] = 90
    with pytest.raises(ValueError, match="step index"):
        decode_ima_adpcm_wav(bytes(bad))
    # torn payload (the data chunk loses its tail)
    with pytest.raises(
        ValueError, match="truncated WAV chunk|whole number of blocks"
    ):
        decode_ima_adpcm_wav(bytes(good[:-8]))
    # fact chunk claiming more frames than present
    bad = bytearray(good)
    i = bad.find(b"fact") + 8
    bad[i : i + 4] = struct.pack("<I", 10_000)
    with pytest.raises(ValueError, match="fact chunk claims"):
        decode_ima_adpcm_wav(bytes(bad))
    # MS: predictor index beyond the file's coefficient table
    w = bytearray(encode_ms_adpcm_wav(s, 8000, 500))
    i = w.find(b"data") + 8
    w[i] = 7
    with pytest.raises(ValueError, match="predictor index"):
        decode_ms_adpcm_wav(bytes(w))
    # encoder guards
    with pytest.raises(ValueError, match="multiple of 8"):
        encode_ima_adpcm_wav(s, 8000, samples_per_block=500)
    with pytest.raises(ValueError, match="must be even"):
        encode_ms_adpcm_wav(s, 8000, samples_per_block=501)


def test_adpcm_through_wav_dispatch_and_header():
    from sample_keyspaces_cdc_streams_connectors_spark.llm.multimodal import (
        decode_audio_samples,
        decode_wav_samples,
        parse_audio_header,
    )

    s = _tone(1000, 2)
    for enc, spb in (
        (encode_ima_adpcm_wav, 505),
        (encode_ms_adpcm_wav, 500),
    ):
        w = enc(s, 16000, samples_per_block=spb)
        d = decode_wav_samples(w)
        assert d.shape == (1000, 2)
        assert np.array_equal(d, decode_audio_samples(w))
        fmt, ch, rate, bits, n_frames = parse_audio_header(w)
        # the fact chunk carries the exact frame count; bits is the
        # 4-bit nibble width the fmt chunk declares
        assert (fmt, ch, rate, bits, n_frames) == ("wav", 2, 16000, 4, 1000)


def test_adpcm_audio_stats_spark(spark):
    from sample_keyspaces_cdc_streams_connectors_spark.llm.multimodal import audio_stats

    s = _tone(800, 1)
    w1 = encode_ima_adpcm_wav(s, 8000, 505)
    w2 = encode_ms_adpcm_wav(s, 8000, 500)
    media = spark.createDataFrame(
        [(1, bytearray(w1)), (2, bytearray(w2))],
        "media_id long, payload binary",
    )
    rows = {r["media_id"]: r for r in audio_stats(media).collect()}
    for mid, wav in ((1, w1), (2, w2)):
        dec = (
            decode_ima_adpcm_wav(wav)
            if mid == 1
            else decode_ms_adpcm_wav(wav)
        ).astype(np.int64)
        r = rows[mid]
        assert r["au_rate"] == 8000 and r["au_channels"] == 1
        assert r["au_n"] == dec.size
        assert r["au_sum_sq"] == int((dec * dec).sum())
        assert r["au_peak"] == int(np.abs(dec).max())


def test_ms_three_channel_round_robin():
    # r14 (ADVICE): the nibble rotation must round-robin ALL
    # channels, not just alternate 0/1 — a 3-channel MS ADPCM WAV
    # previously crashed with IndexError (uncaught by the operator
    # contract) or left garbage in channels >= 2
    for ch in (3, 4):
        s = _tone(1200, ch)
        w = encode_ms_adpcm_wav(s, 8000, samples_per_block=500)
        d = decode_ms_adpcm_wav(w)
        assert d.shape == s.shape and d.dtype == np.int16
        for c in range(ch):
            assert _snr_db(s[:, c : c + 1], d[:, c : c + 1]) > 30.0


def test_ima_three_channel():
    for ch in (3,):
        s = _tone(1010, ch)
        d = decode_ima_adpcm_wav(encode_ima_adpcm_wav(s, 8000, 505))
        assert d.shape == s.shape
        for c in range(ch):
            assert _snr_db(s[:, c : c + 1], d[:, c : c + 1]) > 30.0
