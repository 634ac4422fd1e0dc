"""MP3/MPEG-audio frame walk (r13 — llm/mp3.py).

Frame LENGTHS are pure public arithmetic, so the walk is exact and
every expected size here is hand-computed from the spec formulas;
SAMPLE decode remains the documented boundary (see SCALE.md).
"""

from __future__ import annotations

import struct

import pytest

from sample_keyspaces_cdc_streams_connectors_spark.llm.mp3 import (
    _header_fields,
    _id3v2_end,
    encode_mp3_stream,
    mp3_frame_walk,
    parse_mp3_vbr_tag,
)


def test_frame_lengths_hand_computed():
    # MPEG-1 Layer III, 128 kbps @ 44100: 144·128000/44100 = 417
    b = encode_mp3_stream([128] * 5)
    assert len(b) == 5 * 417
    n, samples, rate, dur, vbr = mp3_frame_walk(b)
    assert (n, samples, rate, vbr) == (5, 5 * 1152, 44100, False)
    assert dur == 5 * 1152 * 1000 // 44100  # 130 ms, integer floor
    # padding bit adds exactly one byte
    b = encode_mp3_stream([128] * 4, pad_every=2)
    assert len(b) == 4 * 417 + 2
    assert mp3_frame_walk(b)[0] == 4
    # MPEG-2 Layer III halves the granule: ⌊72·64000/22050⌋ = 208,
    # 576 samples per frame
    b = encode_mp3_stream([64] * 3, version=2, mono=True)
    assert len(b) == 3 * 208
    assert mp3_frame_walk(b)[:3] == (3, 3 * 576, 22050)
    # Layer I: (12·192000/48000)·4 = 192 bytes, 384 samples
    b = encode_mp3_stream([192] * 4, layer=1, rate_idx=1)
    assert len(b) == 4 * 192
    assert mp3_frame_walk(b)[:3] == (4, 4 * 384, 48000)
    # Layer II: 144·192000/44100 = 626
    b = encode_mp3_stream([192] * 4, layer=2)
    assert len(b) == 4 * 626
    assert mp3_frame_walk(b)[:3] == (4, 4 * 1152, 44100)


def test_vbr_tags_and_id3_skip():
    kbps = [128, 160, 96, 320, 40]
    b = encode_mp3_stream(
        kbps, pad_every=3, id3v2_pad=77, id3v1=True, xing=True
    )
    n, samples, rate, _dur, vbr = mp3_frame_walk(b)
    assert n == 6 and vbr  # the Xing frame is a frame too
    # the cheap pass reads the Xing count without walking
    off = _id3v2_end(b)
    assert off == 10 + 77
    hdr = _header_fields(b[off : off + 4])
    assert parse_mp3_vbr_tag(b, off, hdr) == 6
    # parse_audio_header fills n_frames (PCM frames) from the tag
    from sample_keyspaces_cdc_streams_connectors_spark.llm.multimodal import parse_audio_header

    fmt, ch, rate2, bits, n_frames = parse_audio_header(b)
    assert (fmt, ch, rate2) == ("mp3", 2, 44100)
    assert n_frames == 6 * 1152
    # no tag → frame count stays honestly NULL on the cheap pass
    fmt, _ch, _r, _b, n_frames = parse_audio_header(
        encode_mp3_stream([128] * 3)
    )
    assert fmt == "mp3" and n_frames is None
    # VBRI (Fraunhofer) variant: fixed 32-byte offset in frame 1
    raw = bytearray(encode_mp3_stream([128] * 4))
    raw[4 + 32 : 4 + 32 + 18] = (
        b"VBRI" + bytes(10) + struct.pack(">I", 4)
    )
    hdr = _header_fields(bytes(raw[:4]))
    assert parse_mp3_vbr_tag(bytes(raw), 0, hdr) == 4
    assert parse_audio_header(bytes(raw))[4] == 4 * 1152


def test_walk_malformed_and_boundaries():
    b = encode_mp3_stream([128] * 3)
    # torn final frame: header parses, bytes missing
    with pytest.raises(ValueError, match="torn final"):
        mp3_frame_walk(b[:-5])
    # sync loss mid-stream
    bb = bytearray(b)
    bb[417] = 0x00
    with pytest.raises(ValueError, match="sync lost"):
        mp3_frame_walk(bytes(bb))
    with pytest.raises(ValueError, match="no frame sync"):
        mp3_frame_walk(b"\x00\x01\x02\x03")
    # parameters changing mid-stream = corrupt/concatenated
    two = encode_mp3_stream([128] * 2) + encode_mp3_stream(
        [64] * 2, version=2, mono=True
    )
    with pytest.raises(ValueError, match="change mid-stream"):
        mp3_frame_walk(two)
    # r14: free format is SUPPORTED (test_free_format_frame_walk) —
    # but flipping the first frame's bitrate index to 0 while the
    # rest stay indexed is a corrupt stream and must raise
    h = bytearray(b)
    h[2] = 0x00
    with pytest.raises(ValueError, match="mixes free-format"):
        mp3_frame_walk(bytes(h))
    h = bytearray(b)
    h[2] = 0xF0 | (h[2] & 0x0F)
    with pytest.raises(ValueError, match="forbidden"):
        mp3_frame_walk(bytes(h))
    h = bytearray(b)
    h[1] = 0xE0 | (1 << 3) | (h[1] & 0x07)
    with pytest.raises(ValueError, match="reserved MPEG version"):
        mp3_frame_walk(bytes(h))


def test_walk_through_spark_stats(spark):
    """The walk as a corpus operator: exact duration/bitrate-mode
    stats per payload inside mapInPandas (the scale posture every
    codec kernel here shares)."""
    import pandas as pd

    from pyspark.sql.types import (
        BooleanType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    payloads = [
        (1, encode_mp3_stream([128] * 10)),
        (2, encode_mp3_stream([64, 128, 96] * 3, pad_every=2, xing=True)),
        (3, b"not audio at all"),
    ]
    media = spark.createDataFrame(
        [(m, bytearray(p)) for m, p in payloads],
        "media_id long, payload binary",
    )
    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("n_frames", IntegerType()),
            StructField("duration_ms", LongType()),
            StructField("is_vbr", BooleanType()),
        ]
    )

    def run(batches):
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                try:
                    n, _s, _r, dur, vbr = mp3_frame_walk(bytes(p))
                    rows.append((int(mid), n, dur, vbr))
                except (ValueError, NotImplementedError):
                    rows.append((int(mid), None, None, None))
            yield pd.DataFrame(
                rows, columns=["media_id", "n_frames", "duration_ms",
                               "is_vbr"]
            ).astype(
                {
                    "media_id": "int64",
                    "n_frames": "Int32",
                    "duration_ms": "Int64",
                }
            )

    got = {
        r["media_id"]: (r["n_frames"], r["duration_ms"], r["is_vbr"])
        for r in media.mapInPandas(run, schema).collect()
    }
    assert got[1] == (10, 10 * 1152 * 1000 // 44100, False)
    assert got[2] == (10, 10 * 1152 * 1000 // 44100, True)
    assert got[3] == (None, None, None)


def test_id3v24_footer_flag():
    # r14 (ADVICE): an ID3v2.4 footer (flags bit 0x10) adds 10
    # trailing bytes not counted in the syncsafe size — the walk
    # previously lost sync on valid files carrying one
    frames = encode_mp3_stream([128] * 3)
    body = b"\x00" * 30
    size = bytes((len(body) >> s) & 0x7F for s in (21, 14, 7, 0))
    tag = b"ID3\x04\x00\x10" + size + body + b"3DI\x04\x00\x10" + size
    assert _id3v2_end(tag + frames) == 10 + 30 + 10
    n, samples, rate, _d, _v = mp3_frame_walk(tag + frames)
    assert (n, samples, rate) == (3, 3 * 1152, 44100)
    # without the footer flag the end stays 10 + size
    tag = b"ID3\x04\x00\x00" + size + body
    assert _id3v2_end(tag + frames) == 10 + 30


def test_free_format_frame_walk():
    """r14: bitrate index 0 (free format) — the frame length is
    measured from the first two sync distances (pure arithmetic, no
    tables), then constant modulo the padding slot."""
    b = encode_mp3_stream([0] * 6, free_format_len=313)
    n, samples, rate, dur, vbr = mp3_frame_walk(b)
    assert (n, samples, rate, vbr) == (6, 6 * 1152, 44100, False)
    assert dur == 6 * 1152 * 1000 // 44100
    # padding varies the length by exactly one slot and still walks
    b = encode_mp3_stream([0] * 6, free_format_len=313, pad_every=2)
    assert mp3_frame_walk(b)[0] == 6
    # Layer I free format: the slot is 4 bytes
    b = encode_mp3_stream(
        [0] * 4, layer=1, rate_idx=1, free_format_len=192, pad_every=2
    )
    assert mp3_frame_walk(b)[:3] == (4, 4 * 384, 48000)
    # with ID3 tags around it
    b = encode_mp3_stream(
        [0] * 3, free_format_len=200, id3v2_pad=40, id3v1=True
    )
    assert mp3_frame_walk(b)[0] == 3
    # a single free-format frame has no second sync to measure from
    one = encode_mp3_stream([0], free_format_len=180)
    with pytest.raises(ValueError, match="second frame sync"):
        mp3_frame_walk(one)
    # mixing free-format and indexed frames is a corrupt stream
    mixed = encode_mp3_stream([0, 0], free_format_len=417) + (
        encode_mp3_stream([128])
    )
    with pytest.raises(ValueError, match="mixes free-format"):
        mp3_frame_walk(mixed)
    # free-format duration reaches the generic audio header surface
    from sample_keyspaces_cdc_streams_connectors_spark.llm.multimodal import parse_audio_header

    fmt, ch, rate2, _bits, _n = parse_audio_header(
        encode_mp3_stream([0] * 3, free_format_len=250)
    )
    assert (fmt, ch, rate2) == ("mp3", 2, 44100)
