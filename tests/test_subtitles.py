"""SRT/WebVTT caption parsing (r13 — llm/subtitles.py): timed text
rows with exact integer-millisecond arithmetic."""

from __future__ import annotations

import pytest

from sample_keyspaces_cdc_streams_connectors_spark.llm.subtitles import (
    extract_subtitle_cues,
    format_srt,
    format_webvtt,
    parse_srt,
    parse_webvtt,
    subtitle_cues,
)

CUES = [
    (1, 0, 2500, "Hello there."),
    (2, 3000, 61500, "Line one\nline two"),
    (7, 3_700_000, 3_700_400, "sparse index survives"),
]


def test_srt_roundtrip_and_dispatch():
    srt = format_srt(CUES)
    assert parse_srt(srt.decode()) == CUES
    assert extract_subtitle_cues(srt) == CUES
    # BOM + CRLF tolerated
    assert extract_subtitle_cues(b"\xef\xbb\xbf" + srt) == CUES


def test_webvtt_features():
    vtt = format_webvtt(CUES, note="generator test")
    got = parse_webvtt(vtt.decode())
    # dense 0-based indices; cue identifiers, the NOTE block, and
    # cue settings after the end timestamp are all handled
    assert got == [
        (0, 0, 2500, "Hello there."),
        (1, 3000, 61500, "Line one\nline two"),
        (2, 3_700_000, 3_700_400, "sparse index survives"),
    ]
    # hours-optional short timestamps
    assert parse_webvtt("WEBVTT\n\n00:05.000 --> 00:07.250\nshort\n") == [
        (0, 5000, 7250, "short")
    ]
    with pytest.raises(ValueError, match="missing WEBVTT header"):
        parse_webvtt("1\n00:00:00.000 --> 00:00:01.000\nx\n")


def test_malformed_raise():
    with pytest.raises(ValueError, match="ends at or before"):
        extract_subtitle_cues(
            b"1\n00:00:01,000 --> 00:00:01,000\nx\n"
        )
    with pytest.raises(ValueError, match="out of range"):
        extract_subtitle_cues(
            b"1\n00:00:99,000 --> 00:01:40,000\nx\n"
        )
    with pytest.raises(ValueError, match="malformed SRT timestamp"):
        extract_subtitle_cues(b"1\n00:00:00.000 --> 00:00:01,000\nx\n")
    with pytest.raises(NotImplementedError):
        extract_subtitle_cues(b"just prose, not captions")


def test_mkv_subtitle_track():
    """Cues from INSIDE a Matroska container: the S_TEXT/UTF8 track
    (cluster timestamp + block relative timestamp, scaled by the
    Segment's TimestampScale; span from BlockDuration) — how real
    video files carry SRT.  Exercised via the same dispatch the
    sidecar formats use."""
    from sample_keyspaces_cdc_streams_connectors_spark.llm.mkv import (
        encode_mkv_subtitles,
        extract_mkv_subtitle_cues,
    )

    raw = [(s, e, t) for _i, s, e, t in CUES]
    mkv = encode_mkv_subtitles(raw, cues_per_cluster=2)
    want = [(i, s, e, t) for i, (s, e, t) in enumerate(raw)]
    assert extract_mkv_subtitle_cues(mkv) == want
    assert extract_subtitle_cues(mkv) == want
    # a non-default timescale (100 µs ticks) floors to exact ms
    mkv = encode_mkv_subtitles([(10, 20, "x")], timescale_ns=100_000)
    assert extract_mkv_subtitle_cues(mkv) == [(0, 1, 2, "x")]
    # styled subtitle codings are an explicit boundary; a video-only
    # container has no subtitle track at all
    bad = bytearray(encode_mkv_subtitles(raw))
    i = bad.find(b"S_TEXT/UTF8")
    bad[i : i + 11] = b"S_TEXT/ASS\x00"
    with pytest.raises(NotImplementedError, match="S_TEXT/UTF8"):
        extract_mkv_subtitle_cues(bytes(bad))
    import numpy as np

    from sample_keyspaces_cdc_streams_connectors_spark.llm.mkv import encode_mkv_mjpeg
    from sample_keyspaces_cdc_streams_connectors_spark.llm.multimodal import encode_jpeg_gray8

    frames = [encode_jpeg_gray8(np.full((8, 8), 5, np.uint8), quant=1)]
    with pytest.raises(ValueError, match="without a subtitle track"):
        extract_mkv_subtitle_cues(encode_mkv_mjpeg(frames, 8, 8))


def test_subtitle_cues_spark(spark):
    media = spark.createDataFrame(
        [
            (1, bytearray(format_srt(CUES))),
            (2, bytearray(format_webvtt(CUES[:1]))),
            (3, bytearray(b"not captions")),
        ],
        "media_id long, payload binary",
    )
    rows = subtitle_cues(media).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["media_id"], []).append(
            (r["cue_idx"], r["start_ms"], r["end_ms"], r["text"])
        )
    assert sorted(by_id[1]) == CUES
    assert by_id[2] == [(0, 0, 2500, "Hello there.")]
    # unrecognized payload: one NULL row, id kept
    assert by_id[3] == [(None, None, None, None)]


def test_webvtt_signature_strictness():
    # r14 (ADVICE): the spec requires WEBVTT followed by space, tab,
    # or end of line — "WEBVTTXYZ" is not a valid signature
    from sample_keyspaces_cdc_streams_connectors_spark.llm.subtitles import parse_webvtt

    with pytest.raises(ValueError, match="WEBVTT"):
        parse_webvtt("WEBVTTXYZ\n\n00:01.000 --> 00:02.000\nx\n")
    assert parse_webvtt(
        "WEBVTT - with a comment\n\n00:01.000 --> 00:02.000\nx\n"
    ) == [(0, 1000, 2000, "x")]
    assert parse_webvtt(
        "WEBVTT\t tabbed\n\n00:01.000 --> 00:02.000\nx\n"
    ) == [(0, 1000, 2000, "x")]


def test_mkv_truncated_subtitle_block_raises():
    # r14 (ADVICE): a subtitle-track block too short for its
    # timestamp+flags must raise like the frames path, not be
    # silently skipped
    from sample_keyspaces_cdc_streams_connectors_spark.llm import mkv as M

    good = M.encode_mkv_subtitles([(10, 20, "x")])
    # rebuild the file with one extra cluster whose SimpleBlock body
    # is just the track vint + 1 byte (needs vint + 2 + 1)
    header_end = good.find(bytes.fromhex("18538067"))
    header = good[:header_end]
    # segment body of the good file (skip the 4-byte id + size vint)
    pos, length = header_end + 4, None
    _n, pos, _w = M._read_vint(good, pos, keep_marker=False)
    seg_body = good[pos:]
    bad_cluster = M._el(
        M._CLUSTER,
        M._uint_el(M._CLUSTER_TIMESTAMP, 50)
        + M._el(M._SIMPLE_BLOCK, bytes([0x81, 0x00])),
    )
    bad = header + M._el(M._SEGMENT, seg_body + bad_cluster)
    with pytest.raises(ValueError, match="truncated Matroska block"):
        M.extract_mkv_subtitle_cues(bad)
    # a truncated block on a DIFFERENT track is still skipped
    other = header + M._el(
        M._SEGMENT,
        seg_body
        + M._el(
            M._CLUSTER,
            M._uint_el(M._CLUSTER_TIMESTAMP, 50)
            + M._el(M._SIMPLE_BLOCK, bytes([0x82, 0x00])),
        ),
    )
    assert M.extract_mkv_subtitle_cues(other) == [(0, 10, 20, "x")]


def test_mp4_tx3g_timed_text():
    """Cues from an MP4 tx3g timed-text track (r14 — the ISO-BMFF
    counterpart of the in-MKV S_TEXT path): gap samples are empty
    length-prefixed samples, timing is stts arithmetic in mdhd
    timescale ticks, and sample location reuses the video path's
    stsz/stsc/stco walk."""
    from sample_keyspaces_cdc_streams_connectors_spark.llm.subtitles import (
        encode_mp4_timed_text,
        extract_mp4_text_cues,
    )

    raw = [(s, e, t) for _i, s, e, t in CUES]
    mp4 = encode_mp4_timed_text(raw)
    want = [(i, s, e, t) for i, (s, e, t) in enumerate(raw)]
    assert extract_mp4_text_cues(mp4) == want
    # reachable through the generic dispatch too
    assert extract_subtitle_cues(mp4) == want
    # a non-ms timescale (600 ticks/s): times floor to exact ms
    mp4 = encode_mp4_timed_text([(0, 2500, "x"), (3000, 4000, "y")],
                                timescale=600)
    assert extract_mp4_text_cues(mp4) == [
        (0, 0, 2500, "x"),
        (1, 3000, 4000, "y"),
    ]
    # styled text codings are an explicit boundary
    bad = bytearray(encode_mp4_timed_text(raw))
    i = bad.find(b"tx3g")
    bad[i : i + 4] = b"stpp"  # TTML subtitles
    with pytest.raises(NotImplementedError, match="tx3g"):
        extract_mp4_text_cues(bytes(bad))
    # a video-only MP4 has no timed-text track
    import numpy as np

    from sample_keyspaces_cdc_streams_connectors_spark.llm.multimodal import (
        encode_jpeg_gray8,
        encode_mp4_mjpeg,
    )

    frames = [encode_jpeg_gray8(np.full((8, 8), 5, np.uint8), quant=1)]
    with pytest.raises(ValueError, match="without a timed-text"):
        extract_mp4_text_cues(encode_mp4_mjpeg(frames, 8, 8))
    # truncated tx3g sample: declared text length exceeds the sample
    good = encode_mp4_timed_text([(0, 1000, "hello")])
    j = good.find(b"\x00\x05hello")
    clipped = bytearray(good)
    clipped[j : j + 2] = b"\x00\x99"
    with pytest.raises(ValueError, match="exceeds its sample"):
        extract_mp4_text_cues(bytes(clipped))


def test_mkv_laced_subtitle_block():
    """r14: a LACED subtitle block (how some muxers pack several
    simultaneous caption lines) yields one cue per laced frame, all
    anchored at the block's timestamp/span — no invented per-frame
    timing."""
    from sample_keyspaces_cdc_streams_connectors_spark.llm import mkv as M

    good = M.encode_mkv_subtitles([(10, 20, "x")])
    header_end = good.find(bytes.fromhex("18538067"))
    header = good[:header_end]
    _n, pos, _w = M._read_vint(good, header_end + 4, keep_marker=False)
    seg_body = good[pos:]
    texts = [b"line one", b"l2", b"third line here"]
    for lac, bits in (("xiph", 0x02), ("ebml", 0x06)):
        blk = (
            bytes([0x81])
            + (50).to_bytes(2, "big")
            + bytes([bits])
            + M.encode_lacing(texts, lac)
        )
        laced_cluster = M._el(
            M._CLUSTER,
            M._uint_el(M._CLUSTER_TIMESTAMP, 100)
            + M._el(
                M._BLOCK_GROUP,
                M._el(M._BLOCK, blk)
                + M._uint_el(M._BLOCK_DURATION, 75),
            ),
        )
        mkv = header + M._el(M._SEGMENT, seg_body + laced_cluster)
        cues = M.extract_mkv_subtitle_cues(mkv)
        assert cues[0] == (0, 10, 20, "x")
        assert cues[1:] == [
            (1, 150, 225, "line one"),
            (2, 150, 225, "l2"),
            (3, 150, 225, "third line here"),
        ], lac
