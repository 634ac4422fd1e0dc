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
