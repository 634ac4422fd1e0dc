"""Media text-tag extraction (r13 — llm/tags.py): ID3v2 / Vorbis
comments / FLAC comment blocks into the text pipeline."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from sample_keyspaces_cdc_streams_connectors_spark.llm.flac import (
    decode_flac_samples,
    encode_flac_pcm16,
)
from sample_keyspaces_cdc_streams_connectors_spark.llm.mp3 import encode_mp3_stream
from sample_keyspaces_cdc_streams_connectors_spark.llm.ogg import encode_ogg_stream
from sample_keyspaces_cdc_streams_connectors_spark.llm.tags import (
    encode_id3v2,
    encode_vorbis_comment_block,
    extract_media_tags,
    media_text_tags,
    parse_id3v2_text,
    vorbis_comment_packet,
)


def _tagged_flac(comments):
    flac = bytearray(
        encode_flac_pcm16(np.zeros((64, 1), np.int16), 8000, blocksize=64)
    )
    flac[4] &= 0x7F  # STREAMINFO is no longer the last block
    block = encode_vorbis_comment_block(comments)
    return bytes(flac[: 8 + 34]) + block + bytes(flac[8 + 34 :])


def test_id3v2_versions_and_encodings():
    frames = [("TIT2", "Song Title"), ("TPE1", "Artist Näme")]
    for ver in (3, 4):
        for unsync in (False, True):
            if ver == 4 and unsync:
                continue  # global unsync is the v2.3 convention
            tag = encode_id3v2(frames, version=ver, unsync=unsync,
                               padding=16)
            got = parse_id3v2_text(tag + encode_mp3_stream([128] * 2))
            assert got == frames, (ver, unsync)
    # v2.2: 3-byte ids and sizes, latin-1
    tag = encode_id3v2([("TT2", "Old Title")], version=2)
    assert parse_id3v2_text(tag + b"") == [("TT2", "Old Title")]
    # UTF-16 with BOM (encoding byte 1) and multi-value null split
    def frame(fid, payload):
        return fid + struct.pack(">I", len(payload)) + b"\x00\x00" + payload

    body = frame(b"TIT2", b"\x01" + "Tïtle".encode("utf-16"))
    body += frame(b"TXXX", b"\x03mykey\x00myval")
    body += frame(b"COMM", b"\x03engdesc\x00the comment")
    hdr = b"ID3\x03\x00\x00" + bytes(
        (len(body) >> s) & 0x7F for s in (21, 14, 7, 0)
    )
    got = parse_id3v2_text(hdr + body)
    assert got == [
        ("TIT2", "Tïtle"),
        ("TXXX:mykey", "myval"),
        ("COMM:eng:desc", "the comment"),
    ]
    # malformed: truncated tag, bad encoding byte
    with pytest.raises(ValueError, match="truncated ID3v2 tag"):
        parse_id3v2_text(hdr + body[:-10])
    bad = frame(b"TIT2", b"\x09oops")
    h2 = b"ID3\x03\x00\x00" + bytes(
        (len(bad) >> s) & 0x7F for s in (21, 14, 7, 0)
    )
    with pytest.raises(ValueError, match="unknown ID3 text encoding"):
        parse_id3v2_text(h2 + bad)
    # no tag → empty, never an error
    assert parse_id3v2_text(encode_mp3_stream([128])) == []


def test_vorbis_comments_ogg_and_flac():
    # Ogg Vorbis: the comment packet is packet #2, reassembled from
    # page lacing — a >255-byte comment exercises the 255-run rule
    long_val = "x" * 600
    cp = vorbis_comment_packet(
        [("TITLE", "Oggy"), ("artist", long_val)]
    )
    b = encode_ogg_stream("vorbis", comment_packet=cp)
    got = extract_media_tags(b)
    assert ("vorbis", "title", "Oggy") in got  # keys normalize lower
    assert ("vorbis", "artist", long_val) in got
    # Opus: the OpusTags packet (RFC 7845 §5.2)
    cp = vorbis_comment_packet([("title", "Opusy")], opus=True)
    got = extract_media_tags(encode_ogg_stream("opus", comment_packet=cp))
    assert ("vorbis", "title", "Opusy") in got
    # FLAC: VORBIS_COMMENT metadata block spliced after STREAMINFO —
    # and the tagged file still decodes its samples bit-exactly
    tagged = _tagged_flac([("title", "Flacky"), ("genre", "test")])
    got = extract_media_tags(tagged)
    assert ("vorbis", "title", "Flacky") in got
    assert ("vorbis", "genre", "test") in got
    assert decode_flac_samples(tagged).shape == (64, 1)
    # untagged payloads of recognized formats → [], unknown raises
    assert extract_media_tags(encode_mp3_stream([128])) == []
    with pytest.raises(NotImplementedError):
        extract_media_tags(b"\x00junk")
    # malformed comment structure raises
    bad = vorbis_comment_packet([("k", "v")])[:-3]
    with pytest.raises(ValueError):
        extract_media_tags(encode_ogg_stream("vorbis", comment_packet=bad))


def test_mp4_ilst_and_mkv_tags():
    from sample_keyspaces_cdc_streams_connectors_spark.llm.mkv import (
        encode_mkv_mjpeg,
        extract_mkv_frames,
    )
    from sample_keyspaces_cdc_streams_connectors_spark.llm.multimodal import (
        encode_jpeg_gray8,
        encode_mp4_mjpeg,
        extract_mp4_frames,
        parse_video_header,
    )
    from sample_keyspaces_cdc_streams_connectors_spark.llm.tags import add_mp4_tags, mkv_tags_element

    frames = [
        encode_jpeg_gray8(np.full((8, 8), v, np.uint8), quant=1)
        for v in (5, 60)
    ]
    # MP4: iTunes-style udta/meta/ilst chain — and the tagged file
    # still walks, decodes, and header-parses identically
    mp4 = encode_mp4_mjpeg(frames, 8, 8)
    tagged = add_mp4_tags(
        mp4, [("©nam", "Clip Title"), ("©ART", "Söme Artist")]
    )
    assert extract_media_tags(tagged) == [
        ("ilst", "©nam", "Clip Title"),
        ("ilst", "©ART", "Söme Artist"),
    ]
    n, out = extract_mp4_frames(tagged)
    assert n == 2 and out[0][1] == frames[0]
    assert parse_video_header(tagged) == parse_video_header(mp4)
    assert extract_media_tags(mp4) == []
    # Matroska: a real Tags element in the Segment — sized AND
    # streamed (unknown-size) forms
    el = mkv_tags_element([("TITLE", "MkvClip"), ("ARTIST", "Söme")])
    for streamed in (False, True):
        mkv = encode_mkv_mjpeg(
            frames, 8, 8, extra_segment=el,
            unknown_size_segment=streamed,
        )
        assert extract_media_tags(mkv) == [
            ("mkv", "TITLE", "MkvClip"),
            ("mkv", "ARTIST", "Söme"),
        ], streamed
        assert extract_mkv_frames(mkv)[0] == 2
    assert extract_media_tags(encode_mkv_mjpeg(frames, 8, 8)) == []


def test_media_text_tags_spark(spark):
    tag = encode_id3v2([("TIT2", "Spark Song")], version=3)
    payloads = [
        (1, tag + encode_mp3_stream([128] * 2)),
        (
            2,
            encode_ogg_stream(
                "vorbis",
                comment_packet=vorbis_comment_packet(
                    [("title", "Oggy")]
                ),
            ),
        ),
        (3, _tagged_flac([("title", "Flacky")])),
        (4, encode_mp3_stream([128])),  # recognized, untagged: 0 rows
        (5, b"\x00junk"),  # unrecognized: one NULL row, id kept
    ]
    media = spark.createDataFrame(
        [(m, bytearray(p)) for m, p in payloads],
        "media_id long, payload binary",
    )
    rows = media_text_tags(media).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["media_id"], []).append(
            (r["source"], r["key"], r["value"])
        )
    assert by_id[1] == [("id3", "TIT2", "Spark Song")]
    assert ("vorbis", "title", "Oggy") in by_id[2]
    assert ("vorbis", "title", "Flacky") in by_id[3]
    assert 4 not in by_id
    assert by_id[5] == [(None, None, None)]


def test_id3v2_truncated_frame_header_raises_valueerror():
    # r14 (ADVICE): a tag truncated mid-frame-header must raise the
    # documented ValueError, never struct.error
    tag = encode_id3v2([("TIT2", "abcdefgh")], version=3)
    for cut in range(1, 10):
        clipped = tag[: len(tag) - cut]
        # fix the header's syncsafe size to match the clipped body
        n = len(clipped) - 10
        hdr = clipped[:6] + bytes(
            (n >> s) & 0x7F for s in (21, 14, 7, 0)
        )
        clipped = hdr + clipped[10:]
        try:
            parse_id3v2_text(clipped)
        except ValueError:
            pass  # documented
        # struct.error or any other type would propagate and fail
