"""Ogg page walk (r13 — llm/ogg.py): exact Vorbis/Opus duration from
granule positions, with RFC 3533 CRC validation — no entropy decode.
"""

from __future__ import annotations

import struct

import pytest

from sample_keyspaces_cdc_streams_connectors_spark.llm.ogg import (
    _ogg_crc,
    encode_ogg_stream,
    ogg_duration,
    ogg_page_walk,
)


def test_vorbis_and_opus_duration_arithmetic():
    b = encode_ogg_stream(
        "vorbis", rate=44100, channels=2, page_samples=(1024, 1024, 512)
    )
    streams = ogg_page_walk(b)
    assert len(streams) == 1
    st = streams[0]
    assert (st["codec"], st["rate"], st["channels"]) == (
        "vorbis", 44100, 2,
    )
    assert st["n_pages"] == 5 and st["last_granule"] == 2560
    assert ogg_duration(b) == (
        "vorbis", 44100, 2, 2560, 2560 * 1000 // 44100, True,
    )
    # Opus granules tick at 48 kHz and subtract the OpusHead pre-skip
    # (RFC 7845 §4) regardless of the input rate field
    b = encode_ogg_stream(
        "opus", rate=16000, channels=1, page_samples=(960, 960),
        pre_skip=312,
    )
    assert ogg_duration(b) == ("opus", 16000, 1, 1920, 40, True)
    # a stream that never closes (no EOS flag) reports eos=False —
    # the truncated-capture screen
    b = encode_ogg_stream("vorbis", page_samples=(1024,), eos=False)
    assert ogg_duration(b)[5] is False


def test_ogg_validation_raises():
    good = encode_ogg_stream()
    # per-page CRC is validated for real (RFC 3533 0x04C11DB7,
    # direct, zero init): one flipped payload bit raises
    bad = bytearray(good)
    bad[-5] ^= 0x01
    with pytest.raises(ValueError, match="CRC mismatch"):
        ogg_page_walk(bytes(bad))
    # the table-driven CRC matches the bitwise definition
    def crc_bitwise(data: bytes) -> int:
        crc = 0
        for byte in data:
            crc ^= byte << 24
            for _ in range(8):
                crc = (
                    ((crc << 1) ^ 0x04C11DB7)
                    if crc & 0x80000000
                    else (crc << 1)
                ) & 0xFFFFFFFF
        return crc

    for probe in (b"", b"OggS", bytes(range(256))):
        assert _ogg_crc(probe) == crc_bitwise(probe)
    # version, capture pattern, truncation, missing pages
    bad = bytearray(good)
    bad[4] = 1
    with pytest.raises(ValueError, match="unknown Ogg version"):
        ogg_page_walk(bytes(bad))
    with pytest.raises(ValueError, match="not an Ogg"):
        ogg_page_walk(b"junk")
    with pytest.raises(ValueError, match="truncated Ogg"):
        ogg_page_walk(good[:30])
    # excise a middle page → the sequence-number check catches it
    pages = []
    pos = 0
    while pos < len(good):
        nseg = good[pos + 26]
        end = pos + 27 + nseg + sum(good[pos + 27 : pos + 27 + nseg])
        pages.append(good[pos:end])
        pos = end
    with pytest.raises(ValueError, match="pages are missing"):
        ogg_page_walk(pages[0] + pages[1] + pages[3] + pages[4])
    # a stream with no BOS page is malformed
    with pytest.raises(ValueError, match="BOS"):
        ogg_page_walk(b"".join(pages[1:]))


def test_ogg_header_pass_fills_frames():
    from sample_keyspaces_cdc_streams_connectors_spark.llm.multimodal import parse_audio_header

    b = encode_ogg_stream(
        "vorbis", rate=22050, channels=1, page_samples=(512, 256)
    )
    assert parse_audio_header(b) == ("ogg", 1, 22050, None, 768)
    b = encode_ogg_stream(
        "opus", rate=48000, channels=2, page_samples=(960,), pre_skip=0
    )
    assert parse_audio_header(b) == ("ogg", 2, 48000, None, 960)
    # a corrupt tail degrades to NULL frames, never a wrong count
    bad = bytearray(
        encode_ogg_stream("vorbis", page_samples=(512, 256))
    )
    bad[-5] ^= 0x01
    assert parse_audio_header(bytes(bad)) == (
        "ogg", 2, 44100, None, None,
    )
