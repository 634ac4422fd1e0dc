"""REAL media text-tag extraction (r13) — the textual metadata
(title / artist / album / comments) embedded in crawl audio, decoded
into the TEXT pipeline.

Four public tag systems cover every container this engine reads:

- **ID3v2** (the informal id3.org specification, versions 2.2/2.3/
  2.4) — the tag block prepended to MP3 files: a syncsafe-sized
  header, then frames (3-byte ids/sizes in v2.2; 4-byte ids, plain
  sizes in v2.3; syncsafe sizes in v2.4).  Text frames (``T…``)
  carry an encoding byte (latin-1 / UTF-16 with BOM / UTF-16BE /
  UTF-8) and null-separated values; ``TXXX`` and ``COMM`` carry
  descriptions.  Unsynchronization (the ``FF 00 → FF`` escape) is
  undone globally (v2.3 tag flag) or per frame (v2.4 format flag).
  Compressed/encrypted frames are skipped — a documented boundary,
  never garbled text.
- **Vorbis comments** (the Xiph VorbisComment spec) — length-prefixed
  UTF-8 ``KEY=value`` pairs: the second packet of an Ogg Vorbis
  stream (``\\x03vorbis``), the ``OpusTags`` packet of an Ogg Opus
  stream (RFC 7845 §5.2), and FLAC metadata block type 4 (same
  structure, no framing magic).  Ogg packets are reassembled from
  page lacing for real (a comment packet larger than one page spans
  pages via the 255-continuation rule).
- **MP4 iTunes-style metadata** (ISO 14496-12 udta/meta + the
  de-facto ``ilst`` item list): UTF-8 ``data`` atoms under ``©nam``/
  ``©ART``-style item boxes.
- **Matroska Tags** (the Matroska spec's tagging chapter): Tag →
  SimpleTag → TagName/TagString UTF-8 pairs, nesting flattened.
- Everything returns ``(key, value)`` rows — normalized lower-case
  keys for vorbis (the spec says keys are case-insensitive), frame
  ids for ID3, item/tag names verbatim for MP4/Matroska.

Malformed structures raise ``ValueError``; unrecognized payloads
raise ``NotImplementedError`` — the same honesty contract as every
codec in this package.
"""

from __future__ import annotations

import struct

__all__ = [
    "encode_id3v2",
    "encode_vorbis_comment_block",
    "extract_media_tags",
    "media_text_tags",
    "parse_id3v2_text",
    "parse_vorbis_comments",
]

_ID3_ENCODINGS = {0: "latin-1", 1: "utf-16", 2: "utf-16-be", 3: "utf-8"}


def _syncsafe(b: bytes) -> int:
    v = 0
    for byte in b:
        if byte & 0x80:
            raise ValueError("ID3 syncsafe byte with bit 7 set")
        v = (v << 7) | byte
    return v


def _de_unsync(b: bytes) -> bytes:
    return b.replace(b"\xff\x00", b"\xff")


def _id3_text(body: bytes) -> list:
    """Decode one text-frame body: encoding byte + null-separated
    values (the v2.4 multi-value convention; a trailing null is
    not a value)."""
    if not body:
        raise ValueError("empty ID3 text frame")
    enc = _ID3_ENCODINGS.get(body[0])
    if enc is None:
        raise ValueError(f"unknown ID3 text encoding {body[0]}")
    raw = body[1:]
    null = b"\x00\x00" if enc.startswith("utf-16") else b"\x00"
    # split on the encoding's null; utf-16 needs even alignment
    parts = []
    if enc.startswith("utf-16"):
        units = [raw[i : i + 2] for i in range(0, len(raw) - 1, 2)]
        cur = b""
        for u in units:
            if u == b"\x00\x00":
                parts.append(cur)
                cur = b""
            else:
                cur += u
        parts.append(cur)
    else:
        parts = raw.split(null)
    out = []
    for p in parts:
        if not p:
            continue
        out.append(p.decode(enc, "replace"))
    return out


def parse_id3v2_text(payload: bytes | None) -> list:
    """``[(frame_id, text), ...]`` from a leading ID3v2 tag —
    text frames (``T…``, with ``TXXX`` rendered ``TXXX:desc``) and
    comments (``COMM:desc``).  Supports v2.2 (3-byte ids/sizes),
    v2.3 (plain sizes, global unsynchronization), and v2.4 (syncsafe
    sizes, per-frame unsynchronization).  Compressed or encrypted
    frames are skipped; a payload without an ID3v2 tag returns
    ``[]``; malformed structure raises ``ValueError``."""
    b = payload or b""
    if b[:3] != b"ID3" or len(b) < 10:
        return []
    major = b[3]
    if major not in (2, 3, 4):
        raise ValueError(f"unsupported ID3v2.{major} tag")
    flags = b[5]
    size = _syncsafe(b[6:10])
    tag = b[10 : 10 + size]
    if len(tag) < size:
        raise ValueError("truncated ID3v2 tag")
    if flags & 0x80 and major <= 3:  # global unsynchronization
        tag = _de_unsync(tag)
    pos = 0
    if flags & 0x40:  # extended header
        if major == 4:
            ext = _syncsafe(tag[0:4])
        else:
            (ext,) = struct.unpack(">I", tag[0:4])
            ext += 4  # v2.3 size excludes its own size field
        pos += ext
    out = []
    id_len = 3 if major == 2 else 4
    # the guard must cover the FULL frame header (id + size + flags:
    # 6 bytes for v2.2, 10 for v2.3/2.4), not just the id+size pair —
    # otherwise a tag truncated mid-header slices short and raises
    # struct.error instead of the documented ValueError
    hdr_len = 6 if major == 2 else 10
    while pos + hdr_len <= len(tag):
        fid = tag[pos : pos + id_len]
        if fid == b"\x00" * id_len:
            break  # padding
        if major == 2:
            fsize = int.from_bytes(tag[pos + 3 : pos + 6], "big")
            body = tag[pos + 6 : pos + 6 + fsize]
            pos += 6 + fsize
            fflags = 0
        else:
            if major == 4:
                fsize = _syncsafe(tag[pos + 4 : pos + 8])
            else:
                (fsize,) = struct.unpack(">I", tag[pos + 4 : pos + 8])
            fflags = struct.unpack(">H", tag[pos + 8 : pos + 10])[0]
            body = tag[pos + 10 : pos + 10 + fsize]
            pos += 10 + fsize
        if len(body) < fsize:
            raise ValueError("truncated ID3v2 frame")
        name = fid.decode("ascii", "replace")
        if major == 4 and fflags & 0x02:  # per-frame unsync
            body = _de_unsync(body)
        # skip compressed/encrypted frames (documented boundary,
        # never garbled text): v2.3 format byte uses 0x80/0x40,
        # v2.4 uses 0x08/0x04
        if (major == 3 and fflags & 0x00C0) or (
            major == 4 and fflags & 0x000C
        ):
            continue
        if name.startswith("T") and name not in ("TXX", "TXXX"):
            for v in _id3_text(body):
                out.append((name, v))
        elif name in ("TXX", "TXXX"):
            vals = _id3_text(body)
            if vals:
                desc, rest = vals[0], vals[1:]
                for v in rest or [""]:
                    out.append((f"{name}:{desc}", v))
        elif name in ("COM", "COMM") and len(body) >= 4:
            enc = body[0]
            lang = body[1:4].decode("ascii", "replace")
            vals = _id3_text(bytes([enc]) + body[4:])
            if vals:
                desc, rest = vals[0], vals[1:]
                text = rest[0] if rest else desc
                d = desc if rest else ""
                out.append((f"{name}:{lang}:{d}", text))
    return out


def parse_vorbis_comments(packet: bytes) -> list:
    """``[(key, value), ...]`` from a VorbisComment structure (after
    any framing magic): vendor string, then count × length-prefixed
    UTF-8 ``KEY=value``.  Keys normalize to lower-case (the spec
    makes them case-insensitive); the vendor string is emitted under
    the ``vendor`` key."""
    if len(packet) < 8:
        raise ValueError("truncated vorbis comment header")
    (vlen,) = struct.unpack("<I", packet[0:4])
    pos = 4 + vlen
    if pos + 4 > len(packet):
        raise ValueError("truncated vorbis comment vendor")
    out = [("vendor", packet[4:pos].decode("utf-8", "replace"))]
    (count,) = struct.unpack("<I", packet[pos : pos + 4])
    pos += 4
    for _ in range(count):
        if pos + 4 > len(packet):
            raise ValueError("truncated vorbis comment list")
        (clen,) = struct.unpack("<I", packet[pos : pos + 4])
        pos += 4
        if pos + clen > len(packet):
            raise ValueError("truncated vorbis comment entry")
        entry = packet[pos : pos + clen].decode("utf-8", "replace")
        pos += clen
        key, eq, value = entry.partition("=")
        if not eq:
            raise ValueError("vorbis comment entry without '='")
        out.append((key.lower(), value))
    return out


def _ogg_packets(b: bytes, want: int):
    """Reassemble the first ``want`` packets of the FIRST Ogg stream
    from page lacing (255-continuation rule; packets may span
    pages)."""
    packets = []
    cur = b""
    serial0 = None
    pos = 0
    while pos < len(b) and len(packets) < want:
        if b[pos : pos + 4] != b"OggS":
            raise ValueError("Ogg capture pattern lost")
        serial = struct.unpack("<I", b[pos + 14 : pos + 18])[0]
        nseg = b[pos + 26]
        table = b[pos + 27 : pos + 27 + nseg]
        body = pos + 27 + nseg
        if serial0 is None:
            serial0 = serial
        take = serial == serial0
        off = body
        for lace in table:
            if take:
                cur += b[off : off + lace]
                if lace < 255:
                    packets.append(cur)
                    cur = b""
                    if len(packets) >= want:
                        break
            off += lace
        pos = body + sum(table)
    return packets


def parse_mp4_ilst(payload: bytes) -> list:
    """``[(key, value), ...]`` from an MP4's iTunes-style metadata:
    moov → udta → meta (a FULL box — 4 version/flags bytes before its
    children, per ISO 14496-12) → ilst, whose item boxes (``©nam``,
    ``©ART``, ...) each carry a ``data`` box whose type flag 1 marks
    UTF-8 text (non-text data atoms are skipped).  Returns ``[]``
    when the chain is absent."""
    from sample_keyspaces_cdc_streams_connectors_spark.llm.multimodal import (
        _mp4_boxes,
        _mp4_find_box,
    )

    b = payload
    moov = _mp4_find_box(b, 0, len(b), b"moov")
    if moov is None:
        return []
    udta = _mp4_find_box(b, *moov, b"udta")
    if udta is None:
        return []
    meta = _mp4_find_box(b, *udta, b"meta")
    if meta is None:
        return []
    ilst = _mp4_find_box(b, meta[0] + 4, meta[1], b"ilst")
    if ilst is None:
        return []
    out = []
    for item, istart, iend in _mp4_boxes(b, *ilst):
        data = _mp4_find_box(b, istart, iend, b"data")
        if data is None:
            continue
        ds, de = data
        if de - ds < 8:
            raise ValueError("truncated MP4 data atom")
        type_flags = int.from_bytes(b[ds : ds + 4], "big") & 0xFFFFFF
        if type_flags != 1:  # not UTF-8 text
            continue
        key = item.decode("latin-1")
        out.append((key, b[ds + 8 : de].decode("utf-8", "replace")))
    return out


# Matroska tagging elements (the Matroska spec's Tags chapter)
_MKV_TAGS = 0x1254C367
_MKV_TAG = 0x7373
_MKV_SIMPLE_TAG = 0x67C8
_MKV_TAG_NAME = 0x45A3
_MKV_TAG_STRING = 0x4487


def parse_mkv_tags(payload: bytes) -> list:
    """``[(key, value), ...]`` from a Matroska Segment's Tags element
    (Tags → Tag → SimpleTag → TagName/TagString, both UTF-8) —
    nested SimpleTags flatten.  Returns ``[]`` when absent."""
    from sample_keyspaces_cdc_streams_connectors_spark.llm.mkv import _ebml_elements, _walk_segment

    b = payload
    _doctype, children = _walk_segment(b)
    out = []

    def simple_tags(lo: int, hi: int):
        for eid, s, e, _u in _ebml_elements(b, lo, hi):
            if eid != _MKV_SIMPLE_TAG:
                continue
            name = value = None
            for c, cs, ce, _cu in _ebml_elements(b, s, e):
                if c == _MKV_TAG_NAME:
                    name = b[cs:ce].decode("utf-8", "replace")
                elif c == _MKV_TAG_STRING:
                    value = b[cs:ce].decode("utf-8", "replace")
            if name is not None:
                out.append((name, value or ""))
            simple_tags(s, e)  # SimpleTags nest, per spec

    for eid, s, e, _u in children:
        if eid != _MKV_TAGS:
            continue
        for t, ts, te, _tu in _ebml_elements(b, s, e):
            if t == _MKV_TAG:
                simple_tags(ts, te)
    return out


def extract_media_tags(payload: bytes | None) -> list:
    """Dispatch: ``[(source, key, value), ...]`` — ID3v2 text frames
    from an MP3 (or any ID3-prefixed payload), the comment header of
    an Ogg Vorbis/Opus stream, a FLAC VORBIS_COMMENT metadata
    block, an MP4's iTunes-style ``ilst`` items, or a Matroska
    Segment's Tags element.  Payloads of these formats WITHOUT tags
    return ``[]``; unrecognized formats raise
    ``NotImplementedError``."""
    b = payload or b""
    if b[:3] == b"ID3" or (
        len(b) >= 2 and b[0] == 0xFF and (b[1] & 0xE0) == 0xE0
    ):
        return [("id3", k, v) for k, v in parse_id3v2_text(b)]
    if b[:4] == b"OggS":
        packets = _ogg_packets(b, 2)
        if len(packets) < 2:
            return []
        p2 = packets[1]
        if p2[:7] == b"\x03vorbis":
            body = p2[7:]
        elif p2[:8] == b"OpusTags":
            body = p2[8:]
        else:
            return []
        return [
            ("vorbis", k, v) for k, v in parse_vorbis_comments(body)
        ]
    if b[:4] == b"fLaC":
        pos = 4
        while pos + 4 <= len(b):
            header = b[pos]
            (length,) = struct.unpack(">I", b"\x00" + b[pos + 1 : pos + 4])
            if (header & 0x7F) == 4:  # VORBIS_COMMENT block
                block = b[pos + 4 : pos + 4 + length]
                if len(block) < length:
                    raise ValueError("truncated FLAC comment block")
                return [
                    ("vorbis", k, v)
                    for k, v in parse_vorbis_comments(block)
                ]
            pos += 4 + length
            if header & 0x80:
                break
        return []
    if len(b) >= 12 and b[4:8] == b"ftyp":
        return [("ilst", k, v) for k, v in parse_mp4_ilst(b)]
    if b[:4] == b"\x1aE\xdf\xa3":
        return [("mkv", k, v) for k, v in parse_mkv_tags(b)]
    raise NotImplementedError(
        "no tag reader for this payload (ID3v2/MP3, Ogg, FLAC, MP4, "
        "Matroska)"
    )


def media_text_tags(media, id_col: str = "media_id"):
    """Spark operator: one output row per extracted tag —
    ``(media_id, source, key, value)`` (mapInPandas; rows out ≠ rows
    in).  Untagged payloads of recognized formats contribute zero
    rows; unrecognized/malformed payloads contribute one NULL-source
    row so the media id is never silently dropped — the corpus-text
    recovery pass (captions, titles, artists) a multimodal pipeline
    feeds into its text cleaning."""
    from typing import Iterator

    import pandas as pd

    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("source", StringType(), True),
            StructField("key", StringType(), True),
            StructField("value", StringType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mids, srcs, keys, vals = [], [], [], []
            for mid, p in zip(pdf[id_col], pdf["payload"]):
                try:
                    rows = extract_media_tags(bytes(p or b""))
                except (ValueError, NotImplementedError, struct.error):
                    rows = None
                if not rows:
                    if rows is None:
                        mids.append(int(mid))
                        srcs.append(None)
                        keys.append(None)
                        vals.append(None)
                    continue
                for source, k, v in rows:
                    mids.append(int(mid))
                    srcs.append(source)
                    keys.append(k)
                    vals.append(v)
            yield pd.DataFrame(
                {
                    "media_id": pd.array(mids, dtype="int64"),
                    "source": srcs,
                    "key": keys,
                    "value": vals,
                }
            )

    return media.mapInPandas(run, schema)


# --- fixture encoders ---------------------------------------------------------


def encode_id3v2(
    frames: list,
    version: int = 3,
    unsync: bool = False,
    padding: int = 0,
) -> bytes:
    """Serialize a REAL ID3v2.2/2.3/2.4 tag from ``[(frame_id,
    text), ...]`` (UTF-8 encoding byte 3 for v2.3/2.4; latin-1 for
    v2.2, which predates it).  ``unsync`` applies the global
    FF-escape (v2.3 flag bit).  Prepend the result to any MP3 stream
    — the fixture mirror of :func:`parse_id3v2_text`."""
    if version not in (2, 3, 4):
        raise ValueError("version must be 2, 3, or 4")
    body = b""
    for fid, text in frames:
        fid_b = fid.encode("ascii")
        if version == 2:
            if len(fid_b) != 3:
                raise ValueError("v2.2 frame ids are 3 bytes")
            payload = b"\x00" + text.encode("latin-1", "replace")
            body += fid_b + len(payload).to_bytes(3, "big") + payload
        else:
            if len(fid_b) != 4:
                raise ValueError("frame ids are 4 bytes")
            payload = b"\x03" + text.encode("utf-8")
            if version == 4:
                size = bytes(
                    (len(payload) >> s) & 0x7F for s in (21, 14, 7, 0)
                )
            else:
                size = struct.pack(">I", len(payload))
            body += fid_b + size + b"\x00\x00" + payload
    body += bytes(padding)
    flags = 0
    if unsync:
        body = body.replace(b"\xff", b"\xff\x00")
        flags |= 0x80
    size = len(body)
    header = (
        b"ID3"
        + bytes([version, 0, flags])
        + bytes((size >> s) & 0x7F for s in (21, 14, 7, 0))
    )
    return header + body


def encode_vorbis_comment_block(
    comments: list, vendor: str = "engine", last: bool = True
) -> bytes:
    """A REAL FLAC VORBIS_COMMENT metadata block (type 4) from
    ``[(key, value), ...]`` — splice after STREAMINFO (clearing its
    last-block flag) to tag a FLAC fixture."""
    body = struct.pack("<I", len(vendor.encode())) + vendor.encode()
    body += struct.pack("<I", len(comments))
    for k, v in comments:
        entry = f"{k}={v}".encode("utf-8")
        body += struct.pack("<I", len(entry)) + entry
    header = bytes([(0x80 if last else 0) | 4]) + len(body).to_bytes(
        3, "big"
    )
    return header + body


def add_mp4_tags(mp4: bytes, tags: list) -> bytes:
    """Splice a REAL iTunes-style metadata chain (udta → meta(full
    box, with the customary ``hdlr`` of type ``mdir``) → ilst →
    item/data atoms, UTF-8 type flag 1) into an existing MP4's moov
    box — the fixture mirror of :func:`parse_mp4_ilst`.  Chunk
    offsets are unaffected: our fixtures put moov after mdat, and
    only moov's own size field changes."""

    def box(tag: bytes, body: bytes) -> bytes:
        return struct.pack(">I", len(body) + 8) + tag + body

    items = b""
    for key, value in tags:
        data = box(
            b"data",
            struct.pack(">I", 1)  # version 0 + type flag 1 (UTF-8)
            + struct.pack(">I", 0)  # locale
            + value.encode("utf-8"),
        )
        items += box(key.encode("latin-1"), data)
    hdlr = box(
        b"hdlr",
        struct.pack(">II", 0, 0) + b"mdir" + b"appl" + bytes(9),
    )
    udta = box(b"udta", box(b"meta", struct.pack(">I", 0) + hdlr
                            + box(b"ilst", items)))
    # locate the top-level moov and grow it in place
    pos = 0
    while pos + 8 <= len(mp4):
        (size,) = struct.unpack(">I", mp4[pos : pos + 4])
        tag = mp4[pos + 4 : pos + 8]
        if tag == b"moov":
            new_size = size + len(udta)
            return (
                mp4[:pos]
                + struct.pack(">I", new_size)
                + mp4[pos + 4 : pos + size]
                + udta
                + mp4[pos + size :]
            )
        pos += size
    raise ValueError("MP4 without a moov box")


def mkv_tags_element(tags: list) -> bytes:
    """A REAL Matroska Tags element (Tags → Tag → SimpleTag ×
    name/string) — splice into a Segment body to tag an MKV fixture
    (:func:`sample_keyspaces_cdc_streams_connectors_spark.llm.mkv.encode_mkv_mjpeg` accepts it via
    ``extra_segment``)."""
    from sample_keyspaces_cdc_streams_connectors_spark.llm.mkv import _el

    simple = b""
    for k, v in tags:
        simple += _el(
            _MKV_SIMPLE_TAG,
            _el(_MKV_TAG_NAME, k.encode("utf-8"))
            + _el(_MKV_TAG_STRING, v.encode("utf-8")),
        )
    return _el(_MKV_TAGS, _el(_MKV_TAG, simple))


def vorbis_comment_packet(comments: list, opus: bool = False) -> bytes:
    """The Ogg comment-header PACKET (``\\x03vorbis`` / ``OpusTags``
    framing + the comment structure) — hand to the Ogg fixture
    encoder as its comment page."""
    block = encode_vorbis_comment_block(comments)[4:]  # strip header
    if opus:
        return b"OpusTags" + block
    return b"\x03vorbis" + block + b"\x01"  # vorbis framing bit
