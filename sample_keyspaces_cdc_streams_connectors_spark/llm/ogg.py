"""REAL Ogg page walk (r13) — exact Vorbis/Opus duration without
entropy decode, the OGG mirror of the MP3 frame walk.

An Ogg physical stream (RFC 3533) is a sequence of self-delimiting
PAGES: a 27-byte header (capture pattern ``OggS``, version, type
flags, 64-bit granule position, serial, sequence number, CRC) plus a
segment lacing table.  Every field a corpus pipeline needs is in the
page layer: the LAST granule position of an audio stream is its total
PCM sample count (Vorbis: samples at the input rate; Opus: 48 kHz
ticks, minus the OpusHead pre-skip), so duration, sample counts, and
truncation detection (no EOS flag) are pure arithmetic — while the
entropy-coded packet payloads stay the documented decode boundary.

The page CRC is validated for real: RFC 3533's CRC-32 (generator
0x04C11DB7, direct/non-reflected, zero init, no final xor) over the
whole page with the CRC field zeroed — a corrupt page raises, never
a silent wrong count.

The fixture encoder writes genuine Ogg streams (BOS identification
page with a real VorbisHead/OpusHead, comment page, granule-stamped
data pages, EOS) that any Ogg tool reads.
"""

from __future__ import annotations

import struct

__all__ = [
    "encode_ogg_stream",
    "ogg_duration",
    "ogg_page_walk",
]


def _crc_table():
    table = []
    for byte in range(256):
        crc = byte << 24
        for _ in range(8):
            crc = ((crc << 1) ^ 0x04C11DB7) if crc & 0x80000000 else (
                crc << 1
            )
        table.append(crc & 0xFFFFFFFF)
    return table


_OGG_CRC_TABLE = _crc_table()


def _ogg_crc(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ _OGG_CRC_TABLE[
            ((crc >> 24) & 0xFF) ^ b
        ]
    return crc


def ogg_page_walk(payload: bytes | None):
    """Walk every page: returns a list of per-STREAM dicts (one per
    serial, in BOS order) with ``serial``, ``codec`` (``vorbis`` /
    ``opus`` / ``theora`` / None), ``n_pages``, ``last_granule`` (the
    last non-``-1`` granule position), ``eos`` (the stream closed
    properly), and for audio codecs the identification-header fields
    (``rate``, ``channels``, ``pre_skip``).  Validates the capture
    pattern, version, per-page CRC, and per-stream page sequence
    numbers — any violation raises ``ValueError``, never a silent
    wrong count."""
    b = payload or b""
    if b[:4] != b"OggS":
        raise ValueError("not an Ogg stream")
    streams: dict[int, dict] = {}
    order = []
    pos = 0
    while pos < len(b):
        if b[pos : pos + 4] != b"OggS":
            raise ValueError(f"Ogg capture pattern lost at byte {pos}")
        if pos + 27 > len(b):
            raise ValueError("truncated Ogg page header")
        version = b[pos + 4]
        if version != 0:
            raise ValueError(f"unknown Ogg version {version}")
        htype = b[pos + 5]
        (granule,) = struct.unpack("<q", b[pos + 6 : pos + 14])
        serial, seq, crc = struct.unpack("<IIi", b[pos + 14 : pos + 26])
        crc &= 0xFFFFFFFF
        nseg = b[pos + 26]
        table_end = pos + 27 + nseg
        if table_end > len(b):
            raise ValueError("truncated Ogg segment table")
        body_len = sum(b[pos + 27 : table_end])
        page_end = table_end + body_len
        if page_end > len(b):
            raise ValueError("truncated Ogg page body")
        page = bytearray(b[pos:page_end])
        page[22:26] = b"\x00\x00\x00\x00"
        if _ogg_crc(bytes(page)) != crc:
            raise ValueError(f"Ogg page CRC mismatch at byte {pos}")
        st = streams.get(serial)
        if st is None:
            if not htype & 0x02:
                raise ValueError(
                    "Ogg stream starts without a BOS page"
                )
            body = b[table_end:page_end]
            codec = rate = channels = None
            pre_skip = 0
            if body[:7] == b"\x01vorbis" and len(body) >= 16:
                codec = "vorbis"
                channels = body[11]
                (rate,) = struct.unpack("<I", body[12:16])
            elif body[:8] == b"OpusHead" and len(body) >= 19:
                codec = "opus"
                channels = body[9]
                (pre_skip,) = struct.unpack("<H", body[10:12])
                (rate,) = struct.unpack("<I", body[12:16])
            elif body[:7] == b"\x80theora":
                codec = "theora"
            st = streams[serial] = {
                "serial": serial,
                "codec": codec,
                "rate": rate,
                "channels": channels,
                "pre_skip": pre_skip,
                "n_pages": 0,
                "last_granule": None,
                "eos": False,
                "_seq": seq,
            }
            order.append(serial)
        else:
            if htype & 0x02:
                raise ValueError("duplicate Ogg BOS page")
            if seq != st["_seq"] + 1:
                raise ValueError(
                    f"Ogg page sequence jump in stream {serial} "
                    f"({st['_seq']} -> {seq}): pages are missing"
                )
            st["_seq"] = seq
        st["n_pages"] += 1
        if granule != -1:
            st["last_granule"] = granule
        if htype & 0x04:
            st["eos"] = True
        pos = page_end
    out = []
    for serial in order:
        st = streams[serial]
        st.pop("_seq")
        out.append(st)
    return out


def ogg_duration(payload: bytes | None):
    """``(codec, rate, channels, n_samples, duration_ms, eos)`` for
    the first AUDIO stream: the total PCM frame count comes from the
    last granule position (Opus granules tick at 48 kHz regardless of
    input rate, minus the OpusHead pre-skip, per RFC 7845 §4;
    ``duration_ms`` floors — oracle-reproducible).  ``eos=False``
    flags a truncated capture (the stream never closed).  Raises
    ``ValueError`` for streams with no audio BOS page."""
    for st in ogg_page_walk(payload):
        if st["codec"] == "vorbis":
            g = st["last_granule"] or 0
            rate = st["rate"] or 0
            dur = g * 1000 // rate if rate else None
            return ("vorbis", st["rate"], st["channels"], g, dur,
                    st["eos"])
        if st["codec"] == "opus":
            g = max((st["last_granule"] or 0) - st["pre_skip"], 0)
            return (
                "opus",
                st["rate"],
                st["channels"],
                g,
                g * 1000 // 48000,
                st["eos"],
            )
    raise ValueError("Ogg stream carries no Vorbis/Opus audio")


def _page(
    serial: int,
    seq: int,
    granule: int,
    packets: list,
    bos: bool = False,
    eos: bool = False,
) -> bytes:
    """Serialize one page from whole packets (each laced 255,...,<255
    per RFC 3533 — packets here never span pages)."""
    lacing = bytearray()
    body = bytearray()
    for p in packets:
        q, r = divmod(len(p), 255)
        lacing += b"\xff" * q + bytes([r])
        body += p
    if len(lacing) > 255:
        raise ValueError("too many segments for one page")
    htype = (0x02 if bos else 0) | (0x04 if eos else 0)
    head = (
        b"OggS\x00"
        + bytes([htype])
        + struct.pack("<q", granule)
        + struct.pack("<III", serial, seq, 0)
        + bytes([len(lacing)])
        + bytes(lacing)
    )
    page = bytearray(head + bytes(body))
    crc = _ogg_crc(bytes(page))
    page[22:26] = struct.pack("<I", crc)
    return bytes(page)


def encode_ogg_stream(
    codec: str = "vorbis",
    rate: int = 44100,
    channels: int = 2,
    page_samples=(1024, 1024, 512),
    pre_skip: int = 312,
    serial: int = 0x1234,
    eos: bool = True,
    comment_packet: bytes | None = None,
) -> bytes:
    """Build a REAL Ogg stream: BOS page with a genuine
    identification header (``\\x01vorbis`` / ``OpusHead``), a comment
    header page, then one data page per ``page_samples`` entry with
    properly accumulating granule positions (Opus granules tick at
    48 kHz and include the pre-skip, per RFC 7845) and correct CRCs
    throughout.  The packet payloads are deterministic filler — the
    page layer is what the walker reads; entropy decode is the
    documented boundary.  The fixture mirror of
    :func:`ogg_page_walk`."""
    if codec == "vorbis":
        ident = (
            b"\x01vorbis"
            + struct.pack("<I", 0)  # version
            + bytes([channels])
            + struct.pack("<I", rate)
            + struct.pack("<iii", -1, rate * 16, -1)  # bitrates
            + b"\xb8"  # blocksizes 2^8/2^11
            + b"\x01"  # framing bit
        )
        comment = b"\x03vorbis" + struct.pack("<II", 6, 0) + b"engine\x01"
    elif codec == "opus":
        ident = (
            b"OpusHead"
            + bytes([1, channels])
            + struct.pack("<H", pre_skip)
            + struct.pack("<I", rate)
            + struct.pack("<h", 0)  # output gain
            + bytes([0])  # mapping family
        )
        comment = b"OpusTags" + struct.pack("<II", 6, 0) + b"engine"
    else:
        raise ValueError(f"unsupported fixture codec {codec!r}")
    if comment_packet is not None:
        comment = comment_packet
    pages = [_page(serial, 0, 0, [ident], bos=True)]
    pages.append(_page(serial, 1, 0, [comment]))
    granule = pre_skip if codec == "opus" else 0
    for i, n in enumerate(page_samples):
        granule += n
        data = bytes((serial + i * 31 + k * 7) % 251 for k in range(300))
        pages.append(
            _page(
                serial,
                2 + i,
                granule,
                [data],
                eos=eos and i == len(page_samples) - 1,
            )
        )
    return b"".join(pages)
