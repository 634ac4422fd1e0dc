"""REAL subtitle/caption parsing (r13) — SRT and WebVTT cues into
timed text rows.

Captions are the highest-value TEXT a video corpus carries: aligned
transcript spans for speech/vision training.  Both wire formats are
public and plain text: SubRip (SRT — numbered blocks,
``HH:MM:SS,mmm --> HH:MM:SS,mmm`` with a comma decimal) and WebVTT
(the W3C spec — a ``WEBVTT`` header, optional cue identifiers,
``.``-decimal timestamps with optional hours, cue settings after the
arrow, ``NOTE``/``STYLE``/``REGION`` blocks).  Parsing is exact
integer millisecond arithmetic; malformed timestamps or block
structure raise ``ValueError`` — never silently dropped or wrong
cues.

``subtitle_cues`` is the Spark operator: one row per cue
(mapInPandas, rows-out ≠ rows-in), joining cleanly against the
audio/video duration columns the other r13 operators emit.
"""

from __future__ import annotations

import re

__all__ = [
    "encode_mp4_timed_text",
    "extract_mp4_text_cues",
    "extract_subtitle_cues",
    "format_srt",
    "format_webvtt",
    "parse_srt",
    "parse_webvtt",
    "subtitle_cues",
]

_SRT_TS = re.compile(r"^(\d{1,2}):(\d{2}):(\d{2}),(\d{3})$")
_VTT_TS = re.compile(r"^(?:(\d{1,4}):)?(\d{2}):(\d{2})\.(\d{3})$")


def _srt_ms(tok: str) -> int:
    m = _SRT_TS.match(tok.strip())
    if not m:
        raise ValueError(f"malformed SRT timestamp {tok.strip()!r}")
    h, mi, s, ms = map(int, m.groups())
    if mi > 59 or s > 59:
        raise ValueError(f"SRT timestamp field out of range {tok!r}")
    return ((h * 60 + mi) * 60 + s) * 1000 + ms


def _vtt_ms(tok: str) -> int:
    m = _VTT_TS.match(tok.strip())
    if not m:
        raise ValueError(f"malformed WebVTT timestamp {tok.strip()!r}")
    h, mi, s, ms = m.groups()
    h = int(h) if h is not None else 0
    mi, s, ms = int(mi), int(s), int(ms)
    if mi > 59 or s > 59:
        raise ValueError(f"WebVTT timestamp field out of range {tok!r}")
    return ((h * 60 + mi) * 60 + s) * 1000 + ms


def _blocks(text: str):
    """yield blank-line-separated blocks as line lists (CRLF/CR
    normalized; a UTF-8 BOM on the first line stripped)."""
    text = text.lstrip("﻿").replace("\r\n", "\n").replace("\r", "\n")
    block: list[str] = []
    for line in text.split("\n"):
        if line.strip() == "":
            if block:
                yield block
                block = []
        else:
            block.append(line)
    if block:
        yield block


def parse_srt(text: str) -> list:
    """``[(cue_idx, start_ms, end_ms, text), ...]`` from SubRip:
    numbered blocks, comma-decimal timestamps, multi-line cue text
    joined with newlines.  The sequence numbers the FILE carries are
    returned (they need not be dense); ``end <= start`` or a
    non-numeric header raises."""
    out = []
    for block in _blocks(text):
        if len(block) < 2:
            raise ValueError("SRT block without timestamp line")
        try:
            idx = int(block[0].strip())
        except ValueError:
            raise ValueError(
                f"SRT block header is not a sequence number: "
                f"{block[0]!r}"
            ) from None
        if "-->" not in block[1]:
            raise ValueError("SRT block without '-->' timing line")
        start_tok, _, end_tok = block[1].partition("-->")
        start, end = _srt_ms(start_tok), _srt_ms(end_tok)
        if end <= start:
            raise ValueError(
                f"SRT cue {idx} ends at or before its start"
            )
        out.append((idx, start, end, "\n".join(block[2:])))
    return out


def parse_webvtt(text: str) -> list:
    """``[(cue_idx, start_ms, end_ms, text), ...]`` from WebVTT:
    the ``WEBVTT`` header line (with optional trailing text), then
    cue blocks — an optional identifier line, the timing line
    (dot-decimal, hours optional, cue settings after the end
    timestamp ignored), and the payload.  ``NOTE``/``STYLE``/
    ``REGION`` blocks are skipped.  Cues index densely from 0 (the
    format has no mandatory numbering)."""
    blocks = list(_blocks(text))
    # the spec requires "WEBVTT" followed by a space, tab, or end of
    # line — "WEBVTTXYZ" is NOT a valid signature
    if (
        not blocks
        or not blocks[0][0].startswith("WEBVTT")
        or (
            len(blocks[0][0]) > 6
            and blocks[0][0][6] not in (" ", "\t")
        )
    ):
        raise ValueError("not a WebVTT file (missing WEBVTT header)")
    first = blocks[0][1:]  # header block may carry metadata lines
    out = []
    idx = 0
    rest = ([first] if any("-->" in ln for ln in first) else []) + blocks[
        1:
    ]
    for block in rest:
        if block[0].split()[0] in ("NOTE", "STYLE", "REGION"):
            continue
        timing_i = next(
            (i for i, ln in enumerate(block) if "-->" in ln), None
        )
        if timing_i is None or timing_i > 1:
            raise ValueError("WebVTT cue block without a timing line")
        start_tok, _, tail = block[timing_i].partition("-->")
        end_tok = tail.strip().split()[0] if tail.strip() else ""
        start, end = _vtt_ms(start_tok), _vtt_ms(end_tok)
        if end <= start:
            raise ValueError("WebVTT cue ends at or before its start")
        out.append(
            (idx, start, end, "\n".join(block[timing_i + 1 :]))
        )
        idx += 1
    return out


def extract_subtitle_cues(payload: bytes | None) -> list:
    """Dispatch on shape: a Matroska container (the ``S_TEXT/UTF8``
    subtitle track — how video files carry SRT internally), WebVTT
    (``WEBVTT`` magic, BOM-tolerant), or SubRip (first block starts
    with a sequence number and a ``-->`` line).  Returns
    ``[(cue_idx, start_ms, end_ms, text), ...]``; payloads that are
    none of these raise ``NotImplementedError``."""
    b = payload or b""
    if b[:4] == b"\x1aE\xdf\xa3":
        # a Matroska container: pull the S_TEXT/UTF8 track (r13 —
        # how real video files carry SRT internally)
        from sample_keyspaces_cdc_streams_connectors_spark.llm.mkv import extract_mkv_subtitle_cues

        return extract_mkv_subtitle_cues(b)
    if len(b) >= 12 and b[4:8] == b"ftyp":
        # an ISO-BMFF container: the tx3g timed-text track (r14 —
        # the MP4 counterpart of the in-MKV S_TEXT path)
        return extract_mp4_text_cues(b)
    text = b.decode("utf-8", "replace")
    probe = text.lstrip("﻿")
    if probe.startswith("WEBVTT"):
        return parse_webvtt(text)
    lines = [ln for ln in probe.replace("\r", "").split("\n") if ln.strip()]
    if (
        len(lines) >= 2
        and lines[0].strip().isdigit()
        and "-->" in lines[1]
    ):
        return parse_srt(text)
    raise NotImplementedError(
        "not a recognized subtitle format (SRT, WebVTT)"
    )


def subtitle_cues(media, id_col: str = "media_id"):
    """Spark operator: one row per cue — ``(media_id, cue_idx,
    start_ms, end_ms, text)`` via mapInPandas.  Unrecognized or
    malformed payloads contribute one NULL-cue row so the id is
    never silently dropped (the tag-extraction contract)."""
    from typing import Iterator

    import pandas as pd

    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("cue_idx", IntegerType(), True),
            StructField("start_ms", LongType(), True),
            StructField("end_ms", LongType(), True),
            StructField("text", StringType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mids, idxs, starts, ends, texts = [], [], [], [], []
            for mid, p in zip(pdf[id_col], pdf["payload"]):
                try:
                    cues = extract_subtitle_cues(bytes(p or b""))
                except (ValueError, NotImplementedError):
                    cues = None
                if not cues:
                    mids.append(int(mid))
                    idxs.append(None)
                    starts.append(None)
                    ends.append(None)
                    texts.append(None)
                    continue
                for i, s, e, t in cues:
                    mids.append(int(mid))
                    idxs.append(i)
                    starts.append(s)
                    ends.append(e)
                    texts.append(t)
            yield pd.DataFrame(
                {
                    "media_id": pd.array(mids, dtype="int64"),
                    "cue_idx": pd.array(idxs, dtype="Int32"),
                    "start_ms": pd.array(starts, dtype="Int64"),
                    "end_ms": pd.array(ends, dtype="Int64"),
                    "text": texts,
                }
            )

    return media.mapInPandas(run, schema)


# --- fixture writers ----------------------------------------------------------


def _srt_ts_str(ms: int) -> str:
    h, rem = divmod(ms, 3_600_000)
    mi, rem = divmod(rem, 60_000)
    s, msec = divmod(rem, 1000)
    return f"{h:02d}:{mi:02d}:{s:02d},{msec:03d}"


def _vtt_ts_str(ms: int) -> str:
    return _srt_ts_str(ms).replace(",", ".")


def format_srt(cues: list) -> bytes:
    """Serialize ``[(idx, start_ms, end_ms, text), ...]`` as a REAL
    SubRip file (CRLF blocks, comma decimals) — the fixture mirror of
    :func:`parse_srt`."""
    blocks = []
    for idx, start, end, text in cues:
        blocks.append(
            f"{idx}\r\n{_srt_ts_str(start)} --> "
            f"{_srt_ts_str(end)}\r\n{text}"
        )
    return ("\r\n\r\n".join(blocks) + "\r\n").encode("utf-8")


def format_webvtt(cues: list, note: str | None = None) -> bytes:
    """Serialize cues as a REAL WebVTT file (header, optional NOTE
    block, dot decimals, a cue-settings token on odd cues so the
    parser's settings-skip is exercised)."""
    parts = ["WEBVTT"]
    if note:
        parts.append(f"NOTE {note}")
    for k, (idx, start, end, text) in enumerate(cues):
        settings = " align:start" if k % 2 else ""
        parts.append(
            f"cue-{idx}\n{_vtt_ts_str(start)} --> "
            f"{_vtt_ts_str(end)}{settings}\n{text}"
        )
    return ("\n\n".join(parts) + "\n").encode("utf-8")


# --- MP4 timed text (tx3g) ----------------------------------------------------
#
# The ISO-BMFF counterpart of the in-Matroska S_TEXT/UTF8 track: 3GPP
# timed text (the ``tx3g`` sample entry, TS 26.245).  Each sample is a
# 16-bit big-endian text length followed by that many UTF-8 bytes
# (optionally trailed by modifier boxes, which plain-text extraction
# ignores); an empty sample is a GAP between cues.  Timing comes from
# the ordinary stts duration table in mdhd-timescale ticks — so the
# extraction below reuses the exact stsz/stsc/stco sample-location
# walk the video-frame path uses (multimodal.mp4_sample_ranges).


def extract_mp4_text_cues(payload: bytes | None) -> list:
    """``[(cue_idx, start_ms, end_ms, text), ...]`` from an MP4's
    tx3g timed-text track: walk moov → trak until one carries a
    ``text``/``sbtl`` handler, require a ``tx3g`` sample entry
    (styled/other text codings raise ``NotImplementedError``), expand
    the stts duration runs against the mdhd timescale, locate each
    sample via the shared stsz/stsc/stco walk, and turn every
    non-empty sample into a cue (empty samples are the spec's gap
    convention).  Cue indexes are dense from 0; times floor to exact
    ms (``ticks * 1000 // timescale``).  Malformed structure raises
    ``ValueError``."""
    import struct

    from sample_keyspaces_cdc_streams_connectors_spark.llm.multimodal import (
        _mp4_boxes,
        _mp4_find_box,
        mp4_sample_ranges,
    )

    b = payload or b""
    if len(b) < 12 or b[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF payload")
    moov = _mp4_find_box(b, 0, len(b), b"moov")
    if moov is None:
        raise ValueError("MP4 without a moov box")
    saw_text_track = False
    for t2, b2, e2 in _mp4_boxes(b, *moov):
        if t2 != b"trak":
            continue
        mdia = _mp4_find_box(b, b2, e2, b"mdia")
        if mdia is None:
            continue
        hdlr = _mp4_find_box(b, *mdia, b"hdlr")
        if hdlr is None or b[hdlr[0] + 8 : hdlr[0] + 12] not in (
            b"text",
            b"sbtl",
        ):
            continue
        saw_text_track = True
        mdhd = _mp4_find_box(b, *mdia, b"mdhd")
        if mdhd is None:
            raise ValueError("MP4 text track without mdhd")
        (timescale,) = struct.unpack(
            ">I", b[mdhd[0] + 12 : mdhd[0] + 16]
        )
        if not timescale:
            raise ValueError("MP4 text track with zero timescale")
        minf = _mp4_find_box(b, *mdia, b"minf")
        stbl = minf and _mp4_find_box(b, *minf, b"stbl")
        if not stbl:
            raise ValueError("MP4 text track without a sample table")
        stsd = _mp4_find_box(b, *stbl, b"stsd")
        if stsd is None or stsd[1] - stsd[0] < 16:
            raise ValueError("MP4 text track without stsd")
        fmt = b[stsd[0] + 12 : stsd[0] + 16]
        if fmt != b"tx3g":
            raise NotImplementedError(
                f"MP4 text coding {fmt!r} is not supported (tx3g only)"
            )
        stts = _mp4_find_box(b, *stbl, b"stts")
        if stts is None:
            raise ValueError("MP4 text track without stts")
        s0 = stts[0]
        (n_runs,) = struct.unpack(">I", b[s0 + 4 : s0 + 8])
        if s0 + 8 + 8 * n_runs > stts[1]:
            raise ValueError("truncated MP4 stts")
        durations = []
        for r in range(n_runs):
            cnt, delta = struct.unpack(
                ">II", b[s0 + 8 + 8 * r : s0 + 16 + 8 * r]
            )
            durations.extend(delta for _ in range(cnt))
        ranges = mp4_sample_ranges(b, stbl)
        if len(durations) != len(ranges):
            raise ValueError("MP4 stts does not cover every text sample")
        out = []
        t = 0
        idx = 0
        for (off, size), dur in zip(ranges, durations):
            if off + size > len(b):
                raise ValueError("MP4 sample extends past end of file")
            sample = b[off : off + size]
            if len(sample) < 2:
                raise ValueError("truncated tx3g sample")
            (text_len,) = struct.unpack(">H", sample[:2])
            if 2 + text_len > len(sample):
                raise ValueError("tx3g text length exceeds its sample")
            start, end = t, t + dur
            t = end
            if text_len == 0:
                continue  # a gap sample, not a cue
            out.append(
                (
                    idx,
                    start * 1000 // timescale,
                    end * 1000 // timescale,
                    sample[2 : 2 + text_len].decode("utf-8"),
                )
            )
            idx += 1
        return out
    if saw_text_track:
        raise ValueError("unreachable")  # every text track returns/raises
    raise ValueError("MP4 without a timed-text track")


def encode_mp4_timed_text(
    cues: list, timescale: int = 1000
) -> bytes:
    """A REAL ISO-BMFF file carrying a 3GPP timed-text (``tx3g``)
    track: mdat holds the length-prefixed UTF-8 samples (empty
    samples for inter-cue gaps), the stbl carries genuine
    stsd('tx3g')/stts/stsc/stsz/stco tables.  ``cues`` is
    ``[(start_ms, end_ms, text), ...]``, non-overlapping and sorted.
    The fixture mirror of :func:`extract_mp4_text_cues`."""
    import struct

    def box(tag: bytes, body: bytes) -> bytes:
        return struct.pack(">I", len(body) + 8) + tag + body

    if not cues:
        raise ValueError("encode_mp4_timed_text needs at least one cue")
    samples = []  # (duration_ticks, raw_bytes)
    t = 0
    for start, end, text in cues:
        s_ticks = start * timescale // 1000
        e_ticks = end * timescale // 1000
        if s_ticks < t:
            raise ValueError("overlapping or unsorted cues")
        if e_ticks <= s_ticks:
            raise ValueError("cue ends at or before its start")
        if s_ticks > t:
            samples.append((s_ticks - t, b"\x00\x00"))  # gap
        data = text.encode("utf-8")
        samples.append(
            (e_ticks - s_ticks, struct.pack(">H", len(data)) + data)
        )
        t = e_ticks
    n = len(samples)
    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 0))
    mdat = box(b"mdat", b"".join(raw for _d, raw in samples))
    data_start = len(ftyp) + 8
    sizes = [len(raw) for _d, raw in samples]
    # one chunk per two samples, last partial — exercises the stsc walk
    chunk_offsets, chunk_counts = [], []
    pos, i = data_start, 0
    while i < n:
        take = min(2, n - i)
        chunk_offsets.append(pos)
        chunk_counts.append(take)
        pos += sum(sizes[i : i + take])
        i += take
    stsc_entries = []
    for ci, cnt in enumerate(chunk_counts, start=1):
        if not stsc_entries or stsc_entries[-1][1] != cnt:
            stsc_entries.append((ci, cnt))
    # stts run-length: consecutive equal durations collapse
    stts_entries = []
    for d, _raw in samples:
        if stts_entries and stts_entries[-1][1] == d:
            stts_entries[-1][0] += 1
        else:
            stts_entries.append([1, d])
    duration = t
    # tx3g sample entry (TS 26.245): base SampleEntry + displayFlags,
    # justification, background RGBA, default text box, default style
    # record, and the mandatory font table
    ftab = box(
        b"ftab", struct.pack(">HHB", 1, 1, 5) + b"Serif"
    )
    stsd_entry = (
        b"\x00" * 6
        + struct.pack(">H", 1)  # data reference index
        + struct.pack(">I", 0)  # displayFlags
        + struct.pack(">bb", 1, -1)  # horizontal/vertical just
        + b"\x00\x00\x00\xff"  # background RGBA
        + struct.pack(">hhhh", 0, 0, 0, 0)  # default text box
        + struct.pack(">HHHBB", 0, 0, 1, 0, 12)  # style record head
        + b"\xff\xff\xff\xff"  # style record text RGBA
        + ftab
    )
    stbl = (
        box(
            b"stsd",
            struct.pack(">II", 0, 1)
            + box(b"tx3g", stsd_entry),
        )
        + box(
            b"stts",
            struct.pack(">II", 0, len(stts_entries))
            + b"".join(
                struct.pack(">II", c, d) for c, d in stts_entries
            ),
        )
        + box(
            b"stsc",
            struct.pack(">II", 0, len(stsc_entries))
            + b"".join(
                struct.pack(">III", fc, cnt, 1)
                for fc, cnt in stsc_entries
            ),
        )
        + box(
            b"stsz",
            struct.pack(">III", 0, 0, n)
            + b"".join(struct.pack(">I", s) for s in sizes),
        )
        + box(
            b"stco",
            struct.pack(">II", 0, len(chunk_offsets))
            + b"".join(struct.pack(">I", o) for o in chunk_offsets),
        )
    )
    minf = (
        box(b"nmhd", struct.pack(">I", 0))
        + box(
            b"dinf",
            box(
                b"dref",
                struct.pack(">II", 0, 1)
                + box(b"url ", struct.pack(">I", 1)),
            ),
        )
        + box(b"stbl", stbl)
    )
    mdia = (
        box(
            b"mdhd",
            struct.pack(">IIIII", 0, 0, 0, timescale, duration)
            + struct.pack(">HH", 0x55C4, 0),
        )
        + box(
            b"hdlr",
            struct.pack(">II", 0, 0)
            + b"text"
            + struct.pack(">III", 0, 0, 0)
            + b"timed text\x00",
        )
        + box(b"minf", minf)
    )
    tkhd = box(
        b"tkhd",
        struct.pack(">I", 7)
        + struct.pack(">II", 0, 0)
        + struct.pack(">I", 1)
        + struct.pack(">I", 0)
        + struct.pack(">I", duration)
        + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0)
        + struct.pack(
            ">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000
        )
        + struct.pack(">II", 0, 0),
    )
    mvhd = box(
        b"mvhd",
        struct.pack(">I", 0)
        + struct.pack(">II", 0, 0)
        + struct.pack(">II", timescale, duration)
        + struct.pack(">I", 0x00010000)
        + struct.pack(">H", 0x0100)
        + b"\x00" * 10
        + struct.pack(
            ">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000
        )
        + b"\x00" * 24
        + struct.pack(">I", 2),
    )
    moov = box(b"moov", mvhd + box(b"trak", tkhd + box(b"mdia", mdia)))
    return ftyp + mdat + moov
