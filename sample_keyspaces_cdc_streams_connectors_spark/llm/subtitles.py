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
