"""REAL stdlib Matroska / WebM container walk (r13) — the third video
container of the web-crawl trio (ISO-BMFF MP4, RIFF AVI, EBML MKV).

Matroska is an EBML document (the IETF-standardized binary XML:
RFC 8794 for EBML itself, the Matroska spec for the element IDs):
every element is ``id vint-size payload``.  The walker reads the
structural subset a corpus pipeline needs — Info (timestamp scale +
duration), Tracks (type / codec id / pixel geometry), and Clusters
(SimpleBlock and BlockGroup/Block frame payloads with keyframe
flags) — supporting both sized and UNKNOWN-SIZE (streamed) segments
and clusters.  Motion-JPEG tracks (codec id ``V_MJPEG``) carry one
complete JPEG per block, so frame extraction shares the whole decode
stack below the container with the MP4/AVI paths; any other video
codec raises ``NotImplementedError`` — the same honest boundary.

The fixture encoder writes genuine EBML (header, doctype
matroska/webm, Info, Tracks, timestamped Clusters) that any Matroska
tool reads — the mirror the MP4/AVI/FLAC/JPEG codecs all have.

Reference tie-in: the reference ships media bytes opaquely
(AbstractAvroConverter.java:100-134); a training-data engine has to
see inside them.
"""

from __future__ import annotations

import struct

__all__ = [
    "encode_lacing",
    "encode_mkv_mjpeg",
    "encode_mkv_pcm",
    "encode_mkv_subtitles",
    "extract_mkv_audio",
    "extract_mkv_frames",
    "extract_mkv_subtitle_cues",
    "parse_mkv_header",
]

# Matroska element IDs (as serialized, marker bits included)
_EBML = 0x1A45DFA3
_SEGMENT = 0x18538067
_INFO = 0x1549A966
_TIMESTAMP_SCALE = 0x2AD7B1
_DURATION = 0x4489
_MUXING_APP = 0x4D80
_WRITING_APP = 0x5741
_TRACKS = 0x1654AE6B
_TRACK_ENTRY = 0xAE
_TRACK_NUMBER = 0xD7
_TRACK_UID = 0x73C5
_TRACK_TYPE = 0x83
_CODEC_ID = 0x86
_VIDEO = 0xE0
_PIXEL_WIDTH = 0xB0
_PIXEL_HEIGHT = 0xBA
_CLUSTER = 0x1F43B675
_CLUSTER_TIMESTAMP = 0xE7
_SIMPLE_BLOCK = 0xA3
_BLOCK_GROUP = 0xA0
_BLOCK = 0xA1
_REFERENCE_BLOCK = 0xFB
_DOCTYPE = 0x4282
_DOCTYPE_VERSION = 0x4287
_DOCTYPE_READ_VERSION = 0x4285
_EBML_VERSION = 0x4286
_EBML_READ_VERSION = 0x42F7


def _read_vint(b: bytes, pos: int, keep_marker: bool):
    """Read one EBML variable-length integer at ``pos``: returns
    ``(value, next_pos, is_all_ones)``.  Element IDs keep the length
    marker (they are matched with it); sizes strip it."""
    if pos >= len(b):
        raise ValueError("truncated EBML vint")
    first = b[pos]
    if first == 0:
        raise ValueError("invalid EBML vint (no length marker)")
    length = 1
    mask = 0x80
    while not first & mask:
        mask >>= 1
        length += 1
    if pos + length > len(b):
        raise ValueError("truncated EBML vint")
    raw = int.from_bytes(b[pos : pos + length], "big")
    value = raw if keep_marker else raw - (mask << (8 * (length - 1)))
    data_bits = 7 * length
    all_ones = (not keep_marker) and value == (1 << data_bits) - 1
    return value, pos + length, all_ones


def _ebml_elements(b: bytes, start: int, end: int):
    """yield ``(element_id, body_start, body_end, unknown_size)`` for
    each child element in [start, end).  Unknown-size elements extend
    to the enclosing range's end (the streamed-Matroska convention for
    Segment and Cluster)."""
    pos = start
    while pos < end:
        eid, pos, _ = _read_vint(b, pos, keep_marker=True)
        size, pos, unknown = _read_vint(b, pos, keep_marker=False)
        if unknown:
            yield eid, pos, end, True
            return
        if pos + size > end:
            raise ValueError("EBML element extends past its parent")
        yield eid, pos, pos + size, False
        pos += size


def _ebml_uint(b: bytes, start: int, end: int) -> int:
    if end - start > 8:
        raise ValueError("EBML unsigned integer wider than 8 bytes")
    return int.from_bytes(b[start:end], "big")


def _ebml_float(b: bytes, start: int, end: int) -> float:
    n = end - start
    if n == 4:
        return struct.unpack(">f", b[start:end])[0]
    if n == 8:
        return struct.unpack(">d", b[start:end])[0]
    raise ValueError(f"EBML float of width {n}")


def _encode_vint_size(v: int) -> bytes:
    """Serialize a size vint in the minimal width that is not the
    all-ones (unknown-size) pattern."""
    for length in range(1, 9):
        if v < (1 << (7 * length)) - 1:
            return (v | (1 << (7 * length))).to_bytes(length, "big")
    raise ValueError("EBML size too large")


def _lace_ranges(b: bytes, start: int, end: int, flags: int) -> list:
    """Frame byte ranges ``[(s, e), ...]`` inside a (Simple)Block body
    ``[start, end)`` per the block's lacing bits (r14 — lacing is how
    real Matroska/WebM packs multiple frames per block, RFC 9559 §11):
    0 = no lacing (one frame), 0x02 = Xiph (255-run size bytes),
    0x04 = fixed-size (equal split), 0x06 = EBML (first size a plain
    vint, then signed-vint deltas).  The last frame is always the
    remainder (Xiph/EBML).  Malformed lacing raises ``ValueError`` —
    never wrong frame boundaries."""
    lace = flags & 0x06
    if lace == 0:
        return [(start, end)]
    if start >= end:
        raise ValueError("truncated Matroska lacing header")
    k = b[start] + 1
    pos = start + 1
    sizes: list[int] = []
    if lace == 0x04:  # fixed-size lacing
        total = end - pos
        if total % k:
            raise ValueError(
                "fixed-size lacing does not divide the block evenly"
            )
        sizes = [total // k] * k
    elif lace == 0x02:  # Xiph lacing
        for _ in range(k - 1):
            size = 0
            while True:
                if pos >= end:
                    raise ValueError("truncated Xiph lacing sizes")
                v = b[pos]
                pos += 1
                size += v
                if v < 255:
                    break
            sizes.append(size)
        rem = (end - pos) - sum(sizes)
        if rem < 0:
            raise ValueError("Xiph lacing sizes exceed the block")
        sizes.append(rem)
    else:  # EBML lacing
        prev = None
        if k >= 2:
            prev, pos, _ = _read_vint(b, pos, keep_marker=False)
            sizes.append(prev)
            for _ in range(k - 2):
                if pos >= end:
                    raise ValueError("truncated EBML lacing sizes")
                p0 = pos
                raw, pos, _ = _read_vint(b, pos, keep_marker=False)
                w = pos - p0
                prev += raw - ((1 << (7 * w - 1)) - 1)  # signed vint
                if prev < 0:
                    raise ValueError("negative EBML lace size")
                sizes.append(prev)
        rem = (end - pos) - sum(sizes)
        if rem < 0:
            raise ValueError("EBML lacing sizes exceed the block")
        sizes.append(rem)
    out = []
    p = pos
    for s in sizes:
        out.append((p, p + s))
        p += s
    return out


def _encode_svint(d: int) -> bytes:
    """Serialize a SIGNED vint (EBML-lacing delta): the raw vint value
    is the delta plus the width's bias ``2^(7w-1) − 1``."""
    for w in range(1, 9):
        bias = (1 << (7 * w - 1)) - 1
        if -bias <= d <= bias:
            return ((d + bias) | (1 << (7 * w))).to_bytes(w, "big")
    raise ValueError("lace delta too large")


def encode_lacing(payloads: list, lacing: str) -> bytes:
    """The lacing header + concatenated frames for a (Simple)Block
    carrying ``payloads`` — the fixture mirror of
    :func:`_lace_ranges`.  ``lacing`` is ``xiph`` | ``fixed`` |
    ``ebml``; the caller prepends track vint, timestamp, and the
    flags byte with the matching lace bits (0x02/0x04/0x06)."""
    k = len(payloads)
    if not 1 <= k <= 256:
        raise ValueError("lacing carries 1-256 frames")
    head = bytes([k - 1])
    if lacing == "fixed":
        if len({len(p) for p in payloads}) > 1:
            raise ValueError("fixed-size lacing needs equal frames")
    elif lacing == "xiph":
        for p in payloads[:-1]:
            size = len(p)
            head += b"\xff" * (size // 255) + bytes([size % 255])
    elif lacing == "ebml":
        if k >= 2:
            head += _encode_vint_size(len(payloads[0]))
            prev = len(payloads[0])
            for p in payloads[1:-1]:
                head += _encode_svint(len(p) - prev)
                prev = len(p)
    else:
        raise ValueError(f"unknown lacing {lacing!r}")
    return head + b"".join(payloads)


_LACE_BITS = {"xiph": 0x02, "fixed": 0x04, "ebml": 0x06}


def _el(eid: int, body: bytes) -> bytes:
    eid_bytes = eid.to_bytes((eid.bit_length() + 7) // 8, "big")
    return eid_bytes + _encode_vint_size(len(body)) + body


def _uint_el(eid: int, v: int) -> bytes:
    n = max(1, (v.bit_length() + 7) // 8)
    return _el(eid, v.to_bytes(n, "big"))


def encode_mkv_mjpeg(
    frames: list,
    width: int,
    height: int,
    frame_duration_ms: int = 83,
    doctype: str = "matroska",
    frames_per_cluster: int = 2,
    use_block_groups: bool = False,
    unknown_size_segment: bool = False,
    keyframe_every: int = 0,
    extra_segment: bytes = b"",
    lacing: str | None = None,
) -> bytes:
    """Minimal REAL Matroska/WebM file carrying a motion-JPEG video
    track: EBML header (doctype ``matroska`` or ``webm``), Segment
    with Info (timestamp scale 1 ms, float duration), Tracks
    (V_MJPEG, pixel geometry), and timestamped Clusters of
    ``frames_per_cluster`` blocks each — ``SimpleBlock`` (keyframe
    flag bit) or, with ``use_block_groups``, ``BlockGroup/Block``
    where a non-keyframe carries a ``ReferenceBlock`` (the spec's
    keyframe signalling for grouped blocks).
    ``unknown_size_segment`` writes the Segment and the LAST Cluster
    with the all-ones unknown size (the live-streaming convention) so
    the reader's to-end-of-parent path is testable.  ``lacing``
    (r14): ``xiph`` | ``fixed`` | ``ebml`` packs each cluster's
    frames into ONE laced SimpleBlock/Block instead of one block per
    frame (``fixed`` requires equal frame sizes).  The fixture
    mirror of :func:`extract_mkv_frames`."""
    if not frames:
        raise ValueError("encode_mkv_mjpeg needs at least one frame")
    header = _el(
        _EBML,
        _uint_el(_EBML_VERSION, 1)
        + _uint_el(_EBML_READ_VERSION, 1)
        + _el(_DOCTYPE, doctype.encode("ascii"))
        + _uint_el(_DOCTYPE_VERSION, 4)
        + _uint_el(_DOCTYPE_READ_VERSION, 2),
    )
    n = len(frames)
    info = _el(
        _INFO,
        _uint_el(_TIMESTAMP_SCALE, 1_000_000)  # 1 ms ticks
        + _el(_DURATION, struct.pack(">d", float(n * frame_duration_ms)))
        + _el(_MUXING_APP, b"engine")
        + _el(_WRITING_APP, b"engine"),
    )
    tracks = _el(
        _TRACKS,
        _el(
            _TRACK_ENTRY,
            _uint_el(_TRACK_NUMBER, 1)
            + _uint_el(_TRACK_UID, 1)
            + _uint_el(_TRACK_TYPE, 1)  # video
            + _el(_CODEC_ID, b"V_MJPEG")
            + _el(
                _VIDEO,
                _uint_el(_PIXEL_WIDTH, width)
                + _uint_el(_PIXEL_HEIGHT, height),
            ),
        ),
    )
    clusters = []
    for c0 in range(0, n, frames_per_cluster):
        body = _uint_el(_CLUSTER_TIMESTAMP, c0 * frame_duration_ms)
        group_frames = frames[c0 : min(c0 + frames_per_cluster, n)]
        if lacing is not None:
            # r14: ONE laced block per cluster — the flags byte
            # carries the lace bits; keyframe signal applies to the
            # whole block
            is_key = keyframe_every <= 0 or (c0 % keyframe_every == 0)
            blk = (
                b"\x81"
                + struct.pack(">h", 0)
                + bytes(
                    [
                        _LACE_BITS[lacing]
                        | (
                            0x80
                            if is_key and not use_block_groups
                            else 0
                        )
                    ]
                )
                + encode_lacing(group_frames, lacing)
            )
            if use_block_groups:
                group = _el(_BLOCK, blk)
                if not is_key:
                    group += _uint_el(_REFERENCE_BLOCK, 0)
                body += _el(_BLOCK_GROUP, group)
            else:
                body += _el(_SIMPLE_BLOCK, blk)
            clusters.append(body)
            continue
        for k in range(c0, min(c0 + frames_per_cluster, n)):
            is_key = keyframe_every <= 0 or (k % keyframe_every == 0)
            rel = (k - c0) * frame_duration_ms
            blk = (
                b"\x81"  # track number 1 as a vint
                + struct.pack(">h", rel)
                + (b"\x80" if is_key and not use_block_groups else b"\x00")
                + frames[k]
            )
            if use_block_groups:
                group = _el(_BLOCK, blk)
                if not is_key:
                    group += _uint_el(
                        _REFERENCE_BLOCK, 0
                    )  # references the previous frame
                body += _el(_BLOCK_GROUP, group)
            else:
                body += _el(_SIMPLE_BLOCK, blk)
        clusters.append(body)
    # extra_segment: pre-serialized Segment children (e.g. a Tags
    # element from llm/tags.py) appended before the clusters
    seg_body = info + tracks + extra_segment
    for i, body in enumerate(clusters):
        last = i == len(clusters) - 1
        if unknown_size_segment and last:
            cid = _CLUSTER.to_bytes(4, "big")
            seg_body += cid + b"\xff" + body  # unknown-size cluster
        else:
            seg_body += _el(_CLUSTER, body)
    if unknown_size_segment:
        sid = _SEGMENT.to_bytes(4, "big")
        return header + sid + b"\xff" + seg_body
    return header + _el(_SEGMENT, seg_body)


def _walk_segment(b: bytes):
    """yield the Segment's child elements; validates the EBML header."""
    top = _ebml_elements(b, 0, len(b))
    eid, s, e, _u = next(top)
    if eid != _EBML:
        raise ValueError("not an EBML/Matroska payload")
    doctype = None
    for c, cs, ce, _cu in _ebml_elements(b, s, e):
        if c == _DOCTYPE:
            doctype = b[cs:ce].decode("ascii", "replace")
    for eid, s, e, _u in top:
        if eid == _SEGMENT:
            return doctype, list(_ebml_elements(b, s, e))
    raise ValueError("Matroska without a Segment")


def parse_mkv_header(payload: bytes | None):
    """``(format, brand, duration_ms, width, height, n_tracks)`` from
    a Matroska/WebM payload — the MKV arm of ``parse_video_header``.
    ``format`` is ``mkv``, ``brand`` the EBML doctype (``matroska`` /
    ``webm``); duration is the Info float times the timestamp scale,
    floored to integer milliseconds."""
    b = payload or b""
    doctype, children = _walk_segment(b)
    scale = 1_000_000
    duration_ticks = None
    width = height = None
    n_tracks = 0
    for eid, s, e, _u in children:
        if eid == _INFO:
            for c, cs, ce, _cu in _ebml_elements(b, s, e):
                if c == _TIMESTAMP_SCALE:
                    scale = _ebml_uint(b, cs, ce)
                elif c == _DURATION:
                    duration_ticks = _ebml_float(b, cs, ce)
        elif eid == _TRACKS:
            for t, ts, te, _tu in _ebml_elements(b, s, e):
                if t != _TRACK_ENTRY:
                    continue
                n_tracks += 1
                for c, cs, ce, _cu in _ebml_elements(b, ts, te):
                    if c == _VIDEO:
                        for v, vs, ve, _vu in _ebml_elements(b, cs, ce):
                            if v == _PIXEL_WIDTH:
                                width = max(
                                    width or 0, _ebml_uint(b, vs, ve)
                                )
                            elif v == _PIXEL_HEIGHT:
                                height = max(
                                    height or 0, _ebml_uint(b, vs, ve)
                                )
    duration_ms = (
        int(duration_ticks * scale // 1_000_000)
        if duration_ticks is not None
        else None
    )
    return ("mkv", doctype, duration_ms, width, height, n_tracks or None)


def extract_mkv_frames(
    payload: bytes | None,
    max_frames: int | None = None,
    keyframes_only: bool = False,
):
    """REAL Matroska frame extraction: find the V_MJPEG video track,
    walk every Cluster's SimpleBlock / BlockGroup elements (sized or
    unknown-size), and cut each frame's exact JPEG bytes — returning
    ``(n_frames, [(frame_idx, bytes), ...])`` with the same
    evenly-spaced ``idx_j = j·n // m`` sampling contract as the
    MP4/AVI walkers.  Keyframes: the SimpleBlock flag bit, or — for
    BlockGroups — the ABSENCE of a ReferenceBlock, per spec.  Laced
    blocks and non-MJPEG video codecs raise ``NotImplementedError``;
    malformed EBML raises ``ValueError`` — never wrong frames."""
    b = payload or b""
    _doctype, children = _walk_segment(b)
    video_track = None
    codec = None
    saw_video = False
    for eid, s, e, _u in children:
        if eid != _TRACKS:
            continue
        for t, ts, te, _tu in _ebml_elements(b, s, e):
            if t != _TRACK_ENTRY:
                continue
            num = ttype = None
            cid = None
            for c, cs, ce, _cu in _ebml_elements(b, ts, te):
                if c == _TRACK_NUMBER:
                    num = _ebml_uint(b, cs, ce)
                elif c == _TRACK_TYPE:
                    ttype = _ebml_uint(b, cs, ce)
                elif c == _CODEC_ID:
                    cid = b[cs:ce].rstrip(b"\x00").decode("ascii", "replace")
            if ttype == 1 and video_track is None:
                saw_video = True
                if cid == "V_MJPEG":
                    video_track, codec = num, cid
    if video_track is None:
        if saw_video:
            raise NotImplementedError(
                "Matroska video track is not motion-JPEG (other codecs' "
                "frame decode is the documented boundary)"
            )
        raise ValueError("Matroska without a video track")
    frames = []  # (payload_range, keyframe)

    def block_frame(bs: int, be: int, simple: bool, key_override=None):
        track, pos, _ = _read_vint(b, bs, keep_marker=False)
        if pos + 3 > be:
            raise ValueError("truncated Matroska block")
        if track != video_track:
            return
        flags = b[pos + 2]
        key = (
            bool(flags & 0x80) if simple else bool(key_override)
        )
        # r14: laced blocks (Xiph/fixed/EBML) carry several frames —
        # every laced frame shares the block's keyframe signal
        for rng in _lace_ranges(b, pos + 3, be, flags):
            frames.append((rng, key))

    for eid, s, e, _u in children:
        if eid != _CLUSTER:
            continue
        for c, cs, ce, _cu in _ebml_elements(b, s, e):
            if c == _SIMPLE_BLOCK:
                block_frame(cs, ce, simple=True)
            elif c == _BLOCK_GROUP:
                block_range = None
                has_reference = False
                for g, gs, ge, _gu in _ebml_elements(b, cs, ce):
                    if g == _BLOCK:
                        block_range = (gs, ge)
                    elif g == _REFERENCE_BLOCK:
                        has_reference = True
                if block_range is not None:
                    block_frame(
                        *block_range,
                        simple=False,
                        key_override=not has_reference,
                    )
    n = len(frames)
    candidates = [
        i for i, (_r, key) in enumerate(frames) if key
    ] if keyframes_only else list(range(n))
    nc = len(candidates)
    m = nc if max_frames is None else min(nc, max_frames)
    picks = [candidates[(j * nc) // m] for j in range(m)] if m else []
    out = []
    for idx in picks:
        (fs, fe), _key = frames[idx]
        out.append((idx, b[fs:fe]))
    return n, out


_BLOCK_DURATION = 0x9B
_TRACK_TYPE_SUBTITLE = 0x11


def encode_mkv_subtitles(
    cues: list,
    track_number: int = 1,
    timescale_ns: int = 1_000_000,
    cues_per_cluster: int = 2,
) -> bytes:
    """A REAL Matroska file carrying an ``S_TEXT/UTF8`` subtitle
    track: each cue is a BlockGroup whose Block holds the UTF-8 text,
    timestamped cluster-relative, with the cue span in BlockDuration
    — exactly how muxers store SRT inside MKV.  ``cues`` is
    ``[(start_ms, end_ms, text), ...]``; ``timescale_ns`` defaults to
    the 1 ms convention.  The fixture mirror of
    :func:`extract_mkv_subtitle_cues`."""
    if not cues:
        raise ValueError("encode_mkv_subtitles needs at least one cue")
    header = _el(
        _EBML,
        _uint_el(_EBML_VERSION, 1)
        + _uint_el(_EBML_READ_VERSION, 1)
        + _el(_DOCTYPE, b"matroska")
        + _uint_el(_DOCTYPE_VERSION, 4)
        + _uint_el(_DOCTYPE_READ_VERSION, 2),
    )
    end_ms = max(e for _s, e, _t in cues)
    info = _el(
        _INFO,
        _uint_el(_TIMESTAMP_SCALE, timescale_ns)
        + _el(_DURATION, struct.pack(">d", float(end_ms)))
        + _el(_MUXING_APP, b"engine")
        + _el(_WRITING_APP, b"engine"),
    )
    tracks = _el(
        _TRACKS,
        _el(
            _TRACK_ENTRY,
            _uint_el(_TRACK_NUMBER, track_number)
            + _uint_el(_TRACK_UID, track_number)
            + _uint_el(_TRACK_TYPE, _TRACK_TYPE_SUBTITLE)
            + _el(_CODEC_ID, b"S_TEXT/UTF8"),
        ),
    )
    seg_body = info + tracks
    for c0 in range(0, len(cues), cues_per_cluster):
        group = cues[c0 : c0 + cues_per_cluster]
        base = group[0][0]
        body = _uint_el(_CLUSTER_TIMESTAMP, base)
        for start, end, text in group:
            rel = start - base
            if not -32768 <= rel <= 32767:
                raise ValueError(
                    "cue start too far from its cluster timestamp"
                )
            blk = (
                bytes([0x80 | track_number])
                + struct.pack(">h", rel)
                + b"\x00"
                + text.encode("utf-8")
            )
            body += _el(
                _BLOCK_GROUP,
                _el(_BLOCK, blk)
                + _uint_el(_BLOCK_DURATION, end - start),
            )
        seg_body += _el(_CLUSTER, body)
    return header + _el(_SEGMENT, seg_body)


def extract_mkv_subtitle_cues(payload: bytes | None) -> list:
    """``[(cue_idx, start_ms, end_ms, text), ...]`` from a Matroska
    ``S_TEXT/UTF8`` subtitle track — cluster timestamp + block
    relative timestamp, scaled by the Segment's TimestampScale to
    exact integer milliseconds (floor), span from BlockDuration
    (spanless cues report ``end == start``).  The caption-recovery
    path for video containers, feeding the same timed-text rows as
    :mod:`~sample_keyspaces_cdc_streams_connectors_spark.llm.subtitles`.  A Matroska file without a
    UTF-8 subtitle track raises ``NotImplementedError`` (other
    subtitle codings — S_TEXT/ASS, VobSub bitmaps — are the
    documented boundary); malformed EBML raises ``ValueError``."""
    b = payload or b""
    _doctype, children = _walk_segment(b)
    scale = 1_000_000
    sub_track = None
    saw_subtitle = False
    for eid, s, e, _u in children:
        if eid == _INFO:
            for c, cs, ce, _cu in _ebml_elements(b, s, e):
                if c == _TIMESTAMP_SCALE:
                    scale = _ebml_uint(b, cs, ce)
        elif eid == _TRACKS:
            for t, ts, te, _tu in _ebml_elements(b, s, e):
                if t != _TRACK_ENTRY:
                    continue
                num = ttype = None
                cid = None
                for c, cs, ce, _cu in _ebml_elements(b, ts, te):
                    if c == _TRACK_NUMBER:
                        num = _ebml_uint(b, cs, ce)
                    elif c == _TRACK_TYPE:
                        ttype = _ebml_uint(b, cs, ce)
                    elif c == _CODEC_ID:
                        cid = (
                            b[cs:ce].rstrip(b"\x00").decode(
                                "ascii", "replace"
                            )
                        )
                if ttype == _TRACK_TYPE_SUBTITLE:
                    saw_subtitle = True
                    if cid == "S_TEXT/UTF8" and sub_track is None:
                        sub_track = num
    if sub_track is None:
        if saw_subtitle:
            raise NotImplementedError(
                "Matroska subtitle track is not S_TEXT/UTF8 (styled/"
                "bitmap subtitle decode is the documented boundary)"
            )
        raise ValueError("Matroska without a subtitle track")
    out = []
    for eid, s, e, _u in children:
        if eid != _CLUSTER:
            continue
        cluster_ts = 0
        for c, cs, ce, _cu in _ebml_elements(b, s, e):
            if c == _CLUSTER_TIMESTAMP:
                cluster_ts = _ebml_uint(b, cs, ce)
            elif c in (_SIMPLE_BLOCK, _BLOCK_GROUP):
                if c == _BLOCK_GROUP:
                    block = duration = None
                    for g, gs, ge, _gu in _ebml_elements(b, cs, ce):
                        if g == _BLOCK:
                            block = (gs, ge)
                        elif g == _BLOCK_DURATION:
                            duration = _ebml_uint(b, gs, ge)
                else:
                    block, duration = (cs, ce), None
                if block is None:
                    continue
                bs, be = block
                track, pos, _ = _read_vint(b, bs, keep_marker=False)
                if track != sub_track:
                    continue
                if pos + 3 > be:
                    # malformed EBML raises, matching the frames path
                    raise ValueError("truncated Matroska block")
                (rel,) = struct.unpack(">h", b[pos : pos + 2])
                start_ticks = cluster_ts + rel
                start_ms = start_ticks * scale // 1_000_000
                dur_ms = (
                    (duration or 0) * scale // 1_000_000
                )
                # r14: a laced subtitle block yields one cue per laced
                # frame, all anchored at the block's timestamp/span
                # (simultaneous captions — lacing carries no per-frame
                # timing without a DefaultDuration, so anything else
                # would invent timestamps)
                for fs, fe in _lace_ranges(
                    b, pos + 3, be, b[pos + 2]
                ):
                    out.append(
                        (
                            len(out),
                            start_ms,
                            start_ms + dur_ms,
                            b[fs:fe].decode("utf-8", "replace"),
                        )
                    )
    return out


# --- Matroska PCM audio (r14) -------------------------------------------------
#
# .mka / audio-in-.mkv: a TrackEntry of type 2 (audio) with an Audio
# element (SamplingFrequency float, Channels, BitDepth) and the
# sample data in cluster blocks — typically LACED (the whole point of
# lacing is packing many small audio frames per block).  Uncompressed
# PCM ("A_PCM/INT/LIT") decodes natively: little-endian interleaved
# integers, no entropy coding.  Lossy codecs (A_VORBIS/A_OPUS/A_AAC)
# raise — the same boundary as the Ogg/MP3 walks.

_MKV_AUDIO = 0xE1
_SAMPLING_FREQ = 0xB5
_MKV_CHANNELS = 0x9F
_BIT_DEPTH = 0x6264
_TRACK_TYPE_AUDIO = 2


def extract_mkv_audio(payload: bytes | None):
    """``(rate, channels, bits, samples)`` from a Matroska PCM audio
    track — ``samples`` an ``(n_frames, channels)`` int16 numpy
    array.  Walks the first audio TrackEntry (SamplingFrequency /
    Channels / BitDepth), requires ``A_PCM/INT/LIT`` at 16 bits
    (other codecs/depths raise ``NotImplementedError``), then
    concatenates every cluster block's frames on that track —
    INCLUDING laced blocks via :func:`_lace_ranges`, which is how
    real .mka packs audio.  Malformed EBML raises ``ValueError``."""
    import numpy as np

    b = payload or b""
    _doctype, children = _walk_segment(b)
    audio_track = None
    codec = None
    rate = chans = bits = None
    saw_audio = False
    for eid, s, e, _u in children:
        if eid != _TRACKS:
            continue
        for t, ts, te, _tu in _ebml_elements(b, s, e):
            if t != _TRACK_ENTRY:
                continue
            num = ttype = None
            cid = None
            a_rate = a_ch = a_bits = None
            for c, cs, ce, _cu in _ebml_elements(b, ts, te):
                if c == _TRACK_NUMBER:
                    num = _ebml_uint(b, cs, ce)
                elif c == _TRACK_TYPE:
                    ttype = _ebml_uint(b, cs, ce)
                elif c == _CODEC_ID:
                    cid = (
                        b[cs:ce].rstrip(b"\x00").decode("ascii", "replace")
                    )
                elif c == _MKV_AUDIO:
                    for g, gs, ge, _gu in _ebml_elements(b, cs, ce):
                        if g == _SAMPLING_FREQ:
                            a_rate = int(_ebml_float(b, gs, ge))
                        elif g == _MKV_CHANNELS:
                            a_ch = _ebml_uint(b, gs, ge)
                        elif g == _BIT_DEPTH:
                            a_bits = _ebml_uint(b, gs, ge)
            if ttype == _TRACK_TYPE_AUDIO and audio_track is None:
                saw_audio = True
                if cid == "A_PCM/INT/LIT":
                    audio_track, codec = num, cid
                    rate = a_rate or 8000
                    chans = a_ch or 1
                    bits = a_bits or 16
    if audio_track is None:
        if saw_audio:
            raise NotImplementedError(
                "Matroska audio track is not uncompressed PCM "
                "(A_VORBIS/A_OPUS/A_AAC entropy decode is the "
                "documented boundary)"
            )
        raise ValueError("Matroska without an audio track")
    if bits not in (16, 24, 32):
        raise NotImplementedError(
            f"Matroska PCM bit depth {bits} unsupported (16/24/32-bit)"
        )
    pieces = []
    for eid, s, e, _u in children:
        if eid != _CLUSTER:
            continue
        for c, cs, ce, _cu in _ebml_elements(b, s, e):
            if c in (_SIMPLE_BLOCK, _BLOCK_GROUP):
                if c == _BLOCK_GROUP:
                    block = None
                    for g, gs, ge, _gu in _ebml_elements(b, cs, ce):
                        if g == _BLOCK:
                            block = (gs, ge)
                    if block is None:
                        continue
                    bs, be = block
                else:
                    bs, be = cs, ce
                track, pos, _ = _read_vint(b, bs, keep_marker=False)
                if track != audio_track:
                    continue
                if pos + 3 > be:
                    raise ValueError("truncated Matroska block")
                for fs, fe in _lace_ranges(b, pos + 3, be, b[pos + 2]):
                    pieces.append(b[fs:fe])
    raw = b"".join(pieces)
    frame_bytes = (bits // 8) * chans
    if len(raw) % frame_bytes:
        raise ValueError(
            "Matroska PCM data is not a whole number of frames"
        )
    if bits == 16:
        samples = np.frombuffer(raw, "<i2").reshape(-1, chans)
    elif bits == 32:
        samples = np.frombuffer(raw, "<i4").reshape(-1, chans)
    else:
        # 24-bit: sign-extend 3-byte little-endian onto the int32
        # surface (the WAV deep-PCM convention)
        u = np.frombuffer(raw, np.uint8).reshape(-1, 3).astype(np.int64)
        v = u[:, 0] | (u[:, 1] << 8) | (u[:, 2] << 16)
        v = np.where(v >= 1 << 23, v - (1 << 24), v)
        samples = v.astype(np.int32).reshape(-1, chans)
    _ = codec
    return rate, chans, bits, samples


def encode_mkv_pcm(
    samples,
    rate: int,
    frames_per_block: int = 64,
    blocks_per_cluster: int = 2,
    lacing: str | None = None,
    doctype: str = "matroska",
    bits: int = 16,
) -> bytes:
    """A REAL Matroska audio file (``.mka``) carrying an
    ``A_PCM/INT/LIT`` track: Audio element with SamplingFrequency /
    Channels / BitDepth, cluster blocks of ``frames_per_block``
    frames each — packed ONE PER BLOCK, or (``lacing``) all of a
    cluster's blocks into a single laced SimpleBlock, the layout real
    .mka uses.  ``bits`` 16/24/32 — deep samples are int32 values on
    the WAV convention.  The fixture mirror of
    :func:`extract_mkv_audio`."""
    import numpy as np

    if bits not in (16, 24, 32):
        raise ValueError("bits must be 16, 24, or 32")
    s = np.asarray(
        samples, dtype=np.int16 if bits == 16 else np.int32
    )
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    if n < 1:
        raise ValueError("need at least one frame")
    header = _el(
        _EBML,
        _uint_el(_EBML_VERSION, 1)
        + _uint_el(_EBML_READ_VERSION, 1)
        + _el(_DOCTYPE, doctype.encode("ascii"))
        + _uint_el(_DOCTYPE_VERSION, 4)
        + _uint_el(_DOCTYPE_READ_VERSION, 2),
    )
    dur_ms = n * 1000 // rate
    info = _el(
        _INFO,
        _uint_el(_TIMESTAMP_SCALE, 1_000_000)
        + _el(_DURATION, struct.pack(">d", float(dur_ms)))
        + _el(_MUXING_APP, b"engine")
        + _el(_WRITING_APP, b"engine"),
    )
    audio_el = _el(
        _MKV_AUDIO,
        _el(_SAMPLING_FREQ, struct.pack(">d", float(rate)))
        + _uint_el(_MKV_CHANNELS, ch)
        + _uint_el(_BIT_DEPTH, bits),
    )
    tracks = _el(
        _TRACKS,
        _el(
            _TRACK_ENTRY,
            _uint_el(_TRACK_NUMBER, 1)
            + _uint_el(_TRACK_UID, 1)
            + _uint_el(_TRACK_TYPE, _TRACK_TYPE_AUDIO)
            + _el(_CODEC_ID, b"A_PCM/INT/LIT")
            + audio_el,
        ),
    )
    def _pack(block) -> bytes:
        if bits == 16:
            return block.astype("<i2").tobytes()
        if bits == 32:
            return block.astype("<i4").tobytes()
        v = block.astype(np.int64) & 0xFFFFFF  # 3-byte LE two's compl.
        out = np.empty(block.size * 3, np.uint8)
        flat = v.reshape(-1)
        out[0::3] = flat & 0xFF
        out[1::3] = (flat >> 8) & 0xFF
        out[2::3] = (flat >> 16) & 0xFF
        return out.tobytes()

    payloads = [
        _pack(s[i : i + frames_per_block])
        for i in range(0, n, frames_per_block)
    ]
    seg_body = info + tracks
    per_cluster = blocks_per_cluster
    for c0 in range(0, len(payloads), per_cluster):
        group = payloads[c0 : c0 + per_cluster]
        ts = c0 * frames_per_block * 1000 // rate
        body = _uint_el(_CLUSTER_TIMESTAMP, ts)
        if lacing is not None:
            blk = (
                b"\x81"
                + struct.pack(">h", 0)
                + bytes([_LACE_BITS[lacing] | 0x80])
                + encode_lacing(group, lacing)
            )
            body += _el(_SIMPLE_BLOCK, blk)
        else:
            for j, p in enumerate(group):
                rel = (
                    (c0 + j) * frames_per_block * 1000 // rate
                ) - ts
                blk = (
                    b"\x81" + struct.pack(">h", rel) + b"\x80" + p
                )
                body += _el(_SIMPLE_BLOCK, blk)
        seg_body += _el(_CLUSTER, body)
    return header + _el(_SEGMENT, seg_body)


def _mka_track_fields(payload: bytes):
    """``(rate, channels, bits)`` of the FIRST audio TrackEntry, or
    ``None`` when the EBML document carries no audio track — the
    cheap header fields :func:`~...multimodal.parse_audio_header`
    reports for Matroska audio (any codec; sample decode separately
    requires A_PCM/INT/LIT)."""
    b = payload
    _doctype, children = _walk_segment(b)
    for eid, s, e, _u in children:
        if eid != _TRACKS:
            continue
        for t, ts, te, _tu in _ebml_elements(b, s, e):
            if t != _TRACK_ENTRY:
                continue
            ttype = None
            a_rate = a_ch = a_bits = None
            for c, cs, ce, _cu in _ebml_elements(b, ts, te):
                if c == _TRACK_TYPE:
                    ttype = _ebml_uint(b, cs, ce)
                elif c == _MKV_AUDIO:
                    for g, gs, ge, _gu in _ebml_elements(b, cs, ce):
                        if g == _SAMPLING_FREQ:
                            a_rate = int(_ebml_float(b, gs, ge))
                        elif g == _MKV_CHANNELS:
                            a_ch = _ebml_uint(b, gs, ge)
                        elif g == _BIT_DEPTH:
                            a_bits = _ebml_uint(b, gs, ge)
            if ttype == _TRACK_TYPE_AUDIO:
                return (a_rate or 8000, a_ch or 1, a_bits or 16)
    return None
