"""Media-text recovery stage (r14) — tags + subtitle cues INTO the
document flow.

The r13 parsers (``llm.tags.extract_media_tags``,
``llm.subtitles.extract_subtitle_cues``) turn container metadata
(titles, artists, comments) and caption tracks into text — exactly
the text a multimodal curation pipeline feeds its cleaning stages.
This module makes them a first-class corpus stage: for every document
carrying a media payload, up to TWO derived text documents join the
flow —

- a **tags** document: the tag VALUES in container order, one per
  line (titles/artists/comments — short, high-signal text);
- a **cues** document: the caption texts in cue order, one per line
  (the transcript — the aligned speech text of the clip).

Derived rows copy every parent column (source, url, timestamps — so
host blocklists, per-domain quotas, and split labels keep working),
replace ``text``/``doc_id``, NULL the payload column (the bytes never
travel further), and carry ``media_text_src`` = ``tags``|``cues``
(original rows carry NULL).  They then flow through the SAME
langid/quality/dedup chain as crawled text.

Scale: ONE ``mapInPandas`` pass, zero shuffles, rows-out ≥ rows-in by
at most 2 per media document.  Parsing walks container headers and
text tracks only — sample data (pixels, PCM) is never decoded.  The
stage is stateless, so it is stream-safe verbatim; batch ≡ streaming
is pinned in tests/test_media_text.py.

Derived ids are a pure function of the parent id: a signed 64-bit
slice of ``md5("media-text:{src}:{id}")`` for integer id columns
(collision against crawl ids is 2^-64-improbable and deterministic
across batch/stream replays), or ``"{id}#media-{src}"`` for string
ids.

Ref tie-in: the reference ships media bytes opaquely through its
converters (AbstractAvroConverter.java:100-134); recovering the text
INSIDE them is the multimodal-pipeline step beyond it.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

from pyspark.sql import DataFrame

__all__ = ["derived_media_text_id", "extract_media_text"]


def derived_media_text_id(parent_id: int, src: str) -> int:
    """The derived document id for a media-text row: a signed 64-bit
    slice of ``md5("media-text:{src}:{parent_id}")`` — deterministic,
    replay-stable, and independent of partitioning."""
    digest = hashlib.md5(
        f"media-text:{src}:{parent_id}".encode()
    ).digest()
    return int.from_bytes(digest[:8], "big", signed=True)


def extract_media_text(
    docs: DataFrame,
    media_col: str = "media",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Append derived tag/cue text documents to ``docs`` (schema +
    ``media_text_src`` string column; original rows pass through with
    NULL).  Unrecognized, malformed, or text-free payloads derive
    nothing — the parent row always survives (crawl-safe: a bad byte
    never fails the batch)."""
    import pandas as pd
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from sample_keyspaces_cdc_streams_connectors_spark.llm.subtitles import extract_subtitle_cues
    from sample_keyspaces_cdc_streams_connectors_spark.llm.tags import extract_media_tags

    if media_col not in docs.columns:
        raise ValueError(
            f"extract_media_text: no column {media_col!r} in "
            f"{docs.columns}"
        )
    in_schema = docs.schema
    if "media_text_src" in docs.columns:
        raise ValueError(
            "extract_media_text: input already has media_text_src"
        )
    id_is_int = isinstance(in_schema[id_col].dataType, LongType) or (
        in_schema[id_col].dataType.typeName()
        in ("long", "integer", "short", "byte")
    )
    # a FRESH StructType: .add() would mutate the DataFrame's cached
    # schema object and desync df.columns from the actual plan output
    out_schema = StructType(
        list(in_schema.fields)
        + [StructField("media_text_src", StringType(), True)]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            base = pdf.copy()
            base["media_text_src"] = None
            derived: list[dict] = []
            for rec in pdf.to_dict("records"):
                payload = rec.get(media_col)
                if payload is None:
                    continue
                b = bytes(payload)
                if not b:
                    continue
                texts: list[tuple[str, str]] = []
                try:
                    tags = extract_media_tags(b)
                except (ValueError, NotImplementedError, struct.error):
                    tags = []
                if tags:
                    texts.append(
                        ("tags", "\n".join(v for _s, _k, v in tags))
                    )
                try:
                    cues = extract_subtitle_cues(b)
                except (ValueError, NotImplementedError, struct.error):
                    cues = []
                if cues:
                    texts.append(
                        ("cues", "\n".join(t for _i, _s, _e, t in cues))
                    )
                for src, text in texts:
                    row = dict(rec)
                    pid = row[id_col]
                    row[id_col] = (
                        derived_media_text_id(int(pid), src)
                        if id_is_int
                        else f"{pid}#media-{src}"
                    )
                    row[text_col] = text
                    row[media_col] = None
                    row["media_text_src"] = src
                    derived.append(row)
            if derived:
                yield pd.concat(
                    [base, pd.DataFrame(derived, columns=base.columns)],
                    ignore_index=True,
                )
            else:
                yield base

    return docs.mapInPandas(run, out_schema)
