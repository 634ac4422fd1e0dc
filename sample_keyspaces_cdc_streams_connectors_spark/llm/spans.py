"""Repeated-span removal: exact substring-level dedup.

Document-level dedup (exact / MinHash / Jaccard) keeps one copy of
near-identical DOCUMENTS, but boilerplate — license headers,
navigation chrome, cookie banners — repeats inside otherwise-unique
pages and survives it.  The public recipe (Lee et al.,
"Deduplicating Training Data Makes Language Models Better",
ACL'22 — their EXACTSUBSTR variant, simplified from suffix arrays to
fixed-width windows): any k-token span occurring in at least
``min_docs`` distinct documents is presumed boilerplate, and every
token covered by such a span is removed from every document.

Spark-first shape (every stage bounded):

1. tokens → k-token rolling windows with POSITIONS (`posexplode`) —
   map-only; window identity is the 60-bit md5 int, so every
   downstream key is an int64, never a k-word string;
2. window document-frequency: one `groupBy(gram)` over (gram,
   doc_id) with `countDistinct` — the same shuffle family as the
   n-gram dedup's frequency pass;
3. hot windows join back to the per-doc positions (AQE picks
   broadcast vs shuffle by the hot set's size — boilerplate
   vocabularies are small by construction, but nothing breaks if
   they are not) and collect per-doc sorted start lists;
4. one Arrow pass marks covered token indexes with a numpy mask and
   rebuilds the text — per-doc work linear in tokens + flagged
   spans, never O(tokens × spans).

Reconstruction note: scrubbed documents are rebuilt from the
NORMALIZED token stream (single spaces, the engine tokenizer's
casefold) — the same canonical form every other text operator keys
on.  Documents with no flagged span keep their original text
byte-identical (the rebuild never runs for them).

Batch-only: window frequencies are corpus-wide aggregates, so the
streaming curation chain rejects the stage (same class as
within-batch dedup).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

from sample_keyspaces_cdc_streams_connectors_spark.functions.text import (
    normalize_text,
    shingles_from_tokens,
    tokens,
)
from sample_keyspaces_cdc_streams_connectors_spark.llm.dedup import md5_int

__all__ = [
    "flag_repeated_spans",
    "merged_spans_col",
    "remove_repeated_spans",
]


def merged_spans_col(starts, k: int, n_tokens):
    """Merge sorted flagged window starts into MAXIMAL repeated spans
    (Lee et al.'s unit of removal): the union of the ``[p, min(p+k,
    n))`` windows as an array of disjoint ``(s, e)`` structs (end
    exclusive), via one JVM left-fold — no explode, no UDF.

    Adjacent windows merge (``[0,5)`` + ``[5,10)`` → ``[0,10)``):
    interval union over token indexes is exactly what the scrub
    removes, so the maximal spans ARE the scrubbed regions and
    ``Σ (e - s)`` is the removed-token count with no distinct pass.
    """
    starts = starts if isinstance(starts, Column) else F.col(starts)
    n = n_tokens if isinstance(n_tokens, Column) else F.col(n_tokens)
    span_t = "array<struct<s:int,e:int>>"
    acc0 = F.struct(
        F.expr(f"CAST(array() AS {span_t})").alias("done"),
        F.lit(-1).cast("int").alias("cs"),
        F.lit(-1).cast("int").alias("ce"),
    )

    def step(acc: Column, p: Column) -> Column:
        e = F.least(p + F.lit(k), n).cast("int")
        done = acc["done"]
        closed = F.concat(
            done,
            F.array(F.struct(acc["cs"].alias("s"), acc["ce"].alias("e"))),
        )
        return (
            F.when(
                acc["cs"] < 0,
                F.struct(
                    done.alias("done"),
                    p.cast("int").alias("cs"),
                    e.alias("ce"),
                ),
            )
            .when(
                p <= acc["ce"],
                F.struct(
                    done.alias("done"),
                    acc["cs"].alias("cs"),
                    F.greatest(acc["ce"], e).alias("ce"),
                ),
            )
            .otherwise(
                F.struct(
                    closed.alias("done"),
                    p.cast("int").alias("cs"),
                    e.alias("ce"),
                )
            )
        )

    def finish(acc: Column) -> Column:
        return F.when(
            acc["cs"] >= 0,
            F.concat(
                acc["done"],
                F.array(F.struct(acc["cs"].alias("s"), acc["ce"].alias("e"))),
            ),
        ).otherwise(acc["done"])

    return F.aggregate(starts, acc0, step, finish)


def flag_repeated_spans(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 10,
    min_docs: int = 2,
    id_col: str = "doc_id",
    count_mode: str = "docs",
) -> DataFrame:
    """Per-doc flagged spans: ``(id_col, __n_tokens, __starts
    array<int> sorted 0-based, __spans array<struct<s,e>>)`` — only
    docs with at least one flagged span appear.  A start ``p`` covers
    token indexes ``[p, min(p + k, n_tokens))``; ``__spans`` is the
    MAXIMAL-span merge of those windows (disjoint intervals, end
    exclusive — Lee et al.'s unit of removal; see
    :func:`merged_spans_col`).  Documents shorter than ``k`` tokens
    form one window covering the whole doc (the engine's shingle
    rule, so short boilerplate still counts).

    ``count_mode`` (r8 — closes the last fixed-k divergence class
    from the r7 quantification, tests/test_spans.py):

    - ``"docs"`` (default) — a window is hot when it appears in
      ``min_docs`` DISTINCT documents: boilerplate as cross-document
      repetition, the engine's historical rule;
    - ``"occurrences"`` — hot when its TOTAL occurrence count reaches
      ``min_docs``, Lee et al.'s actual EXACTSUBSTR criterion: a
      phrase repeated within one document counts too.  Same plan
      shape (the frequency pass becomes a plain count — CHEAPER than
      the distinct), pinned coverage-identical to the brute-force
      suffix-criterion reference on planted corpora."""
    if count_mode not in ("docs", "occurrences"):
        raise ValueError(
            f"count_mode must be docs|occurrences, got {count_mode!r}"
        )
    toked = docs.select(
        F.col(id_col),
        tokens(normalize_text(F.col(text_col))).alias("__toks"),
    ).filter(F.size("__toks") > 0)
    # empty/whitespace-only docs are excluded BEFORE the window
    # explode: the shingle short-doc rule would otherwise give them a
    # single empty-string window, repeated empties would count as a
    # hot span, and coverage over zero tokens is degenerate (the
    # DuckDB oracle's generate_series join drops such rows the same
    # way — both sides report 0 flagged / 0 removed for empty docs)
    grams = toked.select(
        F.col(id_col),
        F.size("__toks").alias("__n_tokens"),
        F.posexplode(
            F.transform(shingles_from_tokens(F.col("__toks"), k), md5_int)
        ).alias("__pos", "__gram"),
    )
    freq = (
        F.countDistinct(id_col)
        if count_mode == "docs"
        else F.count(F.lit(1))
    )
    hot = (
        grams.groupBy("__gram")
        .agg(freq.alias("__df"))
        .filter(F.col("__df") >= min_docs)
        .select("__gram")
    )
    per_doc = (
        grams.join(hot, "__gram")
        .groupBy(id_col)
        .agg(
            F.first("__n_tokens").alias("__n_tokens"),
            F.sort_array(F.collect_set("__pos")).alias("__starts"),
        )
    )
    return per_doc.withColumn(
        "__spans",
        merged_spans_col(F.col("__starts"), k, F.col("__n_tokens")),
    )


def remove_repeated_spans(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 10,
    min_docs: int = 2,
    id_col: str = "doc_id",
    count_mode: str = "docs",
) -> DataFrame:
    """Scrub every flagged span from every document.

    Returns ``docs`` with ``text_col`` rewritten (normalized-token
    rebuild; untouched docs keep their original bytes) plus
    ``n_removed_tokens`` (distinct covered token indexes),
    ``n_flagged_spans`` (distinct flagged window starts) and
    ``n_maximal_spans`` (merged maximal repeated spans — Lee et al.'s
    span count) — schema otherwise preserved.

    The scrub walks the MERGED maximal intervals (r5), not the raw
    window starts: per-doc work is O(tokens + maximal spans), and the
    removed-token count is just Σ (e - s) over disjoint intervals —
    no mask-distinct accounting needed (the mask remains only to
    rebuild the kept text).  ``count_mode`` passes through to
    :func:`flag_repeated_spans` (r8 — ``"occurrences"`` is Lee et
    al.'s exact criterion; ``"docs"`` the cross-document default)."""
    flagged = flag_repeated_spans(
        docs,
        text_col=text_col,
        k=k,
        min_docs=min_docs,
        id_col=id_col,
        count_mode=count_mode,
    )

    out_schema = StructType(
        [
            StructField("clean", StringType()),
            StructField("removed", IntegerType()),
        ]
    )

    @F.pandas_udf(out_schema)
    def scrub(toks: pd.Series, spans: pd.Series) -> pd.DataFrame:
        cleans: list = []
        removed: list = []
        for tk, sp in zip(toks, spans):
            # the UDF evaluates for every row (Catalyst extracts it
            # below the when()); unflagged rows arrive with null
            # spans and their output is discarded by the coalesce
            words = list(tk) if tk is not None else []
            n = len(words)
            mask = np.zeros(n, dtype=bool)
            total = 0
            for iv in sp if sp is not None else ():
                s, e = int(iv["s"]), int(iv["e"])
                mask[s:e] = True
                total += e - s  # intervals are disjoint by merge
            keep = [w for w, m in zip(words, mask) if not m]
            cleans.append(" ".join(keep))
            removed.append(total)
        return pd.DataFrame({"clean": cleans, "removed": removed})

    joined = docs.join(flagged, id_col, "left")
    toks_expr = tokens(normalize_text(F.col(text_col)))
    scrubbed = F.when(
        F.col("__spans").isNotNull(), scrub(toks_expr, F.col("__spans"))
    )
    out_cols = []
    for c in docs.columns:
        if c == text_col:
            out_cols.append(
                F.coalesce(scrubbed["clean"], F.col(text_col)).alias(text_col)
            )
        else:
            out_cols.append(F.col(c))
    return joined.select(
        *out_cols,
        F.coalesce(scrubbed["removed"], F.lit(0))
        .cast("int")
        .alias("n_removed_tokens"),
        # size(NULL) is -1 under non-ANSI semantics, so guard on the
        # null itself rather than coalescing the size
        F.when(F.col("__starts").isNotNull(), F.size("__starts"))
        .otherwise(0)
        .cast("int")
        .alias("n_flagged_spans"),
        F.when(F.col("__spans").isNotNull(), F.size("__spans"))
        .otherwise(0)
        .cast("int")
        .alias("n_maximal_spans"),
    )
