"""Byte-pair-encoding tokenizer: distributed training, map-only encode.

The text layer so far *estimates* token counts with regexes
(``functions.text.bpe_token_estimate``); this module makes the count
real: a trainable BPE vocabulary (Sennrich et al., ACL'16) whose
merge table drives an exact subword segmentation.

Why this scales to 100 TB: BPE training never needs the corpus — it
needs the **word frequency table**, which is corpus-size-independent
(a few hundred thousand distinct words cover essentially all mass in
natural text).  So the distributed part is exactly one
map-side-combined ``groupBy(word).count()`` shuffle plus a
``TakeOrderedAndProject`` heap for the ``max_words`` cap; the merge
loop itself runs driver-side over that bounded table (the same
sample-bounded-driver-compute discipline as ``llm/pq.py``'s codebook
trainer).  Encoding is the reverse shape: the merge table is tiny
(``n_merges`` pairs), so it broadcasts into an Arrow-batched
``pandas_udf`` — map-only, zero exchanges (plan-pinned).

Counterpart surface in the reference: none (its only tokenization is
the Bedrock embedding call, S3VectorTargetMapper.java:100-125); this
is a north-star LLM-pipeline extension.

Determinism: merge selection breaks count ties lexicographically on
the pair, so the merge table is a pure function of the word-frequency
table — bit-identical across runs and partitionings (and against the
sequential reference implementation in the tests).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sample_keyspaces_cdc_streams_connectors_spark.functions.text import tokens

__all__ = [
    "BpeModel",
    "train_bpe",
    "bpe_segment",
    "bpe_token_count",
]

#: end-of-word sentinel (never appears in whitespace-split words)
_EOW = "</w>"


@dataclass(frozen=True)
class BpeModel:
    """An ordered merge table; rank = merge priority (0 merges first)."""

    merges: tuple[tuple[str, str], ...]

    @property
    def ranks(self) -> dict[tuple[str, str], int]:
        return {pair: i for i, pair in enumerate(self.merges)}


def _merge_word(symbols: tuple[str, ...], ranks: dict[tuple[str, str], int]) -> tuple[str, ...]:
    """Apply merges to one symbol sequence, best-ranked pair first —
    the canonical greedy BPE segmentation."""
    syms = list(symbols)
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return tuple(syms)


def _train_on_freqs(word_freqs: dict[str, int], n_merges: int) -> tuple[tuple[str, str], ...]:
    """Sequential BPE merge loop over a word-frequency table.

    Plain Sennrich training with a deterministic tie-break
    (max count, then lexicographically smallest pair).  Complexity is
    bounded by the table, not the corpus."""
    vocab: dict[tuple[str, ...], int] = {
        tuple(w) + (_EOW,): c for w, c in word_freqs.items() if w
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + c
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if counts[best] < 2:
            break  # nothing repeats — further merges are noise
        merged = best[0] + best[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == best[0]
                    and syms[i + 1] == best[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + c
        vocab = new_vocab
        merges.append(best)
    return tuple(merges)


def train_bpe(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    max_words: int = 200_000,
) -> BpeModel:
    """Train a BPE merge table on a corpus.

    Distributed phase: lower-cased whitespace words are counted with
    ONE map-side-combined shuffle; the ``max_words`` most frequent
    (ties broken by word — deterministic) flow back through a top-k
    heap, never a global sort.  Driver phase: the classic merge loop
    over the bounded frequency table.  At 100 TB the shuffle carries
    (word, partial-count) pairs — the corpus text never moves.
    """
    if n_merges < 0:
        raise ValueError(f"n_merges must be >= 0, got {n_merges}")
    if max_words < 1:
        raise ValueError(f"max_words must be >= 1, got {max_words}")
    freq_rows = (
        docs.select(
            F.explode(tokens(F.lower(F.col(text_col)))).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("word"))
        .limit(max_words)
        .collect()
    )
    return BpeModel(
        merges=_train_on_freqs({r["word"]: r["n"] for r in freq_rows}, n_merges)
    )


def _segment_udf(model: BpeModel, count_only: bool):
    """Arrow-batched encoder: broadcast-by-closure merge ranks, one
    python-side pass per distinct word per batch (memoized)."""
    import pandas as pd

    ranks = model.ranks

    # no inline type hints: the module-level `from __future__ import
    # annotations` would stringify them, which pandas_udf's type-hint
    # resolution cannot import here (pd is function-local)
    import re

    # Java \s (ASCII-only) — NOT python str.split()/\s (unicode-aware):
    # encode-time words must match the JVM tokenizer training counted
    # with, or U+00A0-style whitespace makes the two disagree on word
    # boundaries (r5 review finding; same discipline as llm.ngram_lm)
    ws = re.compile(r"[ \t\n\x0b\f\r]+")

    def encode_batch(texts):
        cache: dict[str, tuple[str, ...]] = {}

        def seg_word(w: str) -> tuple[str, ...]:
            got = cache.get(w)
            if got is None:
                got = _merge_word(tuple(w) + (_EOW,), ranks)
                cache[w] = got
            return got

        out = []
        for t in texts:
            if t is None:
                out.append(None)
                continue
            pieces: list[str] = []
            for w in ws.split(t.lower()):
                if w:
                    pieces.extend(seg_word(w))
            out.append(len(pieces) if count_only else pieces)
        return pd.Series(out)

    if count_only:
        return F.pandas_udf(encode_batch, "long")
    return F.pandas_udf(encode_batch, "array<string>")


def bpe_segment(col: Column, model: BpeModel) -> Column:
    """Exact BPE subword segmentation → ``array<string>`` (the
    ``</w>`` sentinel stays attached to word-final pieces, so the
    original lower-cased word stream is recoverable by concatenation —
    property-pinned).  Map-only; zero exchanges."""
    return _segment_udf(model, count_only=False)(col)


def bpe_token_count(col: Column, model: BpeModel) -> Column:
    """Exact BPE token count under the trained merge table — the
    trainable replacement for ``functions.text.bpe_token_estimate``.
    Map-only; zero exchanges."""
    return _segment_udf(model, count_only=True)(col)


def save_bpe_model(spark, model: BpeModel, path: str) -> None:
    """Persist the merge table as parquet of (rank, left, right) —
    written THROUGH Spark (object-store-safe, same discipline as
    ``llm.quality_model.save_quality_model``)."""
    rows = [(i, a, b) for i, (a, b) in enumerate(model.merges)]
    spark.createDataFrame(
        rows or [(-1, "", "")], "rank int, left string, right string"
    ).repartition(1).write.mode("overwrite").parquet(f"{path}/merges")


def load_bpe_model(spark, path: str) -> BpeModel:
    rows = sorted(
        (
            (r["rank"], r["left"], r["right"])
            for r in spark.read.parquet(f"{path}/merges").collect()
            if r["rank"] >= 0
        )
    )
    return BpeModel(merges=tuple((a, b) for _, a, b in rows))
