"""Text-analysis column functions for the LLM-data-pipeline layer.

All pure Column expressions (JVM built-ins, whole-stage codegen) —
no Python touches row data, so these run at full scan speed over a
100 TB `documents` table.  Counterpart of the reference's only text
handling (the Bedrock ``embedding-field`` extraction,
S3VectorTargetMapper.java:100-125) extended to the north-star text
operations: tokenization, language-ID, quality scoring,
fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: tiny high-frequency English stopword set used by the heuristic
#: language/quality scorers (order irrelevant; deterministic).
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "it")


def normalize_text(col: Column) -> Column:
    """Whitespace-collapsed, lowercased, trimmed — the canonical form
    used for fingerprinting and exact dedup."""
    return F.lower(F.trim(F.regexp_replace(col, r"\s+", " ")))


# --- SQL-text twins (r14 optimization) -------------------------------------
#
# Building deep Column trees from Python costs one py4j round trip per
# node (~0.3-0.5 ms each); higher-order functions (transform / filter /
# aggregate / zip_with) cost tens of ms EACH to construct.  Measured
# with cProfile at sf0.1: DataFrame CONSTRUCTION was ~15 s of the ~45 s
# headline suite, dominated by exactly these builders.  Each `*_sql`
# twin composes the SAME expression as SQL text (one py4j call to
# parse via F.expr / selectExpr); equivalence with the Column form is
# pinned in tests/test_properties.py::test_sql_twins_match_column_forms.

def normalize_text_sql(c: str) -> str:
    """SQL-text twin of :func:`normalize_text`."""
    return rf"lower(trim(regexp_replace({c}, '\\s+', ' ')))"


def tokens_sql(c: str) -> str:
    """SQL-text twin of :func:`tokens`."""
    return rf"filter(split(trim({c}), '\\s+'), t -> t != '')"


def token_count_sql(c: str) -> str:
    """SQL-text twin of :func:`token_count`."""
    return f"size({tokens_sql(c)})"


def bpe_token_estimate_sql(c: str) -> str:
    """SQL-text twin of :func:`bpe_token_estimate`."""
    return rf"regexp_count({c}, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')"


def stopword_count_sql(c: str) -> str:
    """SQL-text twin of :func:`stopword_count`."""
    pat = r"\\b(" + "|".join(STOPWORDS) + r")\\b"
    return f"regexp_count(lower({c}), '{pat}')"


def lang_id_sql(c: str, n: str | None = None, stops: str | None = None) -> str:
    """SQL-text twin of :func:`lang_id`.  ``n``/``stops`` optionally
    substitute pre-staged token/stopword COUNT expressions (e.g. a
    projected column name) for the inline recomputation — the
    expression tree is otherwise identical (r14: text_analysis stages
    each count once instead of re-deriving it per output column)."""
    n = n or token_count_sql(c)
    stops = stops or stopword_count_sql(c)
    return (
        f"CASE WHEN ({n} > 0) AND ({stops} / {n} > 0.08) "
        "THEN 'en' ELSE 'unknown' END"
    )


def quality_score_sql(
    c: str, n: str | None = None, stops: str | None = None
) -> str:
    """SQL-text twin of :func:`quality_score` (same optional staged
    counts as :func:`lang_id_sql`)."""
    n = f"CAST({n or token_count_sql(c)} AS BIGINT)"
    chars = f"CAST(length({c}) AS BIGINT)"
    alpha = f"CAST(regexp_count({c}, '[A-Za-z]') AS BIGINT)"
    stops = f"CAST({stops or stopword_count_sql(c)} AS BIGINT)"
    return (
        f"CAST(floor(least({n}, 64) * 400 / 64) "
        f"+ (CASE WHEN {chars} > 0 THEN floor({alpha} * 300 / {chars}) "
        "ELSE 0 END) "
        f"+ floor(least({stops}, 8) * 300 / 8) AS INT)"
    )


def doc_fingerprint_sql(c: str) -> str:
    """SQL-text twin of :func:`doc_fingerprint`."""
    return f"md5({normalize_text_sql(c)})"


def md5_int_sql(c: str) -> str:
    """SQL-text twin of ``llm.dedup.md5_int`` (lives here to keep the
    SQL twins in one module; dedup re-exports it)."""
    return f"CAST(conv(substring(md5({c}), 1, 15), 16, 10) AS BIGINT)"


def shingles_from_tokens_sql(toks: str, k: int = 3) -> str:
    """SQL-text twin of :func:`shingles_from_tokens`.  ``toks`` should
    be a bound column NAME (the fragment is referenced O(k) times)."""
    m = f"(size({toks}) - {k} + 1)"
    shingles = f"slice({toks}, 1, {m})"
    for j in range(1, k):
        shingles = (
            f"zip_with({shingles}, slice({toks}, {j + 1}, {m}), "
            "(a, b) -> concat_ws(' ', a, b))"
        )
    return (
        f"CASE WHEN size({toks}) <= {k} "
        f"THEN array(array_join({toks}, ' ')) ELSE {shingles} END"
    )


def tokens(col: Column) -> Column:
    """Whitespace tokenization → array<string> (empty array for
    empty/blank text)."""
    return F.filter(F.split(F.trim(col), r"\s+"), lambda t: t != "")


def token_count(col: Column) -> Column:
    """Number of non-whitespace runs (BPE-ish proxy: whitespace split;
    see ``bpe_token_estimate`` for the sub-word estimate)."""
    return F.size(tokens(col))


def bpe_token_estimate(col: Column) -> Column:
    """Crude BPE token-count estimate: word-ish runs + digits +
    punctuation each count (regexp-based, deterministic)."""
    return F.regexp_count(col, F.lit(r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"))


def stopword_count(col: Column) -> Column:
    """Occurrences of the STOPWORDS set as standalone words."""
    pat = r"\b(" + "|".join(STOPWORDS) + r")\b"
    return F.regexp_count(F.lower(col), F.lit(pat))


def lang_id(
    col: Column, n: Column | None = None, stops: Column | None = None
) -> Column:
    """Heuristic language ID: 'en' when the stopword density over the
    token stream clears 8%, else 'unknown' (n-gram-free variant of
    the classic stopword profile method).  This is the oracle-pinned
    form used by the `text_analysis` gate query; for multilingual
    corpora use :func:`lang_id_multi`.  ``n``/``stops`` optionally
    substitute pre-staged count COLUMNS for the inline recomputation
    (r14 — annotate_corpus stages each count once per row)."""
    n = token_count(col) if n is None else n
    stops = stopword_count(col) if stops is None else stops
    return F.when(
        (n > 0) & (stops / n > 0.08), F.lit("en")
    ).otherwise(F.lit("unknown"))


#: per-language stopword profiles for :func:`lang_id_multi` — the
#: highest-frequency function words, chosen to be (mostly) disjoint
#: across the four languages so densities separate cleanly
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "it", "was", "for"),
    "es": ("el", "la", "los", "las", "que", "y", "en", "un", "una", "por"),
    "fr": ("le", "les", "des", "une", "est", "et", "dans", "qui", "pas", "au"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "sich", "auf"),
}


def lang_id_multi(col: Column, min_density: float = 0.08) -> Column:
    """Multi-language stopword-profile ID over en/es/fr/de.

    Scores each language as (its stopword hits / token count) and
    returns the argmax when it clears ``min_density``, else
    'unknown'.  All-JVM ``regexp_count`` per language — one
    projection, no shuffle, no Python; ties break by the fixed
    profile order (en, es, fr, de), deterministically.

    This is the classic stopword-profile method (the degenerate
    single-language form is :func:`lang_id`); character-n-gram models
    beat it on short texts but need a trained profile table — the
    upgrade path is a broadcast-joined n-gram profile, same plan
    shape as the eval-decontamination probe.
    """
    n = token_count(col)
    lowered = F.lower(col)
    densities = {
        lang: F.regexp_count(
            lowered, F.lit(r"\b(" + "|".join(words) + r")\b")
        )
        / n
        for lang, words in LANG_STOPWORDS.items()
    }
    best = F.lit("unknown")
    best_d = F.lit(float(min_density))
    # reversed so earlier profile order wins exact ties
    for lang in reversed(list(densities)):
        d = densities[lang]
        best = F.when(d >= best_d, F.lit(lang)).otherwise(best)
        best_d = F.when(d >= best_d, d).otherwise(best_d)
    return F.when(n > 0, best).otherwise(F.lit("unknown"))


def quality_score(
    col: Column, n: Column | None = None, stops: Column | None = None
) -> Column:
    """Deterministic 0..1000 quality score (per-mille) from length,
    alpha ratio and stopword density.

    score = 400*min(tokens,64)//64 + 300*alpha//chars
          + 300*min(stops,8)//8

    All-integer floor arithmetic: floor(int/int) in double is exact in
    IEEE754 (correctly-rounded division; an integral true quotient is
    produced exactly), so Spark and any ANSI-SQL oracle agree bitwise.

    ``n``/``stops`` optionally substitute pre-staged count COLUMNS
    (same contract as :func:`lang_id`).
    """
    n = (token_count(col) if n is None else n).cast("bigint")
    chars = F.length(col).cast("bigint")
    alpha = F.regexp_count(col, F.lit(r"[A-Za-z]")).cast("bigint")
    stops = (stopword_count(col) if stops is None else stops).cast("bigint")
    score = (
        F.floor(F.least(n, F.lit(64)) * 400 / 64)
        + F.when(chars > 0, F.floor(alpha * 300 / chars)).otherwise(F.lit(0))
        + F.floor(F.least(stops, F.lit(8)) * 300 / 8)
    )
    return score.cast("int")


def doc_fingerprint(col: Column) -> Column:
    """Content fingerprint: md5 of the normalized text — the exact-dup
    key (md5 is identical across Spark/DuckDB → oracle-checkable)."""
    return F.md5(normalize_text(col))


def shingles_from_tokens(toks: Column, k: int = 3) -> Column:
    """k-word shingles from a token-array column.

    INLINING-TOLERANT by construction: built as a left fold of
    ``zip_with`` over k aligned slices, so no lambda ever references
    the outer token array — every ``toks`` reference sits at an HOF
    *argument* position, evaluated once per row.  (The previous
    ``transform(sequence, i -> slice(toks, i+1, k))`` form re-ran any
    inlined ``toks`` expression once per shingle index — O(tokens²)
    regexp work when Catalyst's predicate pushdown substituted the
    tokenizer into a filter condition, the blowup that made
    ``repetition_filter`` quadratic.)  Callers should still project
    the token array first when convenient (saves the constant-factor
    re-evaluations), but correctness of the cost model no longer
    depends on it.

    Documents shorter than k tokens yield a single shingle of all
    tokens, so no doc vanishes.
    """
    n = F.size(toks)
    m = n - k + 1
    shingles = F.slice(toks, 1, m)
    for j in range(1, k):
        shingles = F.zip_with(
            shingles,
            F.slice(toks, j + 1, m),
            lambda a, b: F.concat_ws(" ", a, b),
        )
    return F.when(n <= k, F.array(F.array_join(toks, " "))).otherwise(
        shingles
    )


def word_shingles(col: Column, k: int = 3) -> Column:
    """k-word shingles of the normalized text → array<string>.

    Convenience single-expression form; hot paths should project
    ``tokens(normalize_text(col))`` first and call
    :func:`shingles_from_tokens` (see PERF note there).
    """
    return shingles_from_tokens(tokens(normalize_text(col)), k)


def winnow_fingerprints(hashes: Column, w: int = 4) -> Column:
    """Winnowing fingerprint selection (Schleimer et al., SIGMOD'03):
    the distinct minimum hash of every ``w``-wide window over the
    ordered k-gram hash sequence → array<bigint>.

    Guarantees any match of length >= w+k-1 tokens shares a selected
    fingerprint, with ~2/(w+1) selection density.  INLINING-TOLERANT:
    the sliding-window minimum is a left fold of ``least`` via
    ``zip_with`` over w aligned slices — no lambda references the
    outer hash array (the ``shingles_from_tokens`` construction), so
    an optimizer-substituted expression is re-evaluated a constant
    number of times, never per window.  Documents with fewer than w
    hashes yield the single global minimum, so no doc vanishes.
    """
    n = F.size(hashes)
    m = n - w + 1
    mins = F.slice(hashes, 1, m)
    for j in range(1, w):
        mins = F.zip_with(
            mins,
            F.slice(hashes, j + 1, m),
            lambda a, b: F.least(a, b),
        )
    return F.array_distinct(
        F.when(n <= w, F.array(F.array_min(hashes))).otherwise(mins)
    )
