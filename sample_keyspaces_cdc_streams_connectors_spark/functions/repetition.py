"""Repetition / boilerplate quality heuristics (Gopher-style).

The classic repetition filters from the public Gopher corpus-curation
recipe (Rae et al. 2021, "Scaling Language Models", table A1): a
document dominated by repeated lines, paragraphs, or n-grams is
boilerplate (navigation chrome, log spam, templated listings) and a
known training-quality hazard.  The reference repo has no text layer
at all (its only text handling is the Bedrock embedding-field
extraction, S3VectorTargetMapper.java:100-125); these statistics are
part of the north-star LLM-data-pipeline surface this engine adds on
top.

Everything here is a pure Column expression over JVM built-ins
(split / array_distinct / zip_with / regexp_count) — zero Python
touches row data, no shuffle, so the whole family runs as one narrow
projection at full scan speed over a 100 TB `documents` table.  Two
Catalyst hazards shape the implementation (measured + root-caused in
SCALE.md "Catalyst inlining hazards"): every array lambda avoids
outer-array references (zip_with folds over aligned slices), and
:func:`repetition_filter` interposes a CollectMetrics pushdown
barrier so its predicate is never substituted below the stats
projection.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sample_keyspaces_cdc_streams_connectors_spark.functions.text import (
    normalize_text,
    shingles_from_tokens,
    tokens,
)


def nonblank_lines(col: Column) -> Column:
    """Non-blank lines of the raw text → array<string> (blank-only
    lines are never "duplicates" worth counting)."""
    return F.filter(F.split(col, r"\n"), lambda l: F.trim(l) != "")


def _sum_len(arr: Column) -> Column:
    """Total characters across an array of strings (bigint)."""
    return F.aggregate(
        arr,
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + F.length(x),
    )


def dup_line_fraction(lines: Column) -> Column:
    """Fraction of line OCCURRENCES that are repeats of an earlier
    line: ``(n - n_distinct) / n`` (0.0 for empty docs).

    ``lines`` should be a materialized array column (see module doc).
    """
    n = F.size(lines)
    return (
        F.when(n > 0, (n - F.size(F.array_distinct(lines))) / n)
        .otherwise(F.lit(0.0))
        .cast("double")
    )


def dup_line_char_fraction(lines: Column) -> Column:
    """Fraction of line CHARACTERS inside repeated line occurrences.

    Each distinct line's first occurrence is "original"; every further
    occurrence contributes its full length to the duplicate mass, so
    the numerator is ``sum_len(all lines) - sum_len(distinct lines)``.
    """
    total = _sum_len(lines)
    dup = total - _sum_len(F.array_distinct(lines))
    return (
        F.when(total > 0, dup / total).otherwise(F.lit(0.0)).cast("double")
    )


def dup_ngram_fraction(grams: Column) -> Column:
    """Fraction of n-gram OCCURRENCES that are repeats:
    ``(n - n_distinct) / n`` over a materialized shingle array.

    Divergence from the paper (documented): Gopher measures the
    fraction of *characters* covered by duplicated n-grams without
    double counting overlaps — an interval-union problem that needs a
    per-document sort+sweep.  The occurrence fraction is the standard
    cheap surrogate (identical ranking on the boilerplate pathologies
    the filter targets) and stays a pure projection.
    """
    n = F.size(grams)
    return (
        F.when(n > 0, (n - F.size(F.array_distinct(grams))) / n)
        .otherwise(F.lit(0.0))
        .cast("double")
    )


def most_common_run(sorted_arr: Column) -> Column:
    """Mode of a SORTED string array via run-length analysis
    → struct(best_run bigint, best string).

    Sorting groups equal values into runs; the run boundaries are the
    positions where the value changes, run lengths are consecutive
    boundary differences, and the mode is the value at the longest
    run's start (first such run on ties → the lexicographically
    smallest mode, deterministic).  All integer-array higher-order
    functions — array HOFs are CodegenFallback (interpreted per row),
    so cheap int comparisons beat a struct-state ``aggregate`` whose
    per-element struct rebuild measured ~20× slower at sf0.1.

    INLINING-TOLERANT: no lambda references the outer array — every
    ``sorted_arr`` reference sits at an HOF argument position
    (``zip_with`` pairs each element with its successor; a two-arg
    ``transform`` turns end-of-run flags into positions), so even
    when Catalyst's predicate pushdown inlines a whole
    sort-of-shingles-of-tokens expression here, it is re-evaluated a
    constant number of times per row, never per element.  Empty
    arrays yield (0, "")."""
    n = F.size(sorted_arr)
    nxt = F.concat(
        F.slice(sorted_arr, 2, F.greatest(n - 1, F.lit(0))),
        F.array(F.lit(None).cast("string")),
    )
    flags = F.zip_with(
        sorted_arr, nxt, lambda a, b: b.isNull() | (a != b)
    )
    ends = F.filter(
        F.transform(flags, lambda f, i: F.when(f, i)),
        lambda x: x.isNotNull(),
    )
    prev_ends = F.concat(
        F.array(F.lit(-1)),
        F.slice(ends, 1, F.greatest(F.size(ends) - 1, F.lit(0))),
    )
    lens = F.zip_with(ends, prev_ends, lambda e, p: (e - p).cast("bigint"))
    best_run = F.array_max(lens)
    pos = F.array_position(lens, best_run).cast("int")
    best = F.element_at(sorted_arr, F.element_at(ends, pos) + 1)
    return F.when(
        n > 0,
        F.struct(best_run.alias("best_run"), best.alias("best")),
    ).otherwise(
        F.struct(
            F.lit(0).cast("bigint").alias("best_run"),
            F.lit("").alias("best"),
        )
    )


def top_ngram_char_fraction(mode: Column, text_chars: Column) -> Column:
    """Fraction of document characters covered by the single most
    frequent n-gram: ``count(mode) * len(mode) / chars`` (the Gopher
    "top n-gram character fraction", computed against the normalized
    text length in ``text_chars``).  ``mode`` is a MATERIALIZED
    :func:`most_common_run` struct column — passing the raw
    expression would re-run the whole run-length analysis once per
    field reference."""
    covered = mode.best_run * F.length(mode.best)
    return (
        F.when(text_chars > 0, covered / text_chars)
        .otherwise(F.lit(0.0))
        .cast("double")
    )


def symbol_word_ratio(col: Column, toks: Column) -> Column:
    """Hash/ellipsis symbols per word — Gopher's symbol-to-word ratio
    (boilerplate markup and truncation spam detector)."""
    syms = F.regexp_count(col, F.lit(r"#|\.\.\.|…")).cast("bigint")
    n = F.size(toks)
    return F.when(n > 0, syms / n).otherwise(F.lit(0.0)).cast("double")


def bullet_ellipsis_fractions(lines: Column) -> tuple[Column, Column]:
    """(fraction of lines starting with a bullet glyph, fraction of
    lines ending in an ellipsis) — Gopher's list/truncation chrome
    signals."""
    n = F.size(lines)
    bullets = F.size(
        F.filter(lines, lambda l: F.trim(l).rlike(r"^([-*•●])"))
    )
    ellipsis = F.size(
        F.filter(lines, lambda l: F.trim(l).rlike(r"(\.\.\.|…)$"))
    )
    zero = F.lit(0.0)
    return (
        F.when(n > 0, bullets / n).otherwise(zero).cast("double"),
        F.when(n > 0, ellipsis / n).otherwise(zero).cast("double"),
    )


def alpha_word_fraction(toks: Column) -> Column:
    """Fraction of words containing at least one alphabetic character
    (Gopher's 80%-alpha-words rule; low values mean tables/code/junk)."""
    n = F.size(toks)
    alpha = F.size(F.filter(toks, lambda t: t.rlike(r"[A-Za-z]")))
    return F.when(n > 0, alpha / n).otherwise(F.lit(0.0)).cast("double")


#: stat column -> (comparison, Gopher-recipe default threshold).
#: "max" stats filter docs ABOVE the bound, "min" stats below it.
GOPHER_DEFAULTS: dict[str, tuple[str, float]] = {
    "dup_line_frac": ("max", 0.30),
    "dup_line_char_frac": ("max", 0.20),
    "top_2gram_char_frac": ("max", 0.20),
    "top_3gram_char_frac": ("max", 0.18),
    "top_4gram_char_frac": ("max", 0.16),
    "dup_5gram_frac": ("max", 0.15),
    "dup_10gram_frac": ("max", 0.10),
    "symbol_word_ratio": ("max", 0.10),
    "bullet_line_frac": ("max", 0.90),
    "ellipsis_line_frac": ("max", 0.30),
    "alpha_word_frac": ("min", 0.80),
}


def with_repetition_stats(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Append the full repetition-statistics family as columns.

    Two chained narrow projections: the first materializes the line /
    token / shingle arrays ONCE (HOF-inlining hazard — an inlined
    tokenizer would re-run per shingle index), the second computes
    every statistic from the materialized arrays and drops them.
    Plan: no shuffle, no Python (pinned in tests/test_repetition.py).
    """
    clash = sorted(set(df.columns) & set(GOPHER_DEFAULTS))
    if clash:
        raise ValueError(
            f"input already has repetition-stat column(s) {clash}; "
            "rename them — the stats stage would overwrite and (in "
            "filter mode) drop them"
        )
    t = F.col(text_col)
    staged = (
        df.withColumns(
            {
                "__lines": nonblank_lines(t),
                "__toks": tokens(normalize_text(t)),
                "__chars": F.length(normalize_text(t)).cast("bigint"),
            }
        )
        .withColumns(
            {
                # sorted for the mode pass (2-4), raw for dup counting
                "__s2": F.array_sort(
                    shingles_from_tokens(F.col("__toks"), 2)
                ),
                "__s3": F.array_sort(
                    shingles_from_tokens(F.col("__toks"), 3)
                ),
                "__s4": F.array_sort(
                    shingles_from_tokens(F.col("__toks"), 4)
                ),
                "__g5": shingles_from_tokens(F.col("__toks"), 5),
                "__g10": shingles_from_tokens(F.col("__toks"), 10),
            }
        )
        .withColumns(
            {
                # materialize each mode struct ONCE — field references
                # on an expression would re-run the analysis per field
                f"__m{k}": most_common_run(F.col(f"__s{k}"))
                for k in (2, 3, 4)
            }
        )
    )
    lines, toks = F.col("__lines"), F.col("__toks")
    chars = F.col("__chars")
    bullet_frac, ellipsis_frac = bullet_ellipsis_fractions(lines)
    out = staged.withColumns(
        {
            "dup_line_frac": dup_line_fraction(lines),
            "dup_line_char_frac": dup_line_char_fraction(lines),
            "top_2gram_char_frac": top_ngram_char_fraction(
                F.col("__m2"), chars
            ),
            "top_3gram_char_frac": top_ngram_char_fraction(
                F.col("__m3"), chars
            ),
            "top_4gram_char_frac": top_ngram_char_fraction(
                F.col("__m4"), chars
            ),
            "dup_5gram_frac": dup_ngram_fraction(F.col("__g5")),
            "dup_10gram_frac": dup_ngram_fraction(F.col("__g10")),
            "symbol_word_ratio": symbol_word_ratio(t, toks),
            "bullet_line_frac": bullet_frac,
            "ellipsis_line_frac": ellipsis_frac,
            "alpha_word_frac": alpha_word_fraction(toks),
        }
    )
    return out.drop(
        "__lines",
        "__toks",
        "__chars",
        "__s2",
        "__s3",
        "__s4",
        "__g5",
        "__g10",
        "__m2",
        "__m3",
        "__m4",
    )


def repetition_filter(
    df: DataFrame,
    text_col: str = "text",
    thresholds: dict[str, float] | None = None,
    keep_stats: bool = False,
) -> DataFrame:
    """Drop boilerplate documents by the Gopher repetition rules.

    ``thresholds`` overrides individual GOPHER_DEFAULTS bounds (keys
    must exist there; a bound of ``None`` disables that rule).  With
    ``keep_stats`` the statistic columns survive on the output for
    audit; otherwise the output schema equals the input schema.
    """
    bounds = dict(GOPHER_DEFAULTS)
    for key, value in (thresholds or {}).items():
        if key not in bounds:
            raise KeyError(
                f"unknown repetition stat {key!r}; known: {sorted(bounds)}"
            )
        direction, _ = bounds[key]
        bounds[key] = (direction, value)

    staged = with_repetition_stats(df, text_col=text_col)
    cond = F.lit(True)
    for stat, (direction, bound) in bounds.items():
        if bound is None:
            continue
        col = F.col(stat)
        rule = col <= F.lit(bound) if direction == "max" else col >= F.lit(bound)
        cond = cond & rule
    # PUSHDOWN BARRIER: a predicate on the stat columns gets pushed
    # below the stats projections with every stat's full expression
    # tree substituted into the condition — the nested references
    # multiply (struct-field access ×2; the run-length arrays are
    # each referenced by max/position/element_at), ending with the
    # tokenizer inlined ~950× and re-run per reference (measured
    # 124 s vs 2 s for the stats projection itself at sf0.1; a
    # non-deterministic rand() wrapper did NOT stop the push in
    # Spark 4).  A CollectMetrics node does: predicates never cross
    # it, so the filter stays above and each stat is computed exactly
    # once per row.  The string-named observe form is valid on batch
    # AND streaming frames; the metric itself (row count) is a free
    # accumulator.  Plan shape pinned in tests/test_repetition.py.
    import uuid

    barrier = staged.observe(
        f"__repetition_barrier_{uuid.uuid4().hex[:12]}",
        F.count(F.lit(1)).alias("rows"),
    )
    kept = barrier.filter(cond)
    return kept if keep_stats else kept.drop(*GOPHER_DEFAULTS.keys())
