"""Repeated-span removal (llm/spans.py): boilerplate scrubbing,
byte-preservation of untouched docs, overlap merging, and the
scrub-vs-interval-math equivalence behind the dedup_spans oracle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sample_keyspaces_cdc_streams_connectors_spark.llm.spans import (
    flag_repeated_spans,
    remove_repeated_spans,
)

BOILER = "this content is provided under the creative commons license terms"


@pytest.fixture()
def corpus(spark):
    rows = [
        (1, f"unique thoughts about spark planning. {BOILER} more unique analysis follows"),
        (2, f"{BOILER} completely different body text in the second document"),
        (3, f"third document body with its own words then {BOILER}"),
        (4, "a document with no boilerplate at all, just original prose"),
        # overlapping repeats: two shifted copies of the boiler words
        (5, f"{BOILER} {BOILER}"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_boilerplate_removed_unique_kept(spark, corpus):
    out = {
        r.doc_id: r
        for r in remove_repeated_spans(corpus, k=5, min_docs=3).collect()
    }
    for d in (1, 2, 3, 5):
        assert "creative commons" not in out[d].text
        assert out[d].n_removed_tokens > 0
    assert "unique thoughts" in out[1].text
    assert "unique analysis" in out[1].text
    assert "different body text" in out[2].text


def test_untouched_docs_keep_original_bytes(spark, corpus):
    original = corpus.filter(F.col("doc_id") == 4).first()["text"]
    row = (
        remove_repeated_spans(corpus, k=5, min_docs=3)
        .filter(F.col("doc_id") == 4)
        .first()
    )
    assert row["text"] == original  # not even re-normalized
    assert row["n_removed_tokens"] == 0 and row["n_flagged_spans"] == 0


def test_overlapping_spans_merge(spark, corpus):
    """Consecutive flagged starts cover overlapping windows: removed
    tokens must count DISTINCT indexes, strictly less than spans*k."""
    row = (
        remove_repeated_spans(corpus, k=5, min_docs=3)
        .filter(F.col("doc_id") == 1)
        .first()
    )
    assert row.n_flagged_spans > 1
    assert row.n_removed_tokens < row.n_flagged_spans * 5


def test_scrub_equals_interval_math(spark, corpus):
    """The Arrow scrub's removed-token count must equal the pure-JVM
    sequence/flatten/array_distinct coverage count (the dedup_spans
    oracle formulation) on every doc."""
    from sample_keyspaces_cdc_streams_connectors_spark.functions.text import normalize_text, tokens

    k = 5
    scrubbed = {
        r.doc_id: r.n_removed_tokens
        for r in remove_repeated_spans(corpus, k=k, min_docs=2).collect()
    }
    flagged = flag_repeated_spans(corpus, k=k, min_docs=2)
    base = corpus.select(
        "doc_id", F.size(tokens(normalize_text(F.col("text")))).alias("n")
    )
    covered = F.size(
        F.array_distinct(
            F.flatten(
                F.transform(
                    "__starts",
                    lambda p: F.sequence(
                        p, F.least(p + k - 1, F.col("n") - 1)
                    ),
                )
            )
        )
    )
    expr = {
        r.doc_id: r.c
        for r in base.join(flagged, "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("__starts").isNotNull(), covered)
            .otherwise(0)
            .alias("c"),
        )
        .collect()
    }
    assert scrubbed == expr


def test_short_repeated_doc_fully_scrubbed(spark):
    """Docs shorter than k form one whole-doc window (shingle rule):
    a short string repeated across docs scrubs to empty."""
    df = spark.createDataFrame(
        [(1, "tiny repeated line"), (2, "tiny repeated line"), (3, "another doc")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in remove_repeated_spans(df, k=10, min_docs=2).collect()}
    assert out[1].text == "" and out[2].text == ""
    assert out[1].n_removed_tokens == 3
    assert out[3].text == "another doc"


def test_pipeline_stage_remove_repeated_spans(spark, corpus):
    from sample_keyspaces_cdc_streams_connectors_spark.config import ConfigError, load_config
    from sample_keyspaces_cdc_streams_connectors_spark.llm.pipeline import (
        build_corpus_pipeline,
        build_streaming_curation,
    )

    conf = {
        "keyspaces-cdc-streams": {
            "corpus": {
                "remove-repeated-spans": "true",
                "span-k": 5,
                "span-min-docs": 3,
            }
        }
    }
    out = build_corpus_pipeline(load_config(conf))(corpus)
    texts = {r.doc_id: r.text for r in out.select("doc_id", "text").collect()}
    assert "creative commons" not in texts[1]
    assert "unique thoughts" in texts[1]
    # annotations are computed on the SCRUBBED text
    row = out.filter(F.col("doc_id") == 5).first()
    assert row.n_tokens == row.text.count(" ") + (1 if row.text else 0)

    with pytest.raises(ConfigError) as e:
        build_streaming_curation(load_config(conf))
    assert "remove-repeated-spans" in str(e.value)


def test_empty_docs_never_flagged(spark):
    """Empty/whitespace-only docs must report 0 flagged / 0 removed
    and keep their bytes — matching the oracle, where the coverage
    join drops zero-token docs (the latent sequence(0,-1) divergence
    found in review)."""
    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, ""), (4, "real words in here")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in remove_repeated_spans(df, k=5, min_docs=2).collect()}
    for d in (1, 2, 3):
        assert out[d].n_flagged_spans == 0 and out[d].n_removed_tokens == 0
    assert out[2].text == "   "  # bytes preserved


# --- r5: maximal-span merge, property-tested vs a sequential reference ------


def _reference_scrub(texts, k, min_docs):
    """Sequential single-process reference of the EXACTSUBSTR recipe:
    same tokenizer (casefold, whitespace), window df across docs,
    mask union, maximal spans from the mask — the ground truth the
    distributed pipeline must reproduce exactly."""
    import re
    from collections import defaultdict

    def toks_of(text):
        norm = re.sub(r"\s+", " ", text or "").strip().lower()
        return [t for t in norm.split(" ") if t != ""]

    def windows(toks):
        if len(toks) == 0:
            return []
        if len(toks) <= k:
            return [(0, tuple(toks))]
        return [(i, tuple(toks[i : i + k])) for i in range(len(toks) - k + 1)]

    docs = {d: toks_of(t) for d, t in texts}
    win_docs = defaultdict(set)
    for d, toks in docs.items():
        for _, w in windows(toks):
            win_docs[w].add(d)
    out = {}
    for d, toks in docs.items():
        n = len(toks)
        mask = [False] * n
        starts = []
        for i, w in windows(toks):
            if len(win_docs[w]) >= min_docs:
                starts.append(i)
                for j in range(i, min(i + k, n)):
                    mask[j] = True
        spans = []
        j = 0
        while j < n:
            if mask[j]:
                s = j
                while j < n and mask[j]:
                    j += 1
                spans.append((s, j))
            else:
                j += 1
        clean = " ".join(t for t, m in zip(toks, mask) if not m)
        out[d] = {
            "clean": clean,
            "removed": sum(mask),
            "starts": len(starts),
            "spans": len(spans),
        }
    return out


def test_property_vs_sequential_reference(spark):
    """Random corpora with PLANTED long boilerplate runs (the case
    the maximal-span merge exists for): the distributed scrub must
    match the sequential reference on scrubbed text, removed-token
    count, flagged-start count, and MAXIMAL-span count for every doc;
    untouched docs keep their original bytes."""
    import random

    rng = random.Random(20260814)
    vocab = [f"w{i}" for i in range(200)]
    long_boiler = " ".join(rng.choice(vocab) for _ in range(13))  # > k
    mid_boiler = " ".join(rng.choice(vocab) for _ in range(6))
    k, min_docs = 5, 2

    for trial in range(3):
        rows = []
        for d in range(25):
            body = [rng.choice(vocab) for _ in range(rng.randint(0, 40))]
            text = " ".join(body)
            r = rng.random()
            if r < 0.35:
                cut = rng.randint(0, len(body))
                text = " ".join(body[:cut]) + f" {long_boiler} " + " ".join(body[cut:])
            elif r < 0.55:
                text = f"{mid_boiler} {text}"
            elif r < 0.6:
                # double plant — adjacent/overlapping windows
                text = f"{long_boiler} {text} {long_boiler}"
            rows.append((d, text.strip()))
        ref = _reference_scrub(rows, k, min_docs)
        got = {
            r.doc_id: r
            for r in remove_repeated_spans(
                spark.createDataFrame(rows, "doc_id long, text string"),
                k=k,
                min_docs=min_docs,
            ).collect()
        }
        originals = dict(rows)
        for d, exp in ref.items():
            row = got[d]
            assert row.n_removed_tokens == exp["removed"], (trial, d)
            assert row.n_flagged_spans == exp["starts"], (trial, d)
            assert row.n_maximal_spans == exp["spans"], (trial, d)
            if exp["starts"] == 0:
                assert row.text == originals[d], (trial, d)  # raw bytes
            else:
                assert row.text == exp["clean"], (trial, d)


# --- r7: fixed-k vs the true suffix-array criterion (VERDICT r5 #8) ---------


def _suffix_criterion_coverage(texts, k, min_docs, count_occurrences=False):
    """Brute-force transcription of the SUFFIX-ARRAY EXACTSUBSTR
    criterion (Lee et al. ACL'22): token i of doc d is covered iff
    SOME substring of length >= k containing i occurs in >= min_docs
    distinct documents (``count_occurrences=True`` switches to the
    paper's occurrence count, where two copies inside ONE doc also
    qualify).  O(docs * n^2) — test-sized corpora only."""
    import re
    from collections import defaultdict

    def toks_of(text):
        norm = re.sub(r"\s+", " ", text or "").strip().lower()
        return [t for t in norm.split(" ") if t != ""]

    docs = {d: toks_of(t) for d, t in texts}
    # df per substring tuple of every length >= k
    seen = defaultdict(set)      # substring -> doc set
    occ = defaultdict(int)       # substring -> occurrence count
    for d, toks in docs.items():
        n = len(toks)
        for length in range(k, n + 1):
            for s in range(n - length + 1):
                sub = tuple(toks[s : s + length])
                seen[sub].add(d)
                occ[sub] += 1
    cover = {}
    for d, toks in docs.items():
        n = len(toks)
        mask = [False] * n
        for length in range(k, n + 1):
            for s in range(n - length + 1):
                sub = tuple(toks[s : s + length])
                hot = (
                    occ[sub] >= min_docs
                    if count_occurrences
                    else len(seen[sub]) >= min_docs
                )
                if hot:
                    for j in range(s, s + length):
                        mask[j] = True
        cover[d] = mask
    return cover


def _fixed_k_coverage(spark, rows, k, min_docs, count_mode="docs"):
    """The engine's ACTUAL removal mask, read from the flagged
    maximal spans themselves (flag_repeated_spans is exactly what
    remove_repeated_spans scrubs with) — no text-based mask
    reconstruction, which could misattribute positions when a removed
    token equals a nearby kept one."""
    import re

    from sample_keyspaces_cdc_streams_connectors_spark.llm.spans import flag_repeated_spans

    df = spark.createDataFrame(rows, "doc_id long, text string")
    flagged = {
        r["doc_id"]: r["__spans"]
        for r in flag_repeated_spans(
            df, k=k, min_docs=min_docs, count_mode=count_mode
        ).collect()
    }
    # cross-check: the scrub's removed-token counts agree with the
    # interval mask (ties the mask to the user-facing operator)
    removed = {
        r["doc_id"]: r["n_removed_tokens"]
        for r in remove_repeated_spans(
            df, k=k, min_docs=min_docs, count_mode=count_mode
        ).collect()
    }
    cover = {}
    for d, text in rows:
        norm = re.sub(r"\s+", " ", text or "").strip().lower()
        n = len([t for t in norm.split(" ") if t != ""])
        mask = [False] * n
        for iv in flagged.get(d) or ():
            for j in range(iv["s"], iv["e"]):
                mask[j] = True
        assert sum(mask) == removed[d], d
        cover[d] = mask
    return cover


def test_fixed_k_equals_suffix_criterion_on_cross_doc_runs(spark):
    """The r5 verdict flagged runs of length k..2k-1 as a possible
    fixed-k residual.  This pins the stronger fact: for CROSS-DOC
    repeats the two constructions are coverage-IDENTICAL at every
    planted run length k..2k+2 — any position inside a length->=k
    repeated substring lies inside one of its k-sub-windows, and that
    window is itself repeated, so the window union equals the
    suffix-criterion union.  (The greedy mask reconstruction in
    _fixed_k_coverage is validated against n_removed_tokens.)"""
    import random

    rng = random.Random(20260815)
    vocab = [f"v{i}" for i in range(500)]  # large vocab: no chance repeats
    k, min_docs = 5, 2
    rows = []
    d = 0
    for run_len in range(k, 2 * k + 3):  # k .. 2k+2
        run = " ".join(rng.choice(vocab) for _ in range(run_len))
        for copy in range(2):
            body = [rng.choice(vocab) for _ in range(rng.randint(6, 18))]
            cut = rng.randint(0, len(body))
            rows.append(
                (d, " ".join(body[:cut]) + f" {run} " + " ".join(body[cut:]))
            )
            d += 1
    # plus unique docs that must stay untouched
    for _ in range(6):
        rows.append((d, " ".join(rng.choice(vocab) for _ in range(15))))
        d += 1

    suffix = _suffix_criterion_coverage(rows, k, min_docs)
    fixed = _fixed_k_coverage(spark, rows, k, min_docs)
    assert suffix.keys() == fixed.keys()
    for doc_id in suffix:
        assert suffix[doc_id] == fixed[doc_id], doc_id


def test_fixed_k_divergence_confined_to_known_classes(spark):
    """The ONLY divergences from the suffix-array construction are the
    two documented, intentional ones:

    1. short docs (n < k): the engine's whole-doc window flags
       repeated short docs as boilerplate; the suffix criterion
       (length >= k only) cannot see them — the engine is STRICTLY
       more aggressive, never less;
    2. within-doc repeats: the engine counts DISTINCT DOCUMENTS
       (boilerplate = cross-document by definition here), the paper
       counts occurrences — a phrase repeated twice inside one
       unique doc is flagged by the paper's criterion, not ours."""
    k, min_docs = 5, 2
    run = "alpha beta gamma delta epsilon zeta"  # 6 tokens > k
    rows = [
        (0, "tiny dup"),                      # short, repeated
        (1, "tiny dup"),
        (2, "unique little"),                 # short, unique
        (3, f"start {run} middle {run} end"),  # within-doc repeat only
        (4, "filler words that appear once in the corpus only here"),
    ]
    suffix_docs = _suffix_criterion_coverage(rows, k, min_docs)
    suffix_occ = _suffix_criterion_coverage(
        rows, k, min_docs, count_occurrences=True
    )
    fixed = _fixed_k_coverage(spark, rows, k, min_docs)

    # class 1: short repeated docs — engine covers, suffix cannot
    assert fixed[0] == [True, True] and suffix_docs[0] == [False, False]
    assert fixed[1] == [True, True]
    assert fixed[2] == [False, False]  # short but unique: untouched
    # class 2: within-doc repeat — occurrence counting covers the two
    # run copies, the engine's distinct-doc df leaves them
    assert not any(fixed[3])
    assert not any(suffix_docs[3])     # distinct-doc suffix agrees
    assert sum(suffix_occ[3]) == 12    # both 6-token copies flagged
    # everything else: all three constructions agree on no coverage
    assert not any(fixed[4]) and not any(suffix_occ[4])


def test_occurrence_mode_closes_last_divergence_class(spark):
    """r8: ``count_mode="occurrences"`` IS Lee et al.'s EXACTSUBSTR
    criterion — on a planted corpus with BOTH cross-doc and
    within-doc repeated runs (all docs >= k tokens, so the short-doc
    rule is inert) the engine's coverage equals the brute-force
    occurrence-counting suffix-criterion reference at every position:
    divergence zero."""
    import random

    rng = random.Random(20260816)
    vocab = [f"w{i}" for i in range(500)]
    k, min_count = 5, 2
    rows = []
    d = 0
    # cross-doc runs of every length k..2k+2
    for run_len in range(k, 2 * k + 3):
        run = " ".join(rng.choice(vocab) for _ in range(run_len))
        for _copy in range(2):
            body = [rng.choice(vocab) for _ in range(rng.randint(6, 18))]
            cut = rng.randint(0, len(body))
            rows.append(
                (d, " ".join(body[:cut]) + f" {run} " + " ".join(body[cut:]))
            )
            d += 1
    # within-doc repeats (the class the docs-mode engine leaves):
    # one run repeated twice inside a single otherwise-unique doc
    for run_len in (k, k + 2, 2 * k + 1):
        run = " ".join(rng.choice(vocab) for _ in range(run_len))
        mid = " ".join(rng.choice(vocab) for _ in range(7))
        rows.append((d, f"{run} {mid} {run}"))
        d += 1
    # unique docs stay untouched
    for _ in range(5):
        rows.append((d, " ".join(rng.choice(vocab) for _ in range(15))))
        d += 1

    suffix_occ = _suffix_criterion_coverage(
        rows, k, min_count, count_occurrences=True
    )
    fixed_occ = _fixed_k_coverage(
        spark, rows, k, min_count, count_mode="occurrences"
    )
    assert suffix_occ.keys() == fixed_occ.keys()
    for doc_id in suffix_occ:
        assert suffix_occ[doc_id] == fixed_occ[doc_id], doc_id
    # and the within-doc docs actually HAVE coverage (the divergence
    # class is exercised, not vacuously equal)
    within_ids = range(d - 8, d - 5)
    assert all(any(fixed_occ[i]) for i in within_ids)


def test_count_mode_validated(spark):
    import pytest as _pytest

    from sample_keyspaces_cdc_streams_connectors_spark.llm.spans import flag_repeated_spans

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="count_mode"):
        flag_repeated_spans(df, count_mode="bogus")


def test_pipeline_span_count_mode_key(spark):
    """corpus.span-count-mode wires through build_corpus_pipeline and
    validates; occurrences mode scrubs a within-doc repeat that docs
    mode leaves."""
    import pytest as _pytest

    from sample_keyspaces_cdc_streams_connectors_spark.config import ConfigError, load_config
    from sample_keyspaces_cdc_streams_connectors_spark.llm.pipeline import build_corpus_pipeline

    run = "alpha beta gamma delta epsilon zeta"
    docs = spark.createDataFrame(
        [(1, f"start {run} middle {run} end"), (2, "some unique words here")],
        "doc_id long, text string",
    )

    def conf(mode):
        return load_config(
            {
                "keyspaces-cdc-streams": {
                    "corpus": {
                        "remove-repeated-spans": "true",
                        "span-k": "5",
                        "span-min-docs": "2",
                        "span-count-mode": mode,
                    }
                }
            }
        )

    removed_docs = {
        r["doc_id"]: r["n_removed_tokens"]
        for r in build_corpus_pipeline(conf("docs"))(docs).collect()
    }
    removed_occ = {
        r["doc_id"]: r["n_removed_tokens"]
        for r in build_corpus_pipeline(conf("occurrences"))(docs).collect()
    }
    assert removed_docs[1] == 0 and removed_occ[1] == 12
    assert removed_docs[2] == removed_occ[2] == 0
    with _pytest.raises(ConfigError, match="span-count-mode"):
        build_corpus_pipeline(conf("bogus"))
