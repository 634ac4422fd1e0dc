"""Connected-components duplicate clustering (llm/components.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sample_keyspaces_cdc_streams_connectors_spark.llm.components import (
    connected_components,
    dedup_survivors,
)


def _uf_components(pairs: list[tuple[int, int]]) -> dict[int, int]:
    """Driver-side union-find ground truth (min-id representative)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


PAIRS = [
    (1, 2), (2, 3),            # chain -> {1,2,3}
    (10, 11), (11, 12), (10, 12),  # triangle -> {10,11,12}
    (20, 21),                  # isolated pair
    (30, 31), (32, 33), (31, 32),  # two pairs merged by a bridge
    (42, 40), (40, 41),        # out-of-order ids
]


def test_components_match_union_find(spark):
    df = spark.createDataFrame(PAIRS, "doc_a long, doc_b long")
    got = {
        r.doc_id: r.component_id
        for r in connected_components(df).collect()
    }
    assert got == _uf_components(PAIRS)


def test_components_long_chain_converges(spark):
    # a 30-node path is far past any realistic dedup diameter; the
    # fixpoint loop must still close it (label floods from node 0)
    chain = [(i, i + 1) for i in range(30)]
    df = spark.createDataFrame(chain, "doc_a long, doc_b long")
    got = connected_components(df, max_iter=35)
    assert got.select("component_id").distinct().count() == 1
    assert got.count() == 31
    assert got.agg(F.min("component_id")).first()[0] == 0


def test_components_direction_invariant(spark):
    fwd = spark.createDataFrame(PAIRS, "doc_a long, doc_b long")
    rev = fwd.select(
        F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b")
    )
    a = sorted(map(tuple, connected_components(fwd).collect()))
    b = sorted(map(tuple, connected_components(rev).collect()))
    assert a == b


def test_components_nonconvergence_raises(spark):
    chain = [(i, i + 1) for i in range(10)]
    df = spark.createDataFrame(chain, "doc_a long, doc_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iter=1)


def test_star_algorithm_matches_union_find_and_label(spark):
    """Alternating large-star/small-star must produce the identical
    mapping as min-label propagation and union-find — on the fixture
    AND on seeded random graphs (the adversarial-topology path)."""
    import random

    for seed in (7, 42, 1337):
        rng = random.Random(seed)
        nodes = list(range(60))
        pairs = [
            (rng.choice(nodes), rng.choice(nodes)) for _ in range(80)
        ]
        pairs = [(a, b) for a, b in pairs if a != b]
        df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
        star = {
            r.doc_id: r.component_id
            for r in connected_components(df, algorithm="star").collect()
        }
        label = {
            r.doc_id: r.component_id
            for r in connected_components(df).collect()
        }
        truth = _uf_components(pairs)
        assert star == truth, f"seed {seed}"
        assert label == truth, f"seed {seed}"


def test_star_algorithm_long_chain_few_rounds(spark):
    # a 64-node path needs ~63 label rounds but only O(log^2) star
    # rounds — 10 is comfortably enough and far below the diameter
    chain = [(i, i + 1) for i in range(63)]
    df = spark.createDataFrame(chain, "doc_a long, doc_b long")
    got = connected_components(df, algorithm="star", max_iter=10)
    assert got.count() == 64
    assert got.select("component_id").distinct().collect()[0][0] == 0


def test_bad_algorithm_rejected(spark):
    df = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
    with pytest.raises(ValueError, match="label|star"):
        connected_components(df, algorithm="bogus")


def test_dedup_survivors_keeps_min_per_component_plus_untouched(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(50)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_a long, doc_b long"
    )
    kept = {r.doc_id for r in dedup_survivors(docs, pairs).collect()}
    # dropped: 2,3 (component of 1) and 11 (component of 10)
    assert kept == set(range(50)) - {2, 3, 11}


def test_empty_pairs_all_docs_survive_both_algorithms(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(5)], "doc_id long, text string"
    )
    empty = spark.createDataFrame([], "doc_a long, doc_b long")
    for algo in ("label", "star"):
        assert connected_components(empty, algorithm=algo).count() == 0
    assert dedup_survivors(docs, empty).count() == 5


def test_components_end_to_end_with_ngram_pairs(spark):
    """Full pipeline: near-dup pairs from the real operator, closed
    into clusters — (a,b) + (b,c) pairs land in ONE cluster."""
    from sample_keyspaces_cdc_streams_connectors_spark.llm.dedup import (
        ngram_jaccard_pairs,
        release_ngram_cache,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    toks = base.split()
    rows = [
        (1, base),
        (2, " ".join(toks[:-1] + ["omega"])),   # near-dup of 1
        (3, " ".join(["omega"] + toks[1:])),    # near-dup of 1 and 2
        (4, "completely different words entirely unrelated content here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = ngram_jaccard_pairs(docs, threshold=0.5)
    comp = connected_components(pairs)
    release_ngram_cache()
    got = {r.doc_id: r.component_id for r in comp.collect()}
    assert got == {1: 1, 2: 1, 3: 1}
    kept = {r.doc_id for r in dedup_survivors(docs, pairs).collect()}
    assert kept == {1, 4}


def test_dedup_survivors_prefer_quality(spark):
    docs = spark.createDataFrame(
        [
            (1, 10), (2, 99), (3, 50),   # component {1,2,3}: 2 wins on quality
            (10, 70), (11, 70),          # component {10,11}: tie -> lowest id
            (20, 5),                     # untouched
        ],
        "doc_id long, quality long",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_a long, doc_b long"
    )
    kept = {
        r.doc_id
        for r in dedup_survivors(docs, pairs, prefer="quality").collect()
    }
    assert kept == {2, 10, 20}
    # default rule unchanged: min-id survivors
    kept_min = {r.doc_id for r in dedup_survivors(docs, pairs).collect()}
    assert kept_min == {1, 10, 20}


def test_prefer_survivor_with_string_ids_ties_deterministic(spark):
    """Equal prefer values with STRING ids: the tie must break to the
    lexicographically lowest id (a negated string id would cast to
    NULL and make the winner arbitrary)."""
    from sample_keyspaces_cdc_streams_connectors_spark.llm.components import dedup_survivors

    docs = spark.createDataFrame(
        [("url-b", "t", 5), ("url-a", "t", 5), ("url-c", "t", 5)],
        "doc_id string, text string, q int",
    )
    pairs = spark.createDataFrame(
        [("url-a", "url-b"), ("url-b", "url-c")],
        "doc_a string, doc_b string",
    )
    kept = dedup_survivors(docs, pairs, prefer="q")
    assert [r["doc_id"] for r in kept.collect()] == ["url-a"]
    # and highest prefer still wins outright
    docs2 = spark.createDataFrame(
        [("url-b", "t", 9), ("url-a", "t", 5), ("url-c", "t", 7)],
        "doc_id string, text string, q int",
    )
    kept2 = dedup_survivors(docs2, pairs, prefer="q")
    assert [r["doc_id"] for r in kept2.collect()] == ["url-b"]


def test_prefer_survivor_null_prefer_loses(spark):
    """A NULL prefer value must never beat a scored doc (a negated
    NULL sorts first under min_by — the regression this pins)."""
    from sample_keyspaces_cdc_streams_connectors_spark.llm.components import dedup_survivors

    docs = spark.createDataFrame(
        [(1, "t", None), (2, "t", 9)],
        "doc_id long, text string, q int",
    )
    pairs = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
    kept = dedup_survivors(docs, pairs, prefer="q")
    assert [r["doc_id"] for r in kept.collect()] == [2]
    # all-NULL prefer: deterministic fallback to the lowest id
    docs2 = spark.createDataFrame(
        [(1, "t", None), (2, "t", None)],
        "doc_id long, text string, q int",
    )
    kept2 = dedup_survivors(docs2, pairs, prefer="q")
    assert [r["doc_id"] for r in kept2.collect()] == [1]


def test_prefer_survivor_string_prefer_natural_order(spark):
    """prefer columns keep their NATURAL ordering — a string prefer
    (e.g. an ISO timestamp) must not be cast to double."""
    from sample_keyspaces_cdc_streams_connectors_spark.llm.components import dedup_survivors

    docs = spark.createDataFrame(
        [
            (1, "t", "2024-01-01T00:00:00"),
            (2, "t", "2025-06-15T12:00:00"),
            (3, "t", "2023-03-03T08:00:00"),
        ],
        "doc_id long, text string, crawl_ts string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)], "doc_a long, doc_b long"
    )
    kept = dedup_survivors(docs, pairs, prefer="crawl_ts")
    assert [r["doc_id"] for r in kept.collect()] == [2]  # latest crawl


def test_auto_routes_hot_hub_to_star(spark, monkeypatch):
    """A hub whose degree exceeds the skew threshold makes auto mode
    take the star path (whose first large-star round collapses the
    hub), with identical components either way."""
    from sample_keyspaces_cdc_streams_connectors_spark.llm import components as C

    # star topology: node 0 paired with 1..60, plus a disjoint pair
    pairs = [(0, i) for i in range(1, 61)] + [(1000, 1001)]
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")

    star_calls = []
    real_star = C._star_components

    def spy(edges, max_iter):
        star_calls.append(1)
        return real_star(edges, max_iter)

    monkeypatch.setattr(C, "_star_components", spy)

    low = {
        (r.doc_id, r.component_id)
        for r in C.connected_components(df, skew_threshold=8).collect()
    }
    assert star_calls  # hub degree 60 > 8 -> star path taken

    star_calls.clear()
    high = {
        (r.doc_id, r.component_id)
        for r in C.connected_components(df, skew_threshold=10_000).collect()
    }
    assert not star_calls  # below threshold -> label path
    assert low == high
    assert {c for _, c in low} == {0, 1000}
