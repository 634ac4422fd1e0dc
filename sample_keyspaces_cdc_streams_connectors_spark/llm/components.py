"""Connected components over near-duplicate pair graphs.

The dedup operators (:mod:`sample_keyspaces_cdc_streams_connectors_spark.llm.dedup`) emit
*pairs* ``(doc_a, doc_b, score)``.  Production corpus curation needs
one more step: transitively close the pairs into duplicate CLUSTERS
and keep one survivor per cluster — pairs (1,2) and (2,3) must yield
one cluster {1,2,3}, not two independent decisions.

Spark-first design: iterative min-label propagation expressed as
DataFrame joins (no GraphFrames dependency, no RDDs):

    label(v) <- min(label(v), min over neighbors u of label(u))

repeated to fixpoint.  Each iteration is ONE shuffle (an edge join +
a groupBy-min); the iteration count is bounded by the label-graph
diameter, which for near-dup clusters (cliques / stars around a
template document) is almost always 1-3.  ``localCheckpoint``
truncates the lineage every iteration so plans stay flat, and the
fixpoint test (``changed == 0``) runs on a count that reuses the
checkpointed frame — the loop is driver-controlled but every
per-element operation is distributed.

At 100 TB: the edge list for D documents with bucketed candidate
generation is O(D) rows (near-dup graphs are sparse by construction
— the LSH/stop-shingle caps bound per-doc degree), so each iteration
shuffles O(D) longs.  Worst-case long chains (diameter ~ D) do not
occur in dedup graphs; for adversarial/unknown topologies pass
``algorithm="star"`` — the alternating large-star/small-star
contraction (Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC'14), which converges in O(log^2 D) rounds of two
edge-list shuffles each, regardless of diameter.  Both algorithms
produce the identical (doc_id, component_id) mapping
(equivalence-tested against union-find on randomized graphs).

Reference parity note: the reference engine has no clustering
operator (its dedup surface ends at per-record transforms); this
module is part of the training-data-pipeline extension surface, spec
in SURVEY.md §2.2 "Dedup (north star)".
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components", "dedup_survivors"]


def _large_star(sym: DataFrame) -> DataFrame:
    """One large-star round (Kiveris et al., SoCC'14): every neighbor
    of ``u`` strictly larger than ``u`` re-attaches to the minimum of
    ``u``'s closed neighborhood.  ``sym`` must hold both directions of
    every edge."""
    mins = sym.groupBy("u").agg(
        F.least(F.min("v"), F.first("u")).alias("m")
    )
    return (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """One small-star round: orient every edge large->small, then
    attach each node's smaller neighbors (and the node itself) to the
    minimum of its smaller neighborhood."""
    oriented = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    )
    mins = oriented.groupBy("u").agg(
        F.least(F.min("v"), F.first("u")).alias("m")
    )
    return (
        oriented.join(mins, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .union(mins.select("u", F.col("m").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _star_components(edges: DataFrame, max_iter: int) -> DataFrame:
    """Alternating large-star/small-star contraction: converges in
    O(log^2 n) rounds on ANY graph (adversarial chains included),
    each round two shuffles of the current edge list.  At the
    fixpoint the edge list IS the star graph (node -> component
    minimum)."""
    cur = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).distinct().localCheckpoint(eager=True)
    prev_sig = None
    for _ in range(max_iter):
        sym = cur.union(
            cur.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        cur = (
            _small_star(_large_star(sym))
            .localCheckpoint(eager=True)
        )
        sig = cur.agg(
            F.count("*").alias("n"),
            F.coalesce(
                F.sum(F.xxhash64("u", "v")), F.lit(0)
            ).alias("h"),
        ).first()
        if prev_sig == (sig.n, sig.h):
            # fixpoint: cur IS the star graph (node -> component min).
            # Add the root rows (min -> min) so the mapping covers
            # every node, exactly like label mode.
            members = cur.select(
                F.col("u").alias("doc_id"), F.col("v").alias("component_id")
            )
            roots = (
                cur.select(F.col("v").alias("doc_id"))
                .distinct()
                .withColumn("component_id", F.col("doc_id"))
            )
            return members.union(roots)
        prev_sig = (sig.n, sig.h)
    raise RuntimeError(
        f"connected_components(star) did not converge in {max_iter} rounds"
    )


#: label mode routes a node's whole neighborhood into one task when
#: it joins labels on the hub's key — above this max-degree the auto
#: mode switches to star contraction, whose first large-star round
#: collapses hub degree (adversarial-safe by construction)
SKEW_DEGREE_THRESHOLD = 1_000_000


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 25,
    algorithm: str = "auto",
    skew_threshold: int = SKEW_DEGREE_THRESHOLD,
) -> DataFrame:
    """Resolve ``(src, dst)`` duplicate pairs into components.

    Returns ``(doc_id, component_id)`` for every node appearing in at
    least one pair, where ``component_id`` is the MINIMUM doc_id of
    the component — a deterministic, join-free-to-interpret cluster
    key.  Raises ``RuntimeError`` if ``max_iter`` iterations did not
    reach the fixpoint.

    ``algorithm="label"`` is min-label propagation — one shuffle per
    round, rounds ~= component diameter: the right choice for dedup
    graphs (cliques/stars, diameter 1-3) WITHOUT extreme hubs (its
    per-round ``sym.join(labels)`` lands a node's entire neighborhood
    in one task).  ``algorithm="star"`` is the alternating
    large-star/small-star contraction (Kiveris et al., SoCC'14) — two
    shuffles per round but O(log^2 n) rounds on ANY topology, and the
    first large-star round collapses hub neighborhoods: the choice
    when the diameter is unknown/adversarial or the degree
    distribution is heavy.  ``algorithm="auto"`` (default) probes the
    max degree with one count aggregate over the checkpointed edge
    list (map-side combined — bounded by node count, not edge count)
    and picks star when it exceeds ``skew_threshold``.  All modes
    return identical output (equivalence-tested vs union-find).
    """
    if algorithm == "star":
        edges0 = (
            pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
            .filter(F.col("u") != F.col("v"))
        )
        return _star_components(edges0, max_iter)
    if algorithm not in ("label", "auto"):
        raise ValueError(
            f"algorithm must be auto|label|star, got {algorithm!r}"
        )
    edges = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    # undirected closure: every edge in both directions
    sym = edges.union(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint(eager=True)

    if algorithm == "auto":
        max_deg = (
            sym.groupBy("u")
            .agg(F.count("*").alias("d"))
            .agg(F.max("d").alias("m"))
            .first()["m"]
        )
        if max_deg is not None and max_deg > skew_threshold:
            # sym is already deduplicated per direction; star's own
            # orient+distinct canonicalizes it
            return _star_components(sym, max_iter)

    # label(v) starts as min(v, min neighbor)
    labels = (
        sym.groupBy("u")
        .agg(F.least(F.min("v"), F.first("u")).alias("label"))
        .select(F.col("u").alias("doc_id"), "label")
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iter):
        # propagate: each node takes the min label over itself and
        # its neighbors' labels (one join + one groupBy-min)
        neighbor_labels = sym.join(
            labels.select(
                F.col("doc_id").alias("v"), F.col("label").alias("nl")
            ),
            "v",
        ).select(F.col("u").alias("doc_id"), F.col("nl").alias("cand"))
        updated = (
            labels.select("doc_id", F.col("label").alias("cand"))
            .union(neighbor_labels)
            .groupBy("doc_id")
            .agg(F.min("cand").alias("new_label"))
        )
        merged = (
            labels.join(updated, "doc_id")
            .select(
                "doc_id",
                F.col("new_label").alias("label"),
                (F.col("new_label") != F.col("label")).alias("__changed"),
            )
            .localCheckpoint(eager=True)
        )
        changed = merged.filter(F.col("__changed")).count()
        labels = merged.select("doc_id", "label")
        if changed == 0:
            return labels.select(
                "doc_id", F.col("label").alias("component_id")
            )
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} iterations"
    )


def dedup_survivors(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "doc_a",
    dst: str = "doc_b",
    prefer: str | None = None,
) -> DataFrame:
    """Keep one survivor per duplicate component.

    By default the survivor is the minimum ``id_col`` of each
    component (the same canonical-winner rule as
    :func:`exact_duplicates`) — non-survivors are exactly the nodes
    whose component_id differs from their own id, one anti-join, no
    extra shuffle.

    ``prefer=<column>`` keeps the component member with the HIGHEST
    value of that column instead (the column's natural ordering;
    NULL always loses; ties — including the all-NULL component —
    break to the LOWEST id, so the choice stays deterministic) — the
    production rule when a quality score exists: survivors should be
    the best representative, not the earliest-crawled.  Costs TWO
    component-keyed aggregates (``max`` of the prefer value, then an
    ``eqNullSafe`` filter to the besties and ``min`` of their ids —
    both map-side combinable) plus the flag join; see the inline
    comment for why this beats a single ``min_by``/``max_by`` with a
    composite key.  Documents in no pair survive untouched either
    way.
    """
    comp = connected_components(pairs, src=src, dst=dst)
    if prefer is None:
        return docs.join(
            comp.filter(F.col("doc_id") != F.col("component_id")).select(
                F.col("doc_id").alias(id_col)
            ),
            id_col,
            "left_anti",
        )
    members = comp.join(
        docs.select(
            F.col(id_col).alias("doc_id"), F.col(prefer).alias("__pref")
        ),
        "doc_id",
    )
    # highest prefer wins (the column's NATURAL ordering — numeric,
    # string, timestamp alike; no cast), NULL prefer always loses,
    # ties break to the LOWEST id for any orderable id type.  Two
    # small component-keyed aggregates instead of one min_by with a
    # negated key: negating the prefer value needs a numeric cast
    # (ANSI crash / silent NULL on strings) and negating the id
    # breaks string ids — both measured regressions.  eqNullSafe
    # keeps the all-NULL-prefer component deterministic (falls back
    # to min id).
    best = members.groupBy("component_id").agg(
        F.max("__pref").alias("__best")
    )
    winners = (
        members.join(best, "component_id")
        .filter(F.col("__pref").eqNullSafe(F.col("__best")))
        .groupBy("component_id")
        .agg(F.min("doc_id").alias("keep_id"))
    )
    losers = members.join(
        winners.select(F.col("keep_id")),
        members["doc_id"] == winners["keep_id"],
        "left_anti",
    ).select(F.col("doc_id").alias(id_col))
    return docs.join(losers, id_col, "left_anti")
