"""Declared correctness queries — the driver-contract surface.

Every implemented operator from SURVEY.md §2 registers one query here:
a ``(spark, sf_dir) -> DataFrame`` callable plus (when SQL-expressible)
an equivalent ANSI SQL string for the DuckDB oracle.  Column names are
aliased identically on both sides — the driver sorts columns by name
before hashing values.

Determinism rules applied throughout:
- session timezone pinned to UTC (``session.tune``),
- float aggregation goes through DECIMAL (exact, order-independent)
  and is cast back to DOUBLE at the end,
- every top-k / limit has a total-order tie-breaker,
- no raw struct/array outputs — flat scalar columns only.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from sample_keyspaces_cdc_streams_connectors_spark.session import tune


@dataclass(frozen=True)
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None => driver records a rows-only check


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # release the previous query's scoped caches (a query's
            # result has been consumed by the time the next one is
            # built — see llm.dedup.release_ngram_cache)
            from sample_keyspaces_cdc_streams_connectors_spark.llm.dedup import release_ngram_cache
            from sample_keyspaces_cdc_streams_connectors_spark.llm.semdedup import release_semdedup_cache
            from sample_keyspaces_cdc_streams_connectors_spark.operators.prefixsum import (
                release_order_stats_cache,
            )

            release_ngram_cache()
            release_semdedup_cache()
            release_order_stats_cache()
            tune(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        REGISTRY[name] = QuerySpec(wrapped, oracle)
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import all query modules (side effect: fills REGISTRY).

    REGISTRATION ORDER MATTERS: the driver's oracle gate records the
    first 50 registry entries in registration order (r4 lesson — the
    registry grew to 59 and pushed the sinkshape + streaming gates out
    of the window).  Round 5 consolidated the registry back under 50
    (see the module docstrings' budget notes) AND reordered imports so
    the reference-core surfaces (CDC transforms, sink shaping,
    streaming state) register before the relational/LLM extensions —
    if the registry ever overflows again, the overflow lands on the
    extension tail, never on a reference operator.
    """
    from sample_keyspaces_cdc_streams_connectors_spark.queries import (  # noqa: F401
        cdc,
        sinkshape,
        streaming,
        relational,
        llm,
    )

    return REGISTRY
