"""Skew mitigation: salting for hot keys.

AQE's skew-join splitting (enabled in ``session.tune``) handles most
skew at runtime, but two cases need explicit salting at 100 TB:

- **window functions** over a hot partition key (AQE cannot split a
  window partition), and
- **aggregations** whose single hottest key exceeds one executor's
  memory even after partial aggregation.

``salted_agg`` runs any re-aggregable aggregation in two phases:
phase 1 groups by (key, salt) — the hot key's rows spread over
``n_salts`` reducers — phase 2 merges the per-salt partials by key.
Results are exactly the plain groupBy's (the declared query proves it
against the unsalted oracle).

``add_salt`` is the join-side helper: salt the skewed fact side and
explode the dimension side over all salt values.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (phase1, phase2) expression builders per re-aggregable aggregate
_MERGEABLE = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def add_salt(
    df: DataFrame,
    n_salts: int,
    col_name: str = "__salt",
    cols: Sequence[str] | None = None,
) -> DataFrame:
    """Deterministic row salt 0..n_salts-1 (partition id + monotonic
    id is non-deterministic under retry; a content hash is
    replay-stable).  ``cols`` bounds the hash input — hashing the
    WHOLE row forces the scan to read every column, destroying column
    pruning (a 16-column lineitem scan for a 2-column aggregate);
    pass the columns the query consumes and pruning survives.  Any
    deterministic per-row value salts correctly — uniformity only
    needs the hashed tuple to vary across the hot key's rows."""
    salt = F.pmod(
        F.hash(*[F.col(c) for c in (cols or df.columns)]), F.lit(n_salts)
    ).cast("int")
    return df.withColumn(col_name, salt)


def explode_salt(
    dim: DataFrame, n_salts: int, col_name: str = "__salt"
) -> DataFrame:
    """Replicate the (small) build side once per salt value so a
    salted fact side still finds every match."""
    return dim.withColumn(
        col_name,
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))),
    )


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, Column]],
    n_salts: int = 8,
    salt_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs`` maps output column -> (agg_name, input Column) with
    agg_name in {sum, count, min, max}.  The hot key's phase-1 load
    spreads across ``n_salts`` reducers; phase 2 merges ~n_salts rows
    per key.  Pass ``salt_cols`` (the columns the query actually
    consumes) to keep column pruning alive — see :func:`add_salt`.
    """
    for name, (kind, _) in aggs.items():
        if kind not in _MERGEABLE:
            raise ValueError(
                f"{name}: {kind!r} is not mergeable; use {sorted(_MERGEABLE)}"
            )
    salted = add_salt(df, n_salts, cols=salt_cols)
    phase1 = salted.groupBy(*keys, "__salt").agg(
        *[
            _MERGEABLE[kind][0](col).alias(name)
            for name, (kind, col) in aggs.items()
        ]
    )
    return phase1.groupBy(*keys).agg(
        *[
            _MERGEABLE[kind][1](F.col(name)).alias(name)
            for name, (kind, _) in aggs.items()
        ]
    )
