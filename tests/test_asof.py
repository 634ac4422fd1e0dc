"""As-of join operator (operators/asof.py) — backward semantics,
same-instant visibility, no-match nulls, multi-key isolation."""

from __future__ import annotations

from sample_keyspaces_cdc_streams_connectors_spark.operators.asof import asof_join


def _frames(spark):
    quotes = spark.createDataFrame(
        [
            (1, 10, 100.0),
            (1, 20, 101.0),
            (1, 30, 99.0),
            (2, 15, 50.0),
        ],
        "sym int, ts long, px double",
    )
    trades = spark.createDataFrame(
        [
            (1, 5, "t0"),   # before any quote -> null
            (1, 10, "t1"),  # same instant -> sees 100.0
            (1, 25, "t2"),  # between -> sees 101.0
            (1, 99, "t3"),  # after all -> sees 99.0
            (2, 20, "t4"),  # other key -> sees 50.0, never sym 1
            (3, 50, "t5"),  # key with no quotes -> null
        ],
        "sym int, ts long, tid string",
    )
    return trades, quotes


def test_asof_join_semantics(spark):
    trades, quotes = _frames(spark)
    out = asof_join(
        trades, quotes, on=["sym"], right_cols=["px"]
    )
    got = {r.tid: (r.asof_ts, r.asof_px) for r in out.collect()}
    assert got == {
        "t0": (None, None),
        "t1": (10, 100.0),
        "t2": (20, 101.0),
        "t3": (30, 99.0),
        "t4": (15, 50.0),
        "t5": (None, None),
    }


def test_asof_join_preserves_left_rowcount(spark):
    trades, quotes = _frames(spark)
    assert asof_join(trades, quotes, on=["sym"], right_cols=["px"]).count() == 6


def test_asof_join_single_shuffle(spark):
    trades, quotes = _frames(spark)
    plan = (
        asof_join(trades, quotes, on=["sym"], right_cols=["px"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1  # union -> one hash partition -> window
