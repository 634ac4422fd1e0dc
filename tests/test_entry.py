"""Driver-contract smoke tests: entry(), queries()/oracle_sql() shape."""

from __future__ import annotations


def test_entry_runs_and_has_stable_schema(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["stream_operation_type", "n", "first_seq", "last_seq"]
    assert sum(r.n for r in rows) > 0


def test_queries_and_oracles_aligned(spark):
    import __spark_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 30
    # HARD registry budget: the driver's oracle gate records only the
    # FIRST 50 registered queries — r4 grew the registry to 59 and
    # silently pushed 9 gates out of the window (VERDICT r4 #1).
    # Adding a query past 50 must consolidate another first.
    assert len(qs) <= 50, (
        f"registry has {len(qs)} queries but the driver checks only "
        "the first 50 — consolidate before registering more"
    )
    # every oracle is a non-empty SQL string
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in os_.values())


def test_each_query_is_callable(spark):
    import __spark_entry__ as e

    for name, fn in e.queries().items():
        assert callable(fn), name
