"""Physical-plan regression tests — the SCALE.md audit, pinned.

These assert the plan SHAPE (broadcast vs shuffle, pushdown, top-k
heaps, exchange counts), not timings: a regression that silently
turns a broadcast join into a sort-merge join or drops a pushed
filter would pass correctness and still be a 100 TB disaster.
"""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def plans(spark, sf_dir):
    import __spark_entry__ as e

    qs = e.queries()

    def get(name: str) -> str:
        df = qs[name](spark, sf_dir)
        return df._jdf.queryExecution().executedPlan().toString()

    return get


def test_dim_joins_broadcast(plans):
    plan = plans("join_inner")
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan


def test_scan_pushdown_and_pruning(plans):
    plan = plans("scan_project")
    assert "PushedFilters: [" in plan
    assert "IsNotNull" in plan or "GreaterThanOrEqual" in plan
    # column pruning: the 16-column lineitem scan reads only 5
    scan = [l for l in plan.splitlines() if "FileScan parquet [" in l][0]
    cols = scan.split("FileScan parquet [", 1)[1].split("]", 1)[0]
    assert len(cols.split(",")) == 5


def test_topk_uses_partial_heaps(plans):
    for q in ("topk_orders", "vector_topk"):
        assert "TakeOrderedAndProject" in plans(q), q


def test_mv_apply_single_exchange(plans):
    assert plans("mv_apply").count("Exchange") == 1


def test_window_rank_single_exchange(plans):
    assert plans("window_rank").count("Exchange") <= 2


def test_cdc_shape_no_python_no_shuffle(plans):
    plan = plans("metadata_enrich")
    assert "Exchange" not in plan  # pure map-side pipeline
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_no_cartesian_anywhere(plans):
    for q in (
        "join_inner",
        "join_left",
        "join_semi_anti",
        "asof_join_purchase",
        "range_join_shipments",
        "dedup_embedding",
    ):
        plan = plans(q)
        assert "CartesianProduct" not in plan, q
        assert "BroadcastNestedLoopJoin" not in plan, q


def test_aggregates_partial_then_final(plans):
    plan = plans("agg_sum_by_key")
    # partial (map-side) + final HashAggregate pair around one exchange
    assert plan.count("HashAggregate") >= 2
    assert plan.count("Exchange") == 1
