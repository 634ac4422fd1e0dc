"""Unit tests for bench.py's report emission (r11 — VERDICT r10 #2).

The r10 bench crashed at report-assembly time with a NameError on a
variable the same round's refactor had renamed — AFTER the entire
~25-minute measurement suite had executed — so round 10 produced no
benchmark artifact at all.  These tests construct the results object
with synthetic numbers and drive the pure assembler end-to-end (build
both dicts, JSON-serialize them, check the contract keys), so a
broken emission is a red test in seconds instead of a lost round.

No Spark session required: ``assemble_reports`` is pure.
"""

from __future__ import annotations

import json

import pytest

import bench


def _results(prev=None) -> bench.BenchResults:
    return bench.BenchResults(
        timings={"agg_sums": 0.5, "join_basic": 0.25},
        sf=0.1,
        cdc_rows_per_sec=250_000,
        cdc_marginal_rows_per_sec=2_500_000,
        corpus_docs_per_sec=6_800,
        streaming_events_per_sec=41_000,
        streaming_pipelines={"sliding_window": 50_000, "session_window": 41_000},
        session_state_events_per_sec=90_000,
        session_state_rate_early=95_000,
        session_state_rate_late=85_000,
        stream_passes=3,
        aux_ops_sec={"bm25_topk": 0.4, "ingest_loop_4batch": 12.3},
        aux_ops_passes_sec={
            "bm25_topk": [0.5, 0.4],
            "ingest_loop_4batch": [12.3, 14.1],
        },
        corpus_early_best=0.91,
        corpus_late_best=0.87,
        cdc_early_best=0.55,
        cdc_late_best=0.52,
        cdc_fat8_best=1.9,
        sess_full_early=4.2,
        sess_floor_early=0.9,
        sess_full_late=4.5,
        sess_floor_late=1.1,
        session_fatten=8,
        sliding_early_best=1.22,
        sliding_late_best=1.31,
        streaming_passes_sec={
            "sliding_window_early": [1.25, 1.22],
            "sliding_window_late": [1.31, 1.4],
            "session_full_early": [4.2, 4.4],
            "session_floor_early": [0.9, 1.0],
            "session_full_late": [4.5, 4.6],
            "session_floor_late": [1.1, 1.2],
        },
        bpe_fertility_ratio=1.31,
        headline_early={"agg_sums": 0.52, "join_basic": 0.27},
        headline_late={"agg_sums": 0.5, "join_basic": 0.25},
        headline_pass_totals=[0.82, 0.79, 0.77, 0.75],
        prev=prev,
    )


def test_reports_build_and_serialize():
    out, detail = bench.assemble_reports(_results())
    # both dicts must round-trip through JSON (the driver parses them)
    json.loads(json.dumps(out))
    json.loads(json.dumps(detail))
    json.loads(json.dumps({**out, **detail}))  # BENCH_DETAIL.json shape


def test_headline_contract_keys():
    out, _ = bench.assemble_reports(_results())
    # the driver's contract: ONE JSON line with these fields
    assert out["metric"] == "headline_suite_seconds"
    assert out["unit"] == "sec"
    assert out["value"] == pytest.approx(0.75)
    assert out["queries"] == {"agg_sums": 0.5, "join_basic": 0.25}
    assert out["sf"] == 0.1
    for key in (
        "cdc_rows_per_sec",
        "cdc_marginal_rows_per_sec",
        "corpus_docs_per_sec",
        "streaming_events_per_sec",
        "streaming_pipelines",
        "session_state_events_per_sec",
        # r13 (ADVICE r12): both positional session rates ride in the
        # HEADLINE artifact so either estimator can be recomputed
        "session_state_rate_early",
        "session_state_rate_late",
    ):
        assert key in out, key


def test_detail_positional_splits_emitted():
    """The r9 #4 / r10 #3 drift instrumentation must actually land in
    the artifact (r10 computed it and silently dropped it)."""
    _, detail = bench.assemble_reports(_results())
    assert detail["headline_early_best_sec"] == {
        "agg_sums": 0.52,
        "join_basic": 0.27,
    }
    assert detail["headline_late_best_sec"] == {
        "agg_sums": 0.5,
        "join_basic": 0.25,
    }
    assert detail["headline_pass_totals_sec"] == [0.82, 0.79, 0.77, 0.75]
    # session full/floor pairs per position + conservative minima
    assert detail["session_full_early_sec"] == 4.2
    assert detail["session_floor_early_sec"] == 0.9
    assert detail["session_full_late_sec"] == 4.5
    assert detail["session_floor_late_sec"] == 1.1
    assert detail["session_full_sec"] == 4.2
    assert detail["session_trigger_floor_sec"] == 0.9
    # corpus/CDC positional bests (r8/r9 instrumentation, still due)
    assert detail["corpus_early_best_sec"] == 0.91
    assert detail["cdc_late_best_sec"] == 0.52
    assert detail["aux_ops_sec"]["ingest_loop_4batch"] == 12.3
    # r13: per-op pass times for positional attribution
    assert detail["aux_ops_passes_sec"]["ingest_loop_4batch"] == [
        12.3,
        14.1,
    ]


def test_delta_section_with_prev_round():
    prev = (9, {"value": 37.85, "queries": {"agg_sums": 0.6, "gone_q": 0.1}})
    _, detail = bench.assemble_reports(_results(prev=prev))
    assert detail["prev_round"] == 9
    assert detail["prev_total_sec"] == 37.85
    assert detail["delta_vs_prev_sec"]["agg_sums"] == pytest.approx(-0.1)
    assert detail["delta_coverage"]["shared"] == 1
    assert detail["delta_coverage"]["current_only"] == ["join_basic"]


def test_delta_section_sums_renamed_queries():
    """Consolidated queries compare against the SUM of their prior
    parts (the merged query does all their work)."""
    prev = (
        7,
        {
            "value": 30.0,
            "queries": {"agg_sum_by_key": 0.2, "agg_salted_sum": 0.35},
        },
    )
    _, detail = bench.assemble_reports(_results(prev=prev))
    assert detail["prev_queries_sec"]["agg_sums"] == pytest.approx(0.55)
    assert detail["delta_vs_prev_sec"]["agg_sums"] == pytest.approx(-0.05)


def test_no_prev_round_omits_delta_keys():
    _, detail = bench.assemble_reports(_results(prev=None))
    assert "delta_vs_prev_sec" not in detail
    assert "prev_round" not in detail


def test_prev_bench_skips_unusable_artifacts(tmp_path, monkeypatch):
    """An rc:1/parsed:null artifact (the r10 crash record) must not
    shadow the newest round that actually measured."""
    import os

    (tmp_path / "BENCH_r9.json").write_text(
        json.dumps({"parsed": {"value": 37.8, "queries": {"agg_sums": 0.6}}})
    )
    (tmp_path / "BENCH_r10.json").write_text(
        json.dumps({"rc": 1, "parsed": None, "tail": "NameError: floor_best"})
    )
    real_dirname = os.path.dirname

    def fake_dirname(path):
        if path == os.path.abspath(bench.__file__):
            return str(tmp_path)
        return real_dirname(path)

    monkeypatch.setattr(bench.os.path, "dirname", fake_dirname)
    got = bench._prev_bench()
    assert got is not None
    n, doc = got
    assert n == 9
    assert doc["queries"] == {"agg_sums": 0.6}


def test_streaming_positional_fields_present():
    # r14 (VERDICT r13 #2): the streaming group carries the same
    # positional attribution data as CDC/corpus/session
    _out, detail = bench.assemble_reports(_results())
    assert detail["sliding_early_best_sec"] == 1.22
    assert detail["sliding_late_best_sec"] == 1.31
    passes = detail["streaming_passes_sec"]
    assert set(passes) == {
        "sliding_window_early",
        "sliding_window_late",
        "session_full_early",
        "session_floor_early",
        "session_full_late",
        "session_floor_late",
    }
    assert all(len(v) == 2 for v in passes.values())
