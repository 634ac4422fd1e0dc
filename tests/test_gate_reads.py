"""r15 scale-safety of the ANN gates' driver-side query-vector read
(VERDICT r14 #3): the pyarrow read must prune row groups via a row
filter instead of loading whole columns, and a file over the driver
budget must fall back to the distributed Spark lookup."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from sample_keyspaces_cdc_streams_connectors_spark.queries import llm as qllm


def _write_two_row_groups(path: str) -> None:
    t = pa.table(
        {
            "vec_id": pa.array([1, 2, 3, 4], type=pa.int64()),
            "embedding": pa.array(
                [[0.1, 0.2], [0.3, 0.4], [0.5, 0.6], [0.7, 0.8]],
                type=pa.list_(pa.float32()),
            ),
        }
    )
    pq.write_table(t, path, row_group_size=2)


def test_gate_query_vec_prunes_row_groups(tmp_path):
    """The filters= read touches only the row group whose vec_id
    statistics match — demonstrated by comparing against the manual
    single-row-group read (row-group pruning is what keeps the driver
    read bounded when the file grows)."""
    sf_dir = str(tmp_path)
    path = f"{sf_dir}/embeddings.parquet"
    _write_two_row_groups(path)
    f = pq.ParquetFile(path)
    assert f.metadata.num_row_groups == 2  # the pruning premise

    # vec_id=4 lives in the SECOND row group only; the filtered read
    # must return exactly its vector (and pyarrow's stats-based
    # pruning means the first row group's pages are skipped)
    vec = qllm._gate_query_vec(sf_dir, vec_id=4)
    manual = [float(x) for x in f.read_row_group(1)["embedding"][1].as_py()]
    assert vec == manual

    got = pq.read_table(
        path,
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "==", 4)],
    )
    assert got.num_rows == 1  # the filter reaches the reader


def test_gate_query_vec_budget_falls_back_to_spark(
    spark, tmp_path, monkeypatch
):
    """A file exceeding the driver budget must NOT be read driver-side
    — the gate degrades to the distributed filter+first lookup."""
    sf_dir = str(tmp_path)
    path = f"{sf_dir}/embeddings.parquet"
    _write_two_row_groups(path)
    monkeypatch.setattr(qllm, "_GATE_DRIVER_READ_BUDGET", 0)

    # without a session the oversized read is refused outright
    with pytest.raises(ValueError, match="driver read budget"):
        qllm._gate_query_vec(sf_dir, vec_id=2)

    # with a session it degrades to the distributed point lookup and
    # returns the identical widened vector
    via_spark = qllm._gate_query_vec(sf_dir, vec_id=2, spark=spark)
    monkeypatch.setattr(qllm, "_GATE_DRIVER_READ_BUDGET", 256 << 20)
    via_arrow = qllm._gate_query_vec(sf_dir, vec_id=2)
    assert via_spark == via_arrow

    with pytest.raises(IndexError, match="not found"):
        monkeypatch.setattr(qllm, "_GATE_DRIVER_READ_BUDGET", 0)
        qllm._gate_query_vec(sf_dir, vec_id=99, spark=spark)
