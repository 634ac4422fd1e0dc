"""Persisted IVF index: partition-pruned probes, recall vs brute
force, codebook round-trip."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from sample_keyspaces_cdc_streams_connectors_spark.llm.ivf_index import (
    ivf_index_topk,
    load_codebook,
    write_ivf_index,
)
from sample_keyspaces_cdc_streams_connectors_spark.llm.similarity import brute_force_topk


@pytest.fixture(scope="module")
def index_path(spark, sf_dir, tmp_path_factory):
    vectors = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    path = str(tmp_path_factory.mktemp("ivf") / "index")
    write_ivf_index(vectors, path, k=8, n_iter=3)
    return path


def test_codebook_roundtrip(index_path):
    cb = load_codebook(index_path)
    assert len(cb) == 8 and all(len(c) == 64 for c in cb)


def test_probe_scan_prunes_partitions(spark, index_path):
    """The probe filter must land in PartitionFilters (directory-level
    pruning), NOT in DataFilters/PushedFilters (post-scan row filter) —
    and the layout must actually be one directory per cell."""
    assert len(glob.glob(f"{index_path}/cell=*")) == 8
    q = ivf_index_topk(spark, index_path, [0.1] * 64, n_probe=2)
    plan = q._jdf.queryExecution().executedPlan().toString()
    scan_line = next(l for l in plan.splitlines() if "FileScan parquet" in l)
    assert "PartitionFilters: [cell" in scan_line and " IN (" in scan_line
    assert "DataFilters: []" in scan_line
    # semantically: the probed scan sees only the probed cells' rows
    from sample_keyspaces_cdc_streams_connectors_spark.llm.ivf_index import _probe_cells

    cells = _probe_cells([0.1] * 64, load_codebook(index_path), 2)
    pruned = spark.read.parquet(index_path).filter(F.col("cell").isin(cells))
    total = spark.read.parquet(index_path)
    assert 0 < pruned.count() < total.count()


def test_recall_vs_brute_force(spark, sf_dir, index_path):
    """The embeddings fixture is near-isotropic (probing with the
    generator's own labels recalls 6/10 at n_probe=4/10 — see
    test_kmeans.py), so >= 6 is the honest partial-probe bar; probing
    ALL cells must recover the exact top-k."""
    vectors = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    query = [float(x) for x in vectors.orderBy("vec_id").first().embedding]
    exact = {r.vec_id for r in brute_force_topk(vectors, query, k=10).collect()}
    approx = {
        r.vec_id
        for r in ivf_index_topk(spark, index_path, query, topk=10, n_probe=4).collect()
    }
    assert len(approx) == 10
    assert len(exact & approx) >= 6
    full = {
        r.vec_id
        for r in ivf_index_topk(spark, index_path, query, topk=10, n_probe=8).collect()
    }
    assert full == exact


def test_codebook_roundtrips_through_hadoop_fs_uri(spark, sf_dir, tmp_path):
    """The codebook is written/read via the Hadoop FileSystem API, so
    the layout works on any supported URI scheme — a file:// URI (the
    scheme-qualified form a driver-local open() cannot handle)
    round-trips; a plain open() would fail on the scheme prefix."""
    vectors = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(64)
    path = f"file://{tmp_path}/uri_index"
    cb = write_ivf_index(vectors, path, k=4, n_iter=1)
    assert load_codebook(path, spark) == cb
    assert load_codebook(path) == cb  # active-session fallback
    got = ivf_index_topk(
        spark, path, [0.05] * 64, topk=5, n_probe=2
    ).collect()
    assert 1 <= len(got) <= 5


def test_append_extends_cells_without_rewriting_untouched_files(
    spark, sf_dir, tmp_path_factory
):
    """Incremental append: new vectors join their nearest EXISTING
    cell, pre-existing files are untouched (byte-identical listing +
    mtimes for cells the append did not reach), and a probe finds an
    appended vector through the same pruned scan."""
    import os

    from sample_keyspaces_cdc_streams_connectors_spark.llm.ivf_index import append_to_ivf_index

    vectors = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    path = str(tmp_path_factory.mktemp("ivf_append") / "index")
    write_ivf_index(vectors.filter(F.col("vec_id") % 2 == 0), path, k=4, n_iter=3)
    n0 = spark.read.parquet(path).count()

    def listing():
        out = {}
        for root, _dirs, files in os.walk(path):
            for f in files:
                if f.endswith(".parquet"):
                    p = os.path.join(root, f)
                    out[p] = os.path.getmtime(p)
        return out

    before = listing()
    odd = vectors.filter(F.col("vec_id") % 2 == 1)
    append_to_ivf_index(odd, path)
    after = listing()

    assert spark.read.parquet(path).count() == n0 + odd.count()
    # every pre-existing file survives byte-for-byte (same mtime)
    for p, mt in before.items():
        assert p in after and after[p] == mt, f"rewrote {p}"
    assert len(after) > len(before)  # appends added new files
    # an appended vector is findable through the pruned probe scan
    target = odd.first()
    got = ivf_index_topk(
        spark, path, [float(x) for x in target.embedding], topk=1, n_probe=1
    ).first()
    assert got.vec_id == target.vec_id


@pytest.fixture(scope="module")
def ivfpq_path(spark, sf_dir, tmp_path_factory):
    from sample_keyspaces_cdc_streams_connectors_spark.llm.ivf_index import write_ivf_pq_index

    vectors = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    path = str(tmp_path_factory.mktemp("ivfpq") / "index")
    write_ivf_pq_index(vectors, path, k=8, n_iter=3, m=8, ksub=8)
    return path


def test_ivf_pq_layout_and_model_roundtrip(spark, ivfpq_path):
    from sample_keyspaces_cdc_streams_connectors_spark.llm.ivf_index import load_pq_model_json

    assert len(glob.glob(f"{ivfpq_path}/cell=*")) == 8
    model = load_pq_model_json(ivfpq_path, spark)
    assert model.m == 8 and model.ksub == 8 and model.dims == 64
    row = spark.read.parquet(ivfpq_path).select("pq_code").first()
    assert len(bytes(row["pq_code"])) == 8  # m one-byte codes


def test_ivf_pq_adc_scan_prunes_both_ways(spark, ivfpq_path):
    """The ADC candidate pass must prune PARTITIONS (probed cells
    only) and COLUMNS (codes, never the raw vectors)."""
    from sample_keyspaces_cdc_streams_connectors_spark.llm.ivf_index import (
        _probe_cells,
        load_codebook,
        load_pq_model_json,
    )
    from sample_keyspaces_cdc_streams_connectors_spark.llm.pq import pq_topk

    q = [0.1] * 64
    model = load_pq_model_json(ivfpq_path, spark)
    cells = _probe_cells(q, load_codebook(ivfpq_path, spark), 2)
    scan = spark.read.parquet(ivfpq_path).filter(F.col("cell").isin(cells))
    adc = pq_topk(scan.select("vec_id", "pq_code"), model, q, k=50)
    plan = adc._jdf.queryExecution().executedPlan().toString()
    scan_line = next(l for l in plan.splitlines() if "FileScan parquet" in l)
    assert "PartitionFilters: [cell" in scan_line
    assert "embedding" not in scan_line.split("ReadSchema")[1]


def test_ivf_pq_recall_vs_exact(spark, sf_dir, ivfpq_path):
    """Full-probe IVF-PQ with generous refine reproduces exact top-10;
    a 2-probe search keeps recall@10 high on the clustered fixture."""
    from sample_keyspaces_cdc_streams_connectors_spark.llm.ivf_index import ivf_pq_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 1).first()["embedding"]]
    exact = [
        (r.vec_id, round(r.sim, 8))
        for r in brute_force_topk(emb, qvec, k=10).collect()
    ]
    full = [
        (r.vec_id, round(r.sim, 8))
        for r in ivf_pq_topk(
            spark, ivfpq_path, qvec, topk=10, n_probe=8, refine=100
        ).collect()
    ]
    assert full == exact  # all cells probed + covering refine = exact
    probed = {
        r.vec_id
        for r in ivf_pq_topk(
            spark, ivfpq_path, qvec, topk=10, n_probe=2, refine=10
        ).collect()
    }
    assert len(probed & {v for v, _ in exact}) >= 7


# --- IVF-int8 (r8): cell pruning + 4x narrower quantized scan ---------------


@pytest.fixture(scope="module")
def ivf_int8_path(spark, sf_dir, tmp_path_factory):
    from sample_keyspaces_cdc_streams_connectors_spark.llm.ivf_index import write_ivf_int8_index

    vectors = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    path = str(tmp_path_factory.mktemp("ivfint8") / "index")
    write_ivf_int8_index(vectors, path, k=8, n_iter=3)
    return path


def test_ivf_int8_layout(spark, ivf_int8_path):
    assert len(glob.glob(f"{ivf_int8_path}/cell=*")) == 8
    row = spark.read.parquet(ivf_int8_path).select("q_scale", "q_code").first()
    assert len(bytes(row["q_code"])) == 64  # one byte per dim
    assert row["q_scale"] > 0


def test_ivf_int8_scan_prunes_both_ways(spark, ivf_int8_path):
    """The quantized scoring pass must prune PARTITIONS (probed cells
    only) and COLUMNS (scale+code, never the raw vectors)."""
    from sample_keyspaces_cdc_streams_connectors_spark.llm.ivf_index import ivf_int8_topk

    q = ivf_int8_topk(spark, ivf_int8_path, [0.1] * 64, n_probe=2, rerank=False)
    plan = q._jdf.queryExecution().executedPlan().toString()
    scan_line = next(l for l in plan.splitlines() if "FileScan parquet" in l)
    assert "PartitionFilters: [cell" in scan_line and " IN (" in scan_line
    assert "embedding" not in scan_line.split("ReadSchema")[1]


def test_ivf_int8_rerank_matches_float_ivf(spark, sf_dir, ivf_int8_path, index_path):
    """Recall parity with float IVF at the SAME n_probe: the re-ranked
    int8 probe returns the identical ids and (exact-cosine) scores —
    the 4x narrower scan costs nothing on the fixture."""
    from sample_keyspaces_cdc_streams_connectors_spark.llm.ivf_index import ivf_int8_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 1).first()["embedding"]]
    for n_probe in (2, 8):
        flt = [
            (r.vec_id, round(r.sim, 8))
            for r in ivf_index_topk(
                spark, ivf_int8_path, qvec, topk=10, n_probe=n_probe
            ).collect()
        ]
        i8 = [
            (r.vec_id, round(r.score, 8))
            for r in ivf_int8_topk(
                spark, ivf_int8_path, qvec, topk=10, n_probe=n_probe
            ).collect()
        ]
        assert i8 == flt, n_probe


def test_ivf_int8_approx_only_overlaps(spark, sf_dir, ivf_int8_path):
    """Without re-rank the int8 scores are ~1e-2 off exact cosine —
    the approx top-10 of a full probe must still overlap the exact
    in-probe answer substantially."""
    from sample_keyspaces_cdc_streams_connectors_spark.llm.ivf_index import ivf_int8_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 1).first()["embedding"]]
    exact = {r.vec_id for r in brute_force_topk(emb, qvec, k=10).collect()}
    approx = {
        r.vec_id
        for r in ivf_int8_topk(
            spark, ivf_int8_path, qvec, topk=10, n_probe=8, rerank=False
        ).collect()
    }
    assert len(approx & exact) >= 7


def test_ivf_int8_append_matches_layout(spark, sf_dir, ivf_int8_path, tmp_path):
    """append_to_ivf_index must quantize appended rows for an int8
    layout — later probes see a uniform (embedding, q_scale, q_code)
    schema and find the appended vectors."""
    import shutil

    from sample_keyspaces_cdc_streams_connectors_spark.llm.ivf_index import append_to_ivf_index, ivf_int8_topk

    path = str(tmp_path / "ivf8_append")
    shutil.copytree(ivf_int8_path, path)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    probe_row = emb.orderBy("vec_id").first()
    fresh = spark.createDataFrame(
        [(999_999, list(probe_row["embedding"]))],
        "vec_id long, embedding array<float>",
    )
    append_to_ivf_index(fresh, path)
    tab = spark.read.parquet(path)
    assert "q_code" in tab.columns
    assert tab.filter(F.col("vec_id") == 999_999).select(
        "q_scale", "q_code"
    ).first()["q_code"] is not None
    # the appended row is its own exact nearest neighbor
    qvec = [float(x) for x in probe_row["embedding"]]
    top = ivf_int8_topk(spark, path, qvec, topk=1, n_probe=8).collect()
    assert top and top[0]["vec_id"] in (999_999, probe_row["vec_id"])
