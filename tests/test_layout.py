"""Z-order layout: bucket/interleave correctness, plan shape, and the
physical payoff — parquet file footers admit fewer files on BOTH
dimensions than a single-column sort layout (checked via pyarrow)."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from sample_keyspaces_cdc_streams_connectors_spark.operators.layout import (
    write_zordered,
    zorder_column,
)


def _files_admitting(path: str, col: str, lo: float, hi: float) -> int:
    """Count parquet files whose [min,max] footer range intersects
    [lo,hi] — exactly what a stats-pruning reader would scan."""
    admitted = 0
    files = sorted(
        glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    )
    for f in files:
        meta = pq.ParquetFile(f).metadata
        fmin, fmax = None, None
        for rg in range(meta.num_row_groups):
            for ci in range(meta.num_columns):
                c = meta.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    s = c.statistics
                    fmin = s.min if fmin is None else min(fmin, s.min)
                    fmax = s.max if fmax is None else max(fmax, s.max)
        if fmin is not None and not (hi < fmin or lo > fmax):
            admitted += 1
    return admitted


def test_interleave_orders_like_morton(spark):
    # 2-bit, 2-col: z(1,0)=0b0001=1? bit i of col j -> pos i*2+j:
    # (a=1,b=0): a bit0 at pos0 -> 1.  (a=0,b=1): b bit0 at pos1 -> 2.
    # (a=1,b=1) -> 3; (a=2,b=0): a bit1 at pos2 -> 4.
    df = spark.createDataFrame(
        [(1, 0), (0, 1), (1, 1), (2, 0)], "a int, b int"
    )
    from sample_keyspaces_cdc_streams_connectors_spark.operators.layout import _interleave

    out = df.select(
        "a", "b", _interleave([F.col("a"), F.col("b")], 2).alias("z")
    ).collect()
    got = {(r["a"], r["b"]): r["z"] for r in out}
    assert got == {(1, 0): 1, (0, 1): 2, (1, 1): 3, (2, 0): 4}


def test_zorder_column_validation(spark):
    df = spark.createDataFrame([(1, 2)], "a int, b int")
    with pytest.raises(ValueError):
        zorder_column(df, ["a"])
    with pytest.raises(ValueError):
        zorder_column(df, ["a", "b"], bits=0)


def test_zorder_plan_no_join_no_python(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    z = zorder_column(ev, ["user_id", "value"], bits=4)
    plan = z._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "Exchange" not in plan  # bucket lookup is a literal fold
    assert "BatchEvalPython" not in plan


def test_zorder_write_preserves_rows(spark, sf_dir, tmp_path):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "value"
    )
    out = str(tmp_path / "z")
    write_zordered(ev, out, ["user_id", "value"], n_files=8, bits=6)
    back = spark.read.parquet(out)
    assert back.count() == ev.count()
    assert back.agg(F.sum("event_id")).collect()[0][0] == ev.agg(
        F.sum("event_id")
    ).collect()[0][0]
    assert "__z" not in back.columns
    # the cell id surfaces as a partition column (documented layout)
    assert "z_cell" in back.columns


def test_zorder_prunes_both_dimensions(spark, sf_dir, tmp_path):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "value"
    )
    n_files = 16
    zpath = str(tmp_path / "zorder")
    spath = str(tmp_path / "single")
    write_zordered(ev, zpath, ["user_id", "value"], n_files=n_files, bits=6)
    # baseline: clustered on user_id only
    (
        ev.repartitionByRange(n_files, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(spath)
    )
    # narrow predicates selecting ~3% of ROWS on each column
    # (quantile-based: equi-depth clustering optimizes pruning per
    # row-selectivity, which is also how real predicates distribute)
    u_q = tuple(
        ev.selectExpr("cast(user_id as double) user_id").approxQuantile(
            "user_id", [0.40, 0.43], 0.001
        )
    )
    v_q = tuple(ev.approxQuantile("value", [0.40, 0.43], 0.001))

    z_u = _files_admitting(zpath, "user_id", *u_q)
    z_v = _files_admitting(zpath, "value", *v_q)
    s_u = _files_admitting(spath, "user_id", *u_q)
    s_v = _files_admitting(spath, "value", *v_q)

    # single-column sort: tight on user_id, useless on value
    assert s_u <= 2
    assert s_v >= n_files - 2
    # z-order: prunes meaningfully on BOTH dimensions — it trades a
    # little of the sorted column's perfection for pruning everywhere
    assert z_u <= n_files / 2
    assert z_v <= n_files / 2
    # and the two-predicate workload scans fewer files overall
    assert z_u + z_v < s_u + s_v


def test_n_files_rounds_up_to_power_of_two(spark, tmp_path):
    """Cell count is n_files rounded UP to a power of two (cells are
    named by top z bits); n_files=1 degenerates to a single cell."""
    # decorrelated dims so every quadrant cell is populated
    df = spark.range(256).select(
        F.col("id").alias("a"), ((F.col("id") * 37) % 256).alias("b")
    )
    out3 = str(tmp_path / "z3")
    write_zordered(df, out3, ["a", "b"], n_files=3, bits=4)
    cells3 = {
        os.path.basename(p)
        for p in glob.glob(os.path.join(out3, "z_cell=*"))
    }
    assert len(cells3) == 4  # 3 -> next power of two

    out1 = str(tmp_path / "z1")
    write_zordered(df, out1, ["a", "b"], n_files=1, bits=4)
    cells1 = glob.glob(os.path.join(out1, "z_cell=*"))
    assert len(cells1) == 1

    with pytest.raises(ValueError):
        write_zordered(df, str(tmp_path / "z0"), ["a", "b"], n_files=0)
