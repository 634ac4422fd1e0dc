"""Int8 embedding quantization + quantized similarity search.

Scale role: at 100 TB the embedding table is itself big data — 10⁹
documents × 768 float32 dims ≈ 3 TB before replication.  Symmetric
per-vector int8 quantization cuts storage and scan bandwidth 4×
(one byte per dimension + one float scale per vector) at ~1e-2
cosine error, and the quantized search reads ONLY the narrow
(id, scale, code) projection.  This is the moderate point on the
compression ladder the engine already has both ends of:

- raw float arrays — exact, 4 bytes/dim (``llm.similarity``);
- int8 codes — ~exact, 1 byte/dim (this module);
- product quantization — lossy, ~m/d bytes/dim at m subspaces
  (``llm.pq``, ~50× smaller, needs trained codebooks).

Int8 needs NO training pass, so it drops into any pipeline where the
vectors are already unit-normalized (the engine's embedding
convention): ``cos(a, b) = dot(a, b) ≈ scale_a · scale_b ·
dot(code_a, code_b)`` with the integer dot exact in int32 arithmetic
(127² · d < 2³¹ for d < 130k dims).

Search (:func:`quantized_topk`) follows the PQ discipline: a map-only
Arrow pass scores the codes against the quantized query (numpy int32
matmul — no Python-per-row), a ``TakeOrderedAndProject`` heap keeps
k·rerank_factor candidates, and an optional exact re-rank joins the
RAW vectors for the candidate set only (never the full table) before
the final top-k — the shrink-then-rerank shape.  The re-ranked
answer equals exact brute force whenever the true top-k sits inside
the approx top-k·factor; int8 score error is ~1e-2, so that holds
except under adversarially tight score ties (pinned empirically in
tests, not a guarantee) while the full scan stays on 1-byte codes.

No reference counterpart (the reference delegates all vector search
to a remote service, S3VectorTargetMapper.java:87-177).
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    StructField,
    StructType,
)

__all__ = [
    "quantize_embeddings",
    "dequantize_col",
    "quantized_topk",
]

#: int8 symmetric range
_QMAX = 127


def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    scale_col: str = "q_scale",
    code_col: str = "q_code",
) -> DataFrame:
    """Append symmetric per-vector int8 quantization: ``scale_col``
    (double, = max|v|/127) and ``code_col`` (BinaryType, one signed
    byte per dimension, ``round(v / scale)``).

    Map-only Arrow pass (plan-pinned in tests/test_quant.py), one
    output byte per dimension — the dequantized vector is
    ``scale * code`` and ``|v_i - scale·code_i| ≤ scale/2``
    everywhere.  All-zero vectors quantize to scale 0 + zero codes
    and dequantize to exact zeros."""
    out_schema = StructType(
        [
            StructField("scale", DoubleType()),
            StructField("code", BinaryType()),
        ]
    )

    @F.pandas_udf(out_schema)
    def quant(vecs: pd.Series) -> pd.DataFrame:
        scales: list[float] = []
        codes: list[bytes] = []
        for v in vecs:
            if v is None:
                # NULL embeddings fail loudly: a NaN scale + garbage
                # code would otherwise poison every search batch the
                # row lands in (reshape/ragged failures downstream)
                raise ValueError(
                    "quantize_embeddings: NULL embedding — filter or "
                    "impute vectors before quantizing"
                )
            scale, q = _quantize_vec(np.asarray(v, dtype=np.float64))
            if not np.isfinite(scale):
                raise ValueError(
                    "quantize_embeddings: non-finite embedding values"
                )
            scales.append(scale)
            codes.append(q.tobytes())
        return pd.DataFrame({"scale": scales, "code": codes})

    q = quant(F.col(vec_col))
    return df.withColumn(scale_col, q["scale"]).withColumn(
        code_col, q["code"]
    )


def dequantize_col(scale_col, code_col):
    """``array<double>`` reconstruction of a quantized vector — an
    Arrow pass for tests/consumers that need the approximate floats
    back (the search path never materializes this; it scores codes
    directly)."""
    from pyspark.sql.types import ArrayType

    @F.pandas_udf(ArrayType(DoubleType()))
    def deq(scales: pd.Series, codes: pd.Series) -> pd.Series:
        out = []
        for s, c in zip(scales, codes):
            q = np.frombuffer(c, dtype=np.int8).astype(np.float64)
            out.append((q * float(s)).tolist())
        return pd.Series(out)

    scale = scale_col if not isinstance(scale_col, str) else F.col(scale_col)
    code = code_col if not isinstance(code_col, str) else F.col(code_col)
    return deq(scale, code)


def _quantize_vec(arr: np.ndarray) -> tuple[float, np.ndarray]:
    """THE symmetric-int8 formula — single definition shared by the
    table-side UDF and the query side, so the 'codes scored against
    the quantized query' symmetry cannot drift.

    Rounding is HALF-AWAY-FROM-ZERO (not numpy's banker's rint, r8):
    it is the rule ANSI SQL ``ROUND`` uses, so the DuckDB oracle of
    the ``vector_topk`` int8 arm replays the quantization
    bit-for-bit.  The two rules differ only on exact .5 steps — a
    measure-zero set for real embeddings — but the gate must hold on
    ANY input."""
    m = float(np.max(np.abs(arr))) if arr.size else 0.0
    if m == 0.0:
        return 0.0, np.zeros(arr.size, dtype=np.int8)
    scale = m / _QMAX
    x = arr / scale
    half_away = np.sign(x) * np.floor(np.abs(x) + 0.5)
    return scale, np.clip(half_away, -_QMAX, _QMAX).astype(np.int8)


def _quantize_query(query_vec: Sequence[float]) -> tuple[float, np.ndarray]:
    return _quantize_vec(
        np.asarray([float(x) for x in query_vec], dtype=np.float64)
    )


def quantized_topk(
    quantized: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    scale_col: str = "q_scale",
    code_col: str = "q_code",
    rerank_with: DataFrame | None = None,
    vec_col: str = "embedding",
    rerank_factor: int = 4,
) -> DataFrame:
    """Approximate-dot top-k over int8 codes, optional exact re-rank.

    ``quantized`` needs only ``(id_col, scale_col, code_col)`` — at
    scale that is the whole point: the scan reads 1 byte/dim + 8
    bytes, not 4 bytes/dim.  Scoring is one map-only Arrow pass
    (``codes_int32 @ query_code`` — exact integer arithmetic, scaled
    by ``scale_row · scale_query``), then a ``TakeOrderedAndProject``
    heap.  With unit-normalized inputs the approx score ≈ cosine.

    ``rerank_with`` (a frame carrying ``id_col`` + raw ``vec_col``)
    re-scores the top ``k·rerank_factor`` candidates with EXACT
    cosine and returns the exact-cosine top-k — the candidate set is
    k·factor rows, so the raw-vector fetch is a broadcast-scale join
    however big the corpus is.  Returns ``(id_col, score)`` ordered
    by score desc, ties to the lower id."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if rerank_factor < 1:
        raise ValueError(f"rerank_factor must be >= 1, got {rerank_factor}")
    q_scale, q_code = _quantize_query(query_vec)
    q32 = q_code.astype(np.int32)

    dims = int(q32.size)

    @F.pandas_udf("double")
    def approx(scales: pd.Series, codes: pd.Series) -> pd.Series:
        if not len(codes):
            return pd.Series([], dtype="float64")
        blob = b"".join(codes.tolist())
        # explicit shape check: a ragged code batch or a query of the
        # wrong width must fail with the cause, not an opaque reshape
        # error (or — worse — a silently mis-aligned score matrix
        # when the byte total happens to divide)
        if len(blob) != len(codes) * dims:
            lens = {len(c) for c in codes.tolist()}
            raise ValueError(
                f"quantized_topk: code widths {sorted(lens)} do not all "
                f"match the query's {dims} dims"
            )
        mat = np.frombuffer(blob, dtype=np.int8).reshape(
            len(codes), dims
        ).astype(np.int32)
        dots = mat @ q32
        return pd.Series(
            dots.astype(np.float64)
            * scales.to_numpy(dtype=np.float64)
            * q_scale
        )

    scored = quantized.select(
        F.col(id_col),
        approx(F.col(scale_col), F.col(code_col)).alias("score"),
    )
    n_cand = k * rerank_factor if rerank_with is not None else k
    top = scored.orderBy(F.desc("score"), F.asc(id_col)).limit(n_cand)
    if rerank_with is None:
        return top
    from sample_keyspaces_cdc_streams_connectors_spark.llm.similarity import (
        _cosine_to_query,
        _query_lit,
        _query_norm,
    )

    # collect the candidate ids ONCE — they are k·factor rows, so the
    # collect is tiny, and it means the dominant full-table quantized
    # scoring stage runs exactly one job (r8 fix: the previous lazy
    # anti-join coverage check re-executed the whole scan a second
    # time because `top` was not cached)
    # dedupe: a quantized table with duplicate ids (the documented
    # re-append hazard) would otherwise inflate len(cand_ids) past the
    # distinct count below and trip a spurious coverage error
    cand_ids = sorted({r[0] for r in top.select(id_col).collect()})
    # coverage check: a silent fewer-than-k / missing-true-best result
    # (stale or filtered rerank_with) becomes a hard error; the probe
    # is one pushed-down IN-filter count over rerank_with
    present = (
        rerank_with.filter(F.col(id_col).isin(cand_ids))
        .select(id_col)
        .distinct()
        .count()
    )
    if present != len(cand_ids):
        raise ValueError(
            f"quantized_topk: {len(cand_ids) - present} candidate "
            f"id(s) absent from rerank_with — the raw-vector frame "
            f"must cover every id in the quantized table"
        )
    exact = rerank_with.filter(F.col(id_col).isin(cand_ids)).select(
        F.col(id_col),
        _cosine_to_query(
            F.col(vec_col), _query_lit(query_vec), _query_norm(query_vec)
        ).alias("score"),
    )
    return exact.orderBy(F.desc("score"), F.asc(id_col)).limit(k)
