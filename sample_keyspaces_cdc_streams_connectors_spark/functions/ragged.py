"""Shared numpy kernel for ragged per-row reductions inside Arrow
batches.

Several Arrow-batched UDFs reduce a per-row VARIABLE-LENGTH int64
array to one scalar (the quality/DSIR margin: gather weights and
sum; the decontamination probe: membership-test and count).  The
vectorized shape is identical — flatten the batch's ragged arrays,
apply one vectorized transform to the flat array, segment-sum back
to rows with ``np.add.reduceat`` — and subtle (the empty/None-row
masking and the reduceat start offsets), so it lives here once.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np

__all__ = ["ragged_segment_sums"]


def ragged_segment_sums(
    vals,
    flat_fn: Callable[[np.ndarray], np.ndarray],
    dtype=np.float64,
) -> np.ndarray:
    """Per-row sums of ``flat_fn`` applied over each row's int64
    array.

    ``vals`` is a sequence of array-likes (None and empty allowed —
    they contribute 0); ``flat_fn`` maps the CONCATENATED flat int64
    array to an aligned array of per-element contributions (must be
    vectorized; it is called exactly once per batch).  Returns a
    ``len(vals)`` array of ``dtype``."""
    n = len(vals)
    out = np.zeros(n, dtype=dtype)
    lens = np.fromiter(
        (0 if v is None else len(v) for v in vals), dtype=np.int64, count=n
    )
    nonempty = [
        np.asarray(v, dtype=np.int64) for v in vals if v is not None and len(v)
    ]
    if nonempty:
        flat = nonempty[0] if len(nonempty) == 1 else np.concatenate(nonempty)
        contrib = flat_fn(flat)
        mask = lens > 0
        starts = np.zeros(int(mask.sum()), dtype=np.int64)
        np.cumsum(lens[mask][:-1], out=starts[1:])
        out[mask] = np.add.reduceat(contrib, starts)
    return out
