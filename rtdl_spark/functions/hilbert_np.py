"""Hilbert-curve keys (vectorized numpy kernel) — the locality upgrade to
the Morton interleave in ``operators.zorder``.

Why Hilbert: a Morton curve takes big jumps — at every power-of-two
boundary the curve teleports across the value space, so a contiguous
curve segment (= one output file) can cover two far-apart rectangles,
loosening that file's min/max footer stats. The Hilbert curve visits every
cell of the grid with unit steps (each successive cell is an orthogonal
neighbor), so equal-length segments have asymptotically tighter bounding
boxes — strictly better file skipping for the same sort cost. The
difference grows with ``bits`` (more boundaries to jump).

Implementation: Skilling's transpose algorithm ("Programming the Hilbert
curve", AIP Conf. Proc. 707, 2004) — coords → Hilbert index in O(bits·dim)
bitwise ops. The per-row branch structure makes it a poor fit for Catalyst
expressions (the state threading would defeat subexpression reuse — the
same trap as the HOF-lambda recompute documented in functions/text.py), so
it runs as an Arrow-batched numpy kernel behind a pandas UDF: a narrow
map, no shuffle, vectorized mask arithmetic per batch — the established
kernel pattern of functions/minhash_np.py. The curve key is only computed
once per layout job (write path), never in the query path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F


def hilbert_index(coords: np.ndarray, bits: int) -> np.ndarray:
    """Vectorized Skilling transform: ``coords`` (n_rows, n_dims) of
    non-negative ints < 2**bits → Hilbert curve index (n_rows,) int64.
    Requires n_dims * bits <= 63 (key must fit a signed long)."""
    X = np.ascontiguousarray(coords, dtype=np.uint64).copy()
    n_rows, n = X.shape
    if n * bits > 63:
        raise ValueError(f"hilbert key needs {n * bits} bits; max 63")
    one = np.uint64(1)
    m = one << np.uint64(bits - 1)
    # Inverse undo: fold each quadrant's reflection/rotation out, MSB down.
    q = m
    while q > one:
        p = q - one
        for i in range(n):
            inv = (X[:, i] & q) != 0
            X[inv, 0] ^= p  # invert low bits of dim 0
            t = (X[~inv, 0] ^ X[~inv, i]) & p  # exchange with dim i
            X[~inv, 0] ^= t
            X[~inv, i] ^= t
        q >>= one
    # Gray encode.
    for i in range(1, n):
        X[:, i] ^= X[:, i - 1]
    t = np.zeros(n_rows, dtype=np.uint64)
    q = m
    while q > one:
        nz = (X[:, n - 1] & q) != 0
        t[nz] ^= q - one
        q >>= one
    for i in range(n):
        X[:, i] ^= t
    # Interleave the transposed form: bit b of dim i lands at position
    # b*n + (n-1-i) — dim 0 carries the most significant bit per group.
    key = np.zeros(n_rows, dtype=np.uint64)
    for b in range(bits):
        for i in range(n):
            bit = (X[:, i] >> np.uint64(b)) & one
            key |= bit << np.uint64(b * n + (n - 1 - i))
    return key.astype(np.int64)


def hilbert_key(scaled: list[Column], bits: int) -> Column:
    """Column of Hilbert indices from already-scaled long columns (each in
    [0, 2**bits); scaling lives in operators.zorder, shared with Morton)."""
    n = len(scaled)
    if n * bits > 63:
        # Validate at plan time on the driver — inside the UDF this would
        # surface as an opaque per-task PythonException after a full job
        # launch (and retries) instead of an immediate, readable error.
        raise ValueError(
            f"hilbert key needs {n * bits} bits for {n} columns × {bits} "
            "bits each; max 63 (reduce bits or columns)"
        )

    @F.pandas_udf("long")
    def _key(*series: pd.Series) -> pd.Series:
        coords = np.column_stack(
            [s.to_numpy(dtype=np.int64, na_value=0) for s in series]
        )
        return pd.Series(hilbert_index(coords, bits))

    return _key(*scaled)
