"""Random-hyperplane (signed random projection) LSH for cosine similarity.

The third ANN path next to brute force and IVF (operators/similarity.py):
each vector is reduced to ``n_tables`` bucket keys, where a key is the
sign pattern of the vector against ``n_bits`` fixed random hyperplanes —
P[sign match] = 1 − θ/π per bit (Charikar's SimHash bound), so vectors at
a small angle collide in some table with high probability. Candidate
generation is then a bucket equi-join: no quadratic scoring, no corpus
broadcast.

The hyperplanes are pseudo-random but fully deterministic (seeded
``numpy.random.default_rng``), generated once per Python worker and cached
— every executor sees identical planes, so bucket keys are reproducible
across runs, workers, and cluster sizes. The projection itself is one
(batch × dim) @ (dim × n_tables·n_bits) matmul per Arrow batch.

Scale: a narrow map (no shuffle, no state), same profile as the MinHash
kernel (functions/minhash_np.py). Table/bit counts trade recall for
candidate-set size; with random vectors the collision probability per
table is ~p^n_bits, so more, narrower tables raise recall at the cost of
more candidate pairs.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

_PLANES_CACHE: dict[tuple, np.ndarray] = {}


def planes_for(dim: int, n_tables: int, n_bits: int, seed: int) -> np.ndarray:
    """(n_tables * n_bits, dim) hyperplane normals; deterministic in all
    four parameters, cached per worker process."""
    key = (dim, n_tables, n_bits, seed)
    if key not in _PLANES_CACHE:
        rng = np.random.default_rng(seed)
        _PLANES_CACHE[key] = rng.standard_normal((n_tables * n_bits, dim))
    return _PLANES_CACHE[key]


def rp_lsh_bucket_keys(
    vec: Column,
    n_tables: int = 8,
    n_bits: int = 6,
    seed: int = 42,
) -> Column:
    """pandas_udf: array<float/double> embedding -> array<string> of
    ``n_tables`` bucket keys ``"<table>:<bits-as-int>"``. NULL/empty
    vectors get no keys (empty array) and so never become candidates."""

    @F.pandas_udf(ArrayType(StringType()))
    def _keys(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        weights = (1 << np.arange(n_bits, dtype=np.int64))[::-1]
        for s in batches:
            out = []
            vecs = [
                None if v is None or len(v) == 0 else np.asarray(v, np.float64)
                for v in s
            ]
            valid = [i for i, v in enumerate(vecs) if v is not None]
            keys_by_row: dict[int, list[str]] = {}
            if valid:
                m = np.stack([vecs[i] for i in valid])
                p = planes_for(m.shape[1], n_tables, n_bits, seed)
                bits = (m @ p.T) > 0  # (n_valid, n_tables*n_bits)
                codes = bits.reshape(len(valid), n_tables, n_bits) @ weights
                for row, c in zip(valid, codes):
                    keys_by_row[row] = [
                        f"{t}:{int(c[t])}" for t in range(n_tables)
                    ]
            out = [keys_by_row.get(i, []) for i in range(len(s))]
            yield pd.Series(out)

    return _keys(vec)
